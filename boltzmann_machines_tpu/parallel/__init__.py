from .mesh import (make_mesh, shard_batch, shard_model_columns, replicate,
                   fully_replicated)
from .distributed import initialize, process_local_slice
