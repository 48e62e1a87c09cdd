from .mesh import make_mesh, shard_batch, shard_model_columns, replicate
