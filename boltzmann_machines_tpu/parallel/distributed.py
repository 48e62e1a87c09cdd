"""Multi-host (DCN) initialization.

On a multi-host TPU pod slice, call `initialize()` once per process before
constructing models; `jax.devices()` then spans all hosts and the same
mesh/sharding code scales across DCN (GSPMD splits collectives into
ICI-within-slice + DCN-across-hosts phases automatically).
"""

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """Thin wrapper over ``jax.distributed.initialize``.

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars).  Safe to call once per process.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_devices': jax.local_device_count(),
        'global_devices': jax.device_count(),
    }


def process_local_slice(n_rows):
    """Row range [start, stop) of a globally (row-)sharded array that this
    process should materialize locally."""
    per = n_rows // jax.process_count()
    start = per * jax.process_index()
    stop = n_rows if jax.process_index() == jax.process_count() - 1 \
        else start + per
    return start, stop
