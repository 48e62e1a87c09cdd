"""Profiling hooks: jax.profiler traces viewable in TensorBoard/Perfetto
(the TPU-native replacement for the reference's Stopwatch-only timing,
SURVEY.md section 5.1)."""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir, name='bmtpu'):
    """Capture a device trace for the enclosed block.

    >>> with trace('/tmp/prof'):     # doctest: +SKIP
    ...     rbm.fit(X)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named region inside a device trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer(object):
    """Lightweight wall-clock step timer that forces a device sync via a
    scalar readback (``block_until_ready`` can return early on remote
    backends)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            float(sync_value if not hasattr(sync_value, 'sum')
                  else sync_value.sum())
        self.times.append(time.perf_counter() - self._t0)
        return self.times[-1]

    def mean(self):
        return sum(self.times) / max(len(self.times), 1)
