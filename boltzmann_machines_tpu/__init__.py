"""TPU-native energy-based-model framework.

A brand-new JAX/XLA/Pallas implementation with the full capabilities of the
reference TF1 library `yell/boltzmann-machines`: RBMs (Bernoulli /
Multinomial / Gaussian units), arbitrary-depth DBMs trained with PCD +
mean-field variational inference, AIS partition-function / ELBO estimation,
sklearn-style fit/transform/sample APIs, schedules, regularizers, and
checkpoint/resume with reproducible RNG.
"""

__version__ = '0.1.0'

import os as _os


def _enable_compilation_cache():
    """Persist XLA/Mosaic compilations across processes: the fused epoch
    mega-kernels take minutes to compile but are stable artifacts."""
    try:
        import jax
        if _os.environ.get('JAX_COMPILATION_CACHE_DIR'):
            return
        cache_dir = _os.path.join(_os.path.expanduser('~'), '.cache',
                                  'bmtpu_jax_cache')
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from . import base, utils
from .layers import BernoulliLayer, MultinomialLayer, GaussianLayer
from .ebm import EnergyBasedModel
from .rbm import BaseRBM, BernoulliRBM, MultinomialRBM, GaussianRBM, logit_mean
from .dbm import DBM
