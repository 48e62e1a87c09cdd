"""Dtype and seed mixins (reference base/mixin.py:7-35 equivalents).

``DtypeMixin`` maps the user-facing ``dtype`` string to jnp/np dtypes and
lazily enables ``jax_enable_x64`` the first time a float64 model is built
(float64 on TPU is software-emulated; it exists for CPU parity tests).

``SeedMixin`` owns the checkpointable host RNG from which per-call op seeds
are drawn (see utils/rng.py for the key-threading contract).
"""

import numpy as np

from ..utils.rng import RNG

_X64_ENABLED = [False]


def _ensure_x64():
    if not _X64_ENABLED[0]:
        import jax
        jax.config.update('jax_enable_x64', True)
        _X64_ENABLED[0] = True


class BaseMixin(object):
    def __init__(self, *args, **kwargs):
        if args or kwargs:
            raise AttributeError('Invalid parameters: {0}, {1}'.format(args, kwargs))
        super(BaseMixin, self).__init__()


class DtypeMixin(BaseMixin):
    def __init__(self, dtype='float32', *args, **kwargs):
        super(DtypeMixin, self).__init__(*args, **kwargs)
        self.dtype = dtype
        if dtype == 'float64':
            _ensure_x64()

    @property
    def _jnp_dtype(self):
        import jax.numpy as jnp
        if self.dtype == 'float64':
            _ensure_x64()
        return getattr(jnp, self.dtype)

    @property
    def _np_dtype(self):
        return getattr(np, self.dtype)


class SeedMixin(BaseMixin):
    def __init__(self, random_seed=None, *args, **kwargs):
        super(SeedMixin, self).__init__(*args, **kwargs)
        self.random_seed = random_seed
        self._rng = RNG(seed=self.random_seed)

    def make_random_seed(self):
        """Draw a fresh op seed, advancing the persisted RNG state."""
        return int(self._rng.randint(2 ** 31 - 1))

    def make_prng_key(self):
        """Draw a fresh ``jax.random`` key from the persisted host RNG."""
        import jax
        return jax.random.PRNGKey(self.make_random_seed())
