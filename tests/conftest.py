"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware."""

import os

# BMT_TEST_TPU=1 runs the suite on the real accelerator (enables the Pallas
# kernel tests); default is CPU with 8 virtual devices.
if not os.environ.get('BMT_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = \
            (flags + ' --xla_force_host_platform_device_count=8').strip()
    # some environments export JAX_PLATFORMS pointing at a plugin backend
    # that wins over the env var -- force via config too
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def tmp_model_dir(tmp_path):
    return str(tmp_path) + '/'


@pytest.fixture
def tiny_data():
    from boltzmann_machines_tpu.utils.rng import RNG
    X = RNG(seed=1337).rand(16, 12)
    X_val = RNG(seed=42).rand(8, 12)
    return X, X_val
