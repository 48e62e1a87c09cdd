#!/usr/bin/env python
"""Measure the tiled CD stats kernel's tile-size choice on the chip.

The mesh training path for models whose W exceeds the resident-kernel
VMEM budget streams W through (V, tile) HBM->VMEM tiles
(`make_tiled_cd_stats_kernel`); `tile=512` was chosen by construction,
not measurement (round-4 verdict).  This sweeps tile sizes at the
CIFAR G-RBM shape the kernel exists for and prints ms/call so the
constant is a recorded decision.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp
    from boltzmann_machines_tpu.ops.pallas_ops import \
        make_tiled_cd_stats_kernel

    V, H, B, k = 3072, 7800, 100, 1
    rng = np.random.RandomState(0)
    state = {
        'W': jnp.asarray(rng.randn(V, H).astype(np.float32) * 0.01),
        'vb': jnp.zeros((V,), jnp.float32),
        'hb': jnp.zeros((H,), jnp.float32),
    }
    X = jnp.asarray(rng.rand(B, V).astype(np.float32))

    print('tiled CD stats sweep: %dx%d batch %d k=%d (W streamed)' %
          (V, H, B, k))
    for tile in (512, 1024, 2048):
        stats = make_tiled_cd_stats_kernel(
            V, H, B, k, sample_v_states=False, sample_h_states=True,
            propup_mult=1., propdown_mult=1., visible='gaussian',
            sigma=1., tile=tile)
        fn = jax.jit(lambda s, x, it: stats(s, x, 7, it, 0)[0]['assoc'])
        out = fn(state, X, 0)
        float(jnp.sum(jnp.abs(out)))  # sync after compile
        n = 30
        t0 = time.perf_counter()
        a = out
        for i in range(n):
            a = fn(state, X, i + 1)
        float(jnp.sum(jnp.abs(a)))
        dt = (time.perf_counter() - t0) / n
        wbytes = V * ((H + 127) // 128 * 128) * 4
        print('tile %4d: %7.3f ms/call  %6.0f samples/s  W-read BW '
              '%5.1f GB/s' % (tile, dt * 1e3, B / dt, wbytes / dt / 1e9))


if __name__ == '__main__':
    main()
