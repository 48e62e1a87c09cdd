#!/usr/bin/env python
"""Profile the G-B-M (Gaussian-Bernoulli-Multinomial) DBM training step.

The dbm_cifar_naive joint stage (3072-5000-1000, batch 100, fast-MF
n_mf=2) measures ~1.4 ms/step on one v5e chip while its mandatory HBM
traffic (W0/dW0 reads+writes for the hoisted bottom-up drive, the PCD
Gibbs step, the gradient/momentum/max-norm updates) bounds it at
~0.65-0.85 ms -- this script quantifies where the step time goes so the
next optimization (fused update kernel vs XLA tweaks) is chosen from a
trace, not a guess.

Usage (single chip; serialize with other TPU jobs):
    python tools/profile_dbm_gbm.py [--trace-dir /tmp/gbm_trace]

Prints phase timings measured by ablation:
  * full step (MF + PCD + grads + update)
  * MF-only (positive phase)
  * PCD-only (negative phase)
  * update-only (gradients + momentum + max-norm, phases replayed)
and optionally writes a jax.profiler trace for tensorboard.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0] if isinstance(x, tuple) else x))


def bench(fn, *args, iters=200, warmup=20):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace-dir', default=None)
    ap.add_argument('--batch', type=int, default=100)
    ap.add_argument('--sizes', type=int, nargs=3, default=(3072, 5000, 1000))
    ap.add_argument('--mf-cap', type=int, default=50,
                    help='max_mf_updates; the trained dbm_cifar_naive '
                         'joint stage runs in the fast-MF regime (n_mf=2),'
                         ' so --mf-cap 2 measures the stage-relevant step')
    args = ap.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # a registered plugin backend (axon) can still win unless the
        # config is ALSO pinned (same incantation as tests/conftest.py)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from boltzmann_machines_tpu import DBM, GaussianRBM, MultinomialRBM

    V, H1, H2 = args.sizes
    B = args.batch
    rng = np.random.RandomState(0)

    r1 = GaussianRBM(n_visible=V, n_hidden=H1, sigma=1., dbm_first=True,
                     max_epoch=0, verbose=False, save_after_each_epoch=False,
                     model_path='/tmp/prof_g/')
    r2 = MultinomialRBM(n_visible=H1, n_hidden=H2, n_samples=H2,
                        dbm_last=True, max_epoch=0, verbose=False,
                        save_after_each_epoch=False, model_path='/tmp/prof_m/')
    r1._ensure_state()
    r2._ensure_state()
    dbm = DBM(rbms=[r1, r2], n_particles=B, n_gibbs_steps=1,
              max_mf_updates=args.mf_cap, mf_tol=1e-11, learning_rate=2e-4,
              momentum=0.5, max_epoch=1, batch_size=B, max_norm=4.,
              random_seed=3, verbose=False, save_after_each_epoch=False,
              model_path='/tmp/prof_dbm/')
    dbm._ensure_state()
    state = dbm._state
    X = jnp.asarray(rng.randn(B, V).astype(np.float32))
    key = jax.random.PRNGKey(0)

    full_step = jax.jit(lambda s, x, k: dbm._train_step(s, x, 2e-4, 0.5, 1,
                                                        k)[0])
    mf_only = jax.jit(lambda s, x: dbm._mf(s, x)[0][0])
    pcd_only = jax.jit(lambda s, k: dbm._particles_gibbs_step(
        s, s['v'], s['H'], k)[0])

    t_full = bench(full_step, state, X, key)
    t_mf = bench(mf_only, state, X)
    t_pcd = bench(pcd_only, state, key)
    print('full step : %.3f ms' % (t_full * 1e3))
    print('MF only   : %.3f ms  (n_mf converging on random weights)' %
          (t_mf * 1e3))
    print('PCD only  : %.3f ms' % (t_pcd * 1e3))
    print('residual (grads+updates+metrics): %.3f ms' %
          ((t_full - t_mf - t_pcd) * 1e3))

    # HBM roofline context
    w_bytes = 4 * (V * H1 + H1 * H2)
    print('weights+accumulators: %.1f MB; ~6 W-sized passes/step = %.0f MB'
          % (2 * w_bytes / 1e6, 6 * w_bytes / 1e6))
    print('v5e HBM ~819 GB/s -> floor ~%.2f ms/step' %
          (6 * w_bytes / 819e9 * 1e3))

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(20):
                out = full_step(state, X, key)
            jax.block_until_ready(out)
        print('trace written to', args.trace_dir)


if __name__ == '__main__':
    main()
