#!/usr/bin/env python
"""Measure the M-RBM flagship stage's epoch rate with PLL logging ON.

The dbm_cifar_naive M-RBM stage (5000x1000, n_samples=1000, batch 100,
reference dbm_cifar_naive.py:117-156) logs PLL, which until round 4
forced the ~14x slower XLA path because the fused CD epoch kernel
declined PLL for non-Bernoulli hiddens.  This tool measures the exact
stage configuration on both paths so the claimed penalty removal is a
recorded number, not a commit message:

  * fused Pallas CD epoch kernel with the in-kernel MC multinomial PLL
    free energy (ops/pallas_ops.py), metrics_every=400 as in the stage;
  * the XLA lax.scan epoch program, same config.

Timing discipline matches bench.py: one warmup epoch (compile), then N
timed epochs bracketed by scalar-readback syncs.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def measure(kernel, n_epochs=8, batch=100, n_rows=12800):
    import jax
    import jax.numpy as jnp
    from boltzmann_machines_tpu import MultinomialRBM

    V, H = 5000, 1000
    rbm = MultinomialRBM(
        n_visible=V, n_hidden=H, n_samples=1000,
        W_init=0.01, hb_init=0., vb_init=0.,
        n_gibbs_steps=1, learning_rate=1e-3, momentum=0.9,
        batch_size=batch, l2=2e-4, sample_h_states=True,
        sample_v_states=False, dbm_last=True, kernel=kernel,
        metrics_config=dict(msre=True, pll=True,
                            train_metrics_every_iter=400),
        verbose=False, save_after_each_epoch=False, random_seed=1337,
        model_path='/tmp/mrbm_bench_%s/' % kernel)
    rbm._ensure_state()

    rng = np.random.RandomState(0)
    X = rng.rand(n_rows, V).astype(np.float32)
    full, rem, n_full = rbm._stage_batches(X)
    assert rem is None

    use_pallas = rbm._pallas_eligible()
    print('kernel=%s -> pallas eligible: %s' % (kernel, use_pallas))
    prog = rbm._pallas_epoch_program(1, n_full) if use_pallas else None
    key = jax.random.PRNGKey(0)

    def run_epoch(state, i):
        if prog is not None:
            return prog(state, full, 1e-3, 0.9, i + 1, 0)[0]
        xprog = rbm._program('train_epoch', rbm._train_epoch_program)
        return xprog(state, full, 1e-3, 0.9, 1,
                     jax.random.fold_in(key, i), 0)[0]

    state = run_epoch(rbm._state, 0)
    float(jnp.sum(jnp.abs(state['W'])))  # sync
    t0 = time.perf_counter()
    for i in range(1, n_epochs + 1):
        state = run_epoch(state, i)
    float(jnp.sum(jnp.abs(state['W'])))  # sync
    dt = time.perf_counter() - t0
    rate = n_rows * n_epochs / dt
    us = dt / (n_epochs * n_full) * 1e6
    print('kernel=%-6s  %8.0f samples/s   %7.1f us/step   (%d epochs, '
          '%d steps/epoch, batch %d, PLL every 400 iters)'
          % (kernel, rate, us, n_epochs, n_full, batch))
    return rate


def main():
    r_pallas = measure('pallas')
    r_xla = measure('xla')
    print('fused/XLA ratio with PLL on: %.1fx' % (r_pallas / r_xla))


if __name__ == '__main__':
    main()
