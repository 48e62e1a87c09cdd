#!/usr/bin/env python
"""Roofline decomposition of the headline fused CD-1 epoch kernel
(784x1024, batch 256) -- verdict round 4, weak #1: prove where the
~0.5-bf16-MFU plateau comes from or beat it.

Per training step the kernel executes:
  * MXU: 5 matmuls of (256x784)@(784x1024) shape-class
         = 5 * 2*B*V*H FLOP = 2.055 GFLOP (f32 operands, default
         precision -> single bf16 MXU pass on v5e, peak ~197 TFLOP/s
         -> 10.4 us of MXU floor)
  * VPU: sampling pipeline = 3 hardware-PRNG draws (B*H + B*V + B*H
         uniforms ~ 725k), 3 compares, 3 sigmoids (~725k transcendental
         evals), the update elementwise chain (~3*V*H = 2.4M FLOP), and
         the EMA/penalty rows
  * HBM: the X batch tile (B*V*4 = 803 KB/step -> ~1 us at 819 GB/s);
         W/dW stay VMEM-resident for the whole epoch

Ablations isolate the VPU share: sampling OFF removes the PRNG+compare
work but keeps sigmoids + update; k=2 doubles the Gibbs matmuls/samples
without doubling the update chain.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, B, NB = 784, 1024, 256, 216


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def bench(epoch, state, full, reps=3, inner=32):
    import jax
    best = None
    s = state
    out = epoch(s, full, 0.05, 0.9, 7, 0)
    sync(out[0]['W'])
    for _ in range(reps):
        t0 = time.time()
        s2 = state
        for i in range(inner):
            out = epoch(s2, full, 0.05, 0.9, 7, i)
            s2 = out[0]
        sync(out[0]['W'])
        dt = (time.time() - t0) / inner
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from boltzmann_machines_tpu import BernoulliRBM
    from boltzmann_machines_tpu.ops import make_cd_epoch_kernel

    rbm = BernoulliRBM(n_visible=V, n_hidden=H, batch_size=B,
                       random_seed=1337, verbose=False,
                       save_after_each_epoch=False,
                       metrics_config=dict(msre=False,
                                           train_metrics_every_iter=10**9),
                       model_path='/tmp/roofline_rbm/')
    rbm._ensure_state()
    X = (np.random.RandomState(0).rand(NB * B, V) < 0.3).astype(np.float32)
    full, rem, _ = rbm._stage_batches(X)
    assert rem is None

    variants = [
        ('full (k=1, sampling on)', dict(k=1, sv=True, sh=True)),
        ('sampling OFF (k=1)', dict(k=1, sv=False, sh=False)),
        ('k=2, sampling on', dict(k=2, sv=True, sh=True)),
        ('k=2, sampling OFF', dict(k=2, sv=False, sh=False)),
        # stage-major batch sub-tiling: attack the serialized VPU<->MXU
        # dependency chain (the ~6 us/step residual of the round-5 table)
        ('k=1 on, sub_tiles=2', dict(k=1, sv=True, sh=True, st=2)),
        ('k=1 on, sub_tiles=4', dict(k=1, sv=True, sh=True, st=4)),
        ('k=1 on, sub_tiles=8', dict(k=1, sv=True, sh=True, st=8)),
        ('k=2 on, sub_tiles=4', dict(k=2, sv=True, sh=True, st=4)),
    ]
    steps = NB
    print('shape %dx%d batch %d, %d steps/epoch' % (V, H, B, steps))
    for name, cfg in variants:
        ep = make_cd_epoch_kernel(
            V, H, B, k=cfg['k'], sample_v_states=cfg['sv'],
            sample_h_states=cfg['sh'], propup_mult=1., propdown_mult=1.,
            l2=1e-5, sparsity_target=0.1, sparsity_cost=1e-5,
            sparsity_damping=0.9, metrics_every=10 ** 9, compute_pll=False,
            sub_tiles=cfg.get('st', 1))
        state = jtu.tree_map(jnp.copy, rbm._state)
        t = bench(ep, state, full)
        us = t / steps * 1e6
        gf = (3 + 2 * cfg['k']) * 2. * B * V * H / 1e9
        print('%-26s %7.2f us/step  %8.0f ksamples/s  matmul %5.2f GFLOP '
              '-> %6.1f TFLOP/s' % (name, us, B / t * steps / 1e3, gf,
                                    gf / (us * 1e-6) / 1e3))


if __name__ == '__main__':
    main()
