#!/usr/bin/env python
"""Batch-size sweep of the headline fused CD-1 epoch kernel (784x1024).

The round-5 roofline decomposition (tools/roofline_headline.py,
RESULTS.md) attributes ~6 us of the 19.55 us step to fixed per-step
overhead -- grid-step pipeline bubbles between the five dependent dots
-- which a larger batch amortizes directly: per SAMPLE the bubbles cost
~24 ns at batch 256 but ~6 ns at batch 1024.  This sweep measures
sustained samples/s (and bf16-peak MFU) at a fixed ~55k-sample epoch
across batch sizes, to pick the headline configuration on measurement
rather than habit.  Usage: python tools/sweep_headline_batch.py
(TPU; ~1 min warm)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H = 784, 1024
N_SAMPLES = 55296  # lcm-friendly: divisible by 256/512/1024/2048
FLOP_PER_SAMPLE = 10. * V * H
V5E_PEAK_FLOPS = 197e12


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def measure(batch_size, reps=3, inner=8):
    from boltzmann_machines_tpu import BernoulliRBM
    rbm = BernoulliRBM(n_visible=V, n_hidden=H, n_gibbs_steps=1,
                       learning_rate=0.05, momentum=0.9,
                       batch_size=batch_size, l2=1e-5, random_seed=1337,
                       verbose=False, save_after_each_epoch=False,
                       metrics_config=dict(train_metrics_every_iter=10 ** 9),
                       model_path='/tmp/sweep_b%d/' % batch_size)
    rbm._ensure_state()
    rng = np.random.RandomState(0)
    X = (rng.rand(N_SAMPLES, V) < 0.3).astype(np.float32)
    full, rem, n_full = rbm._stage_batches(X)
    assert rem is None
    if not rbm._pallas_eligible():
        return None
    prog = rbm._pallas_epoch_program(1, n_full)
    out = prog(rbm._state, full, 0.05, 0.9, 7, 0)   # compile + warm
    sync(out[0]['W'])
    best = None
    for _ in range(reps):
        t0 = time.time()
        s = rbm._state
        for i in range(inner):
            s = prog(s, full, 0.05, 0.9, 7, i)[0]
        sync(s['W'])
        dt = (time.time() - t0) / inner
        best = dt if best is None else min(best, dt)
    sps = N_SAMPLES / best
    return dict(batch=batch_size, steps=n_full,
                us_per_step=round(best / n_full * 1e6, 2),
                samples_per_sec=round(sps, 0),
                mfu_bf16=round(sps * FLOP_PER_SAMPLE / V5E_PEAK_FLOPS, 4))


def main():
    for b in (256, 512, 1024, 2048):
        r = measure(b)
        print(json.dumps(r if r is not None
                         else {'batch': b, 'eligible': False}), flush=True)


if __name__ == '__main__':
    main()
