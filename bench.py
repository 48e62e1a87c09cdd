#!/usr/bin/env python
"""Headline benchmark: MNIST-shape Bernoulli RBM CD-1 training throughput.

Reference baseline (BASELINE.md): examples/rbm_mnist.py trains 784x1024
CD-1 on 55k samples for 120 epochs in ~38 min on a GTX 1060, i.e.
55000 * 120 / 2280 s ~= 2895 samples/sec (one Gibbs sweep + update each).

Two configurations are measured:

* headline: batch 256, metrics off -- the hot-loop capability number
  (one jitted/fused epoch per dispatch);
* ref_config: the reference's own training configuration -- batch 10 with
  PLL/MSRE logged every 1000 iterations (rbm_mnist.py batch_size=10) --
  so cross-round perf claims stay configuration-honest.

MFU = model FLOPs/s / chip peak.  CD-1 runs 5 (B, V)x(V, H) matmuls per
step (propup x2, propdown, positive+negative associations), i.e.
10*V*H FLOP per sample, evaluated in float32.  Both normalizations are
emitted: `mfu_bf16_peak` divides by the v5e bf16 figure (197 TFLOP/s,
the canonical per-chip peak -- conservative for an f32 program) and
`mfu_f32_peak` by half that (v5e has no separate f32 unit; f32 dots run
at half bf16 rate through the MXU).

The primary metric is also emitted under BASELINE.json's name,
`gibbs_sweeps_per_sec_per_chip`: at CD-1 each training sample performs
exactly one Gibbs sweep (one propup/sample + one propdown/sample +
propup, reference base_rbm.py:415-479), so sweeps/s == samples/s, and
the bench runs on a single chip.

Prints ONE JSON line with the headline metric plus the auxiliary fields.
"""

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

BASELINE_SAMPLES_PER_SEC = 55000. * 120. / (38. * 60.)
V5E_PEAK_FLOPS = 197e12
V, H = 784, 1024
FLOP_PER_SAMPLE = 10. * V * H


def _sync(jnp, state):
    # force a real device sync via scalar readback: on some remote
    # backends block_until_ready returns before execution completes
    return float(jnp.sum(jnp.abs(state['W'])))


def measure(batch_size, n_samples, n_epochs, metrics_config):
    import jax
    import jax.numpy as jnp
    from boltzmann_machines_tpu import BernoulliRBM

    rbm = BernoulliRBM(n_visible=V, n_hidden=H, n_gibbs_steps=1,
                       learning_rate=0.05, momentum=0.9,
                       batch_size=batch_size, l2=1e-5, random_seed=1337,
                       verbose=False, save_after_each_epoch=False,
                       metrics_config=metrics_config,
                       model_path='/tmp/bench_rbm_%d/' % batch_size)
    rbm._ensure_state()

    rng = np.random.RandomState(0)
    X = (rng.rand(n_samples, V) < 0.3).astype(np.float32)
    full, rem, n_full = rbm._stage_batches(X)
    assert rem is None

    use_pallas = rbm._pallas_eligible()
    prog = rbm._pallas_epoch_program(1, n_full) if use_pallas else None
    key = jax.random.PRNGKey(0)

    def run_epoch(state, i):
        if prog is not None:
            return prog(state, full, 0.05, 0.9, i + 1, 0)[0]
        xprog = rbm._program('train_epoch', rbm._train_epoch_program)
        return xprog(state, full, 0.05, 0.9, 1,
                     jax.random.fold_in(key, i), 0)[0]

    state = run_epoch(rbm._state, 0)   # warmup / compile
    _sync(jnp, state)
    t0 = time.perf_counter()
    for i in range(1, n_epochs + 1):
        state = run_epoch(state, i)
    _sync(jnp, state)
    dt = time.perf_counter() - t0
    return n_samples * n_epochs / dt


_DONE = threading.Event()


def _emit_failure(reason):
    """One structured, parseable JSON line instead of a stack trace, so an
    outage round stays interpretable (round-3 BENCH artifact was a raw
    traceback).  Exit code 0: the failure IS the recorded result."""
    print(json.dumps({
        'metric': 'rbm_mnist_cd1_train_samples_per_sec',
        'value': None,
        'unit': 'samples/s',
        'vs_baseline': None,
        'backend_unavailable': True,
        'error': reason[:2000],
        'last_green': 'round 5 session: 11.8M samples/s (542x ref-config)',
    }), flush=True)


def _watchdog(deadline_s):
    """The TPU plugin backend can hang inside its init/retry loop with no
    deadline of its own (observed round 3); a daemon timer converts that
    hang into a structured-failure exit."""
    if _DONE.wait(deadline_s):
        return
    _emit_failure('watchdog: bench did not complete within %.0f s '
                  '(backend hang or extreme tunnel latency)' % deadline_s)
    os._exit(0)


def _measure_all():
    headline = measure(batch_size=256, n_samples=55296, n_epochs=20,
                       metrics_config=dict(train_metrics_every_iter=10 ** 9))
    # the reference's own configuration (rbm_mnist.py: batch 10, metrics
    # logged every 1000 iterations)
    ref_cfg = measure(batch_size=10, n_samples=55000, n_epochs=2,
                      metrics_config=dict(msre=True, pll=True,
                                          train_metrics_every_iter=1000))
    return headline, ref_cfg


def main():
    deadline = float(os.environ.get('GRAFT_BENCH_DEADLINE', '1500'))
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()
    last_err = None
    for attempt in range(3):
        if attempt:
            time.sleep(30. * attempt)   # bounded backoff between retries
        try:
            headline, ref_cfg = _measure_all()
            break
        except Exception:
            last_err = traceback.format_exc()
            sys.stderr.write(last_err)
    else:
        _DONE.set()
        _emit_failure('backend error after 3 attempts: ' +
                      last_err.strip().splitlines()[-1])
        return
    mfu_bf16 = headline * FLOP_PER_SAMPLE / V5E_PEAK_FLOPS
    print(json.dumps({
        'metric': 'rbm_mnist_cd1_train_samples_per_sec',
        'value': round(headline, 1),
        'unit': 'samples/s',
        'vs_baseline': round(headline / BASELINE_SAMPLES_PER_SEC, 2),
        # BASELINE.json's primary metric name; CD-1 sweeps == samples
        # (one Gibbs sweep per sample per update), single chip
        'gibbs_sweeps_per_sec_per_chip': round(headline, 1),
        'mfu_bf16_peak': round(mfu_bf16, 4),
        'mfu_f32_peak': round(2. * mfu_bf16, 4),
        'note': 'CD-1: gibbs sweeps/s == samples/s; mfu counts f32 model '
                'FLOPs against bf16 peak (conservative) and f32 peak',
        'ref_config_batch10_samples_per_sec': round(ref_cfg, 1),
        'ref_config_batch10_vs_baseline':
            round(ref_cfg / BASELINE_SAMPLES_PER_SEC, 2),
    }), flush=True)
    _DONE.set()


if __name__ == '__main__':
    main()
