#!/usr/bin/env python
"""Headline benchmark: MNIST-shape Bernoulli RBM CD-1 training throughput.

Reference baseline (BASELINE.md): examples/rbm_mnist.py trains 784x1024
CD-1 on 55k samples for 120 epochs in ~38 min on a GTX 1060, i.e.
55000 * 120 / 2280 s ~= 2895 samples/sec (one Gibbs sweep + update each).

Here one *epoch* is a single jitted lax.scan over the dataset on-device.
Prints one JSON line: samples/sec through the full CD-1 training step.
"""

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 55000. * 120. / (38. * 60.)


def main():
    import jax
    import jax.numpy as jnp
    from boltzmann_machines_tpu import BernoulliRBM

    batch_size = 256
    n_samples = 55296  # 216 full batches
    rbm = BernoulliRBM(n_visible=784, n_hidden=1024, n_gibbs_steps=1,
                       learning_rate=0.05, momentum=0.9, batch_size=batch_size,
                       l2=1e-5, random_seed=1337, verbose=False,
                       save_after_each_epoch=False,
                       metrics_config=dict(train_metrics_every_iter=10 ** 9),
                       model_path='/tmp/bench_rbm/')
    rbm._ensure_state()

    rng = np.random.RandomState(0)
    X = (rng.rand(n_samples, 784) < 0.3).astype(np.float32)
    full, rem, n_full = rbm._stage_batches(X)
    assert rem is None

    use_pallas = rbm._pallas_eligible()
    if use_pallas:
        prog = rbm._pallas_epoch_program(1, n_full)
        use_pallas = prog is not None

    key = jax.random.PRNGKey(0)

    def run_epoch(state, i):
        if use_pallas:
            state = prog(state, full, 0.05, 0.9, i + 1, 0)[0]
        else:
            xprog = rbm._program('train_epoch', rbm._train_epoch_program)
            state, _, _ = xprog(state, full, 0.05, 0.9, 1,
                                jax.random.fold_in(key, i), 0)
        return state

    def sync(state):
        # force a real device sync via scalar readback: on some remote
        # backends block_until_ready returns before execution completes
        return float(jnp.sum(jnp.abs(state['W'])))

    # warmup / compile
    state = run_epoch(rbm._state, 0)
    sync(state)

    n_epochs = 20
    t0 = time.perf_counter()
    for i in range(1, n_epochs + 1):
        state = run_epoch(state, i)
    sync(state)
    dt = time.perf_counter() - t0

    samples_per_sec = n_samples * n_epochs / dt
    print(json.dumps({
        'metric': 'rbm_mnist_cd1_train_samples_per_sec',
        'value': round(samples_per_sec, 1),
        'unit': 'samples/s',
        'vs_baseline': round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
