#!/usr/bin/env python
"""Bisect the residual shardmap_full vs shardmap_nm gap (~17 us/step with
metrics compiled out): the only differences left are traced-vs-constant
scalars (lr / momentum / seed), buffer donation, and the iter counter
threading.  Each variant flips one feature."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, B, NB = 784, 1024, 256, 216


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from boltzmann_machines_tpu import BernoulliRBM
    from boltzmann_machines_tpu.parallel import make_mesh
    from boltzmann_machines_tpu.ops.pallas_ops import make_cd_stats_kernel

    rng = np.random.RandomState(0)
    X = (rng.rand(NB * B, V) < 0.3).astype(np.float32)

    rbm = BernoulliRBM(n_visible=V, n_hidden=H, n_gibbs_steps=1,
                       learning_rate=0.05, momentum=0.9, batch_size=B,
                       l2=1e-5, random_seed=1337, verbose=False,
                       save_after_each_epoch=False,
                       metrics_config=dict(train_metrics_every_iter=10 ** 9),
                       model_path='/tmp/prof_rbm2/')
    rbm._ensure_state()
    rbm.set_mesh(make_mesh((1, 1)))
    mesh, axis = rbm._mesh
    full, rem, n_full = rbm._stage_batches(X)
    key = jax.random.PRNGKey(0)

    stats_fn = make_cd_stats_kernel(
        V, H, B, 1, sample_v_states=rbm.sample_v_states,
        sample_h_states=rbm.sample_h_states,
        propup_mult=rbm._propup_multiplier,
        propdown_mult=rbm._propdown_multiplier, visible='bernoulli')

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, 'dtype')]
        return float(jnp.sum(jnp.abs(leaves[0].ravel()[:4])))

    def bench_threaded(call, state0, reps=3, inner=32):
        state = call(state0)
        sync(state)
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                state = call(state)
            sync(state)
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    def report(name, dt):
        print('%-22s %8.1f us/step' % (name, dt / NB * 1e6), flush=True)

    def fresh_state():
        r = BernoulliRBM(n_visible=V, n_hidden=H, n_gibbs_steps=1,
                         learning_rate=0.05, momentum=0.9, batch_size=B,
                         l2=1e-5, random_seed=1337, verbose=False,
                         save_after_each_epoch=False,
                         model_path='/tmp/prof_rbm2/')
        r._ensure_state()
        return r._state

    # A: constants, no donation (== shardmap_nm)
    def smA(state, Xb):
        def body(carry, xb):
            st, it = carry
            stats, aux = stats_fn(st, xb, jnp.uint32(12345), it,
                                  jax.lax.axis_index(axis))
            stats = jax.lax.psum(stats, axis)
            st = rbm._apply_cd_update(st, stats, B, 0.05, 0.9)
            return (st, it + 1), ()
        (state, _), _ = jax.lax.scan(body, (state, 0), Xb)
        return state
    jA = jax.jit(jax.shard_map(smA, mesh=mesh,
                               in_specs=(P(), P(None, 'data', None)),
                               out_specs=P(), check_vma=False))
    report('A const,nodonate', bench_threaded(
        lambda st: jA(st, full), fresh_state()))

    # B: traced lr/mom/seed, no donation
    def smB(state, Xb, lr, mom, seed32):
        def body(carry, xb):
            st, it = carry
            stats, aux = stats_fn(st, xb, seed32, it,
                                  jax.lax.axis_index(axis))
            stats = jax.lax.psum(stats, axis)
            st = rbm._apply_cd_update(st, stats, B, lr, mom)
            return (st, it + 1), ()
        (state, _), _ = jax.lax.scan(body, (state, 0), Xb)
        return state
    jB = jax.jit(jax.shard_map(
        smB, mesh=mesh,
        in_specs=(P(), P(None, 'data', None), P(), P(), P()),
        out_specs=P(), check_vma=False))
    report('B traced scalars', bench_threaded(
        lambda st: jB(st, full, 0.05, 0.9, jnp.uint32(12345)),
        fresh_state()))

    # C: traced + donation
    jC = jax.jit(jax.shard_map(
        smB, mesh=mesh,
        in_specs=(P(), P(None, 'data', None), P(), P(), P()),
        out_specs=P(), check_vma=False), donate_argnums=(0,))
    report('C traced+donate', bench_threaded(
        lambda st: jC(st, full, 0.05, 0.9, jnp.uint32(12345)),
        fresh_state()))

    # D: the production program, metrics compiled out
    sprog = rbm._shardmap_epoch_program(1)
    report('D production', bench_threaded(
        lambda st: sprog(st, full, 0.05, 0.9, 1, key, 0)[0], fresh_state()))


if __name__ == '__main__':
    main()
