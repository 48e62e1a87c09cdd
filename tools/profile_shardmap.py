#!/usr/bin/env python
"""Bisect the shard_map-epoch throughput gap vs the whole-epoch kernel.

Round-2 measurement: ~160k samples/s for the shard_map epoch on a
1-device mesh vs ~11.8M for the fused whole-epoch kernel -- a ~70x cliff
that RESULTS.md blamed on per-step host launches, which cannot be right
(the epoch is ONE jitted shard_map(lax.scan(...)) program).  This script
times every structural variant between the two paths so the real cost is
pinned to a specific program feature:

  whole_epoch    fused Pallas epoch kernel (grid over batches, W in VMEM)
  stats_scan     jit(scan(stats kernel + XLA update)), NO shard_map
  stats_only     jit(scan(stats kernel)), update dropped (state threaded)
  shardmap_nm    jit(shard_map(scan(stats+update))), metrics OFF
  shardmap_full  the production _shardmap_epoch_program (metrics branch)
  xla_scan       jit(scan(lax stats + XLA update)) -- no Pallas at all

Run on the real chip:  python tools/profile_shardmap.py [--trace DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, B, NB = 784, 1024, 256, 216  # rbm_mnist headline shape


def sync(x):
    """Force a REAL device sync: on the axon backend block_until_ready can
    return before execution completes, so read back a scalar instead."""
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype,
                                                        jnp.floating)]
    # ONE scalar readback: the runtime executes dispatches in order, so a
    # sum over the last float leaf forces completion of everything prior
    # (each readback costs a full link round trip -- keep it to one)
    return float(jnp.sum(leaves[-1])) if leaves else 0.


def bench(fn, *args, reps=3, inner=32):
    """Per-epoch time with the sync round trip amortized over `inner`
    back-to-back dispatches (the tunneled link's scalar readback costs
    ~0.1 s, which would swamp a 20 ms epoch)."""
    out = fn(*args)  # compile
    sync(out)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace', default=None,
                    help='profile the shardmap_full variant into DIR')
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from boltzmann_machines_tpu import BernoulliRBM
    from boltzmann_machines_tpu.parallel import make_mesh
    from boltzmann_machines_tpu.ops.pallas_ops import make_cd_stats_kernel

    rng = np.random.RandomState(0)
    X = (rng.rand(NB * B, V) < 0.3).astype(np.float32)

    def fresh(mesh=False):
        rbm = BernoulliRBM(n_visible=V, n_hidden=H, n_gibbs_steps=1,
                           learning_rate=0.05, momentum=0.9, batch_size=B,
                           l2=1e-5, random_seed=1337, verbose=False,
                           save_after_each_epoch=False,
                           metrics_config=dict(
                               train_metrics_every_iter=10 ** 9),
                           model_path='/tmp/prof_rbm/')
        rbm._ensure_state()
        if mesh:
            rbm.set_mesh(make_mesh((1, 1)))
        return rbm

    rbm = fresh()
    full, rem, n_full = rbm._stage_batches(X)
    assert rem is None and n_full == NB
    key = jax.random.PRNGKey(0)
    seed32 = jnp.uint32(12345)
    n_samples = NB * B

    results = {}

    def report(name, dt):
        results[name] = dt
        print('%-16s %10.4f s  %12.0f samples/s  %8.1f us/step'
              % (name, dt, n_samples / dt, dt / NB * 1e6), flush=True)

    # NB: the epoch programs donate their state argument, so every variant
    # THREADS the returned state back in (never reuses a donated buffer)
    def bench_threaded(prog_call, state0, reps, inner=32):
        state = prog_call(state0)  # compile
        sync(state)
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                state = prog_call(state)
            sync(state)
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    # sync-overhead baseline so readers can judge the timings
    t0 = time.perf_counter()
    sync(rbm._state)
    print('sync round-trip: %.4f s' % (time.perf_counter() - t0),
          flush=True)

    # 1) fused whole-epoch kernel ------------------------------------- #
    prog = rbm._pallas_epoch_program(1, NB)
    report('whole_epoch', bench_threaded(
        lambda st: prog(st, full, 0.05, 0.9, 1, 0)[0], rbm._state,
        args.reps))

    # 2) stats kernel + XLA update in a plain jitted scan -------------- #
    stats_fn = make_cd_stats_kernel(
        V, H, B, 1, sample_v_states=rbm.sample_v_states,
        sample_h_states=rbm.sample_h_states,
        propup_mult=rbm._propup_multiplier,
        propdown_mult=rbm._propdown_multiplier, visible='bernoulli')

    @jax.jit
    def stats_scan(state, Xb):
        def body(carry, xb):
            st, it = carry
            stats, aux = stats_fn(st, xb, seed32, it, 0)
            st = rbm._apply_cd_update(st, stats, B, 0.05, 0.9)
            return (st, it + 1), ()
        (state, _), _ = jax.lax.scan(body, (state, 0), Xb)
        return state

    report('stats_scan', bench(stats_scan, rbm._state, full,
                               reps=args.reps))

    # 3) stats kernel only (no update) --------------------------------- #
    @jax.jit
    def stats_only(state, Xb):
        def body(carry, xb):
            st, it = carry
            stats, aux = stats_fn(st, xb, seed32, it, 0)
            # consume the stats so they are not DCE'd; state unchanged
            return (st, it + 1), stats['assoc'][0, 0]
        (state, _), s = jax.lax.scan(body, (state, 0), Xb)
        return state, s

    report('stats_only', bench(stats_only, rbm._state, full,
                               reps=args.reps))

    # 4) shard_map 1-device mesh, metrics effectively off, minimal body  #
    mrbm = fresh(mesh=True)
    mesh, axis = mrbm._mesh

    def sm_body(state, Xb):
        def body(carry, xb):
            st, it = carry
            stats, aux = stats_fn(st, xb, seed32, it,
                                  jax.lax.axis_index(axis))
            stats = jax.lax.psum(stats, axis)
            st = mrbm._apply_cd_update(st, stats, B, 0.05, 0.9)
            return (st, it + 1), ()
        (state, _), _ = jax.lax.scan(body, (state, 0), Xb)
        return state

    sm = jax.jit(jax.shard_map(
        sm_body, mesh=mesh, in_specs=(P(), P(None, 'data', None)),
        out_specs=P(), check_vma=False))
    report('shardmap_nm', bench(sm, mrbm._state, full, reps=args.reps))

    # 5) the production shard_map epoch (donates state -- thread it) --- #
    sprog = mrbm._shardmap_epoch_program(1)
    report('shardmap_full', bench_threaded(
        lambda st: sprog(st, full, 0.05, 0.9, 1, key, 0)[0],
        mrbm._state, args.reps))
    mrbm._state = None  # donated away

    if args.trace:
        frbm = fresh(mesh=True)
        tprog = frbm._shardmap_epoch_program(1)
        st = tprog(frbm._state, full, 0.05, 0.9, 1, key, 0)[0]  # compile
        sync(st)
        with jax.profiler.trace(args.trace):
            sync(tprog(st, full, 0.05, 0.9, 1, key, 0)[0])

    # 6) pure-XLA stats + update scan ---------------------------------- #
    xrbm = fresh()

    @jax.jit
    def xla_scan(state, Xb):
        def body(carry, xb):
            st, it = carry
            stats, aux = xrbm._cd_stats(st, xb, 1,
                                        jax.random.fold_in(key, it))
            st = xrbm._apply_cd_update(st, stats, B, 0.05, 0.9)
            return (st, it + 1), ()
        (state, _), _ = jax.lax.scan(body, (state, 0), Xb)
        return state

    report('xla_scan', bench(xla_scan, xrbm._state, full, reps=args.reps))


if __name__ == '__main__':
    main()
