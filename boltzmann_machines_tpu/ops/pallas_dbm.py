"""Fused Pallas kernels for 2-layer Bernoulli DBM inference workloads.

``make_ais_kernel`` runs the ENTIRE annealed-importance-sampling beta sweep
(reference dbm.py:696-736) as one ``pallas_call``: both weight matrices live
in VMEM for all ``n_betas`` temperatures, every tempered-Gibbs transition
samples from the on-chip PRNG, and all ``n_runs`` chains advance together on
the MXU.  The reference pays one `tf.while_loop` iteration per beta with
host-scheduled ops; at 20k betas x 5 Gibbs steps the XLA path is dominated
by threefry sampling -- this kernel removes both costs.

Shapes are kept >= 2-D throughout (Mosaic relayout constraint); per-run
reductions use keepdims so the (R, 1) row-sum layout is preserved.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .pallas_ops import _uniform_bits  # shared PRNG-to-uniform conversion


def _ais_kernel(seed_ref, x0_ref, W0_ref, W1_ref, vb_ref, hb0_ref, hb1_ref,
                logw_ref, *, n_betas, k, sample_v, sample_h0, sample_h1):
    f32 = jnp.float32
    pltpu.prng_seed(seed_ref[0])
    W0 = W0_ref[:]        # (V, H1)
    W1 = W1_ref[:]        # (H1, H2)
    vb = vb_ref[:]        # (1, V)
    hb0 = hb0_ref[:]      # (1, H1)
    hb1 = hb1_ref[:]      # (1, H2)
    delta = f32(1. / n_betas)

    def propdown0(x):     # (R, H1) @ (V, H1)^T -> (R, V)
        return jax.lax.dot_general(x, W0, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def propup1(x):       # (R, H1) @ (H1, H2) -> (R, H2)
        return jnp.dot(x, W1, preferred_element_type=f32)

    def log_p(x, beta):
        """log p~_beta(x) with v, h2 summed out (dbm.py:650-660);
        returns (R, 1)."""
        t1 = beta * jnp.sum(x * hb0, axis=1, keepdims=True)
        t2 = propdown0(x) + vb
        t1 += jnp.sum(jax.nn.softplus(beta * t2), axis=1, keepdims=True)
        t3 = propup1(x) + hb1
        t1 += jnp.sum(jax.nn.softplus(beta * t3), axis=1, keepdims=True)
        return t1

    def transition(x, beta):
        """k-step tempered Gibbs transition on h1 (dbm.py:662-694)."""
        def body(_, x):
            v = jax.nn.sigmoid(beta * propdown0(x) + beta * vb)
            if sample_v:
                v = (_uniform_bits(v.shape) < v).astype(f32)
            h2 = jax.nn.sigmoid(beta * propup1(x) + beta * hb1)
            if sample_h1:
                h2 = (_uniform_bits(h2.shape) < h2).astype(f32)
            t = jnp.dot(v, W0, preferred_element_type=f32) + \
                jax.lax.dot_general(h2, W1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            x_new = jax.nn.sigmoid(beta * t + beta * hb0)
            if sample_h0:
                x_new = (_uniform_bits(x_new.shape) < x_new).astype(f32)
            return x_new
        return jax.lax.fori_loop(0, k, body, x)

    x1 = transition(x0_ref[:], delta)
    log_w = -log_p(x1, f32(0.))

    def sweep(i, carry):
        log_w, x = carry
        beta = i.astype(f32) * delta
        log_w = log_w + log_p(x, beta)
        x_new = transition(x, beta + delta)
        log_w = log_w - log_p(x_new, beta)
        return (log_w, x_new)

    log_w, x_M = jax.lax.fori_loop(1, n_betas, sweep, (log_w, x1))
    log_w = log_w + log_p(x_M, f32(1.))
    logw_ref[:] = jnp.broadcast_to(log_w, logw_ref.shape)


def _dbm_epoch_kernel(scalars_ref, sched_ref, x_ref, *refs,
                      layer_sizes, batch_size, n_particles, k,
                      max_mf_updates, mf_tol, sample_v, sample_h,
                      l2, max_norm, sparsity_target, sparsity_cost,
                      sparsity_damping):
    """One PCD/mean-field DBM training epoch in a single kernel.

    Layer math mirrors dbm.py:385-622 for all-Bernoulli units; see
    boltzmann_machines_tpu/dbm.py for the semantics.  State layout in
    `refs`: inputs then outputs, each ordered
      vb, hb[0..L-1], W[0..L-1], dvb, dhb[], dW[], q_means[], mu_means[],
      v, H[0..L-1]
    followed by msre and n_mf per-batch outputs and the DMA semaphores.
    """
    f32 = jnp.float32
    L = len(layer_sizes) - 1
    # vb + hb*L + W*L + dvb + dhb*L + dW*L + q*L + m*L + v + H*L
    n_state = 3 + 7 * L
    ins = refs[:n_state]
    outs = refs[n_state:2 * n_state]
    msre_o = refs[2 * n_state]
    nmf_o = refs[2 * n_state + 1]
    dma_sems = refs[2 * n_state + 2]

    i = pl.program_id(0)
    pltpu.prng_seed(scalars_ref[0], i)
    lr = sched_ref[0]
    mom = sched_ref[1]

    @pl.when(i == 0)
    def _():
        copies = [pltpu.make_async_copy(src, dst, dma_sems.at[j])
                  for j, (src, dst) in enumerate(zip(ins, outs))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    # unpack the persistent VMEM state (outputs)
    idx = 0
    def take(n):
        nonlocal idx
        r = outs[idx:idx + n]
        idx += n
        return r
    (vb_r,) = take(1)
    hb_r = take(L)
    W_r = take(L)
    (dvb_r,) = take(1)
    dhb_r = take(L)
    dW_r = take(L)
    q_r = take(L)
    m_r = take(L)
    (v_r,) = take(1)
    H_r = take(L)

    X = x_ref[0]                      # (B, V)
    W = [w[:] for w in W_r]
    vb = vb_r[:]                      # (1, V)
    hb = [b[:] for b in hb_r]         # (1, Hi)

    def up(x, l):                     # x @ W_l
        return jnp.dot(x, W[l], preferred_element_type=f32)

    def down(x, l):                   # x @ W_l^T
        return jax.lax.dot_general(x, W[l], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def bern(p):
        return (_uniform_bits(p.shape) < p).astype(f32)

    # ---------------- positive phase: mean field ---------------------- #
    # bottom-up doubled-input init (dbm.py:436-444)
    mu = []
    T = 2. * up(X, 0)
    T = jax.nn.sigmoid(T + hb[0])
    mu.append(T)
    for l in range(1, L):
        T = up(T, l)
        if l < L - 1:
            T = 2. * T
        T = jax.nn.sigmoid(T + hb[l])
        mu.append(T)

    def mf_sweep(mu):
        new = list(mu)
        T = up(X, 0)
        if L >= 2:
            T = T + down(mu[1], 1)
        new[0] = jax.nn.sigmoid(T + hb[0])
        for l in range(1, L - 1):
            T = up(new[l - 1], l) + down(mu[l + 1], l + 1)
            new[l] = jax.nn.sigmoid(T + hb[l])
        if L >= 2:
            new[L - 1] = jax.nn.sigmoid(up(new[L - 2], L - 1) + hb[L - 1])
        return tuple(new)

    def mf_cond(carry):
        step, mu, delta = carry
        return jnp.logical_and(step < max_mf_updates, delta > f32(mf_tol))

    def mf_body(carry):
        step, mu, _ = carry
        new = mf_sweep(mu)
        delta = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(a - b)) for a, b in zip(new, mu)]))
        return step + 1, new, delta

    n_mf, mu, _ = jax.lax.while_loop(
        mf_cond, mf_body, (jnp.zeros((), jnp.int32), tuple(mu),
                           jnp.asarray(jnp.inf, f32)))

    # ---------------- negative phase: PCD Gibbs ----------------------- #
    v = v_r[:]
    H = [h[:] for h in H_r]

    def gibbs(_, carry):
        v, H = carry
        Hn = list(H)
        T = up(v, 0)
        if L >= 2:
            T = T + down(H[1], 1)
        Hn[0] = jax.nn.sigmoid(T + hb[0])
        if sample_h[0]:
            Hn[0] = bern(Hn[0])
        for l in range(1, L - 1):
            T = up(Hn[l - 1], l) + down(H[l + 1], l + 1)
            Hn[l] = jax.nn.sigmoid(T + hb[l])
            if sample_h[l]:
                Hn[l] = bern(Hn[l])
        if L >= 2:
            Hn[L - 1] = jax.nn.sigmoid(up(Hn[L - 2], L - 1) + hb[L - 1])
            if sample_h[L - 1]:
                Hn[L - 1] = bern(Hn[L - 1])
        vn = jax.nn.sigmoid(down(Hn[0], 0) + vb)
        if sample_v:
            vn = bern(vn)
        return (vn, tuple(Hn))

    v, H = jax.lax.fori_loop(0, k, gibbs, (v, tuple(H)))
    v_r[:] = v
    for l in range(L):
        H_r[l][:] = H[l]

    # ---------------- gradients + updates ----------------------------- #
    N = f32(batch_size)
    M = f32(n_particles)

    def corr(a, b):                   # a^T @ b
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    dvb = jnp.mean(X, 0, keepdims=True) - jnp.mean(v, 0, keepdims=True)
    dW = [corr(X, mu[0]) / N - corr(v, H[0]) / M - f32(l2) * W[0]]
    for l in range(1, L):
        dW.append(corr(mu[l - 1], mu[l]) / N - corr(H[l - 1], H[l]) / M
                  - f32(l2) * W[l])
    dhb = [jnp.mean(mu[l], 0, keepdims=True)
           - jnp.mean(H[l], 0, keepdims=True) for l in range(L)]

    damp = f32(sparsity_damping)
    for l in range(L):
        cost = f32(sparsity_cost[l])
        target = f32(sparsity_target[l])
        q_new = damp * q_r[l][:] + (1. - damp) * \
            jnp.sum(H[l], 0, keepdims=True)
        m_new = damp * m_r[l][:] + (1. - damp) * \
            jnp.sum(mu[l], 0, keepdims=True)
        q_r[l][:] = q_new
        m_r[l][:] = m_new
        pen = cost * (q_new - target) + cost * (m_new - target)
        dW[l] = dW[l] - pen
        dhb[l] = dhb[l] - pen

    dvb_acc = lr * (mom * dvb_r[:] + dvb)
    dvb_r[:] = dvb_acc
    vb_r[:] = vb + dvb_acc
    finite_max_norm = max_norm is not None and math.isfinite(max_norm)
    for l in range(L):
        dW_acc = lr * (mom * dW_r[l][:] + dW[l])
        dW_r[l][:] = dW_acc
        W_new = W[l] + dW_acc
        if finite_max_norm:
            norm = jnp.sqrt(jnp.sum(W_new * W_new, axis=0, keepdims=True))
            W_new = W_new * jnp.minimum(norm, f32(max_norm)) / \
                jnp.maximum(norm, f32(1e-8))
        W_r[l][:] = W_new
        dhb_acc = lr * (mom * dhb_r[l][:] + dhb[l])
        dhb_r[l][:] = dhb_acc
        hb_r[l][:] = hb[l] + dhb_acc

    # ---------------- metrics ----------------------------------------- #
    # reconstruction with the POST-update weights (matches the XLA path's
    # dbm.py _train_step, which reads new_state)
    W_new0 = W_r[0][:]
    v_means = jax.nn.sigmoid(
        jax.lax.dot_general(mu[0], W_new0, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32) + vb_r[:])
    msre = jnp.mean(jnp.square(X - v_means))
    msre_o[pl.ds(i, 1), :] = jnp.full((1, 128), msre, dtype=f32)
    nmf_o[pl.ds(i, 1), :] = jnp.full((1, 128), n_mf.astype(f32), dtype=f32)


def make_dbm_epoch_kernel(layer_sizes, batch_size, n_particles, k,
                          max_mf_updates, mf_tol, sample_v, sample_h,
                          l2, max_norm, sparsity_target, sparsity_cost,
                          sparsity_damping, interpret=False):
    """Fused all-Bernoulli DBM training epoch: grid over minibatches, all
    weights / accumulators / EMA means / persistent particles VMEM-resident
    for the entire epoch.

    Returns ``epoch(state, X_batches, lr, momentum, seed) ->
    (state, msre_per_batch, n_mf_per_batch)``.
    """
    V = layer_sizes[0]
    L = len(layer_sizes) - 1
    hs = layer_sizes[1:]
    kern = functools.partial(
        _dbm_epoch_kernel, layer_sizes=tuple(layer_sizes),
        batch_size=batch_size, n_particles=n_particles, k=k,
        max_mf_updates=max_mf_updates, mf_tol=float(mf_tol),
        sample_v=sample_v, sample_h=tuple(sample_h), l2=float(l2),
        max_norm=(float(max_norm) if max_norm is not None else None),
        sparsity_target=tuple(float(t) for t in sparsity_target),
        sparsity_cost=tuple(float(c) for c in sparsity_cost),
        sparsity_damping=float(sparsity_damping))

    def state_shapes():
        f32 = jnp.float32
        shapes = [(1, V)]
        shapes += [(1, h) for h in hs]          # hb
        shapes += [(layer_sizes[l], hs[l]) for l in range(L)]  # W
        shapes += [(1, V)]                      # dvb
        shapes += [(1, h) for h in hs]          # dhb
        shapes += [(layer_sizes[l], hs[l]) for l in range(L)]  # dW
        shapes += [(1, h) for h in hs]          # q_means
        shapes += [(1, h) for h in hs]          # mu_means
        shapes += [(n_particles, V)]            # v
        shapes += [(n_particles, h) for h in hs]  # H
        return [jax.ShapeDtypeStruct(s, f32) for s in shapes]

    def flatten_state(state):
        xs = [state['vb'].reshape(1, V)]
        xs += [state['hb'][l].reshape(1, hs[l]) for l in range(L)]
        xs += list(state['W'])
        xs += [state['dvb'].reshape(1, V)]
        xs += [state['dhb'][l].reshape(1, hs[l]) for l in range(L)]
        xs += list(state['dW'])
        xs += [state['q_means'][l].reshape(1, hs[l]) for l in range(L)]
        xs += [state['mu_means'][l].reshape(1, hs[l]) for l in range(L)]
        xs += [state['v']]
        xs += list(state['H'])
        return xs

    def unflatten_state(xs):
        it = iter(xs)
        vb = next(it).reshape(V)
        hb = tuple(next(it).reshape(hs[l]) for l in range(L))
        W = tuple(next(it) for _ in range(L))
        dvb = next(it).reshape(V)
        dhb = tuple(next(it).reshape(hs[l]) for l in range(L))
        dW = tuple(next(it) for _ in range(L))
        q = tuple(next(it).reshape(hs[l]) for l in range(L))
        m = tuple(next(it).reshape(hs[l]) for l in range(L))
        v = next(it)
        H = tuple(next(it) for _ in range(L))
        return {'vb': vb, 'hb': hb, 'W': W, 'dvb': dvb, 'dhb': dhb,
                'dW': dW, 'q_means': q, 'mu_means': m, 'v': v, 'H': H}

    n_state = len(state_shapes())

    @jax.jit
    def epoch(state, X_batches, lr, momentum, seed):
        f32 = jnp.float32
        NB = X_batches.shape[0]
        scalars = jnp.asarray([seed], jnp.uint32)
        sched = jnp.stack([jnp.asarray(lr, f32), jnp.asarray(momentum, f32)])

        shapes = state_shapes()

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda i, s=shape: tuple(0 for _ in s),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, batch_size, V), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(memory_space=pl.ANY)] * n_state,
            out_specs=tuple([const_spec(s.shape) for s in shapes] +
                            [const_spec((NB, 128)), const_spec((NB, 128))]),
            out_shape=tuple(shapes +
                            [jax.ShapeDtypeStruct((NB, 128), f32)] * 2),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_state,))],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(scalars, sched, X_batches, *flatten_state(state))

        new_state = unflatten_state(outs[:n_state])
        msre = outs[n_state][:, 0]
        n_mf = outs[n_state + 1][:, 0]
        return new_state, msre, n_mf

    return epoch


def _dbm_sample_kernel(scalars_ref, vb_ref, *refs,
                       layer_sizes, sample_v, sample_h):
    """`n_steps` sampled Gibbs sweeps on the persistent chains followed by
    one mean sweep (reference dbm.py:641-648 sample_v semantics)."""
    f32 = jnp.float32
    L = len(layer_sizes) - 1
    hb_r = refs[:L]
    W_r = refs[L:2 * L]
    v_in = refs[2 * L]
    H_in = refs[2 * L + 1:2 * L + 1 + L]
    v_out = refs[2 * L + 1 + L]
    H_out = refs[2 * L + 2 + L:2 * L + 2 + 2 * L]

    pltpu.prng_seed(scalars_ref[0])
    n_steps = scalars_ref[1].astype(jnp.int32)
    vb = vb_ref[:]
    hb = [b[:] for b in hb_r]
    W = [w[:] for w in W_r]

    def up(x, l):
        return jnp.dot(x, W[l], preferred_element_type=f32)

    def down(x, l):
        return jax.lax.dot_general(x, W[l], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def bern(p):
        return (_uniform_bits(p.shape) < p).astype(f32)

    def sweep(carry, sample):
        v, H = carry
        Hn = list(H)
        T = up(v, 0)
        if L >= 2:
            T = T + down(H[1], 1)
        Hn[0] = jax.nn.sigmoid(T + hb[0])
        if sample and sample_h[0]:
            Hn[0] = bern(Hn[0])
        for l in range(1, L - 1):
            T = up(Hn[l - 1], l) + down(H[l + 1], l + 1)
            Hn[l] = jax.nn.sigmoid(T + hb[l])
            if sample and sample_h[l]:
                Hn[l] = bern(Hn[l])
        if L >= 2:
            Hn[L - 1] = jax.nn.sigmoid(up(Hn[L - 2], L - 1) + hb[L - 1])
            if sample and sample_h[L - 1]:
                Hn[L - 1] = bern(Hn[L - 1])
        vn = jax.nn.sigmoid(down(Hn[0], 0) + vb)
        if sample and sample_v:
            vn = bern(vn)
        return (vn, tuple(Hn))

    v, H = jax.lax.fori_loop(
        0, n_steps, lambda _, c: sweep(c, True),
        (v_in[:], tuple(h[:] for h in H_in)))
    v_means, _ = sweep((v, H), False)

    v_out[:] = v_means  # reference assigns the means into the v particles
    for l in range(L):
        H_out[l][:] = H[l]


def make_dbm_sample_kernel(layer_sizes, n_particles, sample_v, sample_h):
    """Fused all-Bernoulli DBM chain sampler:
    ``sample(state, n_steps, seed) -> (new_state, v_means)`` with a dynamic
    (SMEM) step count -- one kernel launch for the whole run."""
    V = layer_sizes[0]
    L = len(layer_sizes) - 1
    hs = layer_sizes[1:]
    kern = functools.partial(_dbm_sample_kernel,
                             layer_sizes=tuple(layer_sizes),
                             sample_v=sample_v, sample_h=tuple(sample_h))

    @jax.jit
    def sample(state, n_steps, seed):
        f32 = jnp.float32
        scalars = jnp.asarray([seed, n_steps], jnp.uint32)
        out_shapes = ([jax.ShapeDtypeStruct((n_particles, V), f32)] +
                      [jax.ShapeDtypeStruct((n_particles, h), f32)
                       for h in hs])
        outs = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L + 2 + L),
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * (L + 1)),
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(scalars,
          state['vb'].reshape(1, V),
          *[state['hb'][l].reshape(1, hs[l]) for l in range(L)],
          *state['W'],
          state['v'], *state['H'])
        new_state = dict(state)
        new_state['v'] = outs[0]
        new_state['H'] = tuple(outs[1:1 + L])
        # the chain's visible means ARE the new v particles (dbm.py:641-648)
        return new_state, outs[0]

    return sample


def make_ais_kernel(n_visible, n_h1, n_h2, n_betas, k, n_runs,
                    sample_v=True, sample_h0=True, sample_h1=True):
    """Build `ais(state, seed, x0) -> (n_runs,) raw log importance weights
    (before the + log Z0 offset)`.  `n_runs` must be a multiple of 8."""
    V, H1, H2 = n_visible, n_h1, n_h2
    kern = functools.partial(_ais_kernel, n_betas=n_betas, k=k,
                             sample_v=sample_v, sample_h0=sample_h0,
                             sample_h1=sample_h1)

    @jax.jit
    def ais(state, seed, x0):
        f32 = jnp.float32
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_runs, 128), f32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(jnp.asarray(seed, jnp.uint32).reshape(1),
          x0,
          state['W'][0], state['W'][1],
          state['vb'].reshape(1, V),
          state['hb'][0].reshape(1, H1),
          state['hb'][1].reshape(1, H2))
        return out[:, 0]

    return ais
