"""Fused Pallas TPU kernels for the block-Gibbs hot path.

Two levels of fusion:

* ``bernoulli_sample`` -- standalone threshold sampler driven by the TPU's
  hardware PRNG (``pltpu.prng_random_bits``).  ~3x faster than threefry
  ``jax.random.uniform`` at RBM-scale shapes.
* ``make_cd_epoch_kernel`` -- the whole CD-k *epoch* as ONE ``pallas_call``:
  the grid iterates over minibatches, model state (W, biases, momentum
  accumulators, sparsity EMAs) lives in VMEM across all grid steps, batches
  stream in from HBM, and sampling uses on-chip PRNG.  This removes the
  per-step kernel-launch latency and keeps W resident, which is the
  dominant win on TPU (one launch per epoch instead of one per minibatch).

The mega-kernel covers sigmoid-hidden RBMs with Bernoulli or fixed-sigma
Gaussian visible units (the MNIST flagship and the CIFAR patch-RBM
stages); Gaussian sampling uses Box-Muller on hardware-PRNG uniforms.
Models whose W + dW exceed the VMEM budget (e.g. 3072x5000) and other
unit types fall back to the XLA path, which is also the reference for the
golden tests (with sampling disabled the two paths agree to float
tolerance; with sampling they are distinct-but-valid PRNG streams).

PRNG note: uniforms are built from raw bits with the mantissa trick
``bitcast((bits >> 9) | 0x3f800000, f32) - 1`` (Mosaic does not lower
uint32->f32 casts).  Streams are seeded per (epoch_seed, grid_step) so
training remains reproducible given the model's host RNG state.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_bits(shape):
    """Uniform [0, 1) float32 from the on-chip PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = (bits >> 9) | jnp.uint32(0x3f800000)
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _normal_from_bits(shape):
    """Standard normal float32 via Box-Muller on hardware-PRNG uniforms."""
    u1 = jnp.maximum(_uniform_bits(shape), 1e-7)
    u2 = _uniform_bits(shape)
    r = jnp.sqrt(-2. * jnp.log(u1))
    return r * jnp.cos((2. * np.pi) * u2)


# ---------------------------------------------------------------------- #
# standalone samplers (hardware PRNG, callable from any XLA program)      #
# ---------------------------------------------------------------------- #
def _seed_words(seed):
    """Normalize `seed` -- a scalar, a (2,) raw uint32 PRNG key, or a typed
    key array -- into a (2,) uint32 vector for `pltpu.prng_seed`."""
    if hasattr(seed, 'dtype') and jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
        seed = jax.random.key_data(seed)
    seed = jnp.asarray(seed)
    if seed.ndim == 0:
        return jnp.stack([seed.astype(jnp.uint32), jnp.uint32(0)])
    return seed.reshape(-1)[:2].astype(jnp.uint32)


def _bernoulli_kernel(seed_ref, p_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0).astype(jnp.uint32))
    u = _uniform_bits(p_ref.shape)
    out_ref[:] = (u < p_ref[:]).astype(p_ref.dtype)


def bernoulli_sample(seed, probs):
    """Draw Bernoulli states with the TPU hardware PRNG.

    seed : scalar / (2,) uint32 / PRNG key (traced ok);
    probs : (B, N) float32.
    """
    return pl.pallas_call(
        _bernoulli_kernel,
        out_shape=jax.ShapeDtypeStruct(probs.shape, probs.dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(_seed_words(seed), probs)


def _normal_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], seed_ref[1])
    out_ref[:] = _normal_from_bits(out_ref.shape)


def normal_sample(seed, shape, dtype=jnp.float32):
    """(B, N) standard normals from the TPU hardware PRNG (Box-Muller)."""
    return pl.pallas_call(
        _normal_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(_seed_words(seed))


def multinomial_sample(seed, means, n_samples):
    """Exact per-row Multinomial(n_samples, means / n_samples) counts with
    the TPU hardware PRNG (see `_multinomial_sample_bits`).

    means : (B, H) expected counts (rows summing to ~n_samples)."""
    def kern(seed_ref, m_ref, out_ref):
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        out_ref[:] = _multinomial_sample_bits(m_ref[:], n_samples)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(means.shape, means.dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(_seed_words(seed), means)


# ---------------------------------------------------------------------- #
# fused CD-k epoch kernel                                                 #
# ---------------------------------------------------------------------- #
def _multinomial_sample_bits(means, n_samples):
    """Exact Multinomial(n_samples, p) counts per row from hardware-PRNG
    uniforms, entirely in VMEM: CDF via an upper-triangular matmul
    (Mosaic-safe cumsum on the MXU), then `n_samples` inverse-CDF bucket
    tests accumulated by a fori_loop, and adjacent differences via a
    shifted-identity matmul.  Mirrors MultinomialLayer.sample (layers.py)
    with the on-chip PRNG.

    Both matmuls run at ``Precision.HIGHEST``: the default TPU matmul
    precision feeds the MXU bf16-truncated operands, which (a) perturbs
    the CDF by ~2^-9 relative and -- far worse -- (b) rounds the
    accumulated counts ``s`` (integers up to n_samples) to bf16's 8-bit
    mantissa in the shift product, producing wrong and even negative
    counts whenever ``n_samples > 256`` (observed on v5e at n=513/1000:
    row sums 854..1105 instead of exactly n).  HIGHEST keeps integer
    values <= 2^24 exact through the bf16x3 decomposition; the cost is
    ~1e8 extra MXU MACs, irrelevant next to the n_samples*B*H compare
    volume."""
    f32 = jnp.float32
    B, H = means.shape
    p = means * f32(1. / n_samples)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    tri = (row <= col).astype(f32)
    cdf = jnp.dot(p, tri, preferred_element_type=f32,
                  precision=jax.lax.Precision.HIGHEST)
    # the last bucket absorbs every draw despite float rounding of the CDF
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, H), 1)
    cdf = cdf + (lane == (H - 1)).astype(f32)

    # accumulate #(u_k < cdf_j) in draw chunks: one hardware-PRNG call and
    # one fori iteration per CH draws (statically unrolled compares) --
    # the draw-at-a-time loop paid ~5x the VPU compare floor in per-
    # iteration overhead at n_samples ~ 1000
    CH = 16
    n_chunks, rem = divmod(n_samples, CH)

    def chunk_body(_, s):
        u = _uniform_bits((B, CH))
        for c in range(CH):
            s = s + (u[:, c:c + 1] < cdf).astype(f32)
        return s

    s = jnp.zeros((B, H), f32)
    if n_chunks:
        s = jax.lax.fori_loop(0, n_chunks, chunk_body, s)
    if rem:
        u = _uniform_bits((B, rem))
        for c in range(rem):
            s = s + (u[:, c:c + 1] < cdf).astype(f32)
    shift = (col == row + 1).astype(f32)   # (s @ shift)_j = s_{j-1}
    return s - jnp.dot(s, shift, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)


def _free_energy_sum(Xv, act, vbn, hbn, sigma_row, visible, hidden, h_hat):
    """Batch-SUM free energy used by the epoch kernel's PLL block; the
    formulas mirror rbm/rbm.py `_free_energy` (reference rbm.py:17-22,
    50-60, 109-116) with two in-kernel conventions: gaussian inputs are
    already sigma-divided (vb raw), and the multinomial log-coefficient
    constant is omitted (it cancels in the fe_flipped - fe difference).
    `act` is Xv @ W; `h_hat` is the caller-drawn multinomial count vector
    (None for bernoulli hidden).  Module-level so the interpret-mode
    goldens can pin it numerically against the XLA `_free_energy`
    (tests/test_pallas_ops.py)."""
    f32 = jnp.float32
    if visible == 'gaussian':
        d = Xv - vbn / sigma_row
        t_vis = 0.5 * jnp.sum(d * d)
    else:
        t_vis = -jnp.sum(Xv * vbn)
    if hidden == 'multinomial':
        t_hid = -jnp.sum(act * h_hat)
    else:
        t_hid = -jnp.sum(jax.nn.softplus(act + hbn))
    return (t_vis + t_hid).astype(f32)


def make_free_energy_probe(n_visible, n_hidden, batch_size, visible,
                           hidden, n_samples=None, interpret=False):
    """Standalone pallas_call evaluating the kernel-side batch-MEAN free
    energy on given (X, W, vb, hb, sigma) -- the exact code path the
    fused PLL uses, exposed for numeric goldens.  Multinomial hidden
    draws its Monte-Carlo count vector from the in-kernel PRNG seeded
    with `seed` (pass different seeds for independent MC evaluations)."""
    V, H, B = n_visible, n_hidden, batch_size
    f32 = jnp.float32

    def kern(seed_ref, x_ref, W_ref, vb_ref, hb_ref, sigma_ref, fe_o,
             hhat_o):
        pltpu.prng_seed(seed_ref[0], seed_ref[1])
        X = x_ref[:]
        act = jnp.dot(X, W_ref[:], preferred_element_type=f32)
        h_hat = None
        if hidden == 'multinomial':
            h_hat = _multinomial_sample_bits(
                jnp.full((1, H), f32(n_samples) / f32(H), f32), n_samples)
            hhat_o[:] = h_hat
        else:
            hhat_o[:] = jnp.zeros((1, H), f32)
        fe = _free_energy_sum(X, act, vb_ref[:], hb_ref[:], sigma_ref[:],
                              visible, hidden, h_hat) / f32(B)
        fe_o[:] = jnp.full((1, 128), fe, dtype=f32)

    def probe(X, W, vb, hb, sigma, seed):
        """-> (batch-mean FE, drawn h_hat counts).  Exposing the draw lets
        CPU goldens pin the FE exactly GIVEN the draw -- interpret-mode
        `prng_seed` is a no-op (fixed stream), so seeded variation only
        exists on real TPU."""
        seeds = jnp.stack([jnp.asarray(seed, jnp.uint32),
                           jnp.zeros((), jnp.uint32)])
        fe, hh = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((1, 128), f32),
                       jax.ShapeDtypeStruct((1, H), f32)),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(seeds, jnp.asarray(X, f32), jnp.asarray(W, f32),
          jnp.asarray(vb, f32).reshape(1, V),
          jnp.asarray(hb, f32).reshape(1, H),
          jnp.broadcast_to(jnp.asarray(
              1. if sigma is None else sigma, f32).reshape(1, -1),
              (1, V)).astype(f32))
        return fe[0, 0], hh[0]

    return probe


def _cd_epoch_kernel(scalars_ref, sched_ref, x_ref, sigma_ref,
                     W_in, vb_in, hb_in, dW_in, dvb_in, dhb_in, q_in,
                     W_o, vb_o, hb_o, dW_o, dvb_o, dhb_o, q_o,
                     msre_o, pll_o, l2_o, dma_sems,
                     *, k, batch_size, n_visible,
                     sample_v_states, sample_h_states,
                     propup_mult, propdown_mult,
                     l2, sparsity_target, sparsity_cost, sparsity_damping,
                     metrics_every, compute_pll, visible,
                     hidden='bernoulli', n_samples=None, sub_tiles=1):
    i = pl.program_id(0)
    pltpu.prng_seed(scalars_ref[0], i)
    lr = sched_ref[0]
    mom = sched_ref[1]
    it = scalars_ref[1] + i.astype(jnp.uint32) + 1  # global iteration counter

    # first grid step: DMA the initial state (HBM-resident inputs) into the
    # persistent VMEM output buffers
    @pl.when(i == 0)
    def _():
        pairs = ((W_in, W_o), (vb_in, vb_o), (hb_in, hb_o), (dW_in, dW_o),
                 (dvb_in, dvb_o), (dhb_in, dhb_o), (q_in, q_o))
        copies = [pltpu.make_async_copy(src, dst, dma_sems.at[j])
                  for j, (src, dst) in enumerate(pairs)]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    X = x_ref[0]  # (B, V)
    W = W_o[:]
    vb = vb_o[:]  # (1, V)
    hb = hb_o[:]  # (1, H)

    f32 = jnp.float32
    up = f32(propup_mult)
    down = f32(propdown_mult)

    def propup(v):
        return jnp.dot(v, W, preferred_element_type=f32)

    def propdown(h):
        return jax.lax.dot_general(h, W, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def h_activation(src):
        pre = up * (propup(src) + hb)
        if hidden == 'multinomial':
            # MultinomialLayer.activation: n_samples * softmax(pre)
            m = jnp.max(pre, axis=1, keepdims=True)
            e = jnp.exp(pre - m)
            return f32(n_samples) * e / jnp.sum(e, axis=1, keepdims=True)
        return jax.nn.sigmoid(pre)

    def h_sample(means):
        if hidden == 'multinomial':
            return _multinomial_sample_bits(means, n_samples)
        return (_uniform_bits(means.shape) < means).astype(f32)

    def v_activation(h_states):
        if visible == 'gaussian':
            # GaussianLayer.activation(mult*x, mult*vb) = mult*x*sigma+mult*vb
            return down * propdown(h_states) * sigma_ref[:] + down * vb
        return jax.nn.sigmoid(down * (propdown(h_states) + vb))

    def v_sample(v_means):
        if visible == 'gaussian':
            return v_means + _normal_from_bits(v_means.shape) * sigma_ref[:]
        return (_uniform_bits(v_means.shape) < v_means).astype(f32)

    N = f32(batch_size)
    if sub_tiles == 1:
        h0_means = h_activation(X)
        h_states = h_sample(h0_means) if sample_h_states else h0_means

        v_means = X
        v_states = X  # defined for the degenerate k=0 case (zero dW gradient;
        #               the reference crashes outright on n_gibbs_steps=0)
        h_means = h0_means
        for _step in range(k):
            v_means = v_activation(h_states)
            v_states = v_sample(v_means) if sample_v_states else v_means
            h_means = h_activation(v_states)
            h_states = h_sample(h_means) if sample_h_states else h_means

        # positive - negative associations (all on the MXU)
        dW_pos = jax.lax.dot_general(X, h0_means, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dW_neg = jax.lax.dot_general(v_states, h_means,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dvb_grad = jnp.mean(X - v_states, axis=0, keepdims=True)
        dhb_grad = jnp.mean(h0_means - h_means, axis=0, keepdims=True)
        h_neg_sum = jnp.sum(h_means, axis=0, keepdims=True)
        msre_mean = jnp.mean(jnp.square(X - v_means))
    else:
        # Stage-major batch sub-tiling: the CD chain's five dependent dots
        # serialize the MXU against the VPU activation/sampling pipeline
        # (the measured ~6 us/step residual of the headline roofline,
        # RESULTS.md).  Splitting the batch into `sub_tiles` independent
        # chunks and issuing each chain STAGE for all chunks before the
        # next stage gives the Mosaic scheduler software-pipelining slack:
        # while chunk A's activations run on the VPU, chunk B's dot of the
        # same stage occupies the MXU.  Identical math per chunk; the
        # PRNG-draw order differs from sub_tiles=1 (documented trajectory
        # divergence -- still deterministic for a fixed seed+config).
        C = batch_size // sub_tiles
        Xc = [X[c * C:(c + 1) * C] for c in range(sub_tiles)]

        def h_stage(srcs):
            pres = [propup(s) for s in srcs]          # MXU, back to back
            means = []
            for p in pres:                            # VPU, overlaps MXU
                pre = up * (p + hb)
                if hidden == 'multinomial':
                    m = jnp.max(pre, axis=1, keepdims=True)
                    e = jnp.exp(pre - m)
                    means.append(f32(n_samples) * e /
                                 jnp.sum(e, axis=1, keepdims=True))
                else:
                    means.append(jax.nn.sigmoid(pre))
            return means

        def v_stage(h_srcs):
            pres = [propdown(h) for h in h_srcs]
            if visible == 'gaussian':
                return [down * p * sigma_ref[:] + down * vb for p in pres]
            return [jax.nn.sigmoid(down * (p + vb)) for p in pres]

        h0m_c = h_stage(Xc)
        hst_c = [h_sample(m) for m in h0m_c] if sample_h_states else h0m_c

        vm_c = list(Xc)
        vs_c = list(Xc)
        hm_c = list(h0m_c)
        for _step in range(k):
            vm_c = v_stage(hst_c)
            vs_c = ([v_sample(m) for m in vm_c]
                    if sample_v_states else vm_c)
            hm_c = h_stage(vs_c)
            hst_c = ([h_sample(m) for m in hm_c]
                     if sample_h_states else hm_c)

        pos_c = [jax.lax.dot_general(x, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 for x, h in zip(Xc, h0m_c)]
        neg_c = [jax.lax.dot_general(v, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 for v, h in zip(vs_c, hm_c)]
        dW_pos = functools.reduce(jnp.add, pos_c)
        dW_neg = functools.reduce(jnp.add, neg_c)
        dvb_grad = functools.reduce(jnp.add, [
            jnp.sum(x - v, axis=0, keepdims=True)
            for x, v in zip(Xc, vs_c)]) / N
        dhb_grad = functools.reduce(jnp.add, [
            jnp.sum(h0 - h, axis=0, keepdims=True)
            for h0, h in zip(h0m_c, hm_c)]) / N
        h_neg_sum = functools.reduce(jnp.add, [
            jnp.sum(h, axis=0, keepdims=True) for h in hm_c])
        msre_mean = functools.reduce(jnp.add, [
            jnp.sum(jnp.square(x - v))
            for x, v in zip(Xc, vm_c)]) / f32(batch_size * n_visible)

    dW_grad = (dW_pos - dW_neg) / N - f32(l2) * W

    damp = f32(sparsity_damping)
    q_new = damp * q_o[:] + (1. - damp) * h_neg_sum
    penalty = f32(sparsity_cost) * (q_new - f32(sparsity_target))
    q_o[:] = q_new

    # momentum rule: acc <- lr * (mom * acc + grad); param += acc
    dW_acc = lr * (mom * dW_o[:] + dW_grad - penalty)
    dvb_acc = lr * (mom * dvb_o[:] + dvb_grad)
    dhb_acc = lr * (mom * dhb_o[:] + dhb_grad - penalty)
    dW_o[:] = dW_acc
    dvb_o[:] = dvb_acc
    dhb_o[:] = dhb_acc
    W_o[:] = W + dW_acc
    vb_o[:] = vb + dvb_acc
    hb_o[:] = hb + dhb_acc

    # ---- metrics (logged every `metrics_every` iterations) ----
    want = (it % jnp.uint32(metrics_every)) == 0
    msre_val = jnp.where(want, msre_mean, f32(0.))
    msre_o[pl.ds(i, 1), :] = jnp.full((1, 128), msre_val, dtype=f32)

    # per-iteration l2 loss on the post-update weights -- same cadence and
    # semantics as the XLA path's `_metrics` (the epoch value is the mean of
    # logged iterations, not end-of-epoch W)
    @pl.when(want)
    def _():
        Wn = W_o[:]
        l2_val = f32(l2) * 0.5 * jnp.sum(Wn * Wn)
        l2_o[pl.ds(i, 1), :] = jnp.full((1, 128), l2_val, dtype=f32)

    @pl.when(jnp.logical_not(want))
    def _():
        l2_o[pl.ds(i, 1), :] = jnp.zeros((1, 128), dtype=f32)

    if compute_pll:
        @pl.when(want)
        def _():
            # flip one random visible unit per row: free energies with the
            # *updated* weights (matches the XLA path's post-update metrics)
            Wn = W_o[:]
            vbn = vb_o[:]
            hbn = hb_o[:]
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (batch_size, n_visible), 1)
            flip_idx = (_uniform_bits((batch_size, 1)) *
                        f32(n_visible)).astype(jnp.int32)
            flip = (ridx == flip_idx).astype(f32)
            Xf = X + flip - 2. * X * flip
            Nf = f32(batch_size)

            # batch-mean free energy as pure scalar reductions (1-D vectors
            # trigger Mosaic relayout issues).  Per-flavour formulas mirror
            # rbm/rbm.py _free_energy (reference rbm.py:17-22, 50-60,
            # 109-116); like the XLA _pll they apply NO dbm doubling.
            def fe_of(Xv):
                act = jnp.dot(Xv, Wn, preferred_element_type=f32)
                h_hat = None
                if hidden == 'multinomial':
                    # Monte-Carlo FE: one fresh uniform-multinomial count
                    # vector per evaluation (the XLA path draws per call
                    # too).  Independent draws for fe(x) and fe(x_flipped)
                    # make the logged PLL sampler-variance dominated -- a
                    # DELIBERATE parity choice mirroring the reference
                    # MultinomialRBM._free_energy (two independent sample
                    # ops, rbm.py:50-60); reusing one draw would be less
                    # noisy but a semantic divergence (advisor round 4).
                    Hn = hbn.shape[1]
                    h_hat = _multinomial_sample_bits(
                        jnp.full((1, Hn), f32(n_samples) / f32(Hn), f32),
                        n_samples)
                return _free_energy_sum(Xv, act, vbn, hbn, sigma_ref[:],
                                        visible, hidden, h_hat) / Nf

            fe = fe_of(X)
            fe_f = fe_of(Xf)
            pll_val = f32(n_visible) * jax.nn.log_sigmoid(fe_f - fe)
            pll_o[pl.ds(i, 1), :] = jnp.full((1, 128), pll_val, dtype=f32)

        @pl.when(jnp.logical_not(want))
        def _():
            pll_o[pl.ds(i, 1), :] = jnp.zeros((1, 128), dtype=f32)
    else:
        pll_o[pl.ds(i, 1), :] = jnp.zeros((1, 128), dtype=f32)


def _tiled_cd_epoch_kernel(scalars_ref, sched_ref, x_ref, sigma_ref,
                           W_in, dW_in,
                           vb_in, hb_in, dvb_in, dhb_in, q_in,
                           W_hbm, dW_hbm,
                           vb_o, hb_o, dvb_o, dhb_o, q_o, msre_o, l2_o,
                           Wt, Wt2, dWt, dWt2, h0m, hst, hm, vpre, vst,
                           dma_sems,
                           *, k, batch_size, n_visible, n_hidden,
                           n_hidden_real, tile,
                           sample_v_states, sample_h_states,
                           propup_mult, propdown_mult,
                           l2, sparsity_target, sparsity_cost,
                           sparsity_damping, metrics_every, visible):
    """CD-k epoch for RBMs whose W does not fit VMEM: W and dW live in HBM
    and stream through double-buffered (V, tile) VMEM tiles -- the DMA for
    tile t+1 (and the store of tile t-1's update) overlaps tile t's
    compute, so the epoch runs at HBM bandwidth instead of serialized
    load->compute->store latency.  Semantics identical to
    `_cd_epoch_kernel`.

    Semaphore layout: 0/1 W in-loads per buffer, 2/3 dW in-loads,
    4/5 W out-stores, 6/7 dW out-stores (the grid-step-0 state DMA reuses
    0..6 and completes before any tile traffic starts)."""
    f32 = jnp.float32
    i = pl.program_id(0)
    pltpu.prng_seed(scalars_ref[0], i)
    lr = sched_ref[0]
    mom = sched_ref[1]
    it = scalars_ref[1] + i.astype(jnp.uint32) + 1
    V, H, B = n_visible, n_hidden, batch_size
    n_tiles = (H + tile - 1) // tile
    up = f32(propup_mult)
    down = f32(propdown_mult)

    @pl.when(i == 0)
    def _():
        pairs = ((W_in, W_hbm), (dW_in, dW_hbm), (vb_in, vb_o),
                 (hb_in, hb_o), (dvb_in, dvb_o), (dhb_in, dhb_o),
                 (q_in, q_o))
        copies = [pltpu.make_async_copy(src, dst, dma_sems.at[j])
                  for j, (src, dst) in enumerate(pairs)]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    X = x_ref[0]
    vb = vb_o[:]
    hb = hb_o[:]

    tl = []
    for t in range(n_tiles):
        c0 = t * tile
        tl.append((t, c0, min(tile, H - c0)))

    def w_buf(idx):
        return Wt if idx % 2 == 0 else Wt2

    def d_buf(idx):
        return dWt if idx % 2 == 0 else dWt2

    def start_w_load(idx):
        t, c0, w = tl[idx]
        cp = pltpu.make_async_copy(W_hbm.at[:, c0:c0 + w],
                                   w_buf(idx).at[:, :w],
                                   dma_sems.at[idx % 2])
        cp.start()
        return cp

    def bern(p):
        return (_uniform_bits(p.shape) < p).astype(f32)

    def h_pass(src, dst_means):
        """dst_means[:, c0:c1] = sigmoid(up * (src @ W_t + hb_t)),
        prefetching tile t+1 under tile t's matmul."""
        cp = start_w_load(0)
        for idx, (t, c0, w) in enumerate(tl):
            nxt = start_w_load(idx + 1) if idx + 1 < n_tiles else None
            cp.wait()
            act = jnp.dot(src, w_buf(idx)[:, :w], preferred_element_type=f32)
            dst_means[:, c0:c0 + w] = jax.nn.sigmoid(
                up * (act + hb[:, c0:c0 + w]))
            cp = nxt

    def v_pass(h_src):
        """vpre[:] = h_src @ W^T (accumulated over prefetched tiles)."""
        vpre[:] = jnp.zeros((B, V), f32)
        cp = start_w_load(0)
        for idx, (t, c0, w) in enumerate(tl):
            nxt = start_w_load(idx + 1) if idx + 1 < n_tiles else None
            cp.wait()
            vpre[:] += jax.lax.dot_general(
                h_src[:, c0:c0 + w], w_buf(idx)[:, :w],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            cp = nxt

    # positive phase
    h_pass(X, h0m)
    if sample_h_states:
        hst[:] = bern(h0m[:])
    else:
        hst[:] = h0m[:]

    # CD-k chain
    v_means_last = X
    for _step in range(k):
        v_pass(hst[:])
        if visible == 'gaussian':
            v_means = down * vpre[:] * sigma_ref[:] + down * vb
            if sample_v_states:
                vst[:] = v_means + _normal_from_bits((B, V)) * sigma_ref[:]
            else:
                vst[:] = v_means
        else:
            v_means = jax.nn.sigmoid(down * (vpre[:] + vb))
            vst[:] = bern(v_means) if sample_v_states else v_means
        v_means_last = v_means
        h_pass(vst[:], hm)
        if sample_h_states:
            hst[:] = bern(hm[:])
        else:
            hst[:] = hm[:]

    # sparsity EMA on summed hidden means
    N = f32(batch_size)
    damp = f32(sparsity_damping)
    q_new = damp * q_o[:] + (1. - damp) * jnp.sum(hm[:], axis=0,
                                                  keepdims=True)
    penalty = f32(sparsity_cost) * (q_new - f32(sparsity_target))
    q_o[:] = q_new

    # bias updates
    dvb_grad = jnp.mean(X - vst[:], axis=0, keepdims=True)
    dhb_grad = jnp.mean(h0m[:] - hm[:], axis=0, keepdims=True) - penalty
    dvb_acc = lr * (mom * dvb_o[:] + dvb_grad)
    dhb_acc = lr * (mom * dhb_o[:] + dhb_grad)
    dvb_o[:] = dvb_acc
    dhb_o[:] = dhb_acc
    vb_o[:] = vb + dvb_acc
    hb_o[:] = hb + dhb_acc

    # weight updates: stream W and dW tiles through double-buffered VMEM --
    # tile t's compute overlaps tile t+1's loads and tile t-1's stores;
    # accumulate sum(W^2) of the post-update tiles for the l2 metric
    def start_update_in(idx):
        t, c0, w = tl[idx]
        cw = pltpu.make_async_copy(W_hbm.at[:, c0:c0 + w],
                                   w_buf(idx).at[:, :w],
                                   dma_sems.at[idx % 2])
        cd = pltpu.make_async_copy(dW_hbm.at[:, c0:c0 + w],
                                   d_buf(idx).at[:, :w],
                                   dma_sems.at[2 + idx % 2])
        cw.start()
        cd.start()
        return cw, cd

    ssq = f32(0.)
    out_cps = [None, None]
    in_cp = start_update_in(0)
    for idx, (t, c0, w) in enumerate(tl):
        nxt = None
        if idx + 1 < n_tiles:
            # tile idx+1 reuses tile idx-1's buffers: its stores must land
            # before the fresh loads overwrite them
            if out_cps[(idx + 1) % 2] is not None:
                for c in out_cps[(idx + 1) % 2]:
                    c.wait()
                out_cps[(idx + 1) % 2] = None
            nxt = start_update_in(idx + 1)
        cw, cd = in_cp
        pos = jax.lax.dot_general(X, h0m[:, c0:c0 + w],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        neg = jax.lax.dot_general(vst[:], hm[:, c0:c0 + w],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        cw.wait()
        cd.wait()
        grad = (pos - neg) / N - f32(l2) * w_buf(idx)[:, :w] \
            - penalty[:, c0:c0 + w]
        acc = lr * (mom * d_buf(idx)[:, :w] + grad)
        if c0 + w > n_hidden_real:
            # H was padded to a 128 multiple: keep padded weight columns
            # exactly zero so they never feed the visible layer
            col = jax.lax.broadcasted_iota(jnp.int32, (V, w), 1) + c0
            acc = jnp.where(col < n_hidden_real, acc, f32(0.))
        d_buf(idx)[:, :w] = acc
        w_buf(idx)[:, :w] = w_buf(idx)[:, :w] + acc
        ssq = ssq + jnp.sum(w_buf(idx)[:, :w] * w_buf(idx)[:, :w])
        ow = pltpu.make_async_copy(w_buf(idx).at[:, :w],
                                   W_hbm.at[:, c0:c0 + w],
                                   dma_sems.at[4 + idx % 2])
        od = pltpu.make_async_copy(d_buf(idx).at[:, :w],
                                   dW_hbm.at[:, c0:c0 + w],
                                   dma_sems.at[6 + idx % 2])
        ow.start()
        od.start()
        out_cps[idx % 2] = (ow, od)
        in_cp = nxt
    for oc in out_cps:
        if oc is not None:
            for c in oc:
                c.wait()

    want = (it % jnp.uint32(metrics_every)) == 0
    msre_val = jnp.where(want, jnp.mean(jnp.square(X - v_means_last)),
                         f32(0.))
    msre_o[pl.ds(i, 1), :] = jnp.full((1, 128), msre_val, dtype=f32)
    # padded weight columns are exactly zero, so ssq equals sum over the
    # real (V, H_real) matrix
    l2_val = jnp.where(want, f32(l2) * 0.5 * ssq, f32(0.))
    l2_o[pl.ds(i, 1), :] = jnp.full((1, 128), l2_val, dtype=f32)


def make_tiled_cd_epoch_kernel(n_visible, n_hidden, batch_size, k,
                               sample_v_states, sample_h_states,
                               propup_mult, propdown_mult,
                               l2, sparsity_target, sparsity_cost,
                               sparsity_damping, metrics_every,
                               visible='bernoulli', sigma=None,
                               tile=1024, interpret=False):
    """Build the hidden-tiled CD-k epoch program for big RBMs (W in HBM).

    Same interface as `make_cd_epoch_kernel` but PLL is not computed
    (returns zeros for the pll stream)."""
    V, B = n_visible, batch_size
    H_real = n_hidden
    # HBM memref slices must be lane-aligned: pad the hidden axis to a
    # multiple of 128 (padded weight columns are masked to zero in the
    # update pass so they never influence the visible layer)
    H = ((n_hidden + 127) // 128) * 128
    tile = min(tile, H)
    sigma_arr = (np.ones((1, V), np.float32) if sigma is None
                 else np.broadcast_to(
                     np.asarray(sigma, np.float32).reshape(1, -1),
                     (1, V)).copy())

    kern = functools.partial(
        _tiled_cd_epoch_kernel, k=k, batch_size=B, n_visible=V, n_hidden=H,
        n_hidden_real=H_real, tile=tile, sample_v_states=sample_v_states,
        sample_h_states=sample_h_states, propup_mult=propup_mult,
        propdown_mult=propdown_mult, l2=l2, sparsity_target=sparsity_target,
        sparsity_cost=sparsity_cost, sparsity_damping=sparsity_damping,
        metrics_every=metrics_every, visible=visible)

    def const2d(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def epoch(state, X_batches, lr, momentum, seed, iter0):
        NB = X_batches.shape[0]
        f32 = jnp.float32
        scalars = jnp.stack([jnp.asarray(seed, jnp.uint32),
                             jnp.asarray(iter0, jnp.uint32)])
        sched = jnp.stack([jnp.asarray(lr, f32), jnp.asarray(momentum, f32)])

        def pad_cols(a):
            return a if H == H_real else \
                jnp.pad(a, ((0, 0), (0, H - H_real)))

        in_state = (pad_cols(state['W']), pad_cols(state['dW']),
                    state['vb'].reshape(1, V),
                    pad_cols(state['hb'].reshape(1, H_real)),
                    state['dvb'].reshape(1, V),
                    pad_cols(state['dhb'].reshape(1, H_real)),
                    pad_cols(state['q_means'].reshape(1, H_real)))

        out_shapes = (
            jax.ShapeDtypeStruct((V, H), f32),     # W (HBM)
            jax.ShapeDtypeStruct((V, H), f32),     # dW (HBM)
            jax.ShapeDtypeStruct((1, V), f32),     # vb
            jax.ShapeDtypeStruct((1, H), f32),     # hb
            jax.ShapeDtypeStruct((1, V), f32),     # dvb
            jax.ShapeDtypeStruct((1, H), f32),     # dhb
            jax.ShapeDtypeStruct((1, H), f32),     # q_means
            jax.ShapeDtypeStruct((NB, 128), f32),  # msre
            jax.ShapeDtypeStruct((NB, 128), f32),  # l2 loss
        )

        outs = pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B, V), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const2d((1, V)),  # sigma
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
            out_specs=tuple(
                [pl.BlockSpec(memory_space=pl.ANY)] * 2 +
                [const2d((1, V)), const2d((1, H)), const2d((1, V)),
                 const2d((1, H)), const2d((1, H)), const2d((NB, 128)),
                 const2d((NB, 128))]),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((V, tile), jnp.float32),      # Wt  (buffer 0)
                pltpu.VMEM((V, tile), jnp.float32),      # Wt2 (buffer 1)
                pltpu.VMEM((V, tile), jnp.float32),      # dWt
                pltpu.VMEM((V, tile), jnp.float32),      # dWt2
                pltpu.VMEM((B, H), jnp.float32),         # h0 means
                pltpu.VMEM((B, H), jnp.float32),         # h states
                pltpu.VMEM((B, H), jnp.float32),         # h means (chain end)
                pltpu.VMEM((B, V), jnp.float32),         # v preactivation
                pltpu.VMEM((B, V), jnp.float32),         # v states
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(scalars, sched, X_batches, jnp.asarray(sigma_arr), *in_state)

        (W, dW, vb, hb, dvb, dhb, q, msre, l2row) = outs
        new_state = {
            'W': W[:, :H_real], 'vb': vb.reshape(V),
            'hb': hb.reshape(H)[:H_real],
            'dW': dW[:, :H_real], 'dvb': dvb.reshape(V),
            'dhb': dhb.reshape(H)[:H_real],
            'q_means': q.reshape(H)[:H_real],
        }
        return new_state, msre[:, 0], jnp.zeros_like(msre[:, 0]), l2row[:, 0]

    return epoch


def _tiled_cd_stats_kernel(seed_ref, x_ref, sigma_ref, W_in, vb_ref, hb_ref,
                           assoc_hbm, dvb_o, dhb_o, hsum_o, vmeans_o,
                           Wt, Wt2, at0, at1, h0m, hst, hm, vpre, vst,
                           dma_sems,
                           *, k, batch_size, n_visible, n_hidden,
                           n_hidden_real, tile,
                           sample_v_states, sample_h_states,
                           propup_mult, propdown_mult, visible):
    """Per-shard CD-k sufficient statistics for models whose W + assoc do
    not fit VMEM: W stays in HBM and streams through double-buffered
    (V, tile) VMEM tiles (like `_tiled_cd_epoch_kernel`), and the
    positive-negative association streams OUT tile-by-tile.  The psum-able
    outputs match `_cd_stats_kernel` exactly, so mesh training of e.g. the
    3072x7800 CIFAR G-RBM keeps the fused path instead of dropping to the
    lax body.

    Semaphore layout: 0/1 W tile loads, 2/3 assoc tile stores."""
    f32 = jnp.float32
    shard_seed = seed_ref[0] ^ (seed_ref[2] * jnp.uint32(0x9E3779B9))
    pltpu.prng_seed(shard_seed, seed_ref[1])
    V, H, B = n_visible, n_hidden, batch_size
    n_tiles = (H + tile - 1) // tile
    up = f32(propup_mult)
    down = f32(propdown_mult)
    X = x_ref[:]
    vb = vb_ref[:]
    hb = hb_ref[:]

    tl = []
    for t in range(n_tiles):
        c0 = t * tile
        tl.append((t, c0, min(tile, H - c0)))

    def w_buf(idx):
        return Wt if idx % 2 == 0 else Wt2

    def a_buf(idx):
        return at0 if idx % 2 == 0 else at1

    def start_w_load(idx):
        t, c0, w = tl[idx]
        cp = pltpu.make_async_copy(W_in.at[:, c0:c0 + w],
                                   w_buf(idx).at[:, :w],
                                   dma_sems.at[idx % 2])
        cp.start()
        return cp

    def bern(p):
        return (_uniform_bits(p.shape) < p).astype(f32)

    def h_pass(src, dst_means):
        cp = start_w_load(0)
        for idx, (t, c0, w) in enumerate(tl):
            nxt = start_w_load(idx + 1) if idx + 1 < n_tiles else None
            cp.wait()
            act = jnp.dot(src, w_buf(idx)[:, :w], preferred_element_type=f32)
            # slice the bias tile from the REF (offset-0 vector), not the
            # preloaded (1, H) value: Mosaic fails to lower the broadcast
            # of a value sliced at a lane offset >= 2 tiles ("Invalid
            # input layout" on (1, w) -> (B, w), observed on v5e round 5)
            dst_means[:, c0:c0 + w] = jax.nn.sigmoid(
                up * (act + hb_ref[:, c0:c0 + w]))
            cp = nxt

    def v_pass(h_src):
        vpre[:] = jnp.zeros((B, V), f32)
        cp = start_w_load(0)
        for idx, (t, c0, w) in enumerate(tl):
            nxt = start_w_load(idx + 1) if idx + 1 < n_tiles else None
            cp.wait()
            vpre[:] += jax.lax.dot_general(
                h_src[:, c0:c0 + w], w_buf(idx)[:, :w],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            cp = nxt

    # positive phase
    h_pass(X, h0m)
    hst[:] = bern(h0m[:]) if sample_h_states else h0m[:]

    # k=0 degenerate case: the chain loop never runs, so the negative
    # phase must equal the positive one (zero gradient) instead of
    # reading uninitialized VMEM scratch (advisor round 4, medium).
    # Statically gated: k is a Python int, and the unconditional
    # initialization changed Mosaic's layout inference for hm enough to
    # break lowering of the k>0 path on-chip ("Invalid input layout" on
    # the hb broadcast, observed round 5).
    if k == 0:
        hm[:] = h0m[:]
        vst[:] = X

    # CD-k chain
    v_means_last = X
    for _step in range(k):
        v_pass(hst[:])
        if visible == 'gaussian':
            v_means = down * vpre[:] * sigma_ref[:] + down * vb
            if sample_v_states:
                vst[:] = v_means + _normal_from_bits((B, V)) * sigma_ref[:]
            else:
                vst[:] = v_means
        else:
            v_means = jax.nn.sigmoid(down * (vpre[:] + vb))
            vst[:] = bern(v_means) if sample_v_states else v_means
        v_means_last = v_means
        h_pass(vst[:], hm)
        hst[:] = bern(hm[:]) if sample_h_states else hm[:]

    # association tiles: pos - neg computed in VMEM, streamed to the HBM
    # output under the next tile's matmuls.  Lane-padding columns are
    # zeroed in-kernel (statically, on the one boundary tile) so a caller
    # that keeps its state padded across the training scan -- avoiding the
    # per-step pad/slice W-sized HBM copies -- sees exactly-zero pad
    # statistics and its padded parameters never drift from zero.
    out_cps = [None, None]
    for idx, (t, c0, w) in enumerate(tl):
        if out_cps[idx % 2] is not None:
            out_cps[idx % 2].wait()
            out_cps[idx % 2] = None
        pos = jax.lax.dot_general(X, h0m[:, c0:c0 + w],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        neg = jax.lax.dot_general(vst[:], hm[:, c0:c0 + w],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        val = pos - neg
        if c0 + w > n_hidden_real:
            col = c0 + jax.lax.broadcasted_iota(jnp.int32, (V, w), 1)
            val = jnp.where(col < n_hidden_real, val, f32(0.))
        a_buf(idx)[:, :w] = val
        oc = pltpu.make_async_copy(a_buf(idx).at[:, :w],
                                   assoc_hbm.at[:, c0:c0 + w],
                                   dma_sems.at[2 + idx % 2])
        oc.start()
        out_cps[idx % 2] = oc
    for oc in out_cps:
        if oc is not None:
            oc.wait()

    dvb_o[:] = jnp.sum(X - vst[:], axis=0, keepdims=True)
    dhb_vals = jnp.sum(h0m[:] - hm[:], axis=0, keepdims=True)
    hsum_vals = jnp.sum(hm[:], axis=0, keepdims=True)
    if H != n_hidden_real:
        hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
                 < n_hidden_real).astype(f32)
        dhb_vals = dhb_vals * hmask
        hsum_vals = hsum_vals * hmask
    dhb_o[:] = dhb_vals
    hsum_o[:] = hsum_vals
    vmeans_o[:] = v_means_last


def make_tiled_cd_stats_kernel(n_visible, n_hidden, batch_size, k,
                               sample_v_states, sample_h_states,
                               propup_mult, propdown_mult,
                               visible='bernoulli', sigma=None,
                               tile=512, interpret=False):
    """Tiled (HBM-streamed W) twin of `make_cd_stats_kernel` -- same
    ``stats(state, X_local, seed, it, shard) -> (stats, aux)`` contract,
    for models too large for the all-resident stats kernel."""
    V, B = n_visible, batch_size
    H_real = n_hidden
    H = ((n_hidden + 127) // 128) * 128
    tile = min(tile, H)
    assert visible in ('bernoulli', 'gaussian')
    sigma_arr = (np.ones((1, V), np.float32) if sigma is None
                 else np.broadcast_to(
                     np.asarray(sigma, np.float32).reshape(1, -1),
                     (1, V)).copy())

    kern = functools.partial(
        _tiled_cd_stats_kernel, k=k, batch_size=B, n_visible=V, n_hidden=H,
        n_hidden_real=H_real, tile=tile,
        sample_v_states=sample_v_states, sample_h_states=sample_h_states,
        propup_mult=propup_mult, propdown_mult=propdown_mult,
        visible=visible)

    def stats(state, X_batch, seed, it, shard):
        f32 = jnp.float32
        seeds = jnp.stack([jnp.asarray(seed, jnp.uint32),
                           jnp.asarray(it, jnp.int32).astype(jnp.uint32),
                           jnp.asarray(shard, jnp.int32).astype(jnp.uint32)])

        # Pre-padded state (the shard_map epoch keeps W/hb lane-padded
        # across the training scan): skip the per-step pad AND return
        # padded stats, so the hot loop moves zero extra W-sized copies.
        # The kernel masks pad-column statistics to exactly zero, so
        # padded parameters never drift.
        pre_padded = H != H_real and state['W'].shape[1] == H

        def pad_cols(a):
            return a if (H == H_real or pre_padded) else \
                jnp.pad(a, ((0, 0), (0, H - H_real)))

        outs = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY),   # W (HBM)
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),  # assoc (HBM)
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((V, H), f32),   # assoc
                jax.ShapeDtypeStruct((1, V), f32),   # dvb_sum
                jax.ShapeDtypeStruct((1, H), f32),   # dhb_sum
                jax.ShapeDtypeStruct((1, H), f32),   # h_sum
                jax.ShapeDtypeStruct((B, V), f32),   # v_means
            ),
            scratch_shapes=[
                pltpu.VMEM((V, tile), jnp.float32),   # Wt
                pltpu.VMEM((V, tile), jnp.float32),   # Wt2
                pltpu.VMEM((V, tile), jnp.float32),   # assoc tile 0
                pltpu.VMEM((V, tile), jnp.float32),   # assoc tile 1
                pltpu.VMEM((B, H), jnp.float32),      # h0 means
                pltpu.VMEM((B, H), jnp.float32),      # h states
                pltpu.VMEM((B, H), jnp.float32),      # h means
                pltpu.VMEM((B, V), jnp.float32),      # v preactivation
                pltpu.VMEM((B, V), jnp.float32),      # v states
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(seeds, X_batch, jnp.asarray(sigma_arr), pad_cols(state['W']),
          state['vb'].reshape(1, V),
          pad_cols(state['hb'].reshape(1, -1)))
        assoc, dvb, dhb, hsum, v_means = outs
        Hs = H if pre_padded else H_real
        stats_tree = {'assoc': assoc[:, :Hs],
                      'dvb_sum': dvb.reshape(V),
                      'dhb_sum': dhb.reshape(H)[:Hs],
                      'h_sum': hsum.reshape(H)[:Hs]}
        aux = {'X': X_batch, 'v_means': v_means}
        return stats_tree, aux

    stats.padded_hidden = H
    return stats


def _cd_stats_kernel(seed_ref, x_ref, sigma_ref, W_ref, vb_ref, hb_ref,
                     assoc_o, dvb_o, dhb_o, hsum_o, vmeans_o,
                     *, k, sample_v_states, sample_h_states,
                     propup_mult, propdown_mult, visible, sub_tiles=1):
    """Per-shard CD-k sufficient statistics (no parameter update): the raw
    sums whose cross-chip ``psum`` equals the full-batch statistics of
    `BaseRBM._cd_stats`.  Used inside the shard_map data-parallel epoch so
    multi-chip training keeps on-chip-PRNG sampling and fused compute while
    XLA handles the gradient all-reduce between steps."""
    f32 = jnp.float32
    # Mosaic supports at most 2 seed values: golden-ratio-mix the shard
    # index into the epoch seed so each (seed, shard) pair gets a distinct
    # stream, and keep the step counter as the second value
    shard_seed = seed_ref[0] ^ (seed_ref[2] * jnp.uint32(0x9E3779B9))
    pltpu.prng_seed(shard_seed, seed_ref[1])
    W = W_ref[:]
    vb = vb_ref[:]
    hb = hb_ref[:]
    X = x_ref[:]
    up = f32(propup_mult)
    down = f32(propdown_mult)

    def propup(v):
        return jnp.dot(v, W, preferred_element_type=f32)

    def propdown(h):
        return jax.lax.dot_general(h, W, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def v_activation(h_states):
        if visible == 'gaussian':
            return down * propdown(h_states) * sigma_ref[:] + down * vb
        return jax.nn.sigmoid(down * (propdown(h_states) + vb))

    def v_sample(v_means):
        if visible == 'gaussian':
            return v_means + _normal_from_bits(v_means.shape) * sigma_ref[:]
        return (_uniform_bits(v_means.shape) < v_means).astype(f32)

    if sub_tiles == 1:
        h0_means = jax.nn.sigmoid(up * (propup(X) + hb))
        if sample_h_states:
            h_states = (_uniform_bits(h0_means.shape) < h0_means).astype(f32)
        else:
            h_states = h0_means

        v_means = X
        v_states = X
        h_means = h0_means
        for _step in range(k):
            v_means = v_activation(h_states)
            v_states = v_sample(v_means) if sample_v_states else v_means
            h_means = jax.nn.sigmoid(up * (propup(v_states) + hb))
            h_states = ((_uniform_bits(h_means.shape) < h_means).astype(f32)
                        if sample_h_states else h_means)

        pos = jax.lax.dot_general(X, h0_means, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        neg = jax.lax.dot_general(v_states, h_means,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        assoc_o[:] = pos - neg
        dvb_o[:] = jnp.sum(X - v_states, axis=0, keepdims=True)
        dhb_o[:] = jnp.sum(h0_means - h_means, axis=0, keepdims=True)
        hsum_o[:] = jnp.sum(h_means, axis=0, keepdims=True)
        vmeans_o[:] = v_means
    else:
        # stage-major batch sub-tiling -- same restructure as
        # _cd_epoch_kernel's sub_tiles branch: chunk A's VPU
        # activation/sampling overlaps chunk B's MXU dot of the same
        # chain stage (see the long comment there)
        B = X.shape[0]
        C = B // sub_tiles
        Xc = [X[c * C:(c + 1) * C] for c in range(sub_tiles)]

        def h_stage(srcs):
            pres = [propup(s) for s in srcs]
            return [jax.nn.sigmoid(up * (p + hb)) for p in pres]

        def v_stage(h_srcs):
            pres = [propdown(h) for h in h_srcs]
            if visible == 'gaussian':
                return [down * p * sigma_ref[:] + down * vb for p in pres]
            return [jax.nn.sigmoid(down * (p + vb)) for p in pres]

        def bern(ms):
            return [(_uniform_bits(m.shape) < m).astype(f32) for m in ms]

        h0m_c = h_stage(Xc)
        hst_c = bern(h0m_c) if sample_h_states else h0m_c
        vm_c = list(Xc)
        vs_c = list(Xc)
        hm_c = list(h0m_c)
        for _step in range(k):
            vm_c = v_stage(hst_c)
            vs_c = ([v_sample(m) for m in vm_c]
                    if sample_v_states else vm_c)
            hm_c = h_stage(vs_c)
            hst_c = bern(hm_c) if sample_h_states else hm_c

        pos_c = [jax.lax.dot_general(x, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 for x, h in zip(Xc, h0m_c)]
        neg_c = [jax.lax.dot_general(v, h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
                 for v, h in zip(vs_c, hm_c)]
        assoc_o[:] = (functools.reduce(jnp.add, pos_c)
                      - functools.reduce(jnp.add, neg_c))
        dvb_o[:] = functools.reduce(jnp.add, [
            jnp.sum(x - v, axis=0, keepdims=True)
            for x, v in zip(Xc, vs_c)])
        dhb_o[:] = functools.reduce(jnp.add, [
            jnp.sum(h0 - h, axis=0, keepdims=True)
            for h0, h in zip(h0m_c, hm_c)])
        hsum_o[:] = functools.reduce(jnp.add, [
            jnp.sum(h, axis=0, keepdims=True) for h in hm_c])
        for c in range(sub_tiles):
            vmeans_o[c * C:(c + 1) * C] = vm_c[c]


def make_cd_stats_kernel(n_visible, n_hidden, batch_size, k,
                         sample_v_states, sample_h_states,
                         propup_mult, propdown_mult,
                         visible='bernoulli', sigma=None, interpret=False,
                         sub_tiles=1):
    """Build ``stats(state, X_local, seed, it, shard) -> (stats, aux)`` for
    one shard-local minibatch: `stats` matches `BaseRBM._cd_stats` (assoc /
    dvb_sum / dhb_sum / h_sum raw sums, psum-able across the data axis) and
    `aux` carries {X, v_means} for the metric branch.  `seed`/`it`/`shard`
    may be traced scalars -- the on-chip PRNG stream is (seed, it, shard)."""
    V, H, B = n_visible, n_hidden, batch_size
    assert visible in ('bernoulli', 'gaussian')
    sigma_arr = (np.ones((1, V), np.float32) if sigma is None
                 else np.broadcast_to(
                     np.asarray(sigma, np.float32).reshape(1, -1),
                     (1, V)).copy())

    sub_tiles = int(sub_tiles)
    if sub_tiles < 1 or B % sub_tiles != 0:
        raise ValueError('sub_tiles=%d must be >=1 and divide the local '
                         'batch size %d' % (sub_tiles, B))
    kern = functools.partial(
        _cd_stats_kernel, k=k,
        sample_v_states=sample_v_states, sample_h_states=sample_h_states,
        propup_mult=propup_mult, propdown_mult=propdown_mult,
        visible=visible, sub_tiles=sub_tiles)

    def stats(state, X_batch, seed, it, shard):
        f32 = jnp.float32
        seeds = jnp.stack([jnp.asarray(seed, jnp.uint32),
                           jnp.asarray(it, jnp.int32).astype(jnp.uint32),
                           jnp.asarray(shard, jnp.int32).astype(jnp.uint32)])
        outs = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 5),
            out_shape=(
                jax.ShapeDtypeStruct((V, H), f32),   # assoc
                jax.ShapeDtypeStruct((1, V), f32),   # dvb_sum
                jax.ShapeDtypeStruct((1, H), f32),   # dhb_sum
                jax.ShapeDtypeStruct((1, H), f32),   # h_sum
                jax.ShapeDtypeStruct((B, V), f32),   # v_means
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(seeds, X_batch, jnp.asarray(sigma_arr),
          state['W'], state['vb'].reshape(1, V), state['hb'].reshape(1, H))
        assoc, dvb, dhb, hsum, v_means = outs
        stats_tree = {'assoc': assoc, 'dvb_sum': dvb.reshape(V),
                      'dhb_sum': dhb.reshape(H), 'h_sum': hsum.reshape(H)}
        aux = {'X': X_batch, 'v_means': v_means}
        return stats_tree, aux

    return stats


def make_cd_epoch_kernel(n_visible, n_hidden, batch_size, k,
                         sample_v_states, sample_h_states,
                         propup_mult, propdown_mult,
                         l2, sparsity_target, sparsity_cost,
                         sparsity_damping, metrics_every,
                         compute_pll=True, interpret=False,
                         visible='bernoulli', sigma=None,
                         hidden='bernoulli', n_samples=None, sub_tiles=1):
    """Build the fused CD-k epoch program for an RBM with Bernoulli or
    Gaussian (fixed-sigma) visible units and Bernoulli (sigmoid) or
    Multinomial (`n_samples` tied softmax draws) hidden units.

    Returns ``epoch(state, X_batches, lr, momentum, seed, iter0)`` ->
    ``(state, msre_per_batch, pll_per_batch)`` where `X_batches` is
    (n_batches, batch_size, n_visible) float32 and `state` is the BaseRBM
    state dict.  One kernel launch per epoch; W stays in VMEM throughout.

    ``sub_tiles`` > 1 splits each batch into that many chunks computed
    stage-major through the CD chain so the VPU pipeline of one chunk
    overlaps the MXU dot of the next (see _cd_epoch_kernel); the batch
    size must divide evenly.  Math is identical up to f32 accumulation
    order; the PRNG-draw order (hence the sampled trajectory for a fixed
    seed) differs from ``sub_tiles=1``.
    """
    V, H, B = n_visible, n_hidden, batch_size
    assert visible in ('bernoulli', 'gaussian')
    assert hidden in ('bernoulli', 'multinomial')
    assert hidden == 'bernoulli' or n_samples is not None
    sub_tiles = int(sub_tiles)
    if sub_tiles < 1 or B % sub_tiles != 0:
        raise ValueError('sub_tiles=%d must be >=1 and divide batch_size=%d'
                         % (sub_tiles, B))
    sigma_arr = (np.ones((1, V), np.float32) if sigma is None
                 else np.broadcast_to(
                     np.asarray(sigma, np.float32).reshape(1, -1),
                     (1, V)).copy())

    kernel = functools.partial(
        _cd_epoch_kernel, k=k, batch_size=B, n_visible=V,
        sample_v_states=sample_v_states, sample_h_states=sample_h_states,
        propup_mult=propup_mult, propdown_mult=propdown_mult,
        l2=l2, sparsity_target=sparsity_target, sparsity_cost=sparsity_cost,
        sparsity_damping=sparsity_damping, metrics_every=metrics_every,
        compute_pll=compute_pll, visible=visible,
        hidden=hidden, n_samples=n_samples, sub_tiles=sub_tiles)

    def const2d(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def epoch(state, X_batches, lr, momentum, seed, iter0):
        NB = X_batches.shape[0]
        f32 = jnp.float32
        scalars = jnp.stack([jnp.asarray(seed, jnp.uint32),
                             jnp.asarray(iter0, jnp.uint32)])
        sched = jnp.stack([jnp.asarray(lr, f32), jnp.asarray(momentum, f32)])

        in_state = (state['W'],
                    state['vb'].reshape(1, V), state['hb'].reshape(1, H),
                    state['dW'],
                    state['dvb'].reshape(1, V), state['dhb'].reshape(1, H),
                    state['q_means'].reshape(1, H))

        out_shapes = (
            jax.ShapeDtypeStruct((V, H), f32),     # W
            jax.ShapeDtypeStruct((1, V), f32),     # vb
            jax.ShapeDtypeStruct((1, H), f32),     # hb
            jax.ShapeDtypeStruct((V, H), f32),     # dW
            jax.ShapeDtypeStruct((1, V), f32),     # dvb
            jax.ShapeDtypeStruct((1, H), f32),     # dhb
            jax.ShapeDtypeStruct((1, H), f32),     # q_means
            jax.ShapeDtypeStruct((NB, 128), f32),  # msre per batch (lane 0)
            jax.ShapeDtypeStruct((NB, 128), f32),  # pll per batch (lane 0)
            jax.ShapeDtypeStruct((NB, 128), f32),  # l2 loss per batch (lane 0)
        )

        outs = pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B, V), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const2d((1, V)),  # sigma
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
            out_specs=(
                const2d((V, H)), const2d((1, V)), const2d((1, H)),
                const2d((V, H)), const2d((1, V)), const2d((1, H)),
                const2d((1, H)),
                const2d((NB, 128)),
                const2d((NB, 128)),
                const2d((NB, 128)),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.SemaphoreType.DMA((7,))],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',),
                # 120 MiB of the v5e's 128 MiB: the multinomial-hidden
                # PLL block measures 114.7 MiB scoped at the reference
                # M-RBM stage shape (5000x1000, batch 100) -- the default
                # 100 MiB cap made that exact config a compile-time OOM
                # (observed round 5); eligibility gating in
                # rbm/base_rbm.py keeps genuinely bigger models off this
                # kernel.
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(scalars, sched, X_batches, jnp.asarray(sigma_arr), *in_state)

        (W, vb, hb, dW, dvb, dhb, q, msre, pll, l2row) = outs
        new_state = {
            'W': W, 'vb': vb.reshape(V), 'hb': hb.reshape(H),
            'dW': dW, 'dvb': dvb.reshape(V), 'dhb': dhb.reshape(H),
            'q_means': q.reshape(H),
        }
        return new_state, msre[:, 0], pll[:, 0], l2row[:, 0]

    return epoch
