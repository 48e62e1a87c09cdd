"""Generic RBM with k-step Contrastive Divergence, rebuilt TPU-first.

Capability parity with reference rbm/base_rbm.py:12-700, redesigned as pure
functional JAX programs instead of a TF1 graph:

* model state is a pytree dict {W, vb, hb, dW, dvb, dhb, q_means} of device
  arrays (reference base_rbm.py:271-327);
* one *epoch* of CD-k training is a single jitted ``lax.scan`` over the
  batched dataset (the reference pays one ``session.run`` per minibatch,
  base_rbm.py:558-567 -- here the whole epoch stays on-device);
* the Gibbs chain is a ``lax.fori_loop`` with a *traced* step count, so the
  per-epoch ``n_gibbs_steps`` schedule never triggers recompilation
  (reference's placeholder-driven while_loop, base_rbm.py:386-405);
* randomness is explicit key-threading: one op seed per ``fit`` drawn from
  the persisted host RNG, then ``fold_in(epoch)`` / ``fold_in(step)``
  (reproducibility contract of reference base/tf_model.py:20-21);
* training metrics (MSRE / PLL / L2) are computed under ``lax.cond`` only on
  the steps where they are logged, so the hot loop stays pure compute.

Semantics preserved exactly (see docstrings below): the momentum rule
``acc <- lr * (m * acc + grad); param += acc`` (base_rbm.py:465-474), the
EMA sparsity penalty on summed hidden means (456-462), dbm_first/dbm_last
input doubling (244-262), PLL via a single randomly flipped unit scaled by
n_visible (496-513), and the free-energy-gap overfitting monitor (592-621).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ebm import EnergyBasedModel
from ..base import is_attribute_name
from ..base.jax_model import (AsyncEpochWriter, MetricsPipeline,
                              device_histogram, fetch_as, fetch_many)
from ..utils import (make_list_from, batch_iter, epoch_iter, schedule_value,
                     write_during_training)
from ..utils.testing import assert_len, assert_shape


class BaseRBM(EnergyBasedModel):
    """A generic Restricted Boltzmann Machine trained with CD-k.

    Parameters mirror the reference implementation (see module docstring);
    highlights:

    n_visible, n_hidden : positive int
    W_init : float (stddev of zero-centered Gaussian) or (V, H) array
    vb_init, hb_init : float or array
    n_gibbs_steps, learning_rate, momentum : value or per-epoch schedule
    max_epoch, batch_size, l2 : training params
    sample_v_states, sample_h_states : bool
        Use sampled states vs. means inside the chain (data-driven hidden
        states are always available sampled).
    dropout : None or float -- keep-probability of visible units.
    sparsity_target, sparsity_cost, sparsity_damping : EMA sparsity penalty.
    dbm_first, dbm_last : double inputs to compensate single-sided evidence
        during DBM pre-training (Salakhutdinov & Hinton 2009).
    metrics_config : dict -- which metrics (msre/pll/l2_loss/feg), formats,
        and cadences to compute.
    """

    def __init__(self,
                 n_visible=784, v_layer_cls=None, v_layer_params=None,
                 n_hidden=256, h_layer_cls=None, h_layer_params=None,
                 W_init=0.01, vb_init=0., hb_init=0., n_gibbs_steps=1,
                 learning_rate=0.01, momentum=0.9, max_epoch=10, batch_size=10,
                 l2=1e-4, sample_v_states=False, sample_h_states=True,
                 dropout=None,
                 sparsity_target=0.1, sparsity_cost=0., sparsity_damping=0.9,
                 dbm_first=False, dbm_last=False,
                 metrics_config=None, verbose=True, save_after_each_epoch=True,
                 checkpoint_every_epoch=1, summaries_every_epoch=1,
                 display_filters=0, display_hidden_activations=0,
                 v_shape=(28, 28), kernel='auto',
                 model_path='rbm_model/', *args, **kwargs):
        super(BaseRBM, self).__init__(model_path=model_path, *args, **kwargs)
        self.n_visible = n_visible
        self.n_hidden = n_hidden

        v_layer_params = v_layer_params or {}
        v_layer_params.setdefault('n_units', self.n_visible)
        v_layer_params.setdefault('dtype', self.dtype)
        h_layer_params = h_layer_params or {}
        h_layer_params.setdefault('n_units', self.n_hidden)
        h_layer_params.setdefault('dtype', self.dtype)
        self._v_layer = v_layer_cls(**v_layer_params)
        self._h_layer = h_layer_cls(**h_layer_params)

        self.W_init = W_init
        if hasattr(self.W_init, '__iter__'):
            self.W_init = np.asarray(self.W_init)
            assert_shape(self, 'W_init', (self.n_visible, self.n_hidden))

        # it is often helpful to initialize i-th visible bias to
        # logit(p_i) of the training-data marginal (Hinton's practical guide)
        self.vb_init = vb_init
        if hasattr(self.vb_init, '__iter__'):
            self.vb_init = np.asarray(self.vb_init)
            assert_len(self, 'vb_init', self.n_visible)

        self.hb_init = hb_init
        if hasattr(self.hb_init, '__iter__'):
            self.hb_init = np.asarray(self.hb_init)
            assert_len(self, 'hb_init', self.n_hidden)

        # set by `init_from`
        self._dW_init = None
        self._dvb_init = None
        self._dhb_init = None

        self.n_gibbs_steps = make_list_from(n_gibbs_steps)
        self.learning_rate = make_list_from(learning_rate)
        self.momentum = make_list_from(momentum)
        self.max_epoch = max_epoch
        self.batch_size = batch_size
        self.l2 = l2

        self.sample_h_states = sample_h_states
        self.sample_v_states = sample_v_states
        self.dropout = dropout

        self.sparsity_target = sparsity_target
        self.sparsity_cost = sparsity_cost
        self.sparsity_damping = sparsity_damping

        self.dbm_first = dbm_first
        self.dbm_last = dbm_last

        self.metrics_config = dict(metrics_config or {})
        self.metrics_config.setdefault('l2_loss', False)
        self.metrics_config.setdefault('msre', False)
        self.metrics_config.setdefault('pll', False)
        self.metrics_config.setdefault('feg', False)
        self.metrics_config.setdefault('l2_loss_fmt', '.2e')
        self.metrics_config.setdefault('msre_fmt', '.4f')
        self.metrics_config.setdefault('pll_fmt', '.3f')
        self.metrics_config.setdefault('feg_fmt', '.2f')
        self.metrics_config.setdefault('train_metrics_every_iter', 10)
        self.metrics_config.setdefault('val_metrics_every_epoch', 1)
        self.metrics_config.setdefault('feg_every_epoch', 2)
        self.metrics_config.setdefault('n_batches_for_feg', 10)
        self._train_metrics_names = ('l2_loss', 'msre', 'pll')
        self._val_metrics_names = ('msre', 'pll')

        self.verbose = verbose
        self.save_after_each_epoch = save_after_each_epoch
        # fetching the full state to the host for checkpoints/histograms
        # every epoch can dominate wall-clock on remote TPU backends; these
        # cadences thin that traffic (1 = the reference's every-epoch
        # behavior; fit() always saves the final state regardless)
        self.checkpoint_every_epoch = int(checkpoint_every_epoch)
        self.summaries_every_epoch = int(summaries_every_epoch)

        assert self.n_hidden >= display_filters
        self.display_filters = display_filters
        assert self.n_hidden >= display_hidden_activations
        self.display_hidden_activations = display_hidden_activations

        self.v_shape = tuple(v_shape)
        if len(self.v_shape) == 2:
            self.v_shape = (self.v_shape[0], self.v_shape[1], 1)

        # 'auto' picks the fused Pallas CD epoch kernel on TPU when the
        # model qualifies (Bernoulli-Bernoulli, float32, no dropout);
        # 'xla' forces the lax path; 'pallas' forces the kernel.
        assert kernel in ('auto', 'xla', 'pallas')
        self.kernel = kernel

        # current epoch and iteration
        self.epoch_ = 0
        self.iter_ = 0

        # device state pytree (None until first init/fit/load)
        self._state = None
        # cache of jitted programs, invalidated when hyperparams change
        self._programs = {}
        # optional device mesh for sharded execution (see set_mesh)
        self._mesh = None
        self._model_axis = None

    # ================================================================== #
    # state management                                                    #
    # ================================================================== #
    def _init_state(self):
        # params.json drops arrays >1e6 elements (base/base_model.py); after
        # load_model those live only in model.npz.  If we get here with a
        # None init, the npz restore never happened -- fail loudly instead
        # of crashing on float(None) below.
        for name in ('W_init', 'vb_init', 'hb_init'):
            if getattr(self, name) is None:
                raise RuntimeError(
                    '`{0}` is None: it was too large for params.json and '
                    'must be restored from the model.npz checkpoint '
                    '(missing or corrupt?) before initializing state'
                    .format(name))
        dtype = self._jnp_dtype
        key = self.make_prng_key()

        if hasattr(self.W_init, '__iter__'):
            W = jnp.asarray(self.W_init, dtype=dtype)
        else:
            W = float(self.W_init) * jax.random.normal(
                key, (self.n_visible, self.n_hidden), dtype=dtype)

        vb = (jnp.asarray(self.vb_init, dtype=dtype)
              if hasattr(self.vb_init, '__iter__')
              else jnp.full((self.n_visible,), float(self.vb_init), dtype=dtype))
        hb = (jnp.asarray(self.hb_init, dtype=dtype)
              if hasattr(self.hb_init, '__iter__')
              else jnp.full((self.n_hidden,), float(self.hb_init), dtype=dtype))

        dW = (jnp.asarray(self._dW_init, dtype=dtype) if self._dW_init is not None
              else jnp.zeros((self.n_visible, self.n_hidden), dtype=dtype))
        dvb = (jnp.asarray(self._dvb_init, dtype=dtype) if self._dvb_init is not None
               else jnp.zeros((self.n_visible,), dtype=dtype))
        dhb = (jnp.asarray(self._dhb_init, dtype=dtype) if self._dhb_init is not None
               else jnp.zeros((self.n_hidden,), dtype=dtype))

        self._state = {
            'W': W, 'vb': vb, 'hb': hb,
            'dW': dW, 'dvb': dvb, 'dhb': dhb,
            'q_means': jnp.zeros((self.n_hidden,), dtype=dtype),
        }

    def _ensure_state(self):
        if self._state is None:
            self._init_state()

    def _get_state_arrays(self, host_state=None):
        self._ensure_state()
        s = host_state if host_state is not None \
            else jax.device_get(self._state)
        return {
            'weights/W': s['W'], 'weights/vb': s['vb'], 'weights/hb': s['hb'],
            'grads_accumulators/dW': s['dW'],
            'grads_accumulators/dvb': s['dvb'],
            'grads_accumulators/dhb': s['dhb'],
            'hidden_activations_means/q_means': s['q_means'],
        }

    def _set_state_arrays(self, arrays):
        dtype = self._jnp_dtype
        self._state = {
            'W': jnp.asarray(arrays['weights/W'], dtype=dtype),
            'vb': jnp.asarray(arrays['weights/vb'], dtype=dtype),
            'hb': jnp.asarray(arrays['weights/hb'], dtype=dtype),
            'dW': jnp.asarray(arrays['grads_accumulators/dW'], dtype=dtype),
            'dvb': jnp.asarray(arrays['grads_accumulators/dvb'], dtype=dtype),
            'dhb': jnp.asarray(arrays['grads_accumulators/dhb'], dtype=dtype),
            'q_means': jnp.asarray(arrays['hidden_activations_means/q_means'],
                                   dtype=dtype),
        }

    def set_params(self, **params):
        self._programs = {}  # hyperparams may have changed -> rebuild programs
        return super(BaseRBM, self).set_params(**params)

    def set_mesh(self, mesh, data_axis='data', model_axis=None):
        """Attach a ``jax.sharding.Mesh``: training batches are sharded along
        `data_axis`; gradient statistics are reduced by XLA-inserted
        collectives over ICI.

        With `model_axis`, the weight matrix's hidden columns (and hidden
        biases / accumulators) are sharded along that axis -- tensor
        parallelism for the largest RBMs (e.g. the 3072x7800 CIFAR G-RBM)."""
        self._mesh = (mesh, data_axis)
        self._model_axis = model_axis
        self._programs = {}
        if model_axis is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._ensure_state()
            col = NamedSharding(mesh, P(None, model_axis))
            vec = NamedSharding(mesh, P(model_axis))
            for k in ('W', 'dW'):
                self._state[k] = jax.device_put(self._state[k], col)
            for k in ('hb', 'dhb', 'q_means'):
                self._state[k] = jax.device_put(self._state[k], vec)
        return self

    # ================================================================== #
    # pure ops (closures over static layer configs)                       #
    # ================================================================== #
    @property
    def _propup_multiplier(self):
        return 2. if self.dbm_first else 1.

    @property
    def _propdown_multiplier(self):
        return 2. if self.dbm_last else 1.

    def _means_h_given_v(self, state, v):
        m = self._propup_multiplier
        x = m * (v @ state['W'])
        return self._h_layer.activation(x, m * state['hb'])

    def _means_v_given_h(self, state, h):
        m = self._propdown_multiplier
        x = m * (h @ state['W'].T)
        return self._v_layer.activation(x, m * state['vb'])

    def _gibbs_chain(self, state, h_states, k, key):
        """Run `k` block-Gibbs steps starting from hidden states.

        `k` may be a traced scalar (per-epoch schedule); the loop is a
        ``lax.fori_loop`` whose body XLA compiles once.  Returns the final
        (v_states, v_means, h_states, h_means).
        """
        B = h_states.shape[0]
        dtype = h_states.dtype
        v0 = jnp.zeros((B, self.n_visible), dtype=dtype)

        def body(i, carry):
            _, _, h_st, _ = carry
            ki = jax.random.fold_in(key, i)
            kv, kh = jax.random.split(ki)
            v_means = self._means_v_given_h(state, h_st)
            v_st = (self._v_layer.sample(kv, v_means)
                    if self.sample_v_states else v_means)
            h_means = self._means_h_given_v(state, v_st)
            h_st = (self._h_layer.sample(kh, h_means)
                    if self.sample_h_states else h_means)
            return (v_st, v_means, h_st, h_means)

        carry = (v0, v0, h_states, jnp.zeros_like(h_states))
        return jax.lax.fori_loop(0, k, body, carry)

    def _maybe_dropout(self, key, X):
        """Reference applies dropout to the input placeholder graph-wide
        (base_rbm.py:417-418), so every consumer sees dropped inputs.

        Also the single widening point for f16-STAGED data: when the
        widened training set would not fit HBM (e.g. the 490k x 7800
        dbm_cifar M-RBM features: 7.65 GB f16 but 15.3 GB f32 on a 16 GB
        chip), `_put` keeps the staged array f16 and every program widens
        per-batch here -- f16 -> f32 is exact, so results are bitwise
        identical to staging wide."""
        X = X.astype(self._jnp_dtype)
        if self.dropout is None:
            return X
        keep = float(self.dropout)
        mask = jax.random.bernoulli(key, keep, X.shape)
        return jnp.where(mask, X / keep, jnp.zeros_like(X))

    def _cd_stats(self, state, X_batch, k, key):
        """CD-k sufficient statistics of one (shard of a) minibatch: the raw
        *sums* whose cross-shard ``psum`` equals the full-batch statistics.
        Returns (stats, aux); `_apply_cd_update(state, stats, N, ...)`
        completes the parameter update."""
        k_drop, k_h0, k_chain = jax.random.split(key, 3)
        X = self._maybe_dropout(k_drop, X_batch)

        h0_means = self._means_h_given_v(state, X)
        h0_samples = self._h_layer.sample(k_h0, h0_means)
        h_states = h0_samples if self.sample_h_states else h0_means

        v_states, v_means, _, h_means = self._gibbs_chain(state, h_states, k,
                                                          key=k_chain)
        stats = {
            'assoc': X.T @ h0_means - v_states.T @ h_means,
            'dvb_sum': jnp.sum(X - v_states, axis=0),
            'dhb_sum': jnp.sum(h0_means - h_means, axis=0),
            'h_sum': jnp.sum(h_means, axis=0),
        }
        aux = {'X': X, 'v_means': v_means}
        return stats, aux

    def _apply_cd_update(self, state, stats, N, lr, momentum,
                         col_mask=None):
        """Parameter update from (possibly psum-reduced) CD statistics:
        the reference momentum rule ``acc <- lr * (m * acc + grad);
        param += acc`` (base_rbm.py:465-474) with L2 on dW and the EMA
        sparsity penalty on summed hidden means (456-462).

        `col_mask` (0/1 over hidden columns) is set when the caller keeps
        its state lane-padded across a training scan: the sparsity
        penalty's ``-cost * target`` constant would otherwise drift the
        padded (exactly-zero) columns of hb/W."""
        dtype = state['W'].dtype
        N = jnp.asarray(N, dtype=dtype)
        l2 = jnp.asarray(self.l2, dtype=dtype)

        dW = stats['assoc'] / N - l2 * state['W']
        dvb = stats['dvb_sum'] / N
        dhb = stats['dhb_sum'] / N

        damping = jnp.asarray(self.sparsity_damping, dtype=dtype)
        q_new = damping * state['q_means'] + (1. - damping) * stats['h_sum']
        penalty = jnp.asarray(self.sparsity_cost, dtype=dtype) * \
            (q_new - jnp.asarray(self.sparsity_target, dtype=dtype))
        if col_mask is not None:
            penalty = penalty * col_mask
        dhb = dhb - penalty
        dW = dW - penalty  # broadcast over visible rows

        lr = jnp.asarray(lr, dtype=dtype)
        momentum = jnp.asarray(momentum, dtype=dtype)
        dW_acc = lr * (momentum * state['dW'] + dW)
        dvb_acc = lr * (momentum * state['dvb'] + dvb)
        dhb_acc = lr * (momentum * state['dhb'] + dhb)

        return {
            'W': state['W'] + dW_acc,
            'vb': state['vb'] + dvb_acc,
            'hb': state['hb'] + dhb_acc,
            'dW': dW_acc, 'dvb': dvb_acc, 'dhb': dhb_acc,
            'q_means': q_new,
        }

    def _cd_step(self, state, X_batch, lr, momentum, k, key):
        """One CD-k parameter update; returns (new_state, aux) where aux
        carries tensors needed by the metric branch."""
        stats, aux = self._cd_stats(state, X_batch, k, key)
        new_state = self._apply_cd_update(state, stats, X_batch.shape[0],
                                          lr, momentum)
        return new_state, aux

    def _pll(self, state, X, key):
        """Pseudo-log-likelihood proxy: corrupt one random unit per sample,
        PLL = n_visible * log_sigmoid(FE(x~) - FE(x)) with batch-mean free
        energies (base_rbm.py:496-513)."""
        B = X.shape[0]
        idx = jax.random.randint(key, (B,), 0, self.n_visible)
        rows = jnp.arange(B)
        flipped = X.at[rows, idx].set(1. - X[rows, idx])
        fe_x = self._free_energy(state, X, jax.random.fold_in(key, 1))
        fe_flipped = self._free_energy(state, flipped, jax.random.fold_in(key, 2))
        return jnp.asarray(self.n_visible, X.dtype) * \
            jax.nn.log_sigmoid(fe_flipped - fe_x)

    def _metrics(self, state, X, v_means, key):
        dtype = X.dtype
        out = {}
        out['msre'] = jnp.mean(jnp.square(X - v_means))
        out['pll'] = (self._pll(state, X, key) if self.metrics_config['pll']
                      else jnp.zeros((), dtype))
        out['l2_loss'] = jnp.asarray(self.l2, dtype) * 0.5 * jnp.sum(jnp.square(state['W']))
        return out

    # ================================================================== #
    # jitted programs                                                     #
    # ================================================================== #
    def _program(self, name, builder):
        if name not in self._programs:
            self._programs[name] = builder()
        return self._programs[name]

    def _train_epoch_program(self):
        every = int(self.metrics_config['train_metrics_every_iter'])

        def epoch_fn(state, X_batches, lr, momentum, k, key, iter0):
            def scan_body(carry, X_batch):
                state, it = carry
                it = it + 1
                step_key = jax.random.fold_in(key, it)
                new_state, aux = self._cd_step(state, X_batch, lr, momentum, k, step_key)
                want = (it % every) == 0

                def metric_branch(_):
                    m = self._metrics(new_state, aux['X'], aux['v_means'],
                                      jax.random.fold_in(step_key, 7))
                    return (m['msre'], m['pll'], m['l2_loss'],
                            jnp.ones((), jnp.bool_))

                def zero_branch(_):
                    z = jnp.zeros((), aux['X'].dtype)
                    return (z, z, z, jnp.zeros((), jnp.bool_))

                metrics = jax.lax.cond(want, metric_branch, zero_branch, None)
                return (new_state, it), metrics

            (state, it), stacked = jax.lax.scan(scan_body, (state, iter0), X_batches)
            return state, it, stacked

        return jax.jit(epoch_fn)

    def _train_step_program(self):
        """Single-step program for the remainder (partial) batch."""
        every = int(self.metrics_config['train_metrics_every_iter'])

        def step_fn(state, X_batch, lr, momentum, k, key, it):
            step_key = jax.random.fold_in(key, it)
            new_state, aux = self._cd_step(state, X_batch, lr, momentum, k, step_key)
            want = (it % every) == 0

            def metric_branch(_):
                m = self._metrics(new_state, aux['X'], aux['v_means'],
                                  jax.random.fold_in(step_key, 7))
                return (m['msre'], m['pll'], m['l2_loss'], jnp.ones((), jnp.bool_))

            def zero_branch(_):
                z = jnp.zeros((), aux['X'].dtype)
                return (z, z, z, jnp.zeros((), jnp.bool_))

            metrics = jax.lax.cond(want, metric_branch, zero_branch, None)
            return new_state, metrics

        return jax.jit(step_fn)

    # ------------------- sharded (shard_map) epoch --------------------- #
    def _shardmap_eligible(self):
        """Mesh-sharded training runs the explicit-collective shard_map
        epoch (per-shard CD statistics + psum + replicated update) unless
        the user forced kernel='xla', the weights are tensor-parallel, or
        the batch does not divide the data axis.  On TPU the per-shard
        statistics use the fused Pallas stats kernel; elsewhere the lax
        body -- the collective structure is identical, which is what the
        CPU-mesh tests exercise."""
        if self._mesh is None or self.kernel == 'xla':
            return False
        if self._model_axis is not None:
            return False  # tensor-parallel W stays on the GSPMD path
        mesh, axis = self._mesh
        if self.batch_size % mesh.shape[axis]:
            return False
        # parameters sharded by hand (device_put, bypassing set_mesh's
        # model_axis) must also stay on the GSPMD path -- the shard_map
        # epoch declares them replicated and would all-gather them
        from ..parallel import fully_replicated
        if self._state is not None and not all(
                fully_replicated(self._state[k])
                for k in ('W', 'vb', 'hb', 'dW', 'dvb', 'dhb', 'q_means')):
            return False
        return True

    def _pallas_stats_eligible(self, local_batch):
        """'resident' (W + assoc VMEM-resident), 'tiled' (W HBM-streamed
        through (V, tile) buffers -- big models, e.g. the 3072x7800 CIFAR
        G-RBM on a mesh), or None (fall back to the lax stats body).

        BMT_FORCE_PALLAS_STATS=resident|tiled overrides the backend and
        VMEM checks (the layer-type constraints still apply): on a
        non-TPU backend the kernels then run in interpret mode, which is
        how the CPU-mesh tests and `dryrun_multichip` exercise
        tiled-stats + psum + update as ONE shard_map program."""
        from ..layers import BernoulliLayer
        forced = os.environ.get('BMT_FORCE_PALLAS_STATS', '')
        if forced not in ('resident', 'tiled'):
            forced = None
        if self.kernel == 'xla' or \
                (forced is None and jax.default_backend() != 'tpu'):
            return None
        kind, _ = self._pallas_visible_kind()
        if kind is None or not isinstance(self._h_layer, BernoulliLayer):
            return None
        if self.dtype != 'float32' or self.dropout is not None:
            return None
        if forced is not None:
            return forced
        # VMEM: W + assoc (V,H each) + the local batch tile + ~6
        # batch-sized intermediates
        vmem = (2 * self.n_visible * self.n_hidden * 4
                + local_batch * (3 * self.n_visible + 6 * self.n_hidden) * 4)
        if vmem <= 96 * 1024 * 1024:
            return 'resident'
        tile = 512
        # the kernel pads H up to a lane multiple and keeps small extra
        # buffers (hb/dhb/hsum rows, output tiles); estimate with the
        # PADDED H so the 10 MB headroom vs the kernel's 110 MB
        # vmem_limit_bytes stays honest (advisor round 4)
        h_pad = ((self.n_hidden + 127) // 128) * 128
        scratch = (4 * self.n_visible * tile * 4
                   + local_batch * (4 * self.n_visible + 3 * h_pad) * 4)
        if scratch <= 100 * 1024 * 1024:
            return 'tiled'
        return None

    def _shardmap_epoch_core(self, k):
        """One training epoch over a data-parallel mesh as a shard_map
        program: each shard computes CD-k sufficient statistics
        for its rows of every minibatch (fused Pallas stats kernel on TPU,
        lax elsewhere), the statistics are psum-reduced over ICI, and every
        shard applies the identical parameter update -- the state stays
        replicated without ever gathering the batch.  Semantics match the
        single-device XLA epoch with global-batch statistics
        (reference base_rbm.py:415-479)."""
        from jax.sharding import PartitionSpec as P
        mesh, axis = self._mesh
        nsh = mesh.shape[axis]
        every = int(self.metrics_config['train_metrics_every_iter'])
        N_global = self.batch_size
        V = self.n_visible
        want_pll = bool(self.metrics_config['pll'])
        dtype = self._jnp_dtype

        stats_fn = None
        stats_mode = self._pallas_stats_eligible(N_global // nsh)
        if stats_mode is not None:
            from ..ops.pallas_ops import (make_cd_stats_kernel,
                                          make_tiled_cd_stats_kernel)
            kind, sigma = self._pallas_visible_kind()
            maker = (make_cd_stats_kernel if stats_mode == 'resident'
                     else make_tiled_cd_stats_kernel)
            extra = {}
            if stats_mode == 'resident':
                extra['sub_tiles'] = self._cd_sub_tiles(
                    self._pallas_hidden_kind()[0], N_global // nsh)
            stats_fn = maker(
                V, self.n_hidden, N_global // nsh, k,
                sample_v_states=self.sample_v_states,
                sample_h_states=self.sample_h_states,
                propup_mult=self._propup_multiplier,
                propdown_mult=self._propdown_multiplier,
                visible=kind, sigma=sigma,
                # forced eligibility on a non-TPU backend (CPU-mesh tests,
                # dryrun_multichip) runs the kernel in interpret mode
                interpret=(jax.default_backend() != 'tpu'), **extra)

        # metrics that can never fire (cadence beyond any real run) are
        # compiled OUT: no per-step cond, no key folds the stats kernel
        # does not consume -- the hot loop is stats + psum + update only
        metrics_off = every >= 10 ** 8

        # tiled-stats models keep their state lane-padded across the whole
        # epoch (pad once on entry, slice once on exit): the stats wrapper
        # would otherwise materialize a padded-W copy plus an assoc slice
        # copy EVERY training step -- ~4 extra W-sized HBM passes on a path
        # whose whole point is W-traffic economy.  The kernel masks
        # pad-column statistics to exactly zero and `col_mask` masks the
        # sparsity penalty's -cost*target constant, so the padded columns
        # of W/hb and their accumulators stay exactly zero.
        H_real = self.n_hidden
        pad_n = 0
        if stats_fn is not None and stats_mode == 'tiled':
            pad_n = int(stats_fn.padded_hidden) - H_real
        col_mask = ((jnp.arange(H_real + pad_n) < H_real).astype(dtype)
                    if pad_n else None)

        def _pad_state(st):
            if not pad_n:
                return st
            pc2 = lambda a: jnp.pad(a, ((0, 0), (0, pad_n)))
            pc1 = lambda a: jnp.pad(a, (0, pad_n))
            return dict(st, W=pc2(st['W']), dW=pc2(st['dW']),
                        hb=pc1(st['hb']), dhb=pc1(st['dhb']),
                        q_means=pc1(st['q_means']))

        def _unpad_state(st):
            if not pad_n:
                return st
            return dict(st, W=st['W'][:, :H_real], dW=st['dW'][:, :H_real],
                        hb=st['hb'][:H_real], dhb=st['dhb'][:H_real],
                        q_means=st['q_means'][:H_real])

        def epoch_fn(state, X_batches, lr, momentum, k_unused, key, iter0):
            state = _pad_state(state)
            my = jax.lax.axis_index(axis)
            seed32 = jax.random.randint(jax.random.fold_in(key, 987654321),
                                        (), 0, 2 ** 31 - 1)

            def step_key_for(it):
                return jax.random.fold_in(jax.random.fold_in(key, it), my)

            def scan_body(carry, X_batch):
                state, it = carry
                it = it + 1
                if stats_fn is not None:
                    stats, aux = stats_fn(state, X_batch, seed32, it, my)
                else:
                    stats, aux = self._cd_stats(state, X_batch, k,
                                                step_key_for(it))
                stats = jax.lax.psum(stats, axis)
                new_state = self._apply_cd_update(state, stats, N_global,
                                                  lr, momentum,
                                                  col_mask=col_mask)
                if metrics_off:
                    return (new_state, it), ()

                want = (it % every) == 0

                def metric_branch(_):
                    # LOCAL parts only; the cross-shard reductions are
                    # batched into one vector psum/pmean after the scan, so
                    # the hot loop carries no per-step metric collectives
                    sq = jnp.sum(jnp.square(aux['X'] - aux['v_means']))
                    if want_pll:
                        # free energy on REAL columns only: each padded
                        # hidden unit would add softplus(0) to both terms
                        # (cancels in the PLL difference, but keep the
                        # logged energies exact)
                        fe_state = _unpad_state(new_state)
                        mk = jax.random.fold_in(step_key_for(it), 7)
                        B = aux['X'].shape[0]
                        idx = jax.random.randint(mk, (B,), 0, V)
                        rows = jnp.arange(B)
                        flipped = aux['X'].at[rows, idx].set(
                            1. - aux['X'][rows, idx])
                        fe_x = self._free_energy(fe_state, aux['X'],
                                                 jax.random.fold_in(mk, 1))
                        fe_f = self._free_energy(fe_state, flipped,
                                                 jax.random.fold_in(mk, 2))
                    else:
                        fe_x = fe_f = jnp.zeros((), dtype)
                    l2c = jnp.asarray(self.l2, dtype) * 0.5 * \
                        jnp.sum(jnp.square(new_state['W']))
                    return (sq, fe_x, fe_f, l2c, jnp.ones((), jnp.bool_))

                def zero_branch(_):
                    z = jnp.zeros((), dtype)
                    return (z, z, z, z, jnp.zeros((), jnp.bool_))

                sq, fe_x, fe_f, l2c, flag = jax.lax.cond(
                    want, metric_branch, zero_branch, None)
                return (new_state, it), (sq, fe_x, fe_f, l2c, flag)

            (state, it), stacked = jax.lax.scan(scan_body, (state, iter0),
                                                X_batches)
            state = _unpad_state(state)
            if metrics_off:
                nb = X_batches.shape[0]
                z = jnp.zeros((nb,), dtype)
                return state, it, (z, z, z, jnp.zeros((nb,), jnp.bool_))
            sq_v, fe_x_v, fe_f_v, l2c_v, flags = stacked
            # batched metric reductions: ONE (n_batches,)-vector psum per
            # epoch instead of a scalar collective per training step
            msre_v = jax.lax.psum(sq_v, axis) / \
                jnp.asarray(N_global * V, dtype)
            if want_pll:
                # _pll semantics: batch-MEAN free energies (equal-sized
                # shards, so pmean of local means is the global mean)
                fe_x_v = jax.lax.pmean(fe_x_v, axis)
                fe_f_v = jax.lax.pmean(fe_f_v, axis)
                pll_v = jnp.where(
                    flags,
                    jnp.asarray(V, dtype) * jax.nn.log_sigmoid(fe_f_v -
                                                               fe_x_v),
                    jnp.zeros((), dtype))
            else:
                pll_v = jnp.zeros_like(msre_v)
            return state, it, (msre_v, pll_v, l2c_v, flags)

        sm = jax.shard_map(
            epoch_fn, mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), (P(), P(), P(), P())),
            check_vma=False)
        return sm

    def _shardmap_epoch_program(self, k):
        """One jitted dispatch of the shard_map epoch (see
        `_shardmap_epoch_core` for the program semantics).

        NO buffer donation: donating the state into the sharded scan was
        measured at +14.7 us/step (63%!) on v5e -- aliasing the outputs
        into the donated inputs defeats the scan's double buffering --
        and the state is threaded through the fit loop anyway, so the
        only cost of not donating is one transient extra state copy."""
        return jax.jit(self._shardmap_epoch_core(k))

    def _shardmap_block_program(self, k, use_val, use_feg):
        """E epochs of mesh-sharded training in one jitted dispatch: the
        shard_map epoch (per-shard stats + psum + replicated update) runs
        once per scanned epoch; the GSPMD remainder step and the
        in-program val/FEG metrics wrap around it.  Key folds match the
        per-epoch mesh loop exactly, so multi-chip training pays one host
        interaction per block instead of several per epoch."""
        sm = self._shardmap_epoch_core(k)
        every = int(self.metrics_config['train_metrics_every_iter'])

        def block_fn(state, full, rem, val_full, val_rem, lrs, moms,
                     ks_unused, key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, _, e = xs
                ekey = jax.random.fold_in(key, e)
                state, it, stacked = sm(state, full, lr, mom,
                                        jnp.zeros((), jnp.int32), ekey, it)
                parts = tuple(stacked[:3])
                if rem is not None:
                    it = it + 1
                    step_key = jax.random.fold_in(ekey, it)
                    state, aux = self._cd_step(state, rem, lr, mom, k,
                                               step_key)
                    want = (it % every) == 0

                    def metric_branch(_):
                        m = self._metrics(state, aux['X'], aux['v_means'],
                                          jax.random.fold_in(step_key, 7))
                        return m['msre'], m['pll'], m['l2_loss']

                    def zero_branch(_):
                        z = jnp.zeros((), aux['X'].dtype)
                        return z, z, z

                    parts = parts + jax.lax.cond(want, metric_branch,
                                                 zero_branch, None)
                outs = self._block_valfeg({'train': parts}, state, e, key,
                                          full, rem, val_full, val_rem, k,
                                          use_val, use_feg)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, ks_unused, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _val_metrics_program(self):
        def val_fn(state, X_batches, k, key):
            def scan_body(i, X_batch):
                step_key = jax.random.fold_in(key, i)
                kd, kc, kp = jax.random.split(step_key, 3)
                X = self._maybe_dropout(kd, X_batch)
                h0_means = self._means_h_given_v(state, X)
                h0_samples = self._h_layer.sample(kc, h0_means)
                h_states = h0_samples if self.sample_h_states else h0_means
                _, v_means, _, _ = self._gibbs_chain(state, h_states, k,
                                                     key=jax.random.fold_in(kc, 1))
                msre = jnp.mean(jnp.square(X - v_means))
                pll = (self._pll(state, X, kp) if self.metrics_config['pll']
                       else jnp.zeros((), X.dtype))
                return i + 1, (msre, pll)

            _, stacked = jax.lax.scan(scan_body, 0, X_batches)
            return stacked

        return jax.jit(val_fn)

    def _free_energy_program(self):
        def fe_fn(state, X_batches, key):
            def scan_body(i, X_batch):
                ki = jax.random.fold_in(key, i)
                kd, kf = jax.random.split(ki)
                X = self._maybe_dropout(kd, X_batch)
                return i + 1, self._free_energy(state, X, kf)
            _, fes = jax.lax.scan(scan_body, 0, X_batches)
            return fes
        return jax.jit(fe_fn)

    def _transform_one(self, state, X_batch, k, key):
        kd, kh, kc = jax.random.split(key, 3)
        X = self._maybe_dropout(kd, X_batch)
        h0_means = self._means_h_given_v(state, X)
        h0_samples = self._h_layer.sample(kh, h0_means)
        h_states = h0_samples if self.sample_h_states else h0_means
        _, _, _, h_means = self._gibbs_chain(state, h_states, k, key=kc)
        return h_means

    def _transform_program(self):
        return jax.jit(self._transform_one)

    def _transform_scan_program(self):
        """All full batches in one dispatch (python-loop dispatch costs
        ~ms each on remote TPU backends).  `i0` offsets the per-batch key
        folds so a chunked transform (big feature maps, see `transform`)
        is bitwise-identical to the single-scan dispatch."""
        def fn(state, X_batches, k, key, i0):
            def body(i, X_batch):
                return i + 1, self._transform_one(
                    state, X_batch, k, jax.random.fold_in(key, i))
            _, H = jax.lax.scan(body, i0, X_batches)
            return H
        return jax.jit(fn)

    # ---------------------------- pallas fast path -------------------- #
    def _pallas_visible_kind(self):
        """('bernoulli'|'gaussian'|None, sigma) for the fused kernel."""
        from ..layers import BernoulliLayer, GaussianLayer
        if isinstance(self._v_layer, BernoulliLayer):
            return 'bernoulli', None
        if isinstance(self._v_layer, GaussianLayer):
            return 'gaussian', np.broadcast_to(
                np.asarray(self._v_layer.sigma, np.float32).reshape(1, -1)
                if np.ndim(self._v_layer.sigma) else
                np.float32(self._v_layer.sigma), (1, self.n_visible))
        return None, None

    def _pallas_hidden_kind(self):
        """('bernoulli'|'multinomial'|None, n_samples) for the fused
        kernel."""
        from ..layers import BernoulliLayer, MultinomialLayer
        if isinstance(self._h_layer, BernoulliLayer):
            return 'bernoulli', None
        if isinstance(self._h_layer, MultinomialLayer):
            return 'multinomial', int(self._h_layer.n_samples)
        return None, None

    def _pallas_eligible(self):
        """The fused CD-epoch kernel covers sigmoid- or multinomial-hidden
        RBMs with Bernoulli or fixed-sigma Gaussian visible units, in
        float32 without dropout on a real TPU (single chip), including
        PLL logging for every flavour (the kernel evaluates the
        per-flavour free energies in-VMEM)."""
        if self.kernel == 'xla':
            return False
        # a single-device mesh needs no collectives -- keep the (much
        # faster) whole-epoch kernel; real multi-chip goes through the
        # shard_map epoch (per-shard stats kernel + psum)
        single_dev = self._mesh is None or \
            (self._mesh[0].size == 1 and self._model_axis is None)
        kind, _ = self._pallas_visible_kind()
        hid, _ = self._pallas_hidden_kind()
        ok = (kind is not None and hid is not None
              and self.dtype == 'float32'
              and self.dropout is None
              and single_dev
              and jax.default_backend() == 'tpu')
        if self.kernel == 'pallas' and not ok:
            raise ValueError('kernel="pallas" requested but the model is '
                             'not eligible for the fused CD epoch kernel')
        return ok

    def _cd_sub_tiles(self, hid, batch_size=None):
        """Batch sub-tiling factor for the fused CD epoch/stats kernels.

        ``BMT_CD_SUBTILES`` overrides (any divisor of the batch size --
        the per-shard local batch on the mesh path); unset/0 means auto.
        Auto keeps 1 unless measurement recorded in RESULTS.md shows
        stage-major sub-tiling beating the monolithic chain for a shape
        class.
        """
        b = self.batch_size if batch_size is None else int(batch_size)
        raw = int(os.environ.get('BMT_CD_SUBTILES', '0') or 0)
        if raw >= 1:
            return raw if b % raw == 0 else 1
        return 1

    def _pallas_epoch_program(self, k, n_batches):
        from ..ops.pallas_ops import (make_cd_epoch_kernel,
                                      make_tiled_cd_epoch_kernel)
        kind, sigma = self._pallas_visible_kind()
        hid, n_samples = self._pallas_hidden_kind()
        common = dict(
            sample_v_states=self.sample_v_states,
            sample_h_states=self.sample_h_states,
            propup_mult=self._propup_multiplier,
            propdown_mult=self._propdown_multiplier,
            l2=float(self.l2), sparsity_target=float(self.sparsity_target),
            sparsity_cost=float(self.sparsity_cost),
            sparsity_damping=float(self.sparsity_damping),
            metrics_every=int(self.metrics_config['train_metrics_every_iter']),
            visible=kind, sigma=sigma)

        # VMEM budget of the all-resident kernel: W + dW for the whole
        # epoch, plus the batch tile, ~5 batch-sized intermediates, and
        # per-batch metric rows.  Multinomial hidden adds the two (H, H)
        # iota matrices of the in-kernel sampler.
        vmem = (2 * self.n_visible * self.n_hidden * 4
                + self.batch_size * (2 * self.n_visible + 5 * self.n_hidden) * 4
                + n_batches * 1024
                + 12 * (self.n_visible + self.n_hidden) * 4)
        if hid == 'multinomial':
            vmem += 2 * self.n_hidden * self.n_hidden * 4 \
                + self.batch_size * self.n_hidden * 4
        # Mosaic's scoped-VMEM allocation runs well above this naive sum
        # for the multinomial-PLL variant (the PLL block instantiates its
        # own triangular/shift matrices plus flip temporaries, and the
        # allocator double-buffers across the metric branch): measured
        # 114.7 MiB scoped vs 55 MiB naive at the reference M-RBM stage
        # shape (5000x1000, batch 100), which compile-OOMed under the old
        # 100 MiB kernel cap.  The kernel cap is now 120 MiB
        # (ops/pallas_ops.py); gate multinomial-with-PLL configs at the
        # naive budget that calibration point maps to, so bigger configs
        # fall back to XLA instead of failing AOT compilation.
        budget = (58 if (hid == 'multinomial'
                         and self.metrics_config['pll'])
                  else 96) * 1024 * 1024
        if vmem <= budget:
            return make_cd_epoch_kernel(
                self.n_visible, self.n_hidden, self.batch_size, k,
                compute_pll=bool(self.metrics_config['pll']),
                hidden=hid, n_samples=n_samples,
                sub_tiles=self._cd_sub_tiles(hid), **common)

        # big-model fallback: hidden-tiled kernel with W/dW streamed from
        # HBM (no PLL stream -- keep XLA when PLL logging is requested;
        # multinomial needs whole softmax rows, so no tiled variant)
        if self.metrics_config['pll'] or hid == 'multinomial':
            return None
        tile = 1024
        scratch = (4 * self.n_visible * tile * 4
                   + 3 * self.batch_size * self.n_hidden * 4
                   + 3 * self.batch_size * self.n_visible * 4
                   + n_batches * 512)
        if scratch > 100 * 1024 * 1024:
            return None
        return make_tiled_cd_epoch_kernel(
            self.n_visible, self.n_hidden, self.batch_size, k,
            tile=tile, **common)

    def _train_epoch_pallas(self, step_prog, full, rem, base_key):
        lr = float(schedule_value(self.learning_rate, self.epoch_))
        mom = float(schedule_value(self.momentum, self.epoch_))
        k = int(schedule_value(self.n_gibbs_steps, self.epoch_))
        ekey = jax.random.fold_in(base_key, self.epoch_)
        # host-cached seed (bitwise-identical to the per-epoch randint,
        # computed for all epochs in ONE dispatch -- see _epoch_seed)
        seed = self._epoch_seed(base_key, self.epoch_)

        iter0 = self.iter_
        n_full = int(full.shape[0])
        parts = []
        if n_full > 0:
            prog = self._program(
                ('pallas_epoch', k, n_full),
                lambda: self._pallas_epoch_program(k, n_full))
            if prog is None:
                return None  # caller falls back to the XLA path
            self._state, msre_s, pll_s, l2_s = prog(self._state, full, lr,
                                                    mom, seed, iter0)
            self.iter_ += n_full
            parts = [msre_s, pll_s, l2_s]
        else:
            # zero full batches: the kernel's grid-step-0 state DMA would
            # never run -- only the remainder step below trains
            n_full = 0
        iters = iter0 + 1 + np.arange(n_full)

        if rem is not None:
            self.iter_ += 1
            self._state, m = step_prog(self._state, rem, lr, mom, k, ekey,
                                       self.iter_)
            if not parts:
                parts = [np.zeros((0,), np.float32)] * 3
            parts += list(m[:3])
            iters = np.append(iters, self.iter_)
        mask = (iters % self.metrics_config['train_metrics_every_iter']) == 0
        return {'parts': parts, 'mask': mask, 'n_full': n_full}

    # ================================================================== #
    # data staging                                                        #
    # ================================================================== #
    def _preprocess(self, X):
        """Input hook (GaussianRBM divides by sigma, rbm.py:101-107).

        float16 inputs to a float32 model stay narrow on the host: the
        exact f16->f32 widening happens on device during staging
        (`_put` -> `JAXModel._device_upload`), skipping the 2x-larger host
        copy and halving the upload -- bitwise-identical results."""
        X = np.asarray(X)
        if X.dtype == np.float16 and self._np_dtype == np.float32:
            return X
        return np.asarray(X, dtype=self._np_dtype)

    def _stage_batches(self, X):
        """Split X into (full_batches, remainder) device arrays; shard the
        batch axis over the mesh if one is attached."""
        X = self._preprocess(X)
        B = self.batch_size
        n_full = len(X) // B
        full = X[:n_full * B].reshape(n_full, B, self.n_visible)
        rem = X[n_full * B:]
        full = self._put(full, batched=True)
        rem = self._put(rem) if len(rem) else None
        return full, rem, n_full

    def _put(self, X, batched=False):
        if self._mesh is None:
            if getattr(X, 'dtype', None) == np.float16 \
                    and self._np_dtype == np.float32:
                X = np.ascontiguousarray(X)
                widen_max = float(os.environ.get(
                    'BMT_STAGE_WIDEN_MAX_GB', '8')) * 1e9
                if X.nbytes * 2 > widen_max:
                    # widened array would not fit HBM alongside the run's
                    # working set -- keep the staged data f16 on device;
                    # every program widens per-batch in _maybe_dropout
                    # (exact), and the fused epoch kernels decline
                    return self._device_upload(X, cast=False)
                return self._device_upload(X)
            X = np.asarray(X)
            if X.nbytes > (int(os.environ.get('BMT_STAGE_SLAB_MB', '256'))
                           << 20):
                # slab-staged upload: one multi-GB device_put crashes the
                # tunneled worker (see JAXModel._device_upload)
                return self._device_upload(X)
            return jnp.asarray(X, dtype=self._jnp_dtype)
        X = jnp.asarray(X, dtype=self._jnp_dtype)
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh, axis = self._mesh
        n_shards = mesh.shape[axis]
        if batched:
            spec = P(None, axis, None) if X.shape[1] % n_shards == 0 \
                else P()
        else:
            # remainder batches have data-dependent row counts; replicate
            # when they do not divide the data axis
            spec = P(axis, None) if X.shape[0] % n_shards == 0 else P()
        return jax.device_put(X, NamedSharding(mesh, spec))

    # ================================================================== #
    # fit / metrics loops                                                 #
    # ================================================================== #
    def _train_epoch(self, epoch_prog, step_prog, full, rem, base_key):
        """Dispatch one training epoch; returns a PENDING metrics record
        (device arrays + host-side log mask) without fetching -- the
        device->host readbacks run on the async epoch pipeline so the
        training thread never blocks on the link (each blocking fetch
        costs a round trip on remote-attached TPUs)."""
        lr = float(schedule_value(self.learning_rate, self.epoch_))
        mom = float(schedule_value(self.momentum, self.epoch_))
        k = int(schedule_value(self.n_gibbs_steps, self.epoch_))
        ekey = jax.random.fold_in(base_key, self.epoch_)

        iter0 = self.iter_
        self._state, it, stacked = epoch_prog(
            self._state, full, lr, mom, k, ekey, iter0)
        # the scan increments exactly once per full batch -- no need to
        # fetch `it` (a blocking scalar readback)
        self.iter_ += int(full.shape[0])

        parts = list(stacked[:3])  # msre, pll, l2 device arrays
        iters = iter0 + 1 + np.arange(int(full.shape[0]))
        if rem is not None:
            self.iter_ += 1
            self._state, m = step_prog(self._state, rem, lr, mom, k, ekey,
                                       self.iter_)
            parts += list(m[:3])
            iters = np.append(iters, self.iter_)
        mask = (iters % self.metrics_config['train_metrics_every_iter']) == 0
        return {'parts': parts, 'mask': mask,
                'n_full': int(full.shape[0])}

    def _reduce_train_metrics(self, fetched, mask, n):
        """Reduce already-fetched epoch metric arrays to the results dict."""
        cols = []
        for i in range(3):  # msre, pll, l2: epoch array (+ remainder scalar)
            col = np.asarray(fetched[i]).reshape(-1)[:n]
            if len(fetched) > 3:
                col = np.append(col, np.asarray(fetched[3 + i]))
            cols.append(col)
        results = {}
        if self.metrics_config['msre']:
            results['msre'] = float(cols[0][mask].mean())
        if self.metrics_config['pll']:
            results['pll'] = float(cols[1][mask].mean())
        if self.metrics_config['l2_loss']:
            results['l2_loss'] = float(cols[2][mask].mean())
        return results

    def _dispatch_val_metrics(self, staged_val):
        """Dispatch (without fetching) the validation metric programs."""
        prog = self._program('val', self._val_metrics_program)
        k = int(schedule_value(self.n_gibbs_steps, self.epoch_))
        key = jax.random.fold_in(self._fit_key, 100000 + self.epoch_)
        full, rem, _ = staged_val
        pending = []
        if full.shape[0]:
            pending += list(prog(self._state, full, k, key))
        if rem is not None:
            pending += list(prog(self._state, rem[None, ...], k,
                                 jax.random.fold_in(key, 1)))
        return pending

    def _reduce_val_metrics(self, fetched):
        # alternating (msre, pll) pairs
        msres = np.concatenate([np.atleast_1d(np.asarray(f))
                                for f in fetched[::2]])
        plls = np.concatenate([np.atleast_1d(np.asarray(f))
                               for f in fetched[1::2]])
        results = {}
        if self.metrics_config['msre']:
            results['msre'] = float(np.mean(msres))
        if self.metrics_config['pll']:
            results['pll'] = float(np.mean(plls))
        return results

    def _dispatch_feg(self, staged_train, staged_val):
        """Free-energy gap between a fixed number of train and validation
        batches -- an overfitting monitor (base_rbm.py:592-621).  Both sets
        are pre-staged device arrays; each side is ONE scan dispatch (the
        per-batch python loop used to dominate epoch wall-clock on remote
        backends)."""
        prog = self._program('fe', self._free_energy_program)
        n = self.metrics_config['n_batches_for_feg']
        key = jax.random.fold_in(self._fit_key, 200000 + self.epoch_)

        def fe_parts(staged, key):
            """Dispatch (without fetching) this side's free-energy arrays."""
            full, rem, n_full = staged
            parts = []
            nb = min(n, int(full.shape[0]))
            if nb:
                parts.append(prog(self._state, full[:nb], key))
            if nb < n and rem is not None:
                parts.append(prog(self._state, rem[None, ...],
                                  jax.random.fold_in(key, 999))[:1])
            return parts

        val_parts = fe_parts(staged_val, jax.random.fold_in(key, 1))
        train_parts = fe_parts(staged_train, jax.random.fold_in(key, 0))
        return val_parts + train_parts, len(val_parts)

    @staticmethod
    def _reduce_feg(fetched, nv):
        val_fe = np.mean(np.concatenate(
            [np.asarray(f).ravel() for f in fetched[:nv]]))
        train_fe = np.mean(np.concatenate(
            [np.asarray(f).ravel() for f in fetched[nv:]]))
        return val_fe - train_fe

    # ------------------- epoch-block training programs ----------------- #
    #
    # On remote-attached TPUs every per-epoch host interaction -- program
    # dispatch, argument upload, metric readback -- costs up to a link
    # round trip.  The epoch-block program folds E WHOLE EPOCHS (training
    # scan + remainder step + validation metrics + free-energy gap, the
    # latter two under `lax.cond` at their epoch cadences) into ONE jitted
    # dispatch returning stacked per-epoch metrics, so the host touches
    # the link once per block instead of several times per epoch.  The
    # per-epoch PRNG derivation (fold_in(fit_key, epoch) / fold_in(.,
    # 100000+epoch) / fold_in(., 200000+epoch)) is reproduced exactly, so
    # trajectories and metric streams are bitwise-identical to the
    # per-epoch path (asserted by tests/test_rbm.py).
    def _epoch_core_xla(self, state, it, full, rem, lr, mom, k, ekey):
        """One epoch's device computation: scan over the full batches plus
        the remainder step.  Returns (state, it, parts) where parts is
        (msre, pll, l2) arrays of shape (n_full,) followed, when a
        remainder batch exists, by the remainder step's three scalars.
        Fold chain matches `_train_epoch_program` + `_train_step_program`."""
        every = int(self.metrics_config['train_metrics_every_iter'])

        def step_metrics(new_state, aux, step_key, it):
            want = (it % every) == 0

            def metric_branch(_):
                m = self._metrics(new_state, aux['X'], aux['v_means'],
                                  jax.random.fold_in(step_key, 7))
                return (m['msre'], m['pll'], m['l2_loss'],
                        jnp.ones((), jnp.bool_))

            def zero_branch(_):
                z = jnp.zeros((), aux['X'].dtype)
                return (z, z, z, jnp.zeros((), jnp.bool_))

            return jax.lax.cond(want, metric_branch, zero_branch, None)

        def scan_body(carry, X_batch):
            state, it = carry
            it = it + 1
            step_key = jax.random.fold_in(ekey, it)
            new_state, aux = self._cd_step(state, X_batch, lr, mom, k,
                                           step_key)
            return (new_state, it), step_metrics(new_state, aux, step_key, it)

        (state, it), stacked = jax.lax.scan(scan_body, (state, it), full)
        parts = list(stacked[:3])
        if rem is not None:
            it = it + 1
            step_key = jax.random.fold_in(ekey, it)
            state, aux = self._cd_step(state, rem, lr, mom, k, step_key)
            m = step_metrics(state, aux, step_key, it)
            parts += list(m[:3])
        return state, it, tuple(parts)

    def _val_core(self, state, val_full, val_rem, k, vkey):
        """Validation msre/pll over the staged val set; fold chain matches
        `_dispatch_val_metrics` (`fold_in(vkey, i)` per full batch, rem
        batch under `fold_in(vkey, 1)` restarting i=0).  Returns (msres,
        plls) of shape (n_val_batches,)."""
        def one_batch(X, key):
            kd, kc, kp = jax.random.split(key, 3)
            X = self._maybe_dropout(kd, X)
            h0_means = self._means_h_given_v(state, X)
            h0_samples = self._h_layer.sample(kc, h0_means)
            h_states = h0_samples if self.sample_h_states else h0_means
            _, v_means, _, _ = self._gibbs_chain(
                state, h_states, k, key=jax.random.fold_in(kc, 1))
            msre = jnp.mean(jnp.square(X - v_means))
            pll = (self._pll(state, X, kp) if self.metrics_config['pll']
                   else jnp.zeros((), X.dtype))
            return msre, pll

        parts_m, parts_p = [], []
        if val_full is not None and val_full.shape[0]:
            def scan_body(i, X_batch):
                m, p = one_batch(X_batch, jax.random.fold_in(vkey, i))
                return i + 1, (m, p)
            _, (ms, ps) = jax.lax.scan(scan_body, 0, val_full)
            parts_m.append(ms)
            parts_p.append(ps)
        if val_rem is not None:
            m, p = one_batch(val_rem,
                             jax.random.fold_in(jax.random.fold_in(vkey, 1),
                                                0))
            parts_m.append(m[None])
            parts_p.append(p[None])
        return jnp.concatenate(parts_m), jnp.concatenate(parts_p)

    def _feg_core(self, state, full, rem, val_full, val_rem, fkey):
        """Per-batch free-energy scalars over the FEG probe batches of both
        sides (`_free_energy` is a batch-MEAN scalar per batch); fold chain
        matches `_dispatch_feg`.  Returns (val_scalars, train_scalars) --
        the host averages them exactly like `_reduce_feg`, so the metric
        stream is bitwise-identical to the per-epoch path."""
        n = self.metrics_config['n_batches_for_feg']

        def side_scalars(staged_full, staged_rem, key):
            parts = []
            nb = min(n, int(staged_full.shape[0])) if staged_full is not None \
                else 0
            if nb:
                def body(i, X_batch):
                    ki = jax.random.fold_in(key, i)
                    kd, kf = jax.random.split(ki)
                    X = self._maybe_dropout(kd, X_batch)
                    return i + 1, self._free_energy(state, X, kf)
                _, fes = jax.lax.scan(body, 0, staged_full[:nb])
                parts.append(fes)
            if nb < n and staged_rem is not None:
                kr = jax.random.fold_in(key, 999)
                kd, kf = jax.random.split(jax.random.fold_in(kr, 0))
                X = self._maybe_dropout(kd, staged_rem)
                parts.append(self._free_energy(state, X, kf)[None])
            return jnp.concatenate(parts)

        val_fes = side_scalars(val_full, val_rem, jax.random.fold_in(fkey, 1))
        train_fes = side_scalars(full, rem, jax.random.fold_in(fkey, 0))
        return val_fes, train_fes

    def _feg_counts(self, staged_train, staged_val):
        """Static per-side scalar counts: one per probe full batch plus one
        for the remainder when it participates (shapes of `_feg_core`'s
        outputs)."""
        n = self.metrics_config['n_batches_for_feg']

        def side_count(staged):
            full, rem, _ = staged
            nb = min(n, int(full.shape[0]))
            cnt = nb
            if nb < n and rem is not None:
                cnt += 1
            return cnt

        return side_count(staged_val), side_count(staged_train)

    def _block_valfeg(self, outs, state, e, key, full, rem, val_full,
                      val_rem, k, use_val, use_feg):
        """Fill `outs` with the in-program val-metrics / FEG entries of one
        block epoch, each under `lax.cond` at its epoch cadence (nan rows
        on off-cadence epochs).  Key folds match the dispatched per-epoch
        paths exactly."""
        val_every = int(self.metrics_config['val_metrics_every_epoch'])
        feg_every = int(self.metrics_config['feg_every_epoch'])
        nan = float('nan')
        if use_val:
            def do_val(_):
                vkey = jax.random.fold_in(key, 100000 + e)
                return self._val_core(state, val_full, val_rem, k, vkey)

            def no_val(_):
                nvb = (int(val_full.shape[0])
                       if val_full is not None else 0) \
                    + (1 if val_rem is not None else 0)
                z = jnp.full((nvb,), nan, self._jnp_dtype)
                return z, z

            outs['val'] = jax.lax.cond(e % val_every == 0, do_val, no_val,
                                       None)
        if use_feg:
            def do_feg(_):
                fkey = jax.random.fold_in(key, 200000 + e)
                return self._feg_core(state, full, rem, val_full, val_rem,
                                      fkey)

            def no_feg(_):
                nv, nt = self._feg_counts(
                    (full, rem, None), (val_full, val_rem, None))
                return (jnp.full((nv,), nan, self._jnp_dtype),
                        jnp.full((nt,), nan, self._jnp_dtype))

            outs['feg'] = jax.lax.cond(e % feg_every == 0, do_feg, no_feg,
                                       None)
        return outs

    def _train_block_program(self, use_val, use_feg):
        """E epochs of training in one jitted dispatch.  Per-epoch lr /
        momentum / gibbs-k schedules arrive as (E,) arrays; validation and
        FEG run in-program under their epoch cadences via `lax.cond`.
        Returns (state, outs) with stacked per-epoch metric arrays."""
        def block_fn(state, full, rem, val_full, val_rem, lrs, moms, ks,
                     key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, k, e = xs
                ekey = jax.random.fold_in(key, e)
                state, it, parts = self._epoch_core_xla(
                    state, it, full, rem, lr, mom, k, ekey)
                outs = self._block_valfeg({'train': parts}, state, e, key,
                                          full, rem, val_full, val_rem, k,
                                          use_val, use_feg)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, ks, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _pallas_block_program(self, k, n_full, use_val, use_feg):
        """E epochs of fused-kernel training in one jitted dispatch: the
        Pallas CD-epoch kernel runs once per scanned epoch (W resident in
        VMEM for each epoch), the XLA remainder step and the in-program
        val/FEG metrics wrap around it.  The per-epoch kernel `seed`
        stream and the remainder/val/FEG key folds are identical to the
        per-epoch Pallas path, so trajectories match bitwise.  Returns
        None when the kernel declines the shape (VMEM budget)."""
        epoch_core = self._pallas_epoch_program(k, n_full)
        if epoch_core is None:
            return None
        every = int(self.metrics_config['train_metrics_every_iter'])

        def block_fn(state, full, rem, val_full, val_rem, lrs, moms, seeds,
                     key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, seed, e = xs
                if n_full > 0:
                    state, msre_s, pll_s, l2_s = epoch_core(
                        state, full, lr, mom, seed, it)
                    it = it + n_full
                    parts = (msre_s, pll_s, l2_s)
                else:
                    z = jnp.zeros((0,), self._jnp_dtype)
                    parts = (z, z, z)
                if rem is not None:
                    # remainder step: fold chain identical to
                    # `_train_step_program` under the per-epoch loop
                    ekey = jax.random.fold_in(key, e)
                    it = it + 1
                    step_key = jax.random.fold_in(ekey, it)
                    state, aux = self._cd_step(state, rem, lr, mom, k,
                                               step_key)
                    want = (it % every) == 0

                    def metric_branch(_):
                        m = self._metrics(state, aux['X'], aux['v_means'],
                                          jax.random.fold_in(step_key, 7))
                        return m['msre'], m['pll'], m['l2_loss']

                    def zero_branch(_):
                        z = jnp.zeros((), aux['X'].dtype)
                        return z, z, z

                    parts = parts + jax.lax.cond(want, metric_branch,
                                                 zero_branch, None)
                outs = self._block_valfeg({'train': parts}, state, e, key,
                                          full, rem, val_full, val_rem, k,
                                          use_val, use_feg)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, seeds, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _train_metrics_every(self):
        return int(self.metrics_config['train_metrics_every_iter'])

    def _block_use_feg(self, use_val):
        return use_val and bool(self.metrics_config['feg'])

    def _block_program(self, kind, kk, n_full, use_val, use_feg):
        """Cached in-block epoch program for `JAXModel._fit_epoch_blocks`;
        None when the fused kernel declines the shape (VMEM budget)."""
        if kind == 'xla':
            return self._program(('train_block', use_val, use_feg),
                                 lambda: self._train_block_program(
                                     use_val, use_feg))
        if kind == 'pallas':
            return self._program(
                ('pallas_block', kk, n_full, use_val, use_feg),
                lambda: self._pallas_block_program(kk, n_full, use_val,
                                                   use_feg))
        return self._program(('shardmap_block', kk, use_val, use_feg),
                             lambda: self._shardmap_block_program(
                                 kk, use_val, use_feg))

    def _any_train_metric(self):
        """True when at least one train scalar metric is enabled -- the
        summaries cadence keys off a metric having been logged (matching
        the reference, where summaries ride the merged train-metric op)."""
        m = self.metrics_config
        return bool(m['msre'] or m['pll'] or m['l2_loss'])

    def _block_boundary_host_work(self, full, rem, aw, per_epoch_iters):
        """Summaries / checkpoint submission at a block boundary --
        identical cadence logic to the per-epoch loop (the boundary epoch
        IS a cadence epoch by construction of `_block_spans`); extends the
        base implementation with the hidden-activation image probe."""
        every = self._train_metrics_every()
        # iterations of the LAST epoch in the block
        last_lo = self.iter_ - per_epoch_iters
        logged = bool((((np.arange(last_lo + 1, self.iter_ + 1)) % every)
                       == 0).any()) and self._any_train_metric()
        want_summaries = logged and \
            self.epoch_ % self.summaries_every_epoch == 0
        want_ckpt = self.save_after_each_epoch and \
            self.epoch_ % self.checkpoint_every_epoch == 0
        if want_summaries and self.display_hidden_activations:
            pend_hidden = self._dispatch_hidden_activations(full, rem)
            if pend_hidden is not None:
                step = self.iter_
                h = pend_hidden
                self._submit_epoch_host_work(
                    aw, want_summaries, want_ckpt,
                    extra_work=lambda: self._write_hidden_activations_img(
                        h, step))
                return
        if want_summaries or want_ckpt:
            self._submit_epoch_host_work(aw, want_summaries, want_ckpt)

    def _make_block_finisher(self, stacked, epochs, iter0, per_epoch_iters,
                             n_full, has_rem, use_val, use_feg):
        """(arrays, consume) for a WHOLE BLOCK: one queued fetch of the
        stacked per-epoch metric arrays; `consume` replays the per-epoch
        scalar writes and verbose lines in epoch order."""
        every = int(self.metrics_config['train_metrics_every_iter'])
        val_every = int(self.metrics_config['val_metrics_every_epoch'])
        feg_every = int(self.metrics_config['feg_every_epoch'])
        max_epoch = self.max_epoch
        arrays = list(stacked['train'])
        n_train = len(arrays)
        if use_val:
            arrays += list(stacked['val'])
        if use_feg:
            arrays += list(stacked['feg'])

        def consume(fetched):
            train = fetched[:n_train]
            pos = n_train
            val = feg = None
            if use_val:
                val = fetched[pos:pos + 2]
                pos += 2
            if use_feg:
                feg = fetched[pos:pos + 2]
            for i, e in enumerate(epochs):
                e = int(e)
                step = iter0 + (i + 1) * per_epoch_iters
                iters = step - per_epoch_iters + 1 + np.arange(
                    per_epoch_iters)
                mask = (iters % every) == 0
                train_results = {}
                if mask.any():
                    row = [np.asarray(t[i]) for t in train]
                    train_results = self._reduce_train_metrics(
                        row, mask, n_full)
                val_results = {}
                if use_val and e % val_every == 0:
                    val_results = self._reduce_val_metrics(
                        [np.asarray(val[0][i]), np.asarray(val[1][i])])
                feg_val = None
                if use_feg and e % feg_every == 0:
                    # mirror _reduce_feg: float32 np.mean over the per-batch
                    # scalars, then subtract -- bitwise-identical stream
                    feg_val = float(np.mean(np.asarray(feg[0][i]))
                                    - np.mean(np.asarray(feg[1][i])))
                for m, v in train_results.items():
                    self._train_writer.add_scalar(
                        self._metrics_names_map[m], v, step)
                for m, v in val_results.items():
                    self._val_writer.add_scalar(
                        self._metrics_names_map[m], v, step)
                if feg_val is not None:
                    self._val_writer.add_scalar(
                        self._metrics_names_map['feg'], feg_val, step)
                if self.verbose:
                    s = 'epoch: {0:{1}}/{2}'.format(
                        e, len(str(max_epoch)), max_epoch)
                    for m, v in sorted(train_results.items()):
                        s += '; {0}: {1:{2}}'.format(
                            m, v, self.metrics_config[m + '_fmt'])
                    for m, v in sorted(val_results.items()):
                        s += '; val.{0}: {1:{2}}'.format(
                            m, v, self.metrics_config[m + '_fmt'])
                    if feg_val is not None:
                        s += ' ; feg: {0:{1}}'.format(
                            feg_val, self.metrics_config['feg_fmt'])
                    write_during_training(s)
            self._train_writer.flush()
            self._val_writer.flush()

        return arrays, consume

    def _init_writers(self):
        from ..utils.summary_writer import SummaryWriter
        if getattr(self, '_train_writer', None) is None:
            self._train_writer = SummaryWriter(self._train_summary_dirpath)
            self._val_writer = SummaryWriter(self._val_summary_dirpath)

    _metrics_names_map = {
        'feg': 'free_energy_gap',
        'l2_loss': 'l2_loss',
        'msre': 'mean_squared_reconstruction_error',
        'pll': 'pseudo_loglikelihood',
    }

    _summary_tensor_names = ('W', 'vb', 'hb', 'dW', 'dvb', 'dhb')

    def _summary_device_stats(self, snap):
        """Device-side reduction for the epoch summaries: bucketed
        histograms of every learned tensor plus the first
        ``display_filters`` weight columns -- a few KB fetched instead of
        the full (V, H) state."""
        out = {name: device_histogram(snap[name])
               for name in self._summary_tensor_names}
        if self.display_filters:
            out['W_filters'] = snap['W'][:, :self.display_filters]
        return out

    def _write_epoch_summaries(self, stats, step):
        """Per-epoch histograms of all learned tensors and (optionally)
        filter-grid images (reference base_rbm.py:295-323, 300-306).
        `step` is passed explicitly: this may run on the async checkpoint
        worker after the training thread has advanced ``iter_``."""
        for name in self._summary_tensor_names:
            self._train_writer.add_device_histogram(name, stats[name], step)
        if self.display_filters:
            from ..utils.plot_utils import filter_grid_image
            img = filter_grid_image(stats['W_filters'], self.v_shape,
                                    self.display_filters)
            self._train_writer.add_image('W_filters', img, step)

    def _dispatch_hidden_activations(self, full, rem):
        """Dispatch the hidden-activation probe (no fetch); the image is
        encoded on the async worker (reference base_rbm.py:429-435 streams
        this with the merged train summaries at the same cadence)."""
        if full.shape[0]:
            probe = full[0]
        elif rem is not None:
            probe = rem
        else:
            return None
        prog = self._program('transform', self._transform_program)
        k = int(schedule_value(self.n_gibbs_steps, self.epoch_))
        key = jax.random.fold_in(self._fit_key, 300000 + self.epoch_)
        h = prog(self._state, probe, k, key)
        return h[:, :self.display_hidden_activations]

    def _write_hidden_activations_img(self, h_dev, step):
        h = np.asarray(h_dev)
        mx = float(h.max())
        if mx > 1.:  # e.g. multinomial expected counts
            h = h / mx
        img = (np.clip(h, 0., 1.) * 255.).astype(np.uint8)
        self._train_writer.add_image('hidden_activation_means', img, step)

    def _fit(self, X, X_val=None, *args, **kwargs):
        self._fit_key = self.make_prng_key()
        self._init_writers()
        use_pallas = self._pallas_eligible()
        use_shardmap = (not use_pallas) and self._shardmap_eligible()
        epoch_prog = None if (use_pallas or use_shardmap) else \
            self._program('train_epoch', self._train_epoch_program)
        step_prog = self._program('train_step', self._train_step_program)
        full, rem, _ = self._stage_batches(X)
        # stage the validation set once -- re-uploading it every epoch costs
        # more than the metrics themselves on remote backends
        staged_val = self._stage_batches(X_val) if X_val is not None else None
        staged_train = (full, rem, None)

        # end-of-epoch host work runs on two async lanes, both overlapped
        # with the next epochs' device execution: a deep metrics lane
        # (KB-scale readbacks, batched drains) and a depth-1 heavy lane
        # (state snapshots -> histograms -> checkpoints); joined on exit
        # so fit() returns a settled disk
        aw = AsyncEpochWriter()
        mp = MetricsPipeline()
        try:
            self._fit_epochs(X_val, use_pallas, use_shardmap, epoch_prog,
                             step_prog, full, rem, staged_train, staged_val,
                             aw, mp)
        finally:
            mp.join()
            aw.join()
            if aw.n_dropped:
                from ..utils.utils import write_during_training
                write_during_training(
                    '%d intermediate checkpoint(s) skipped under device-'
                    'link backpressure; final checkpoint written '
                    'synchronously' % aw.n_dropped)

    def _fit_epochs(self, X_val, use_pallas, use_shardmap, epoch_prog,
                    step_prog, full, rem, staged_train, staged_val, aw, mp):
        # Dispatch whole EPOCH BLOCKS (up to 64 epochs per program --
        # fused Pallas kernel epochs, shard_map mesh epochs, or XLA epochs
        # -- with val/FEG in-program): one link interaction per block
        # instead of several per epoch.  GSPMD mesh fallbacks (forced
        # kernel='xla' on a mesh, tensor-parallel weights) keep the
        # per-epoch loop below.  BMT_EPOCH_BLOCKS=0 forces the per-epoch
        # loop everywhere (used by the equivalence tests).
        # f16-staged data (too big to widen on device): the fused epoch
        # kernels take f32 HBM inputs, so decline them; the XLA programs
        # widen per batch in _maybe_dropout
        if use_pallas and full is not None and \
                full.dtype == jnp.float16:
            use_pallas = False
        if os.environ.get('BMT_EPOCH_BLOCKS', '1') != '0':
            if use_shardmap:
                return self._fit_epoch_blocks(full, rem, staged_val, aw,
                                              mp, kind='shardmap')
            if self._mesh is None:
                kind = 'pallas' if use_pallas else 'xla'
                return self._fit_epoch_blocks(full, rem, staged_val, aw,
                                              mp, kind=kind)
        for self.epoch_ in epoch_iter(start_epoch=self.epoch_,
                                      max_epoch=self.max_epoch,
                                      verbose=self.verbose):
            pend_train = None
            if use_pallas:
                pend_train = self._train_epoch_pallas(step_prog, full,
                                                      rem, self._fit_key)
                if pend_train is None:  # kernel declined (VMEM budget)
                    use_pallas = False
                    epoch_prog = self._program('train_epoch',
                                               self._train_epoch_program)
            if pend_train is None:
                if use_shardmap:
                    kk = int(schedule_value(self.n_gibbs_steps, self.epoch_))
                    epoch_prog = self._program(
                        ('shardmap_epoch', kk),
                        lambda kk=kk: self._shardmap_epoch_program(kk))
                pend_train = self._train_epoch(epoch_prog, step_prog, full,
                                               rem, self._fit_key)

            pend_val = None
            pend_feg = None
            if X_val is not None and \
                    self.epoch_ % self.metrics_config['val_metrics_every_epoch'] == 0:
                pend_val = self._dispatch_val_metrics(staged_val)
            if X_val is not None and self.metrics_config['feg'] and \
                    self.epoch_ % self.metrics_config['feg_every_epoch'] == 0:
                pend_feg = self._dispatch_feg(staged_train, staged_val)

            # whether this epoch logged train metrics is pure host
            # arithmetic on iteration numbers -- no device readback needed
            logged = bool(pend_train['mask'].any()) and \
                self._any_train_metric()
            want_summaries = logged and \
                self.epoch_ % self.summaries_every_epoch == 0
            want_ckpt = self.save_after_each_epoch and \
                self.epoch_ % self.checkpoint_every_epoch == 0
            pend_hidden = None
            if want_summaries and self.display_hidden_activations:
                pend_hidden = self._dispatch_hidden_activations(full, rem)

            # ALL device->host metric readbacks + summary-scalar writes +
            # the verbose epoch line run on the deep metrics lane (whole
            # batches of queued epochs drain per link round trip); state
            # snapshots/checkpoints keep the depth-1 heavy lane
            arrays, consume = self._make_epoch_finisher(
                pend_train, pend_val, pend_feg, pend_hidden)
            mp.submit(arrays, consume)
            if want_summaries or want_ckpt:
                self._submit_epoch_host_work(aw, want_summaries, want_ckpt)

    def _make_epoch_finisher(self, pend_train, pend_val, pend_feg,
                             pend_hidden=None):
        """Build (arrays, consume) for the metrics pipeline: `arrays` is
        everything pending for this epoch (fetched in one combined batch,
        possibly together with other epochs' arrays); `consume(fetched)`
        reduces + writes scalars + emits the verbose line on the worker.
        Snapshot epoch/step NOW -- the training thread advances them while
        the worker runs."""
        epoch_no = self.epoch_
        step = self.iter_

        batched = []
        if pend_hidden is not None:
            batched.append(pend_hidden)
        want_train = pend_train is not None and \
            len(pend_train['mask']) and pend_train['mask'].any()
        if want_train:
            batched += pend_train['parts']
        if pend_val:
            batched += pend_val
        if pend_feg is not None:
            batched += pend_feg[0]

        def consume(fetched):
            pos = 0

            def take(n):
                nonlocal pos
                out = fetched[pos:pos + n]
                pos += n
                return out

            if pend_hidden is not None:
                self._write_hidden_activations_img(take(1)[0], step)
            train_results = {}
            if want_train:
                fparts = take(len(pend_train['parts']))
                train_results = self._reduce_train_metrics(
                    fparts, pend_train['mask'], pend_train['n_full'])
            val_results = self._reduce_val_metrics(take(len(pend_val))) \
                if pend_val else {}
            feg = None
            if pend_feg is not None:
                feg = self._reduce_feg(take(len(pend_feg[0])), pend_feg[1])
            for m, v in train_results.items():
                self._train_writer.add_scalar(self._metrics_names_map[m], v,
                                              step)
            for m, v in val_results.items():
                self._val_writer.add_scalar(self._metrics_names_map[m], v,
                                            step)
            if feg is not None:
                self._val_writer.add_scalar(self._metrics_names_map['feg'],
                                            feg, step)
            self._train_writer.flush()
            self._val_writer.flush()

            if self.verbose:
                s = 'epoch: {0:{1}}/{2}'.format(
                    epoch_no, len(str(self.max_epoch)), self.max_epoch)
                for m, v in sorted(train_results.items()):
                    s += '; {0}: {1:{2}}'.format(m, v, self.metrics_config[m + '_fmt'])
                for m, v in sorted(val_results.items()):
                    s += '; val.{0}: {1:{2}}'.format(m, v, self.metrics_config[m + '_fmt'])
                if feg is not None:
                    s += ' ; feg: {0:{1}}'.format(feg, self.metrics_config['feg_fmt'])
                write_during_training(s)

        return batched, consume

    # ================================================================== #
    # public API                                                          #
    # ================================================================== #
    def init_from(self, rbm):
        """Warm-start from another RBM of the same class: copies weights,
        momentum accumulators, and trailing-underscore attributes
        (base_rbm.py:668-685)."""
        if type(self) is not type(rbm):
            raise ValueError('an attempt to initialize `{0}` from `{1}`'
                             .format(self.__class__.__name__,
                                     rbm.__class__.__name__))
        weights = rbm.get_params_arrays(scope='weights')
        self.W_init = weights['W']
        self.vb_init = weights['vb']
        self.hb_init = weights['hb']

        accs = rbm.get_params_arrays(scope='grads_accumulators')
        self._dW_init = accs['dW']
        self._dvb_init = accs['dvb']
        self._dhb_init = accs['dhb']

        for k, v in vars(rbm).items():
            if is_attribute_name(k):
                setattr(self, k, v)
        self._state = None
        self._programs = {}

    def transform(self, X, np_dtype=None):
        """Hidden activation probabilities after the k-step chain -- the same
        feature map the reference's `transform_op` computes
        (base_rbm.py:437-440: chain-final h_means; stochastic when
        intermediate hidden states are sampled)."""
        self._ensure_state()
        np_dtype = np_dtype or self._np_dtype
        key = self.make_prng_key()
        k = int(schedule_value(self.n_gibbs_steps, self.epoch_))

        full, rem, n_full = self._stage_batches(X)
        H = np.zeros((len(X), self.n_hidden), dtype=np_dtype)
        if n_full:
            prog = self._program('transform_scan', self._transform_scan_program)
            # chunk the scan when the full feature map would not fit HBM
            # next to the staged inputs (490k x 7800 G-RBM features are
            # 15.3 GB in f32): dispatch fixed-size chunks of batches and
            # fetch each before the next materializes.  The i0 key offset
            # keeps chunked == single-scan bitwise.
            budget = float(os.environ.get(
                'BMT_TRANSFORM_CHUNK_GB', '2')) * 1e9
            B = self.batch_size
            batch_bytes = B * (self.n_hidden + self.n_visible) * 4
            n_chunk = max(1, min(n_full, int(budget // max(batch_bytes, 1))))
            for c0 in range(0, n_full, n_chunk):
                nb = min(n_chunk, n_full - c0)
                chunk = full if n_full <= n_chunk else \
                    jax.lax.dynamic_slice_in_dim(full, c0, nb)
                H_c = prog(self._state, chunk, k, key, c0)
                H[c0 * B:(c0 + nb) * B] = fetch_as(
                    H_c, np_dtype).reshape(-1, self.n_hidden)
        if rem is not None:
            prog = self._program('transform', self._transform_program)
            H_b = prog(self._state, rem, k, jax.random.fold_in(key, n_full))
            H[n_full * self.batch_size:] = fetch_as(H_b, np_dtype)
        return H

    def free_energy(self, X):
        """Batch-mean free energy of `X` (host-facing convenience)."""
        self._ensure_state()
        prog = self._program('fe', self._free_energy_program)
        Xb = jnp.asarray(self._preprocess(np.asarray(X)))[None, ...]
        return float(np.asarray(prog(self._state, Xb, self.make_prng_key())[0]))
