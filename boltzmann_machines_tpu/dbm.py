"""Deep Boltzmann Machine with PCD + mean-field variational inference,
rebuilt TPU-first (capability parity with reference dbm.py:14-963).

Design notes (vs. the TF1 reference):

* The model state is one pytree: weights/biases per layer, momentum
  accumulators, EMA sparsity means, and the **persistent Markov chains**
  (``n_particles`` fantasy particles) -- all device-resident across the whole
  training run.  The reference double-buffers particles in TF Variables
  (dbm.py:361-383); functionally only the latest (v, H) matters and is
  carried/checkpointed.
* One epoch = one jitted ``lax.scan`` over minibatches.  Mean-field runs as a
  ``lax.while_loop`` with an infinity-norm tolerance and update counting
  (dbm.py:449-478); the PCD Gibbs chain is a ``lax.fori_loop`` with a traced
  step count.  Batch and particle axes can be sharded over a device mesh --
  the MF convergence predicate is a global reduction XLA turns into a psum.
* Mean-field starts from the bottom-up doubled-input initialization
  (dbm.py:436-444).  NOTE a deliberate divergence: the reference initializes
  ``mu_new`` this way but its first sweep actually consumes the *previous
  minibatch's* persisted ``mu`` as top-down context (dbm.py:449-467); we use
  the documented initialization.  Both iterate to the same fixed point.
* Per-layer sparsity uses the full EMA **vectors** -- the reference indexes a
  scalar element ``q_means[i]`` / ``mu_means[i]`` of the running sums
  (dbm.py:581-588), a bug we deliberately fix (penalty broadcast semantics
  are otherwise preserved).
* AIS (2-layer Bernoulli DBMs) anneals on the h1 state space with v and h2
  analytically summed out (dbm.py:650-736); the beta sweep is a ``lax.scan``
  with all ``n_runs`` chains vectorized (and shardable) on-device.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from .base.jax_model import (AsyncEpochWriter, MetricsPipeline,
                             device_histogram, fetch_as, fetch_many)
from .ebm import EnergyBasedModel
from .layers import BaseLayer, BernoulliLayer
from .parallel import fully_replicated as _fully_replicated
from .utils import (make_list_from, batch_iter, epoch_iter, schedule_value,
                    write_during_training,
                    log_sum_exp, log_diff_exp, log_mean_exp, log_std_exp)


def make_beta_schedule(n_betas, kind='linear'):
    """Inverse-temperature ladder (length n_betas + 1, 0 -> 1) for AIS.

    'linear' is the reference's uniform spacing (dbm.py:696-736).
    'adaptive' allocates betas the way Salakhutdinov & Murray (2008)
    do for their large runs -- sparse early, dense near beta = 1 where the
    importance-weight variance concentrates (~3.5% of betas on [0, 0.5),
    ~27.5% on [0.5, 0.9), ~69% on [0.9, 1]) -- which tightens the estimate
    on peaked models at equal cost."""
    if kind == 'linear':
        return np.linspace(0., 1., n_betas + 1)
    if kind != 'adaptive':
        raise ValueError("beta_schedule must be 'linear' or 'adaptive'")
    if n_betas < 3:  # too few steps for three bands; uniform is exact
        return np.linspace(0., 1., n_betas + 1)
    n1 = max(int(round(0.035 * n_betas)), 1)
    n3 = max(int(round(0.69 * n_betas)), 1)
    n2 = n_betas - n1 - n3
    if n2 < 1:  # small ladders: keep the total exactly n_betas
        n3 = max(n_betas - n1 - 1, 1)
        n2 = n_betas - n1 - n3
    return np.concatenate([
        np.linspace(0., 0.5, n1, endpoint=False),
        np.linspace(0.5, 0.9, n2, endpoint=False),
        np.linspace(0.9, 1., n3 + 1)])


class DBM(EnergyBasedModel):
    """Deep Boltzmann Machine trained by PCD with mean-field inference.

    Parameters mirror the reference (dbm.py:89-99): built from a list of
    pretrained RBMs (greedy layer-wise stacking with halving of intermediate
    weights and bias averaging, dbm.py:266-291), trained with `n_particles`
    persistent chains, per-epoch `learning_rate`/`momentum`/`n_gibbs_steps`
    schedules, L2 + max-norm regularization, and per-layer sparsity targets.
    """

    def __init__(self, rbms=None,
                 n_particles=100, v_particle_init=None, h_particles_init=None,
                 n_gibbs_steps=5, max_mf_updates=10, mf_tol=1e-7,
                 learning_rate=0.0005, momentum=0.9, max_epoch=10,
                 batch_size=100, l2=0., max_norm=np.inf,
                 sample_v_states=True, sample_h_states=None,
                 sparsity_target=0.1, sparsity_cost=0., sparsity_damping=0.9,
                 train_metrics_every_iter=10, val_metrics_every_epoch=1,
                 verbose=False, save_after_each_epoch=True,
                 checkpoint_every_epoch=1, summaries_every_epoch=1,
                 display_filters=0, display_particles=0, v_shape=(28, 28),
                 kernel='auto', model_path='dbm_model/', *args, **kwargs):
        super(DBM, self).__init__(model_path=model_path, *args, **kwargs)
        self.n_layers_ = len(rbms) if rbms is not None else None
        self.n_visible_ = None
        self.n_hiddens_ = []
        self.layers_config_ = None
        self._v_layer = None
        self._h_layers = None
        self._W_init = self._vb_init = self._hb_init = None
        self.load_rbms(rbms)

        self.n_particles = n_particles
        self._v_particle_init = v_particle_init
        self._h_particles_init = h_particles_init

        self.n_gibbs_steps = make_list_from(n_gibbs_steps)
        self.max_mf_updates = max_mf_updates
        self.mf_tol = mf_tol

        self.learning_rate = make_list_from(learning_rate)
        self.momentum = make_list_from(momentum)
        self.max_epoch = max_epoch
        self.batch_size = batch_size
        self.l2 = l2
        self.max_norm = max_norm

        self.sample_v_states = sample_v_states
        self.sample_h_states = sample_h_states or \
            ([True] * self.n_layers_ if self.n_layers_ else None)

        self.sparsity_target = make_list_from(sparsity_target)
        self.sparsity_cost = make_list_from(sparsity_cost)
        if self.n_layers_ is not None and self.n_layers_ > 1:
            for x in (self.sparsity_target, self.sparsity_cost):
                if len(x) == 1:
                    x *= self.n_layers_
        self.sparsity_damping = sparsity_damping

        self.train_metrics_every_iter = train_metrics_every_iter
        self.val_metrics_every_epoch = val_metrics_every_epoch
        self.verbose = verbose
        self.save_after_each_epoch = save_after_each_epoch
        # host-fetch cadences (see BaseRBM): 1 = reference's every-epoch
        # behavior; fit() always saves the final state regardless
        self.checkpoint_every_epoch = int(checkpoint_every_epoch)
        self.summaries_every_epoch = int(summaries_every_epoch)

        for nh in self.n_hiddens_:
            assert nh >= display_filters
        self.display_filters = display_filters
        assert display_particles <= self.n_particles
        self.display_particles = display_particles

        self.v_shape = tuple(v_shape)
        if len(self.v_shape) == 2:
            self.v_shape = (self.v_shape[0], self.v_shape[1], 1)

        # 'auto' uses the fused Pallas AIS kernel on TPU for 2-layer
        # Bernoulli DBMs; 'xla' forces the lax paths everywhere.
        assert kernel in ('auto', 'xla', 'pallas')
        self.kernel = kernel

        self.epoch_ = 0
        self.iter_ = 0
        self.n_samples_generated_ = 0

        self._state = None
        self._programs = {}
        self._mesh = None

    # ================================================================== #
    # construction from pretrained RBMs                                   #
    # ================================================================== #
    def load_rbms(self, rbms):
        """Bind pretrained RBMs: record their weights as stacking inits and
        adopt their unit layers (reference dbm.py:207-231)."""
        if rbms is None:
            return
        self._rbms = rbms
        self.n_layers_ = len(rbms)
        self.n_visible_ = rbms[0].n_visible
        self.n_hiddens_ = [r.n_hidden for r in rbms]

        self._W_init, self._vb_init, self._hb_init = [], [], []
        for r in rbms:
            w = r.get_params_arrays(scope='weights')
            self._W_init.append(np.asarray(w['W']))
            self._vb_init.append(np.asarray(w['vb']))
            self._hb_init.append(np.asarray(w['hb']))

        self._v_layer = rbms[0]._v_layer
        self._h_layers = [r._h_layer for r in rbms]
        for L in [self._v_layer] + self._h_layers:
            L.dtype = self.dtype
        self.layers_config_ = [L.get_config()
                               for L in [self._v_layer] + self._h_layers]
        if getattr(self, 'sample_h_states', None) is None:
            self.sample_h_states = [True] * self.n_layers_
        self._state = None
        self._programs = {}

    def _ensure_layers(self):
        if self._v_layer is None:
            if self.layers_config_ is None:
                raise RuntimeError('DBM has no layers: construct with '
                                   '`rbms=[...]` or call `load_rbms`')
            layers = [BaseLayer.from_config(c) for c in self.layers_config_]
            self._v_layer = layers[0]
            self._h_layers = layers[1:]

    def _stacked_init(self):
        """Compose DBM weights from RBM weights, halving intermediate layers
        and averaging shared biases (dbm.py:266-291)."""
        W_init, hb_init = [], []
        vb_init = self._vb_init[0].copy()
        for i in range(self.n_layers_):
            W = self._W_init[i].copy()
            vb = self._vb_init[i].copy()
            hb = self._hb_init[i].copy()
            if 0 < i < self.n_layers_ - 1:
                W *= 0.5
                vb *= 0.5
                hb *= 0.5
            W_init.append(W)
            if i == 0:
                hb_init.append(0.5 * hb)
            else:
                hb_init[i - 1] = hb_init[i - 1] + 0.5 * vb
                hb_init.append(0.5 * hb if i < self.n_layers_ - 1 else hb)
        return W_init, vb_init, hb_init

    def _init_state(self):
        self._ensure_layers()
        dtype = self._jnp_dtype
        L = self.n_layers_

        if self._W_init is not None:
            W_init, vb_init, hb_init = self._stacked_init()
        else:
            raise RuntimeError('DBM state requires pretrained RBM weights; '
                               'construct with `rbms=[...]`')

        key = self.make_prng_key()
        kv, kvn, *khs = jax.random.split(key, 2 + L)

        if self._v_particle_init is not None:
            v = jnp.asarray(self._v_particle_init, dtype=dtype)
        else:
            v = self._v_layer.init(kv, self.n_particles, dtype=dtype)

        H = []
        for i in range(L):
            if self._h_particles_init is not None and \
                    self._h_particles_init[i] is not None:
                H.append(jnp.asarray(self._h_particles_init[i], dtype=dtype))
            else:
                H.append(self._h_layers[i].init(khs[i], self.n_particles,
                                                dtype=dtype))

        self._state = {
            'vb': jnp.asarray(vb_init, dtype=dtype),
            'W': tuple(jnp.asarray(w, dtype=dtype) for w in W_init),
            'hb': tuple(jnp.asarray(b, dtype=dtype) for b in hb_init),
            'dvb': jnp.zeros_like(jnp.asarray(vb_init, dtype=dtype)),
            'dW': tuple(jnp.zeros(w.shape, dtype=dtype) for w in W_init),
            'dhb': tuple(jnp.zeros(b.shape, dtype=dtype) for b in hb_init),
            'q_means': tuple(jnp.zeros((n,), dtype=dtype) for n in self.n_hiddens_),
            'mu_means': tuple(jnp.zeros((n,), dtype=dtype) for n in self.n_hiddens_),
            'v': v,
            'H': tuple(H),
        }

    def _ensure_state(self):
        self._ensure_layers()
        if self._state is None:
            self._init_state()

    def _get_state_arrays(self, host_state=None):
        self._ensure_state()
        s = host_state if host_state is not None \
            else jax.device_get(self._state)
        out = {'weights/vb': s['vb'],
               'grads_accumulators/dvb': s['dvb'],
               'negative_particles/v': s['v']}
        for i in range(self.n_layers_):
            out['weights/W_{0}'.format(i)] = s['W'][i]
            out['weights/hb_{0}'.format(i)] = s['hb'][i]
            out['grads_accumulators/dW_{0}'.format(i)] = s['dW'][i]
            out['grads_accumulators/dhb_{0}'.format(i)] = s['dhb'][i]
            out['hidden_means_accumulators/q_means_{0}'.format(i)] = s['q_means'][i]
            out['hidden_means_accumulators/mu_means_{0}'.format(i)] = s['mu_means'][i]
            out['negative_particles/H_{0}'.format(i)] = s['H'][i]
        return out

    def _set_state_arrays(self, arrays):
        dtype = self._jnp_dtype
        L = self.n_layers_
        g = lambda k: jnp.asarray(arrays[k], dtype=dtype)
        self._state = {
            'vb': g('weights/vb'),
            'W': tuple(g('weights/W_{0}'.format(i)) for i in range(L)),
            'hb': tuple(g('weights/hb_{0}'.format(i)) for i in range(L)),
            'dvb': g('grads_accumulators/dvb'),
            'dW': tuple(g('grads_accumulators/dW_{0}'.format(i)) for i in range(L)),
            'dhb': tuple(g('grads_accumulators/dhb_{0}'.format(i)) for i in range(L)),
            'q_means': tuple(g('hidden_means_accumulators/q_means_{0}'.format(i))
                             for i in range(L)),
            'mu_means': tuple(g('hidden_means_accumulators/mu_means_{0}'.format(i))
                              for i in range(L)),
            'v': g('negative_particles/v'),
            'H': tuple(g('negative_particles/H_{0}'.format(i)) for i in range(L)),
        }

    def set_params(self, **params):
        self._programs = {}
        return super(DBM, self).set_params(**params)

    def set_mesh(self, mesh, data_axis='data'):
        """Attach a device mesh: minibatches, persistent particles, and AIS
        runs are sharded along `data_axis` (parameters replicated; gradient
        and convergence reductions become ICI collectives)."""
        self._mesh = (mesh, data_axis)
        self._programs = {}
        # reshard existing particle state
        if self._state is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            m, ax = self._mesh
            sh = NamedSharding(m, P(ax, None))
            self._state['v'] = jax.device_put(self._state['v'], sh)
            self._state['H'] = tuple(jax.device_put(h, sh)
                                     for h in self._state['H'])
        return self

    def _put(self, X, batched=False):
        if self._mesh is None:
            if getattr(X, 'dtype', None) == np.float16 \
                    and self._np_dtype == np.float32:
                return self._device_upload(np.ascontiguousarray(X))
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
            spec = P(None, axis, None) if X.shape[1] % n_shards == 0 else P()
        else:
            # replicate remainder batches whose row count does not divide
            # the data axis
            spec = P(axis, None) if X.shape[0] % n_shards == 0 else P()
        return jax.device_put(X, NamedSharding(mesh, spec))

    # ================================================================== #
    # pure ops                                                            #
    # ================================================================== #
    def _particles_gibbs_step(self, state, v, H, key, sample=True):
        """Layer-parallel block-Gibbs step on (v, H) using mixed fresh/stale
        neighbors (reference dbm.py:385-427): layer i sees fresh layer i-1
        and stale layer i+1; v is resampled last from fresh H[0]."""
        L = self.n_layers_
        keys = jax.random.split(key, L + 1)
        H_new = list(H)

        T = v @ state['W'][0]
        if L >= 2:
            T = T + H[1] @ state['W'][1].T
        H_new[0] = self._h_layers[0].activation(T, state['hb'][0])
        if sample and self.sample_h_states[0]:
            H_new[0] = self._h_layers[0].sample(keys[0], H_new[0])

        for i in range(1, L - 1):
            T = H_new[i - 1] @ state['W'][i] + H[i + 1] @ state['W'][i + 1].T
            H_new[i] = self._h_layers[i].activation(T, state['hb'][i])
            if sample and self.sample_h_states[i]:
                H_new[i] = self._h_layers[i].sample(keys[i], H_new[i])

        if L >= 2:
            T = H_new[-2] @ state['W'][-1]
            H_new[-1] = self._h_layers[-1].activation(T, state['hb'][-1])
            if sample and self.sample_h_states[-1]:
                H_new[-1] = self._h_layers[-1].sample(keys[L - 1], H_new[-1])

        T = H_new[0] @ state['W'][0].T
        v_new = self._v_layer.activation(T, state['vb'])
        if sample and self.sample_v_states:
            v_new = self._v_layer.sample(keys[L], v_new)

        return v_new, tuple(H_new)

    def _constrain_particles(self, v, H):
        """Keep persistent chains sharded along the data axis so XLA never
        gathers them (no-op without a mesh)."""
        if self._mesh is None:
            return v, H
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh, axis = self._mesh
        sh = NamedSharding(mesh, P(axis, None))
        v = jax.lax.with_sharding_constraint(v, sh)
        H = tuple(jax.lax.with_sharding_constraint(h, sh) for h in H)
        return v, H

    def _particles_update(self, state, v, H, n_steps, key, sample=True):
        """Run the persistent chains for `n_steps` (traced) Gibbs steps."""
        def body(i, carry):
            v, H = carry
            return self._particles_gibbs_step(state, v, H,
                                              jax.random.fold_in(key, i),
                                              sample=sample)
        v, H = jax.lax.fori_loop(0, n_steps, body, (v, H))
        return self._constrain_particles(v, H)

    def _mf_init(self, state, T0):
        """Bottom-up initialization with doubled inputs for non-top layers
        (dbm.py:436-444).  `T0 = X @ W[0]` is precomputed by `_mf` (it is
        loop-invariant and shared with every `_mf_sweep`)."""
        mu = []
        T = 2. * T0
        T = self._h_layers[0].activation(T, state['hb'][0])
        mu.append(T)
        for i in range(1, self.n_layers_):
            T = T @ state['W'][i]
            if i < self.n_layers_ - 1:
                T = 2. * T
            T = self._h_layers[i].activation(T, state['hb'][i])
            mu.append(T)
        return tuple(mu)

    def _mf_sweep(self, state, T0, mu):
        """One damped-free mean-field sweep (gibbs step w/o sampling,
        update_v=False).  Takes the precomputed bottom-up drive
        `T0 = X @ W[0]` instead of X: X and W are fixed across the
        mean-field while_loop, and XLA does not hoist expensive dots out
        of while bodies, so recomputing it per sweep would cost more HBM
        FLOPs than the rest of the sweep combined at CIFAR shapes
        (100x3072 @ 3072x5000 = 3.1 GFLOP/sweep x up to 50 sweeps)."""
        L = self.n_layers_
        mu_new = list(mu)
        T = T0
        if L >= 2:
            T = T + mu[1] @ state['W'][1].T
        mu_new[0] = self._h_layers[0].activation(T, state['hb'][0])
        for i in range(1, L - 1):
            T = mu_new[i - 1] @ state['W'][i] + mu[i + 1] @ state['W'][i + 1].T
            mu_new[i] = self._h_layers[i].activation(T, state['hb'][i])
        if L >= 2:
            T = mu_new[-2] @ state['W'][-1]
            mu_new[-1] = self._h_layers[-1].activation(T, state['hb'][-1])
        return tuple(mu_new)

    def _mf(self, state, X, axis_name=None):
        """Mean-field fixed point: sweep until the max infinity-norm change
        across layers is <= mf_tol or `max_mf_updates` reached; returns
        (mu, n_updates) (reference dbm.py:429-478).

        Inside a shard_map body pass `axis_name`: the convergence predicate
        becomes a global pmax over the sharded batch, so every shard runs
        the same number of sweeps (the reference's whole-batch infinity
        norm)."""
        dtype = X.dtype
        tol = jnp.asarray(self.mf_tol, dtype=dtype)
        T0 = X @ state['W'][0]   # loop-invariant bottom-up drive, hoisted
        mu0 = self._mf_init(state, T0)

        def cond(carry):
            step, mu, delta = carry
            return jnp.logical_and(step < self.max_mf_updates, delta > tol)

        def body(carry):
            step, mu, _ = carry
            mu_new = self._mf_sweep(state, T0, mu)
            delta = jnp.max(jnp.stack(
                [jnp.max(jnp.abs(a - b)) for a, b in zip(mu_new, mu)]))
            if axis_name is not None:
                delta = jax.lax.pmax(delta, axis_name)
            return step + 1, mu_new, delta

        init = (jnp.zeros((), jnp.int32), mu0,
                jnp.asarray(jnp.inf, dtype=dtype))
        n_mf_updates, mu, _ = jax.lax.while_loop(cond, body, init)
        return mu, n_mf_updates

    def _reconstruction_means(self, state, mu0):
        """p(v | h0 = mu0) means (dbm.py:624-632)."""
        return self._v_layer.activation(mu0 @ state['W'][0].T, state['vb'])

    def _apply_max_norm(self, W):
        """Per-column max-norm constraint (dbm.py:511-513)."""
        if not np.isfinite(self.max_norm):
            return W
        norm = jnp.linalg.norm(W, axis=0)
        mx = jnp.asarray(self.max_norm, dtype=W.dtype)
        return W * jnp.minimum(norm, mx) / jnp.maximum(norm, 1e-8)

    def _dbm_stats(self, state, X, k, key, axis_name=None, constrain=True):
        """PCD/MF sufficient statistics of one (shard of a) minibatch plus
        the advanced local particle rows: the raw *sums* whose cross-shard
        ``psum`` equals the full-batch/full-particle statistics.  Returns
        (stats, particles, aux)."""
        L = self.n_layers_

        # positive phase: variational mean-field on the (local) minibatch
        mu, n_mf_updates = self._mf(state, X, axis_name=axis_name)

        # negative phase: advance the (local) persistent chains k steps
        if constrain:
            v, H = self._particles_update(state, state['v'], state['H'],
                                          k, key)
        else:  # inside shard_map: rows are already local, no constraints
            def body(i, carry):
                v, H = carry
                return self._particles_gibbs_step(
                    state, v, H, jax.random.fold_in(key, i))
            v, H = jax.lax.fori_loop(0, k, body, (state['v'], state['H']))

        stats = {
            'sum_X': jnp.sum(X, axis=0),
            'sum_v': jnp.sum(v, axis=0),
            'pos': tuple([X.T @ mu[0]] +
                         [mu[i - 1].T @ mu[i] for i in range(1, L)]),
            'neg': tuple([v.T @ H[0]] +
                         [H[i - 1].T @ H[i] for i in range(1, L)]),
            'sum_mu': tuple(jnp.sum(mu[i], axis=0) for i in range(L)),
            'sum_H': tuple(jnp.sum(H[i], axis=0) for i in range(L)),
        }
        aux = {'mu0': mu[0], 'n_mf': n_mf_updates}
        return stats, (v, H), aux

    def _apply_dbm_update(self, state, stats, particles, N, M, lr, momentum):
        """Parameter update from (possibly psum-reduced) PCD/MF statistics:
        data statistics / N minus particle statistics / M, per-layer EMA
        sparsity, the reference momentum rule, and max-norm clipping
        (reference dbm.py:515-622)."""
        L = self.n_layers_
        dtype = state['vb'].dtype
        N = jnp.asarray(N, dtype=dtype)
        M = jnp.asarray(M, dtype=dtype)
        l2 = jnp.asarray(self.l2, dtype=dtype)
        v, H = particles

        dvb = stats['sum_X'] / N - stats['sum_v'] / M
        dW = [stats['pos'][i] / N - stats['neg'][i] / M - l2 * state['W'][i]
              for i in range(L)]
        dhb = [stats['sum_mu'][i] / N - stats['sum_H'][i] / M
               for i in range(L)]

        # per-layer EMA sparsity on summed particle and variational means
        # (vector form; reference's scalar indexing dbm.py:581-588 is a bug
        # we deliberately fix -- see module docstring)
        damping = jnp.asarray(self.sparsity_damping, dtype=dtype)
        q_means, mu_means = [], []
        for i in range(L):
            cost = jnp.asarray(self.sparsity_cost[i], dtype=dtype)
            target = jnp.asarray(self.sparsity_target[i], dtype=dtype)
            q_new = damping * state['q_means'][i] + \
                (1. - damping) * stats['sum_H'][i]
            m_new = damping * state['mu_means'][i] + \
                (1. - damping) * stats['sum_mu'][i]
            q_means.append(q_new)
            mu_means.append(m_new)
            penalty = cost * (q_new - target) + cost * (m_new - target)
            dW[i] = dW[i] - penalty
            dhb[i] = dhb[i] - penalty

        # momentum rule acc <- lr*(m*acc + g); W gets max-norm clipping
        lr = jnp.asarray(lr, dtype=dtype)
        momentum = jnp.asarray(momentum, dtype=dtype)
        dvb_acc = lr * (momentum * state['dvb'] + dvb)
        dW_acc = [lr * (momentum * state['dW'][i] + dW[i]) for i in range(L)]
        dhb_acc = [lr * (momentum * state['dhb'][i] + dhb[i]) for i in range(L)]

        W_new = [self._apply_max_norm(state['W'][i] + dW_acc[i])
                 for i in range(L)]

        return {
            'vb': state['vb'] + dvb_acc,
            'W': tuple(W_new),
            'hb': tuple(state['hb'][i] + dhb_acc[i] for i in range(L)),
            'dvb': dvb_acc,
            'dW': tuple(dW_acc),
            'dhb': tuple(dhb_acc),
            'q_means': tuple(q_means),
            'mu_means': tuple(mu_means),
            'v': v,
            'H': H,
        }

    def _train_step(self, state, X, lr, momentum, k, key):
        """One PCD/MF parameter update (reference dbm.py:515-639)."""
        stats, particles, aux = self._dbm_stats(state, X, k, key)
        new_state = self._apply_dbm_update(state, stats, particles,
                                           X.shape[0], self.n_particles,
                                           lr, momentum)
        v_means = self._reconstruction_means(new_state, aux['mu0'])
        msre = jnp.mean(jnp.square(X - v_means))
        return new_state, (msre, aux['n_mf'])

    # ================================================================== #
    # jitted programs                                                     #
    # ================================================================== #
    def _program(self, name, builder):
        if name not in self._programs:
            self._programs[name] = builder()
        return self._programs[name]

    def _pallas_epoch_eligible(self):
        """The fused DBM epoch kernel covers all-Bernoulli float32 DBMs on
        a single TPU chip (the dbm_mnist flagship configuration); a
        single-device mesh needs no collectives, so it keeps the kernel."""
        self._ensure_layers()
        if self.kernel == 'xla':
            return False
        single_dev = self._mesh is None or self._mesh[0].size == 1
        ok = (all(isinstance(l, BernoulliLayer)
                  for l in [self._v_layer] + self._h_layers)
              and self.dtype == 'float32'
              and single_dev
              and jax.default_backend() == 'tpu')
        return ok

    def _shardmap_eligible(self):
        """Mesh-sharded DBM training runs the explicit-collective shard_map
        epoch: batch rows AND persistent particles sharded along the data
        axis, gradient statistics psum-reduced, the MF convergence
        predicate pmax-reduced, weights replicated."""
        if self._mesh is None or self.kernel == 'xla':
            return False
        mesh, axis = self._mesh
        n = mesh.shape[axis]
        if self.batch_size % n or self.n_particles % n:
            return False
        # Manually model-sharded parameters (e.g. W[0] device_put with
        # PartitionSpec(None, 'model'), as in __graft_entry__) must stay on
        # the GSPMD path: the shard_map epoch declares parameters
        # replicated, which would silently all-gather tensor-parallel
        # weights onto every device.
        if self._state is not None:
            # every leaf the shard_map in_specs declare replicated,
            # including the sparsity accumulators (advisor round 2)
            params = ([self._state['vb']] + list(self._state['W'])
                      + list(self._state['hb']) + [self._state['dvb']]
                      + list(self._state['dW']) + list(self._state['dhb'])
                      + list(self._state['q_means'])
                      + list(self._state['mu_means']))
            if not all(_fully_replicated(p) for p in params):
                return False
        return True

    def _shardmap_epoch_core(self, k):
        """One DBM training epoch over a data-parallel mesh as a
        shard_map program.  Each shard runs mean-field on its batch
        rows (globally-synchronized convergence via pmax) and advances its
        rows of the persistent chains; the PCD gradient statistics are
        psum-reduced over ICI and every shard applies the identical update.
        Weights stay replicated, particles stay sharded -- nothing is ever
        gathered.  Semantics match the single-device epoch with
        whole-batch/whole-chain statistics (reference dbm.py:515-639)."""
        from jax.sharding import PartitionSpec as P
        mesh, axis = self._mesh
        N_global = self.batch_size
        M_global = self.n_particles
        V = self.n_visible_
        dtype = self._jnp_dtype

        def epoch_fn(state, X_batches, lr, momentum, k_unused, key, iter0):
            my = jax.lax.axis_index(axis)

            def scan_body(carry, X_batch):
                state, it = carry
                it = it + 1
                step_key = jax.random.fold_in(jax.random.fold_in(key, it), my)
                stats, particles, aux = self._dbm_stats(
                    state, X_batch, k, step_key, axis_name=axis,
                    constrain=False)
                stats = jax.lax.psum(stats, axis)
                new_state = self._apply_dbm_update(
                    state, stats, particles, N_global, M_global, lr, momentum)
                v_means = self._reconstruction_means(new_state, aux['mu0'])
                # local squared error only; the cross-shard reduction is
                # batched into one vector psum after the scan
                sq = jnp.sum(jnp.square(X_batch - v_means))
                return (new_state, it), (sq, aux['n_mf'])

            (state, it), (sq_v, n_mf_v) = jax.lax.scan(
                scan_body, (state, iter0), X_batches)
            msre_v = jax.lax.psum(sq_v, axis) / \
                jnp.asarray(N_global * V, dtype)
            return state, it, (msre_v, n_mf_v)

        rep = P()
        shard = P(axis, None)
        state_spec = {'vb': rep, 'W': rep, 'hb': rep, 'dvb': rep, 'dW': rep,
                      'dhb': rep, 'q_means': rep, 'mu_means': rep,
                      'v': shard, 'H': shard}
        sm = jax.shard_map(
            epoch_fn, mesh=mesh,
            in_specs=(state_spec, P(None, axis, None), rep, rep, rep, rep,
                      rep),
            out_specs=(state_spec, rep, (rep, rep)),
            check_vma=False)
        return sm

    def _shardmap_epoch_program(self, k):
        """One jitted dispatch of the shard_map DBM epoch."""
        return jax.jit(self._shardmap_epoch_core(k))

    def _shardmap_block_program(self, k, use_val):
        """E epochs of mesh-sharded PCD/MF training in one jitted dispatch:
        the shard_map DBM epoch (sharded batch rows + persistent chains,
        psum'd statistics, pmax'd MF convergence) runs once per scanned
        epoch; the GSPMD remainder step and in-program val metrics wrap
        around it.  Key folds match the per-epoch mesh loop exactly."""
        sm = self._shardmap_epoch_core(k)

        def block_fn(state, full, rem, val_full, val_rem, lrs, moms,
                     ks_unused, key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, _, e = xs
                ekey = jax.random.fold_in(key, e)
                state, it, (msres, n_mfs) = sm(
                    state, full, lr, mom, jnp.zeros((), jnp.int32), ekey, it)
                parts = [msres, n_mfs]
                if rem is not None:
                    it = it + 1
                    state, (m, n) = self._train_step(
                        state, rem, lr, mom, k, jax.random.fold_in(ekey, it))
                    parts += [m, n]
                outs = self._block_val({'train': tuple(parts)}, state, e,
                                       val_full, val_rem, use_val)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, ks_unused, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _pallas_epoch_program(self, k, n_batches):
        from .ops.pallas_dbm import make_dbm_epoch_kernel
        # VMEM budget: weights + accumulators live twice (W, dW), plus the
        # persistent particles, one batch of mean-field buffers, the input
        # tile, and per-batch metric rows -- all resident for the epoch.
        sizes = [self.n_visible_] + list(self.n_hiddens_)
        w_elems = sum(sizes[i] * sizes[i + 1] for i in range(self.n_layers_))
        vmem = (2 * w_elems * 4
                + (self.n_particles + 2 * self.batch_size) * sum(sizes) * 4
                + n_batches * 1024
                + 12 * sum(sizes) * 4)
        if vmem > 96 * 1024 * 1024:
            return None
        return make_dbm_epoch_kernel(
            [self.n_visible_] + list(self.n_hiddens_),
            self.batch_size, self.n_particles, k,
            int(self.max_mf_updates), float(self.mf_tol),
            bool(self.sample_v_states), list(self.sample_h_states),
            float(self.l2), self.max_norm,
            list(self.sparsity_target), list(self.sparsity_cost),
            float(self.sparsity_damping))

    def _train_epoch_program(self):
        def epoch_fn(state, X_batches, lr, momentum, k, key, iter0):
            def scan_body(carry, X_batch):
                state, it = carry
                it = it + 1
                new_state, (msre, n_mf) = self._train_step(
                    state, X_batch, lr, momentum, k,
                    jax.random.fold_in(key, it))
                return (new_state, it), (msre, n_mf)
            (state, it), stacked = jax.lax.scan(scan_body, (state, iter0),
                                                X_batches)
            return state, it, stacked
        return jax.jit(epoch_fn)

    def _train_step_program(self):
        def step_fn(state, X_batch, lr, momentum, k, key, it):
            return self._train_step(state, X_batch, lr, momentum, k,
                                    jax.random.fold_in(key, it))
        return jax.jit(step_fn)

    def _val_core(self, state, val_full, val_rem):
        """In-program validation msre/n_mf over the staged val set;
        mean-field is deterministic, so values are identical to the
        dispatched `_val_metrics_program` path.  Returns (msres, n_mfs) of
        shape (n_val_batches,)."""
        def one_batch(X):
            mu, n_mf = self._mf(state, X)
            v_means = self._reconstruction_means(state, mu[0])
            msre = jnp.mean(jnp.square(X - v_means))
            # float cast: the nan rows of non-val epochs (lax.cond's other
            # branch) need a floating dtype
            return msre, n_mf.astype(self._jnp_dtype)

        parts_m, parts_n = [], []
        if val_full is not None and val_full.shape[0]:
            def scan_body(_, X_batch):
                return _, one_batch(X_batch)
            _, (ms, ns) = jax.lax.scan(scan_body, 0, val_full)
            parts_m.append(ms)
            parts_n.append(ns)
        if val_rem is not None:
            m, n = one_batch(val_rem)
            parts_m.append(m[None])
            parts_n.append(jnp.asarray(n)[None])
        return jnp.concatenate(parts_m), jnp.concatenate(parts_n)

    def _train_block_program(self, use_val):
        """E epochs of PCD/MF training in one jitted dispatch (the DBM
        analog of BaseRBM's epoch-block program).  Per-epoch lr / momentum
        / gibbs-k schedules arrive as (E,) arrays; validation metrics run
        in-program under their epoch cadence via `lax.cond`.  PRNG fold
        chains match the per-epoch programs exactly, so trajectories and
        metric streams are bitwise-identical (asserted in
        tests/test_dbm.py)."""
        def block_fn(state, full, rem, val_full, val_rem, lrs, moms, ks,
                     key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, k, e = xs
                ekey = jax.random.fold_in(key, e)

                def scan_body(carry, X_batch):
                    state, it = carry
                    it = it + 1
                    new_state, (msre, n_mf) = self._train_step(
                        state, X_batch, lr, mom, k,
                        jax.random.fold_in(ekey, it))
                    return (new_state, it), (msre, n_mf)

                (state, it), (msres, n_mfs) = jax.lax.scan(
                    scan_body, (state, it), full)
                parts = [msres, n_mfs]
                if rem is not None:
                    it = it + 1
                    state, (m, n) = self._train_step(
                        state, rem, lr, mom, k, jax.random.fold_in(ekey, it))
                    parts += [m, n]
                outs = self._block_val({'train': tuple(parts)}, state, e,
                                       val_full, val_rem, use_val)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, ks, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _block_val(self, outs, state, e, val_full, val_rem, use_val):
        """Fill `outs` with the in-program val-metrics entry of one block
        epoch under `lax.cond` at the val cadence (nan rows off-cadence)."""
        if not use_val:
            return outs
        val_every = int(self.val_metrics_every_epoch)
        nan = float('nan')

        def do_val(_):
            return self._val_core(state, val_full, val_rem)

        def no_val(_):
            nvb = (int(val_full.shape[0]) if val_full is not None else 0) \
                + (1 if val_rem is not None else 0)
            z = jnp.full((nvb,), nan, self._jnp_dtype)
            return z, z

        outs['val'] = jax.lax.cond(e % val_every == 0, do_val, no_val, None)
        return outs

    def _pallas_block_program(self, k, n_full, use_val):
        """E epochs of fused-kernel PCD/MF training in one jitted dispatch:
        the Pallas DBM-epoch kernel runs once per scanned epoch, the XLA
        remainder step and in-program val metrics wrap around it.  Kernel
        seed stream and remainder key folds are identical to the per-epoch
        Pallas path.  Returns None when the kernel declines the shape."""
        epoch_core = self._pallas_epoch_program(k, n_full)
        if epoch_core is None:
            return None

        def block_fn(state, full, rem, val_full, val_rem, lrs, moms, seeds,
                     key, iter0, epochs):
            def epoch_body(carry, xs):
                state, it = carry
                lr, mom, seed, e = xs
                if n_full > 0:
                    state, msres, n_mfs = epoch_core(state, full, lr, mom,
                                                     seed)
                    it = it + n_full
                    parts = [msres, n_mfs]
                else:
                    z = jnp.zeros((0,), self._jnp_dtype)
                    parts = [z, z]
                if rem is not None:
                    ekey = jax.random.fold_in(key, e)
                    it = it + 1
                    state, (m, n) = self._train_step(
                        state, rem, lr, mom, k, jax.random.fold_in(ekey, it))
                    parts += [m, n]
                outs = self._block_val({'train': tuple(parts)}, state, e,
                                       val_full, val_rem, use_val)
                return (state, it), outs

            (state, it), stacked = jax.lax.scan(
                epoch_body, (state, iter0), (lrs, moms, seeds, epochs))
            return state, stacked

        return jax.jit(block_fn)

    def _train_metrics_every(self):
        return int(self.train_metrics_every_iter)

    def _block_program(self, kind, kk, n_full, use_val, use_feg):
        """Cached in-block epoch program for `JAXModel._fit_epoch_blocks`
        (the DBM has no FEG metric; `use_feg` is always False here); None
        when the fused DBM kernel declines the shape (VMEM budget)."""
        if kind == 'xla':
            return self._program(('train_block', use_val),
                                 lambda: self._train_block_program(use_val))
        if kind == 'pallas':
            return self._program(('pallas_block', kk, n_full, use_val),
                                 lambda: self._pallas_block_program(
                                     kk, n_full, use_val))
        return self._program(('shardmap_block', kk, use_val),
                             lambda: self._shardmap_block_program(kk,
                                                                  use_val))


    def _make_block_finisher(self, stacked, epochs, iter0, per_epoch_iters,
                             n_full, has_rem, use_val, use_feg=False):
        """(arrays, consume) for a WHOLE BLOCK: one queued fetch of the
        stacked per-epoch metric arrays; `consume` replays the per-epoch
        scalar writes and verbose lines in epoch order."""
        every = int(self.train_metrics_every_iter)
        val_every = int(self.val_metrics_every_epoch)
        max_epoch = self.max_epoch
        arrays = list(stacked['train'])
        n_train = len(arrays)
        if use_val:
            arrays += list(stacked['val'])

        def consume(fetched):
            train = fetched[:n_train]
            val = fetched[n_train:n_train + 2] if use_val else None
            for i, e in enumerate(epochs):
                e = int(e)
                step = iter0 + (i + 1) * per_epoch_iters
                iters = step - per_epoch_iters + 1 + np.arange(
                    per_epoch_iters)
                mask = (iters % every) == 0
                train_msre = train_n_mf = None
                if mask.any():
                    msres = np.asarray(train[0][i]).reshape(-1)[:n_full]
                    n_mfs = np.asarray(train[1][i]).reshape(-1)[:n_full]
                    if n_train > 2:  # remainder step scalars
                        msres = np.append(msres, np.asarray(train[2][i]))
                        n_mfs = np.append(n_mfs, np.asarray(train[3][i]))
                    train_msre = float(msres[mask].mean())
                    train_n_mf = float(n_mfs[mask].mean())
                val_msre = val_n_mf = None
                if use_val and e % val_every == 0:
                    val_msre = float(np.mean(np.asarray(val[0][i])))
                    val_n_mf = float(np.mean(np.asarray(val[1][i])))
                if train_msre is not None:
                    self._train_writer.add_scalar(
                        'mean_squared_recon_error', train_msre, step)
                    self._train_writer.add_scalar('n_mf_updates',
                                                  train_n_mf, step)
                if val_msre is not None and np.isfinite(val_msre):
                    self._val_writer.add_scalar(
                        'mean_squared_recon_error', val_msre, step)
                    self._val_writer.add_scalar('n_mf_updates', val_n_mf,
                                                step)
                if self.verbose:
                    s = 'epoch: {0:{1}}/{2}'.format(
                        e, len(str(max_epoch)), max_epoch)
                    if train_msre is not None:
                        s += '; msre: {0:.5f}'.format(train_msre)
                    if train_n_mf is not None:
                        s += '; n_mf_upds: {0:.1f}'.format(train_n_mf)
                    if val_msre is not None and np.isfinite(val_msre):
                        s += '; val.msre: {0:.5f}'.format(val_msre)
                        s += '; val.n_mf_upds: {0:.1f}'.format(val_n_mf)
                    write_during_training(s)
            self._train_writer.flush()
            self._val_writer.flush()

        return arrays, consume

    def _val_metrics_program(self):
        def val_fn(state, X_batches):
            def scan_body(_, X_batch):
                mu, n_mf = self._mf(state, X_batch)
                v_means = self._reconstruction_means(state, mu[0])
                msre = jnp.mean(jnp.square(X_batch - v_means))
                return _, (msre, n_mf)
            _, stacked = jax.lax.scan(scan_body, 0, X_batches)
            return stacked
        return jax.jit(val_fn)

    def _transform_program(self):
        def transform_fn(state, X_batch):
            mu, _ = self._mf(state, X_batch)
            return mu[-1]
        return jax.jit(transform_fn)

    def _transform_scan_program(self):
        def fn(state, X_batches):
            def body(_, X_batch):
                mu, _ = self._mf(state, X_batch)
                return 0, mu[-1]
            _, G = jax.lax.scan(body, 0, X_batches)
            return G
        return jax.jit(fn)

    def _reconstruct_program(self):
        def recon_fn(state, X_batch):
            mu, _ = self._mf(state, X_batch)
            return self._reconstruction_means(state, mu[0])
        return jax.jit(recon_fn)

    def _reconstruct_scan_program(self):
        def fn(state, X_batches):
            def body(_, X_batch):
                mu, _ = self._mf(state, X_batch)
                return 0, self._reconstruction_means(state, mu[0])
            _, R = jax.lax.scan(body, 0, X_batches)
            return R
        return jax.jit(fn)

    def _sample_v_program(self):
        def sample_fn(state, k, key):
            v, H = self._particles_update(state, state['v'], state['H'],
                                          k, key, sample=True)
            # one extra non-sampled sweep for activation means; the sampled
            # H persists while v takes the means (reference dbm.py:641-648)
            v_means, _ = self._particles_gibbs_step(
                state, v, H, jax.random.fold_in(key, 2 ** 31 - 1), sample=False)
            new_state = dict(state)
            new_state['v'] = v_means
            new_state['H'] = H
            return new_state, v_means
        return jax.jit(sample_fn)

    # ---------------------------- AIS --------------------------------- #
    def _ais_unnorm_log_prob_h1(self, state, x, beta, b0=None):
        """log p~_beta on h1 with v, h2 summed out (dbm.py:650-660).

        With a base-rate bias `b0`, the geometric path interpolates from
        p0(h1) propto exp(h1.b0) instead of the uniform distribution
        (Salakhutdinov & Murray 2008): an extra (1-beta) * (x.b0) term."""
        log_p = beta * (x @ state['hb'][0])
        if b0 is not None:
            log_p += (1. - beta) * (x @ b0)
        T2 = x @ state['W'][0].T + state['vb']
        log_p += jnp.sum(jax.nn.softplus(beta * T2), axis=1)
        T3 = x @ state['W'][1] + state['hb'][1]
        log_p += jnp.sum(jax.nn.softplus(beta * T3), axis=1)
        return log_p

    def _ais_transition(self, state, x, beta, k, key, b0=None):
        """k-step tempered Gibbs transition on h1 (dbm.py:662-694)."""
        def body(i, x):
            ki = jax.random.fold_in(key, i)
            kv, k2, kx = jax.random.split(ki, 3)
            v = self._v_layer.activation(beta * (x @ state['W'][0].T),
                                         beta * state['vb'])
            if self.sample_v_states:
                v = self._v_layer.sample(kv, v)
            h2 = self._h_layers[1].activation(beta * (x @ state['W'][1]),
                                              beta * state['hb'][1])
            if self.sample_h_states[1]:
                h2 = self._h_layers[1].sample(k2, h2)
            T = v @ state['W'][0] + h2 @ state['W'][1].T
            bias = beta * state['hb'][0]
            if b0 is not None:
                bias = bias + (1. - beta) * b0
            x_hat = self._h_layers[0].activation(beta * T, bias)
            if self.sample_h_states[0]:
                x_hat = self._h_layers[0].sample(kx, x_hat)
            return x_hat
        return jax.lax.fori_loop(0, k, body, x)

    def _ais_program(self, betas, base_rate=None):
        """Annealed importance sampling along the inverse-temperature
        ladder `betas` (ascending, betas[0]=0, betas[-1]=1), all `n_runs`
        chains vectorized (dbm.py:696-736).  Non-uniform ladders and a
        base-rate p0 are this framework's robustness extensions (the
        reference supports only the uniform/uniform combination)."""
        betas = np.asarray(betas, dtype=np.float64)
        assert betas[0] == 0. and betas[-1] == 1. and len(betas) >= 2
        M = len(betas) - 1

        def ais_fn(state, k, key, x0):
            dtype = x0.dtype
            b0 = (None if base_rate is None
                  else jnp.asarray(base_rate, dtype=dtype))
            bts = jnp.asarray(betas, dtype=dtype)

            x1 = self._ais_transition(state, x0, bts[1], k,
                                      jax.random.fold_in(key, 0), b0=b0)
            log_Z = -self._ais_unnorm_log_prob_h1(state, x1, 0., b0=b0)

            def scan_body(carry, inp):
                log_Z, x = carry
                i, beta, beta_next = inp
                log_Z = log_Z + self._ais_unnorm_log_prob_h1(state, x, beta,
                                                             b0=b0)
                x_new = self._ais_transition(state, x, beta_next, k,
                                             jax.random.fold_in(key, i),
                                             b0=b0)
                log_Z = log_Z - self._ais_unnorm_log_prob_h1(state, x_new,
                                                             beta, b0=b0)
                return (log_Z, x_new), None

            idx = jnp.arange(1, M)
            (log_Z, x_M), _ = jax.lax.scan(
                scan_body, (log_Z, x1), (idx, bts[1:M], bts[2:M + 1]))
            log_Z = log_Z + self._ais_unnorm_log_prob_h1(state, x_M, 1.,
                                                         b0=b0)
            # log Z0 of the base distribution: v and h2 stay uniform
            # (softplus(0) = log 2 per unit); h1 contributes sum softplus(b0)
            # (= H1 * log 2 for the uniform b0 = 0 base)
            log_Z0 = (self.n_visible_ + self.n_hiddens_[1]) * np.log(2.)
            if base_rate is None:
                log_Z0 += self.n_hiddens_[0] * np.log(2.)
                return log_Z + jnp.asarray(log_Z0, dtype=dtype)
            return log_Z + jnp.asarray(log_Z0, dtype=dtype) + \
                jnp.sum(jax.nn.softplus(jnp.asarray(base_rate, dtype=dtype)))
        return jax.jit(ais_fn)

    def _ais_log_Z0(self, base_rate=None):
        """log Z of the AIS base distribution p0 (v, h2 uniform; h1 uniform
        or base-rate biased)."""
        log_Z0 = (self.n_visible_ + self.n_hiddens_[1]) * np.log(2.)
        if base_rate is None:
            return log_Z0 + self.n_hiddens_[0] * np.log(2.)
        return log_Z0 + float(np.sum(np.logaddexp(0., np.asarray(
            base_rate, dtype=np.float64))))

    def _reverse_ais_program(self, betas, base_rate=None):
        """Reverse AIS -- the backward half of BDMC (Grosse, Ghahramani &
        Adams 2015; Burda, Grosse & Salakhutdinov 2015).  No reference
        counterpart (reference dbm.py:696-736 implements only the forward
        direction).

        Anneal model -> base starting from (approximate) model samples
        `x0`.  Each bridge accumulates
        ``log p~_{g_{t+1}}(x_t) - log p~_{g_t}(x_t)`` with the ladder `g`
        DESCENDING 1 -> 0, and x_{t+1} ~ T_{g_{t+1}}(x_t), so
        ``E[exp(w_rev)] = Z0 / Z1`` exactly when x0 ~ p1.  Hence
        ``log Z0 - log_mean_exp(w_rev)`` is a stochastic UPPER bound on
        log Z1 (Jensen), complementing the forward estimate's stochastic
        LOWER bound: the pair brackets log Z even on peaked models where
        the sigma-interval is undefined.  Returns the per-chain reverse
        log-weights w_rev."""
        betas = np.asarray(betas, dtype=np.float64)
        assert betas[0] == 0. and betas[-1] == 1. and len(betas) >= 2
        gammas = betas[::-1].copy()  # descending 1 -> 0
        M = len(gammas) - 1

        def rais_fn(state, k, key, x0):
            dtype = x0.dtype
            b0 = (None if base_rate is None
                  else jnp.asarray(base_rate, dtype=dtype))
            gts = jnp.asarray(gammas, dtype=dtype)

            def scan_body(carry, inp):
                w, x = carry
                i, g, g_next = inp
                w = w + self._ais_unnorm_log_prob_h1(state, x, g_next,
                                                     b0=b0) \
                    - self._ais_unnorm_log_prob_h1(state, x, g, b0=b0)
                x_new = self._ais_transition(state, x, g_next, k,
                                             jax.random.fold_in(key, i),
                                             b0=b0)
                return (w, x_new), None

            idx = jnp.arange(M)
            w0 = jnp.zeros((x0.shape[0],), dtype)
            (w, _), _ = jax.lax.scan(scan_body, (w0, x0),
                                     (idx, gts[:M], gts[1:M + 1]))
            return w
        return jax.jit(rais_fn)

    def _model_h1_samples(self, n_runs, burn_in, key):
        """Approximate samples from p1(h1): start from the persistent PCD
        particles' first hidden layer (already near the model distribution
        after training) tiled to n_runs, then burn in `burn_in` tempered
        Gibbs sweeps at beta = 1."""
        h1 = self._state['H'][0]
        reps = int(np.ceil(n_runs / h1.shape[0]))
        x0 = jnp.tile(h1, (reps, 1))[:n_runs].astype(self._jnp_dtype)
        if self.sample_h_states[0]:
            # particles may be mean-valued; binarize for the h1 state space
            x0 = (x0 > 0.5).astype(self._jnp_dtype)
        if burn_in > 0:
            x0 = self._ais_transition(self._state, x0, 1., int(burn_in),
                                      key)
        return x0

    def _log_proba_program(self):
        """Variational lower bound -E(x, mu) + H(mu) (dbm.py:738-759)."""
        def lp_fn(state, X_batch):
            mu, _ = self._mf(state, X_batch)
            t1 = X_batch @ state['W'][0]
            minus_E = jnp.sum(t1 * mu[0], axis=1)
            t2 = mu[0] @ state['W'][1]
            minus_E += jnp.sum(t2 * mu[1], axis=1)
            minus_E += X_batch @ state['vb']
            minus_E += mu[0] @ state['hb'][0]
            minus_E += mu[1] @ state['hb'][1]

            s1 = jnp.clip(mu[0], 1e-7, 1. - 1e-7)
            s2 = jnp.clip(mu[1], 1e-7, 1. - 1e-7)
            S1 = -s1 * jnp.log(s1) - (1. - s1) * jnp.log(1. - s1)
            S2 = -s2 * jnp.log(s2) - (1. - s2) * jnp.log(1. - s2)
            ent = jnp.sum(S1, axis=1) + jnp.sum(S2, axis=1)
            return minus_E + ent
        self._log_proba_fn = lp_fn
        return jax.jit(lp_fn)

    def _log_proba_scan_program(self):
        self._program('log_proba', self._log_proba_program)
        fn = self._log_proba_fn

        def scan_fn(state, X_batches):
            def body(_, X_batch):
                return 0, fn(state, X_batch)
            _, P = jax.lax.scan(body, 0, X_batches)
            return P
        return jax.jit(scan_fn)

    # ================================================================== #
    # fit loop                                                            #
    # ================================================================== #
    def _preprocess(self, X):
        X = np.asarray(X)
        if X.dtype == np.float16 and self._np_dtype == np.float32:
            return X  # exact widening happens on device during staging
        return np.asarray(X, dtype=self._np_dtype)

    def _stage_batches(self, X):
        X = self._preprocess(X)
        B = self.batch_size
        n_full = len(X) // B
        full = X[:n_full * B].reshape(n_full, B, self.n_visible_)
        rem = X[n_full * B:]
        full = self._put(full, batched=True)
        rem = self._put(rem) if len(rem) else None
        return full, rem, n_full

    def _init_writers(self):
        from .utils.summary_writer import SummaryWriter
        if getattr(self, '_train_writer', None) is None:
            self._train_writer = SummaryWriter(self._train_summary_dirpath)
            self._val_writer = SummaryWriter(self._val_summary_dirpath)

    def _summary_device_stats(self, snap):
        """Device-side reduction for the epoch summaries: bucketed
        histograms of the weights/biases, per-layer cumulative-filter
        columns (the W_0 @ ... @ W_l products stay on device, only the
        first ``display_filters`` visible-space columns come back), and the
        first ``display_particles`` persistent chains."""
        out = {'vb': device_histogram(snap['vb']),
               'W': [device_histogram(w) for w in snap['W']],
               'hb': [device_histogram(b) for b in snap['hb']]}
        if self.display_filters:
            cum = snap['W'][0]
            filters = [cum[:, :self.display_filters]]
            for l in range(1, self.n_layers_):
                cum = cum @ snap['W'][l]
                filters.append(cum[:, :self.display_filters])
            out['W_filters'] = filters
        if self.display_particles:
            out['particles'] = snap['v'][:self.display_particles]
        return out

    def _write_epoch_summaries(self, s, step):
        """Per-epoch weight/bias histograms, cumulative-filter images per
        layer (reference dbm.py:312-322), and negative-particle images
        (dbm.py:531-547).  `step` is passed explicitly: this may run on the
        async checkpoint worker after the training thread advanced
        ``iter_``."""
        w = self._train_writer
        w.add_device_histogram('vb', s['vb'], step)
        for l in range(self.n_layers_):
            w.add_device_histogram('W_{0}'.format(l), s['W'][l], step)
            w.add_device_histogram('hb_{0}'.format(l), s['hb'][l], step)
        if self.display_filters:
            from .utils.plot_utils import filter_grid_image
            for l in range(self.n_layers_):
                img = filter_grid_image(s['W_filters'][l], self.v_shape,
                                        self.display_filters)
                w.add_image('W_filters_{0}'.format(l), img, step)
        if self.display_particles:
            from .utils.plot_utils import filter_grid_image
            v = np.asarray(s['particles']).T  # (V, n)
            img = filter_grid_image(v, self.v_shape, self.display_particles)
            w.add_image('negative_particles', img, step)

    def _fit(self, X, X_val=None, *args, **kwargs):
        self._fit_key = self.make_prng_key()
        self._init_writers()
        use_pallas = self._pallas_epoch_eligible()
        use_shardmap = (not use_pallas) and self._shardmap_eligible()
        epoch_prog = None if (use_pallas or use_shardmap) else \
            self._program('train_epoch', self._train_epoch_program)
        step_prog = self._program('train_step', self._train_step_program)
        full, rem, _ = self._stage_batches(X)
        # stage the validation set once (uploads dominate on remote links)
        staged_val = self._stage_batches(X_val) if X_val is not None else None

        # end-of-epoch host work runs on a depth-1 async pipeline (see
        # AsyncEpochWriter), overlapped with the next epoch on device
        aw = AsyncEpochWriter()
        mp = MetricsPipeline()
        try:
            self._fit_epochs(X_val, use_pallas, use_shardmap, epoch_prog,
                             step_prog, full, rem, staged_val, aw, mp)
        finally:
            mp.join()
            aw.join()
            if aw.n_dropped:
                from .utils.utils import write_during_training
                write_during_training(
                    '%d intermediate checkpoint(s) skipped under device-'
                    'link backpressure; final checkpoint written '
                    'synchronously' % aw.n_dropped)

    def _fit_epochs(self, X_val, use_pallas, use_shardmap, epoch_prog,
                    step_prog, full, rem, staged_val, aw, mp):
        # Dispatch whole EPOCH BLOCKS (up to 64 epochs per program --
        # fused Pallas kernel epochs, shard_map mesh epochs, or XLA epochs
        # -- with val metrics in-program): one link interaction per block
        # instead of several per epoch.  GSPMD mesh fallbacks keep the
        # per-epoch loop; BMT_EPOCH_BLOCKS=0 forces it everywhere (used by
        # the equivalence tests).
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
            lr = float(schedule_value(self.learning_rate, self.epoch_))
            mom = float(schedule_value(self.momentum, self.epoch_))
            k = int(schedule_value(self.n_gibbs_steps, self.epoch_))
            ekey = jax.random.fold_in(self._fit_key, self.epoch_)

            if use_pallas and full.shape[0] > 0:
                prog = self._program(
                    ('pallas_epoch', k, int(full.shape[0])),
                    lambda: self._pallas_epoch_program(k, int(full.shape[0])))
                if prog is None:
                    use_pallas = False
                    epoch_prog = self._program('train_epoch',
                                               self._train_epoch_program)
            iter0 = self.iter_
            parts = []
            n_full = int(full.shape[0])
            if use_pallas and n_full > 0:
                # host-cached per-epoch kernel seed (one dispatch for all
                # epochs; the per-epoch randint readback costs a round
                # trip on remote backends)
                seed = self._epoch_seed(self._fit_key, self.epoch_)
                self._state, msres, n_mfs = prog(self._state, full, lr, mom,
                                                 seed)
                self.iter_ += n_full
                parts = [msres, n_mfs]
            elif use_pallas:
                # zero full batches: grid-step-0 state DMA would never run;
                # only the remainder step below trains
                n_full = 0
            else:
                if use_shardmap:
                    epoch_prog = self._program(
                        ('shardmap_epoch', k),
                        lambda k=k: self._shardmap_epoch_program(k))
                self._state, it, (msres, n_mfs) = epoch_prog(
                    self._state, full, lr, mom, k, ekey, iter0)
                # the scan increments once per batch; no scalar readback
                self.iter_ += n_full
                parts = [msres, n_mfs]
            iters = iter0 + 1 + np.arange(n_full)
            if rem is not None:
                self.iter_ += 1
                self._state, (m, n) = step_prog(self._state, rem, lr, mom, k,
                                                ekey, self.iter_)
                if not parts:
                    parts = [np.zeros((0,), np.float32)] * 2
                parts += [m, n]
                iters = np.append(iters, self.iter_)

            # reference logs metrics every `train_metrics_every_iter` steps
            # -- pure host arithmetic, no device readback
            mask = (iters % self.train_metrics_every_iter) == 0
            pend_val = None
            if X_val is not None and \
                    self.epoch_ % self.val_metrics_every_epoch == 0:
                pend_val = self._dispatch_val_metrics(staged_val)

            # summaries reduce on device (KB-scale fetch); only checkpoint
            # epochs fetch the full state.  Histograms/images only when a
            # train step was logged this epoch
            want_summaries = bool(mask.any()) and \
                self.epoch_ % self.summaries_every_epoch == 0
            want_ckpt = self.save_after_each_epoch and \
                self.epoch_ % self.checkpoint_every_epoch == 0
            # metric readbacks + scalar writes + the verbose line run on
            # the deep metrics lane (whole batches of queued epochs drain
            # per link round trip); snapshots/checkpoints keep the
            # depth-1 heavy lane
            arrays, consume = self._make_epoch_finisher(parts, mask,
                                                        n_full, pend_val)
            mp.submit(arrays, consume)
            if want_summaries or want_ckpt:
                self._submit_epoch_host_work(aw, want_summaries, want_ckpt)

    def _make_epoch_finisher(self, parts, mask, n_full, pend_val):
        epoch_no = self.epoch_
        step = self.iter_
        want_train = bool(parts) and bool(mask.any())
        batched = (parts if want_train else []) + (pend_val or [])
        n_parts = len(parts) if want_train else 0

        def consume(fetched):
            train_msre = train_n_mf = None
            if want_train:
                msres = np.asarray(fetched[0]).reshape(-1)[:n_full]
                n_mfs = np.asarray(fetched[1]).reshape(-1)[:n_full]
                if n_parts > 2:  # remainder step scalars
                    msres = np.append(msres, np.asarray(fetched[2]))
                    n_mfs = np.append(n_mfs, np.asarray(fetched[3]))
                train_msre = float(msres[mask].mean())
                train_n_mf = float(n_mfs[mask].mean())
            val_msre = val_n_mf = None
            if pend_val is not None:
                val_msre, val_n_mf = self._reduce_val_metrics(
                    fetched[n_parts:])
            if train_msre is not None:
                self._train_writer.add_scalar('mean_squared_recon_error',
                                              train_msre, step)
                self._train_writer.add_scalar('n_mf_updates', train_n_mf,
                                              step)
            if val_msre is not None and np.isfinite(val_msre):
                self._val_writer.add_scalar('mean_squared_recon_error',
                                            val_msre, step)
                self._val_writer.add_scalar('n_mf_updates', val_n_mf, step)
            self._train_writer.flush()
            self._val_writer.flush()

            if self.verbose:
                s = 'epoch: {0:{1}}/{2}'.format(
                    epoch_no, len(str(self.max_epoch)), self.max_epoch)
                if train_msre is not None:
                    s += '; msre: {0:.5f}'.format(train_msre)
                if train_n_mf is not None:
                    s += '; n_mf_upds: {0:.1f}'.format(train_n_mf)
                if val_msre is not None and np.isfinite(val_msre):
                    s += '; val.msre: {0:.5f}'.format(val_msre)
                    s += '; val.n_mf_upds: {0:.1f}'.format(val_n_mf)
                write_during_training(s)

        return batched, consume

    def _dispatch_val_metrics(self, staged_val):
        prog = self._program('val', self._val_metrics_program)
        full, rem, _ = staged_val
        pending = []
        if full.shape[0]:
            pending += list(prog(self._state, full))
        if rem is not None:
            pending += list(prog(self._state, rem[None, ...]))
        return pending

    @staticmethod
    def _reduce_val_metrics(fetched):
        if not len(fetched):  # degenerate staged val set (no rows at all)
            return float('nan'), float('nan')
        # alternating (msre, n_mf) pairs
        msres = np.concatenate([np.atleast_1d(np.asarray(f))
                                for f in fetched[::2]])
        n_mfs = np.concatenate([np.atleast_1d(np.asarray(f))
                                for f in fetched[1::2]])
        return float(np.mean(msres)), float(np.mean(n_mfs))

    # ================================================================== #
    # public API                                                          #
    # ================================================================== #
    def transform(self, X, np_dtype=None):
        """Last-layer variational activations mu_L (reference dbm.py:859-872)."""
        self._ensure_state()
        np_dtype = np_dtype or self._np_dtype
        full, rem, n_full = self._stage_batches(X)
        G = np.zeros((len(X), self.n_hiddens_[-1]), dtype=np_dtype)
        if n_full:
            prog = self._program('transform_scan', self._transform_scan_program)
            # chunk the scan when the full feature map would not fit HBM
            # next to the staged inputs (see BaseRBM.transform); the MF
            # fixed point has no RNG, so chunked == single-scan trivially
            budget = float(os.environ.get(
                'BMT_TRANSFORM_CHUNK_GB', '2')) * 1e9
            B = self.batch_size
            batch_bytes = B * (self.n_hiddens_[-1] + self.n_visible_) * 4
            n_chunk = max(1, min(n_full, int(budget // max(batch_bytes, 1))))
            for c0 in range(0, n_full, n_chunk):
                nb = min(n_chunk, n_full - c0)
                chunk = full if n_full <= n_chunk else \
                    jax.lax.dynamic_slice_in_dim(full, c0, nb)
                G_c = prog(self._state, chunk)
                G[c0 * B:(c0 + nb) * B] = fetch_as(
                    G_c, np_dtype).reshape(-1, self.n_hiddens_[-1])
        if rem is not None:
            prog = self._program('transform', self._transform_program)
            G_b = prog(self._state, rem)
            G[n_full * self.batch_size:] = fetch_as(G_b, np_dtype)
        return G

    def reconstruct(self, X):
        """p(v | h0 = mu0(x)) reconstruction means (dbm.py:874-885)."""
        self._ensure_state()
        full, rem, n_full = self._stage_batches(X)
        X_recon = np.zeros_like(np.asarray(X, dtype=self._np_dtype))
        if n_full:
            prog = self._program('reconstruct_scan',
                                 self._reconstruct_scan_program)
            R = prog(self._state, full)
            X_recon[:n_full * self.batch_size] = np.asarray(R).reshape(
                -1, self.n_visible_)
        if rem is not None:
            prog = self._program('reconstruct', self._reconstruct_program)
            X_recon[n_full * self.batch_size:] = np.asarray(
                prog(self._state, rem))
        return X_recon

    def sample_v(self, n_gibbs_steps=0, save_model=False):
        """Visible activation means of the persistent chains after
        `n_gibbs_steps` sampled sweeps (dbm.py:887-897).  Mutates (and
        persists) the chains."""
        self._ensure_state()
        key = self.make_prng_key()
        if self._pallas_epoch_eligible():
            from .ops.pallas_dbm import make_dbm_sample_kernel
            prog = self._program(
                'pallas_sample_v',
                lambda: make_dbm_sample_kernel(
                    [self.n_visible_] + list(self.n_hiddens_),
                    self.n_particles, bool(self.sample_v_states),
                    list(self.sample_h_states)))
            seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
            self._state, v = prog(self._state, int(n_gibbs_steps), seed)
        else:
            prog = self._program('sample_v', self._sample_v_program)
            self._state, v = prog(self._state, int(n_gibbs_steps), key)
        v = np.asarray(v)
        if save_model:
            self.n_samples_generated_ += int(n_gibbs_steps)
            self._save_model()
        return v

    def log_Z(self, n_betas=100, n_runs=100, n_gibbs_steps=5,
              beta_schedule='linear', base_rate=None,
              bdmc=False, bdmc_burn_in=200):
        """AIS estimate of the log partition function for a 2-layer binary
        DBM: anneal on h1 with v, h2 summed out (dbm.py:899-939).

        Robustness extensions beyond the reference (all default OFF for
        parity): `beta_schedule='adaptive'` uses the Salakhutdinov-Murray
        ladder (dense near beta = 1); `base_rate` anneals from a
        non-uniform base p0(h1) propto exp(h1 . b0) -- pass an (H1,) array
        or 'hidden_bias' to use the model's own first hidden biases;
        `bdmc=True` additionally runs the annealing backward from
        (approximate) model samples -- bidirectional Monte Carlo (Grosse
        et al. 2015) -- whose estimate is a stochastic UPPER bound on
        log Z, so the forward/backward pair brackets log Z with a DEFINED
        gap even on peaked models where log(Z - sigma) does not exist.

        Returns (log_mean, (log_low, log_high), values) where low/high are
        log(Z_mean -+ std(Z)).  With bdmc=True the interval is instead the
        BDMC sandwich (forward estimate, reverse estimate) and `values`
        is a dict with the per-chain forward/reverse log-weights and both
        bounds."""
        self._ensure_state()
        assert self.n_layers_ == 2
        for L in [self._v_layer] + self._h_layers:
            assert isinstance(L, BernoulliLayer)

        if isinstance(base_rate, str):
            if base_rate != 'hidden_bias':
                raise ValueError("base_rate must be an array, None, or "
                                 "'hidden_bias'")
            base_rate = np.asarray(jax.device_get(self._state['hb'][0]))
        elif base_rate is not None:
            base_rate = np.asarray(base_rate, dtype=self._np_dtype)

        key = self.make_prng_key()
        k0, key = jax.random.split(key)
        if base_rate is None:
            p0 = 0.5
        else:  # draw x0 from the base-rate distribution itself
            p0 = jax.nn.sigmoid(jnp.asarray(base_rate, self._jnp_dtype))
        x0 = (jax.random.uniform(k0, (n_runs, self.n_hiddens_[0]),
                                 dtype=self._jnp_dtype) < p0) \
            .astype(self._jnp_dtype)

        use_pallas = (self.kernel != 'xla' and self.dtype == 'float32'
                      and self._mesh is None and n_runs % 8 == 0
                      and beta_schedule == 'linear' and base_rate is None
                      and jax.default_backend() == 'tpu')
        if use_pallas:
            from .ops.pallas_dbm import make_ais_kernel
            prog = self._program(
                ('pallas_ais', n_betas, n_runs, int(n_gibbs_steps)),
                lambda: make_ais_kernel(
                    self.n_visible_, self.n_hiddens_[0], self.n_hiddens_[1],
                    n_betas, int(n_gibbs_steps), n_runs,
                    sample_v=self.sample_v_states,
                    sample_h0=self.sample_h_states[0],
                    sample_h1=self.sample_h_states[1]))
            seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
            log_Z0 = (self.n_visible_ + self.n_hiddens_[0] +
                      self.n_hiddens_[1]) * np.log(2.)
            values = np.asarray(prog(self._state, seed, x0)) + log_Z0
        else:
            betas = make_beta_schedule(n_betas, beta_schedule)
            cache_key = ('ais', n_betas, beta_schedule,
                         None if base_rate is None
                         else hash(base_rate.tobytes()))
            prog = self._program(cache_key,
                                 lambda: self._ais_program(betas, base_rate))
            x0 = self._put(x0)
            values = np.asarray(prog(self._state, int(n_gibbs_steps), key, x0))

        log_mean = log_mean_exp(values)
        if bdmc:
            betas = make_beta_schedule(n_betas, beta_schedule)
            rcache_key = ('rais', n_betas, beta_schedule,
                          None if base_rate is None
                          else hash(base_rate.tobytes()))
            rprog = self._program(
                rcache_key,
                lambda: self._reverse_ais_program(betas, base_rate))
            kb, kr = jax.random.split(jax.random.fold_in(key, 271828))
            x1 = self._model_h1_samples(n_runs, bdmc_burn_in, kb)
            w_rev = np.asarray(rprog(self._state, int(n_gibbs_steps), kr,
                                     x1))
            log_Z0 = self._ais_log_Z0(base_rate)
            log_upper = log_Z0 - log_mean_exp(w_rev)
            return log_mean, (log_mean, log_upper), {
                'forward': values, 'reverse': w_rev,
                'log_Z_lower': log_mean, 'log_Z_upper': log_upper,
                'bdmc_gap': log_upper - log_mean,
            }
        log_std = log_std_exp(values, log_mean_exp_x=log_mean)
        log_high = log_sum_exp([log_std, log_mean])
        log_low = log_diff_exp([log_std, log_mean])[0]
        return log_mean, (log_low, log_high), values

    def log_proba(self, X_test, log_Z):
        """Variational lower bound on log p(x) minus log_Z (dbm.py:941-957)."""
        self._ensure_state()
        assert self.n_layers_ == 2
        for L in [self._v_layer] + self._h_layers:
            assert isinstance(L, BernoulliLayer)

        full, rem, n_full = self._stage_batches(X_test)
        P = np.zeros(len(X_test))
        if n_full:
            scan_prog = self._program('log_proba_scan',
                                      self._log_proba_scan_program)
            P_full = scan_prog(self._state, full)
            P[:n_full * self.batch_size] = np.asarray(P_full).reshape(-1)
        if rem is not None:
            prog = self._program('log_proba', self._log_proba_program)
            P[n_full * self.batch_size:] = np.asarray(prog(self._state, rem))
        return P - log_Z
