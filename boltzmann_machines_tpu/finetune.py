"""Discriminative fine-tuning: MLP classifiers warm-started from RBM/DBM
weights (the Keras + MultiAdam stage of the reference examples,
rbm_mnist.py:85-131, dbm_mnist.py:169-226, dbm_cifar_naive.py:208-256,
rebuilt as a jitted JAX training loop).

Supports the reference's fine-tuning recipe: glorot-initialized dense
stacks with optional warm-start weights per layer, sigmoid/relu
activations, batch-norm + dropout heads (CIFAR pipelines), L2 weight decay,
Adam with per-layer learning-rate multipliers, early stopping, and
reduce-LR-on-plateau."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .utils import one_hot, batch_iter
from .utils.rng import RNG


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape
    limit = np.sqrt(6. / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class MLPClassifier(object):
    """Dense softmax classifier with per-layer warm starts.

    Parameters
    ----------
    layers : list of dict
        One per hidden layer:
          units : int
          activation : 'sigmoid' | 'relu' | 'tanh'
          weights : optional (W, b) warm-start arrays
          batch_norm : bool (default False)
          dropout : float drop-probability after the activation (default 0)
          lr_multiplier : float (default 1.) -- per-layer Adam multiplier
    n_classes : int
    l2 : weight-decay coefficient on hidden kernels
    learning_rate : base Adam learning rate
    early_stopping_patience / reduce_lr_patience / reduce_lr_factor /
    min_lr : Keras-style callbacks semantics (monitor = val accuracy or
    val loss via `val_metric`)
    """

    def __init__(self, n_inputs, layers, n_classes=10, l2=1e-5,
                 learning_rate=1e-3, max_epoch=100, batch_size=128,
                 val_metric='val_acc', early_stopping_patience=12,
                 reduce_lr_patience=6, reduce_lr_factor=0.2, min_lr=1e-5,
                 random_seed=1337, verbose=True):
        self.n_inputs = n_inputs
        self.layers = layers
        self.n_classes = n_classes
        self.l2 = l2
        self.learning_rate = learning_rate
        self.max_epoch = max_epoch
        self.batch_size = batch_size
        self.val_metric = val_metric
        self.early_stopping_patience = early_stopping_patience
        self.reduce_lr_patience = reduce_lr_patience
        self.reduce_lr_factor = reduce_lr_factor
        self.min_lr = min_lr
        self.verbose = verbose
        self._rng = RNG(random_seed)
        self._params = None
        self._bn_stats = None
        self._opt_state = None

    # ------------------------------------------------------------------ #
    def _init_params(self):
        key = jax.random.PRNGKey(int(self._rng.randint(2 ** 31 - 1)))
        params = []
        bn = []
        fan_in = self.n_inputs
        for i, cfg in enumerate(self.layers + [dict(units=self.n_classes)]):
            units = cfg['units']
            key, k = jax.random.split(key)
            if cfg.get('weights') is not None:
                W, b = cfg['weights']
                W = jnp.asarray(W, jnp.float32)
                b = jnp.asarray(b, jnp.float32)
            else:
                W = glorot_uniform(k, (fan_in, units))
                b = jnp.zeros((units,), jnp.float32)
            params.append({'W': W, 'b': b})
            if cfg.get('batch_norm'):
                params[-1]['gamma'] = jnp.ones((units,), jnp.float32)
                params[-1]['beta'] = jnp.zeros((units,), jnp.float32)
                bn.append({'mean': jnp.zeros((units,), jnp.float32),
                           'var': jnp.ones((units,), jnp.float32)})
            else:
                bn.append(None)
            fan_in = units
        self._params = params
        self._bn_stats = bn

    def _apply(self, params, bn_stats, X, train, key):
        """Forward pass; returns (logits, new_bn_stats)."""
        h = X
        new_bn = []
        for i, cfg in enumerate(self.layers):
            p = params[i]
            h = h @ p['W'] + p['b']
            if cfg.get('batch_norm'):
                if train:
                    mean = jnp.mean(h, axis=0)
                    var = jnp.var(h, axis=0)
                    stats = {'mean': 0.99 * bn_stats[i]['mean'] + 0.01 * mean,
                             'var': 0.99 * bn_stats[i]['var'] + 0.01 * var}
                else:
                    mean, var = bn_stats[i]['mean'], bn_stats[i]['var']
                    stats = bn_stats[i]
                h = p['gamma'] * (h - mean) * jax.lax.rsqrt(var + 1e-5) \
                    + p['beta']
                new_bn.append(stats)
            else:
                new_bn.append(None)
            act = cfg.get('activation', 'sigmoid')
            h = getattr(jax.nn, act)(h)
            drop = cfg.get('dropout', 0.)
            if train and drop:
                key, k = jax.random.split(key)
                keep = 1. - drop
                mask = jax.random.bernoulli(k, keep, h.shape)
                h = jnp.where(mask, h / keep, 0.)
        p = params[-1]
        logits = h @ p['W'] + p['b']
        new_bn.append(None)
        return logits, new_bn

    def _loss(self, params, bn_stats, X, Y, key):
        logits, new_bn = self._apply(params, bn_stats, X, True, key)
        ce = optax.softmax_cross_entropy(logits, Y).mean()
        reg = sum(jnp.sum(jnp.square(params[i]['W'])) * self.l2
                  for i in range(len(self.layers)))
        return ce + reg, new_bn

    def _multipliers(self):
        """Per-layer lr multipliers on the dense kernel/bias only --
        batch-norm gamma/beta train at the full rate, as in the reference
        recipe where BN is a separate (unmatched) Keras layer."""
        mults = {}
        for i, cfg in enumerate(self.layers):
            m = float(cfg.get('lr_multiplier', 1.))
            mults['{0}/W'.format(i)] = m
            mults['{0}/b'.format(i)] = m
        return mults

    def _build_programs(self):
        from .utils.optimizers import scale_by_multipliers
        adam = optax.scale_by_adam()
        mults = self._multipliers()

        def train_step(params, bn_stats, opt_state, X, Y, lr, key):
            (loss, new_bn), grads = jax.value_and_grad(
                self._loss, has_aux=True)(params, bn_stats, X, Y, key)
            updates, opt_state = adam.update(grads, opt_state, params)
            updates = scale_by_multipliers(updates, mults, lr)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, new_bn, opt_state, loss

        def train_epoch(params, bn_stats, opt_state, Xb, Yb, lr, key):
            def step(carry, xy):
                params, bn_stats, opt_state, i = carry
                X, Y = xy
                params, bn_stats, opt_state, loss = train_step(
                    params, bn_stats, opt_state, X, Y, lr,
                    jax.random.fold_in(key, i))
                return (params, bn_stats, opt_state, i + 1), loss

            (params, bn_stats, opt_state, _), losses = jax.lax.scan(
                step, (params, bn_stats, opt_state, 0), (Xb, Yb))
            return params, bn_stats, opt_state, jnp.mean(losses)

        def evaluate(params, bn_stats, X, Y):
            logits, _ = self._apply(params, bn_stats, X, False,
                                    jax.random.PRNGKey(0))
            # include the L2 term, matching Keras' val_loss semantics
            reg = sum(jnp.sum(jnp.square(params[i]['W'])) * self.l2
                      for i in range(len(self.layers)))
            loss = optax.softmax_cross_entropy(logits, Y).mean() + reg
            acc = jnp.mean(jnp.argmax(logits, 1) == jnp.argmax(Y, 1))
            return loss, acc

        return jax.jit(train_epoch), jax.jit(train_step), jax.jit(evaluate)

    # ------------------------------------------------------------------ #
    def fit(self, X, y, X_val=None, y_val=None):
        if self._params is None:
            self._init_params()
        X = np.asarray(X, np.float32)
        Y = one_hot(np.asarray(y), self.n_classes).astype(np.float32)
        B = self.batch_size
        nb = len(X) // B
        d = X.shape[1]
        Xb = jnp.asarray(X[:nb * B].reshape(nb, B, d))
        Yb = jnp.asarray(Y[:nb * B].reshape(nb, B, self.n_classes))
        X_rem = jnp.asarray(X[nb * B:]) if len(X) % B else None
        Y_rem = jnp.asarray(Y[nb * B:]) if len(X) % B else None
        if X_val is not None:
            Xv = jnp.asarray(np.asarray(X_val, np.float32))
            Yv = jnp.asarray(one_hot(np.asarray(y_val),
                                     self.n_classes).astype(np.float32))

        train_epoch, train_step, evaluate = self._build_programs()
        adam = optax.scale_by_adam()
        opt_state = adam.init(self._params)
        lr = self.learning_rate
        best = -np.inf
        stall_es = stall_rlr = 0
        key = jax.random.PRNGKey(int(self._rng.randint(2 ** 31 - 1)))

        # per-epoch float(loss) readbacks are the natural heartbeats; a
        # silently hung link inside an epoch program trips the watchdog
        from .base.jax_model import hang_watchdog_window, heartbeat
        with hang_watchdog_window():
            self._fit_loop(train_epoch, train_step, evaluate, opt_state,
                           lr, best, stall_es, stall_rlr, key,
                           nb, Xb, Yb, X_rem, Y_rem,
                           Xv if X_val is not None else None,
                           Yv if X_val is not None else None, heartbeat)
        return self

    def _fit_loop(self, train_epoch, train_step, evaluate, opt_state,
                  lr, best, stall_es, stall_rlr, key, nb, Xb, Yb,
                  X_rem, Y_rem, Xv, Yv, heartbeat):
        X_val = Xv
        for epoch in range(1, self.max_epoch + 1):
            key, k = jax.random.split(key)
            loss = jnp.zeros(())
            if nb > 0:
                self._params, self._bn_stats, opt_state, loss = train_epoch(
                    self._params, self._bn_stats, opt_state, Xb, Yb, lr, k)
            if X_rem is not None:
                self._params, self._bn_stats, opt_state, rem_loss = \
                    train_step(self._params, self._bn_stats, opt_state,
                               X_rem, Y_rem, lr, jax.random.fold_in(k, nb))
                if nb == 0:
                    loss = rem_loss
            msg = 'mlp epoch {0}/{1}: loss {2:.4f}'.format(
                epoch, self.max_epoch, float(loss))
            heartbeat()
            if X_val is not None:
                vloss, vacc = evaluate(self._params, self._bn_stats, Xv, Yv)
                vloss, vacc = float(vloss), float(vacc)
                msg += '; val_loss {0:.4f}; val_acc {1:.4f}'.format(vloss, vacc)
                score = vacc if self.val_metric == 'val_acc' else -vloss
                if score > best + 1e-6:
                    best = score
                    stall_es = stall_rlr = 0
                else:
                    stall_es += 1
                    stall_rlr += 1
                if stall_rlr >= self.reduce_lr_patience and lr > self.min_lr:
                    lr = max(lr * self.reduce_lr_factor, self.min_lr)
                    stall_rlr = 0
                    msg += '; reducing lr to {0:.2e}'.format(lr)
                if stall_es >= self.early_stopping_patience:
                    if self.verbose:
                        print(msg + '; early stopping')
                    break
            if self.verbose:
                print(msg)
        return self

    def predict_proba(self, X):
        X = np.asarray(X, np.float32)
        if not hasattr(self, '_infer_fn'):
            def infer(params, bn_stats, X):
                logits, _ = self._apply(params, bn_stats, X, False,
                                        jax.random.PRNGKey(0))
                return jax.nn.softmax(logits, axis=-1)
            self._infer_fn = jax.jit(infer)
        from .base.jax_model import hang_watchdog_window, heartbeat
        out = []
        with hang_watchdog_window():
            for Xb in batch_iter(X, batch_size=4096):
                out.append(np.asarray(self._infer_fn(
                    self._params, self._bn_stats, jnp.asarray(Xb))))
                heartbeat()
        return np.concatenate(out, 0)

    def predict(self, X):
        return np.argmax(self.predict_proba(X), axis=1)

    def score(self, X, y):
        return float(np.mean(self.predict(X) == np.asarray(y)))

    def get_weights(self, layer):
        p = self._params[layer]
        return np.asarray(p['W']), np.asarray(p['b'])
