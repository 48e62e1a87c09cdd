"""Fine-tuning MLP + multi_adam tests."""

import numpy as np

import jax.numpy as jnp
import optax

from boltzmann_machines_tpu.finetune import MLPClassifier
from boltzmann_machines_tpu.utils.optimizers import multi_adam
from boltzmann_machines_tpu.utils import RNG


def _toy_data(n=512, d=16, seed=0):
    rng = RNG(seed)
    X = rng.rand(n, d).astype('float32')
    w = rng.randn(d, 3)
    y = np.argmax(X @ w, axis=1)
    return X, y


def test_mlp_learns_and_warm_start():
    X, y = _toy_data()
    mlp = MLPClassifier(16, [dict(units=8, activation='sigmoid')],
                        n_classes=3, max_epoch=30, batch_size=64,
                        early_stopping_patience=100, verbose=False,
                        random_seed=1)
    mlp.fit(X[:384], y[:384], X[384:], y[384:])
    assert mlp.score(X[384:], y[384:]) > 0.7

    # warm start from trained weights: accuracy preserved at epoch 0
    W, b = mlp.get_weights(0)
    W2, b2 = mlp.get_weights(1)
    mlp2 = MLPClassifier(16, [dict(units=8, activation='sigmoid',
                                   weights=(W, b))],
                         n_classes=3, max_epoch=1, batch_size=64,
                         verbose=False, random_seed=2)
    mlp2._init_params()
    np.testing.assert_allclose(np.asarray(mlp2._params[0]['W']), W)


def test_mlp_bn_dropout_path():
    X, y = _toy_data()
    mlp = MLPClassifier(16, [dict(units=8, activation='relu',
                                  batch_norm=True, dropout=0.3)],
                        n_classes=3, max_epoch=10, batch_size=64,
                        verbose=False, random_seed=1)
    mlp.fit(X[:384], y[:384], X[384:], y[384:])
    proba = mlp.predict_proba(X[384:])
    np.testing.assert_allclose(proba.sum(1), 1., atol=1e-5)
    # deterministic at inference (dropout off)
    np.testing.assert_allclose(proba, mlp.predict_proba(X[384:]))


def test_multi_adam_multipliers():
    params = {'dense_1': {'w': jnp.ones(4)}, 'dense_2': {'w': jnp.ones(4)}}
    grads = {'dense_1': {'w': jnp.ones(4)}, 'dense_2': {'w': jnp.ones(4)}}
    opt = multi_adam(learning_rate=0.1, lr_multipliers={'dense_1': 0.1})
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    u1 = float(updates['dense_1']['w'][0])
    u2 = float(updates['dense_2']['w'][0])
    # same adam direction, 10x smaller step on dense_1
    assert abs(u1 * 10 - u2) < 1e-6
    assert u2 < 0  # descent
