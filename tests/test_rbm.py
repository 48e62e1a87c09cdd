"""RBM integration tests: ctor validation, seeded determinism, checkpoint /
resume trajectory identity (tier 3 of the reference's strategy; mirrors
reference rbm/tests/test_rbm.py:12-134)."""

import numpy as np
import pytest

from boltzmann_machines_tpu import BernoulliRBM, MultinomialRBM, GaussianRBM
from boltzmann_machines_tpu.rbm import logit_mean
from boltzmann_machines_tpu.utils import RNG

N_VISIBLE, N_HIDDEN = 12, 8

RBM_CONFIG = dict(n_visible=N_VISIBLE, n_hidden=N_HIDDEN,
                  sample_v_states=True, sample_h_states=True,
                  dropout=0.9, verbose=False, random_seed=1337,
                  max_epoch=2, batch_size=6)

CLASSES = {
    BernoulliRBM: {},
    MultinomialRBM: dict(n_samples=16),
    GaussianRBM: dict(sigma=1.),
}


@pytest.fixture
def X():
    return RNG(seed=1337).rand(16, N_VISIBLE)


@pytest.fixture
def X_val():
    return RNG(seed=42).rand(8, N_VISIBLE)


def weights_of(rbm):
    return rbm.get_params_arrays(scope='weights')


def assert_weights_equal(a, b):
    wa, wb = weights_of(a), weights_of(b)
    np.testing.assert_allclose(wa['W'], wb['W'])
    np.testing.assert_allclose(wa['vb'], wb['vb'])
    np.testing.assert_allclose(wa['hb'], wb['hb'])


@pytest.mark.parametrize('cls', list(CLASSES))
def test_W_init_validation(cls):
    for bad in [np.zeros((4, 2)), np.zeros((3, 3)), np.zeros((3, 2))]:
        with pytest.raises(ValueError):
            cls(n_visible=4, n_hidden=3, W_init=bad)
    cls(n_visible=4, n_hidden=3, W_init=np.zeros((4, 3)))
    cls(n_visible=1, n_hidden=1, W_init=np.zeros((1, 1)))


def test_seeded_init_deterministic(tmp_model_dir):
    a = BernoulliRBM(model_path=tmp_model_dir + 'a/', **RBM_CONFIG)
    b = BernoulliRBM(model_path=tmp_model_dir + 'b/', **RBM_CONFIG)
    a.init()
    b.init()
    assert_weights_equal(a, b)
    W = weights_of(a)['W']
    assert W.shape == (N_VISIBLE, N_HIDDEN)
    assert 0. < np.abs(W).mean() < 0.1  # ~N(0, 0.01)


@pytest.mark.parametrize('cls,extra,dtype', [
    (BernoulliRBM, {}, 'float32'),
    (BernoulliRBM, {}, 'float64'),
    (MultinomialRBM, dict(n_samples=16), 'float32'),
    (GaussianRBM, dict(sigma=1.), 'float32'),
])
def test_consistency(cls, extra, dtype, X, X_val, tmp_model_dir):
    """Same-seed models must be bitwise-identical through fit, extra fit,
    reload-from-disk, and another fit (reference test_rbm.py:69-114)."""
    cfg = dict(RBM_CONFIG, **extra)
    r1 = cls(model_path=tmp_model_dir + 'r1/', dtype=dtype, **cfg)
    r2 = cls(model_path=tmp_model_dir + 'r2/', dtype=dtype, **cfg)

    r1.fit(X)
    r2.fit(X)
    assert_weights_equal(r1, r2)
    H1, H2 = r1.transform(X_val), r2.transform(X_val)
    assert H1.shape == (len(X_val), N_HIDDEN)
    np.testing.assert_allclose(H1, H2)

    r1.set_params(max_epoch=r1.max_epoch + 1).fit(X)
    r2.set_params(max_epoch=r2.max_epoch + 1).fit(X)
    assert_weights_equal(r1, r2)

    r1 = cls.load_model(tmp_model_dir + 'r1/')
    r2 = cls.load_model(tmp_model_dir + 'r2/')
    assert_weights_equal(r1, r2)
    np.testing.assert_allclose(r1.transform(X_val), r2.transform(X_val))

    r1.set_params(max_epoch=r1.max_epoch + 1).fit(X)
    r2.set_params(max_epoch=r2.max_epoch + 1).fit(X)
    assert_weights_equal(r1, r2)
    np.testing.assert_allclose(r1.transform(X_val), r2.transform(X_val))


def test_consistency_with_val(X, X_val, tmp_model_dir):
    cfg = dict(RBM_CONFIG)
    cfg['metrics_config'] = dict(msre=True, pll=True, feg=True,
                                 train_metrics_every_iter=2)
    r1 = BernoulliRBM(model_path=tmp_model_dir + 'r1/', **cfg)
    r2 = BernoulliRBM(model_path=tmp_model_dir + 'r2/', **cfg)
    r1.fit(X, X_val)
    r2.fit(X, X_val)
    assert_weights_equal(r1, r2)
    np.testing.assert_allclose(r1.transform(X_val), r2.transform(X_val))


def _read_scalars(logdir):
    """(tag, step, value) triples from a logdir's scalars.jsonl sidecar."""
    import json
    import os
    path = os.path.join(logdir, 'scalars.jsonl')
    with open(path) as f:
        return sorted((r['tag'], r['step'], r['value'])
                      for r in map(json.loads, f))


def test_epoch_block_path_matches_per_epoch_path(X, X_val, tmp_model_dir,
                                                 monkeypatch):
    """The epoch-block fit loop (whole blocks of epochs in one jitted
    dispatch, val/FEG in-program under `lax.cond`) must be bitwise-
    identical to the per-epoch dispatch loop -- weights, transforms, AND
    the full scalar metric streams (train msre/pll/l2, val msre/pll, feg
    at their cadences)."""
    cfg = dict(RBM_CONFIG, max_epoch=5)
    cfg['metrics_config'] = dict(msre=True, pll=True, l2_loss=True, feg=True,
                                 train_metrics_every_iter=2,
                                 val_metrics_every_epoch=2,
                                 feg_every_epoch=3, n_batches_for_feg=2)
    rb = BernoulliRBM(model_path=tmp_model_dir + 'block/', **cfg)
    rb.fit(X, X_val)

    monkeypatch.setenv('BMT_EPOCH_BLOCKS', '0')
    rp = BernoulliRBM(model_path=tmp_model_dir + 'perepoch/', **cfg)
    rp.fit(X, X_val)

    assert_weights_equal(rb, rp)
    np.testing.assert_allclose(rb.transform(X_val), rp.transform(X_val))
    assert rb.epoch_ == rp.epoch_ and rb.iter_ == rp.iter_

    for side in ('train', 'val'):
        sb = _read_scalars(tmp_model_dir + 'block/logs/' + side)
        sp = _read_scalars(tmp_model_dir + 'perepoch/logs/' + side)
        assert [(t, s) for t, s, _ in sb] == [(t, s) for t, s, _ in sp]
        np.testing.assert_allclose([v for _, _, v in sb],
                                   [v for _, _, v in sp], rtol=1e-6)


def test_adaptive_block_cap_matches_uncapped(X, X_val, tmp_model_dir,
                                             monkeypatch):
    """With a per-program wall-clock budget active (the axon worker kills
    executions past ~1 min, so blocks are sized adaptively from measured
    epoch time -- jax_model._program_seconds_budget), the fit trajectory
    and metric streams must stay bitwise what the uncapped block path
    produces: block size is a dispatch detail, never semantics.  A tiny
    budget forces the cap to its 1-epoch floor, exercising the resize
    and re-measure paths."""
    cfg = dict(RBM_CONFIG, max_epoch=5)
    cfg['metrics_config'] = dict(msre=True, pll=True,
                                 train_metrics_every_iter=2,
                                 val_metrics_every_epoch=2)
    rb = BernoulliRBM(model_path=tmp_model_dir + 'uncapped/', **cfg)
    rb.fit(X, X_val)

    monkeypatch.setenv('BMT_MAX_PROGRAM_SECONDS', '1e-9')
    rc = BernoulliRBM(model_path=tmp_model_dir + 'capped/', **cfg)
    rc.fit(X, X_val)

    assert_weights_equal(rb, rc)
    assert rb.epoch_ == rc.epoch_ and rb.iter_ == rc.iter_
    for side in ('train', 'val'):
        su = _read_scalars(tmp_model_dir + 'uncapped/logs/' + side)
        sc = _read_scalars(tmp_model_dir + 'capped/logs/' + side)
        assert [(t, s) for t, s, _ in su] == [(t, s) for t, s, _ in sc]
        np.testing.assert_allclose([v for _, _, v in su],
                                   [v for _, _, v in sc], rtol=1e-6)


def test_block_then_per_epoch_resume_matches(X, X_val, tmp_model_dir,
                                             monkeypatch):
    """Training some epochs on the block path, then RESUMING on the
    per-epoch path (through a disk checkpoint), must land exactly where
    the same two fit calls on the per-epoch path land -- the paths are
    interchangeable at any fit boundary.  (Two fit calls are NOT compared
    to one longer fit: each `fit` draws a fresh fit key from the host
    RNG, the reference's per-call op-seed semantics.)"""
    cfg = dict(RBM_CONFIG, max_epoch=3)

    ra = BernoulliRBM(model_path=tmp_model_dir + 'a/', **cfg)
    ra.fit(X, X_val)                       # blocks (default)
    ra = BernoulliRBM.load_model(tmp_model_dir + 'a/')
    monkeypatch.setenv('BMT_EPOCH_BLOCKS', '0')
    ra.set_params(max_epoch=5).fit(X, X_val)   # per-epoch resume

    rb = BernoulliRBM(model_path=tmp_model_dir + 'b/', **cfg)
    rb.fit(X, X_val)                       # per-epoch from the start
    rb.set_params(max_epoch=5).fit(X, X_val)

    assert_weights_equal(ra, rb)
    assert ra.iter_ == rb.iter_ and ra.epoch_ == rb.epoch_


def test_learning_decreases_msre(tmp_model_dir):
    """CD-1 on separable binary data must reduce reconstruction error."""
    rng = RNG(seed=7)
    # two prototype patterns + noise
    protos = (rng.rand(2, N_VISIBLE) < 0.5).astype(float)
    X = protos[rng.randint(0, 2, 128)]
    flip = rng.rand(*X.shape) < 0.05
    X = np.abs(X - flip)

    def recon_msre(rbm):
        """Deterministic mean-field reconstruction error from the current
        weights (one up-down pass on activation means)."""
        w = weights_of(rbm)
        Hm = 1. / (1. + np.exp(-(X @ w['W'] + w['hb'])))
        Vm = 1. / (1. + np.exp(-(Hm @ w['W'].T + w['vb'])))
        return float(np.mean((X - Vm) ** 2))

    rbm = BernoulliRBM(n_visible=N_VISIBLE, n_hidden=N_HIDDEN,
                       max_epoch=1, batch_size=16, learning_rate=0.1,
                       momentum=0.5, l2=0., random_seed=1337, verbose=False,
                       save_after_each_epoch=False,
                       metrics_config=dict(msre=True, train_metrics_every_iter=1),
                       model_path=tmp_model_dir)
    rbm.fit(X)
    msre_after_1 = recon_msre(rbm)

    rbm.set_params(max_epoch=30)
    rbm.fit(X)
    msre_after_30 = recon_msre(rbm)
    assert msre_after_30 < msre_after_1

    fe_trained = rbm.free_energy(X)
    fe_random = rbm.free_energy((RNG(3).rand(128, N_VISIBLE) < 0.5).astype(float))
    # trained model assigns lower free energy (higher prob) to training data
    assert fe_trained < fe_random


def test_init_from(X, tmp_model_dir):
    cfg = dict(RBM_CONFIG)
    r1 = BernoulliRBM(model_path=tmp_model_dir + 'r1/', **cfg)
    r1.fit(X)
    r2 = BernoulliRBM(model_path=tmp_model_dir + 'r2/', **cfg)
    r2.init_from(r1)
    r2.init()
    assert_weights_equal(r1, r2)
    # momentum accumulators copied too (reference base_rbm.py:668-685)
    a1 = r1.get_params_arrays('grads_accumulators')
    a2 = r2.get_params_arrays('grads_accumulators')
    np.testing.assert_allclose(a1['dW'], a2['dW'])
    assert r2.epoch_ == r1.epoch_

    with pytest.raises(ValueError):
        GaussianRBM(n_visible=N_VISIBLE, n_hidden=N_HIDDEN).init_from(r1)


def test_multinomial_transform_normalized(X, tmp_model_dir):
    rbm = MultinomialRBM(n_visible=N_VISIBLE, n_hidden=N_HIDDEN, n_samples=16,
                         max_epoch=1, batch_size=8, verbose=False,
                         random_seed=1, model_path=tmp_model_dir)
    rbm.fit(X)
    H = rbm.transform(X)
    # expected softmax probabilities: each row sums to ~1
    np.testing.assert_allclose(H.sum(axis=1), np.ones(len(X)), atol=1e-4)


def test_multinomial_sampler_distribution():
    """Inverse-CDF bucket counting is an exact Multinomial(n, p) sampler:
    row sums, means, and variances match."""
    import jax
    import jax.numpy as jnp
    from boltzmann_machines_tpu.layers import MultinomialLayer
    L = MultinomialLayer(n_units=8, n_samples=100)
    means = L.activation(
        jnp.asarray(RNG(0).randn(4, 8), jnp.float32), jnp.zeros(8))
    S = np.asarray(jax.vmap(lambda k: L.sample(k, means))(
        jax.random.split(jax.random.PRNGKey(0), 2000)))
    assert (S.sum(-1) == 100).all()
    exp = np.asarray(means)
    assert np.abs(S.mean(0) - exp).max() < 0.5
    p = exp / 100.
    var_ratio = S.var(0) / (100 * p * (1 - p))
    assert np.abs(var_ratio - 1).max() < 0.25


def test_gaussian_preprocess_divides_by_sigma():
    g = GaussianRBM(n_visible=4, n_hidden=2, sigma=2., verbose=False)
    X = np.ones((3, 4))
    np.testing.assert_allclose(g._preprocess(X), 0.5 * np.ones((3, 4)))


def test_dbm_first_doubles_propup():
    rbm = BernoulliRBM(n_visible=4, n_hidden=2, dbm_first=True, verbose=False)
    assert rbm._propup_multiplier == 2.
    assert rbm._propdown_multiplier == 1.
    rbm = BernoulliRBM(n_visible=4, n_hidden=2, dbm_last=True, verbose=False)
    assert rbm._propup_multiplier == 1.
    assert rbm._propdown_multiplier == 2.


def test_float16_input_staging_is_exact(X, tmp_model_dir):
    """float16 inputs to a float32 model are widened to float32 ON DEVICE
    during staging (skipping the 2x host copy); f16 -> f32 is exact, so
    training must be bitwise-identical to casting on the host first."""
    X16 = X.astype(np.float16)
    cfg = dict(RBM_CONFIG, max_epoch=3)
    ra = BernoulliRBM(model_path=tmp_model_dir + 'f16/', **cfg)
    ra.fit(X16)
    rb = BernoulliRBM(model_path=tmp_model_dir + 'f32/', **cfg)
    rb.fit(X16.astype(np.float32))
    assert_weights_equal(ra, rb)
    np.testing.assert_array_equal(ra.transform(X16),
                                  rb.transform(X16.astype(np.float32)))
