"""Real-data quality evidence on sklearn's bundled handwritten digits.

MNIST/CIFAR downloads are blocked in the build environment, so full parity
with the reference's published numbers (README.md:155-175) is gated behind
tests/test_quality_parity.py (auto-runs once real MNIST is on disk).  The
UCI handwritten-digits set that ships *inside* scikit-learn (1797 real 8x8
images) lets us pin the reference's qualitative quality claims on genuine
data in every CI run:

- unsupervised RBM features improve a linear classifier over raw pixels
  (reference README.md:155-159: RBM features + LogReg 1.83% vs raw ~7.5%
  on MNIST);
- discriminative fine-tuning warm-started from RBM weights beats the same
  MLP from random init (reference README.md:170-175 semi-supervised gains).
"""

import numpy as np
import pytest

from boltzmann_machines_tpu import BernoulliRBM
from boltzmann_machines_tpu.finetune import MLPClassifier

sklearn = pytest.importorskip('sklearn')
from sklearn.datasets import load_digits
from sklearn.linear_model import LogisticRegression
from sklearn.model_selection import train_test_split


@pytest.fixture(scope='module')
def digits():
    d = load_digits()
    X = ((d.data / 16.) > 0.5).astype('float32')  # binarize stroke pixels
    return train_test_split(X, d.target, test_size=360, random_state=1337,
                            stratify=d.target)


@pytest.fixture(scope='module')
def trained_rbm(digits, tmp_path_factory):
    X_train, _, _, _ = digits
    rbm = BernoulliRBM(
        n_visible=64, n_hidden=256, n_gibbs_steps=1, learning_rate=0.05,
        momentum=list(np.geomspace(0.5, 0.9, 8)), max_epoch=600,
        batch_size=32, l2=1e-4, sparsity_target=0.1, sparsity_cost=1e-4,
        random_seed=1337, verbose=False, save_after_each_epoch=False,
        model_path=str(tmp_path_factory.mktemp('digits_rbm')) + '/')
    rbm.fit(X_train[:1408])  # whole batches only
    return rbm


def test_rbm_features_beat_raw_pixels(digits, trained_rbm):
    X_train, X_test, y_train, y_test = digits
    raw = LogisticRegression(max_iter=2000).fit(
        X_train, y_train).score(X_test, y_test)
    feat = LogisticRegression(max_iter=2000).fit(
        trained_rbm.transform(X_train), y_train).score(
        trained_rbm.transform(X_test), y_test)
    # measured: raw 0.9250, features 0.9361 (seed 1337)
    assert feat >= 0.92
    assert feat >= raw


def test_classifier_trio_on_rbm_features(digits, trained_rbm):
    """The reference's notebook workflow compares kNN / LogReg / SVM on
    RBM features (README.md:155-159: 2.88% / 1.83% / 1.80% MNIST test
    error).  On the bundled real digits: every classifier stays strong on
    the features, and the feature space helps the weaker classifiers
    (kNN, LogReg) while costing the kernel SVM at most noise.

    Measured (seed 1337): knn 0.9444 -> 0.9500, logreg 0.9250 -> 0.9361,
    svm 0.9639 -> 0.9611."""
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.svm import SVC
    X_train, X_test, y_train, y_test = digits
    F_train = trained_rbm.transform(X_train)
    F_test = trained_rbm.transform(X_test)

    scores = {}
    for name, mk in [('knn', lambda: KNeighborsClassifier(n_neighbors=5)),
                     ('logreg', lambda: LogisticRegression(max_iter=2000)),
                     ('svm', lambda: SVC(C=5., gamma='scale'))]:
        raw = mk().fit(X_train, y_train).score(X_test, y_test)
        feat = mk().fit(F_train, y_train).score(F_test, y_test)
        scores[name] = (raw, feat)
        assert feat >= 0.93, (name, feat)
    assert scores['knn'][1] >= scores['knn'][0]
    assert scores['logreg'][1] >= scores['logreg'][0]
    assert scores['svm'][1] >= scores['svm'][0] - 0.01


def test_finetune_warm_start_beats_random_init(digits, trained_rbm):
    X_train, X_test, y_train, y_test = digits
    Xt, Xv, yt, yv = train_test_split(X_train, y_train, test_size=160,
                                      random_state=7, stratify=y_train)
    w = trained_rbm.get_params_arrays('weights')

    def accuracy(warm):
        layers = [dict(units=256, activation='sigmoid',
                       weights=(w['W'], w['hb']) if warm else None,
                       lr_multiplier=0.1 if warm else 1.)]
        mlp = MLPClassifier(n_inputs=64, layers=layers, n_classes=10,
                            max_epoch=100, batch_size=64, random_seed=1,
                            verbose=False)
        mlp.fit(Xt, yt, Xv, yv)
        return float((mlp.predict(X_test) == y_test).mean())

    warm, cold = accuracy(True), accuracy(False)
    # measured: warm 0.9306, cold 0.9083 (seed 1)
    assert warm >= 0.92
    assert warm > cold


def test_semi_supervised_labeled_subsets(digits, trained_rbm):
    """Reference README.md:170-175 mechanics on real data: pretrain the
    generative model on the full *unlabeled* corpus, then fine-tune a
    classifier on shrinking labeled subsets, warm-started from the RBM
    weights vs. randomly initialized.  The reference's MNIST table shows
    the warm-start gain growing as labels shrink (+0.53% at 60k labels ->
    +5.68% at 100 labels); on the bundled 1,437 real training digits the
    same mechanics must hold: warm >= cold on every subset, with a
    strictly positive gain once labels are scarce.

    Measured (seed 1):
      labels  warm    cold    gain
      1437    0.9194  0.9111  +0.8%
       320    0.8778  0.8333  +4.4%
       128    0.8611  0.7861  +7.5%
    """
    X_train, X_test, y_train, y_test = digits
    w = trained_rbm.get_params_arrays('weights')

    def accuracy(n_labels, warm, batch_size):
        # stratified labeled subset, 80/20 train/val split
        if n_labels >= len(X_train):
            Xs, ys = X_train, y_train
        else:
            Xs, _, ys, _ = train_test_split(
                X_train, y_train, train_size=n_labels, random_state=11,
                stratify=y_train)
        n_val = max(n_labels // 5, 20)
        Xt, Xv, yt, yv = train_test_split(Xs, ys, test_size=n_val,
                                          random_state=7, stratify=ys)
        layers = [dict(units=256, activation='sigmoid',
                       weights=(w['W'], w['hb']) if warm else None,
                       lr_multiplier=0.01 if warm else 1.)]
        mlp = MLPClassifier(n_inputs=64, layers=layers, n_classes=10,
                            max_epoch=100, batch_size=batch_size,
                            random_seed=1, verbose=False)
        mlp.fit(Xt, yt, Xv, yv)
        return float((mlp.predict(X_test) == y_test).mean())

    gains = {}
    for n_labels, batch_size in [(len(X_train), 64), (320, 32), (128, 16)]:
        warm = accuracy(n_labels, True, batch_size)
        cold = accuracy(n_labels, False, batch_size)
        gains[n_labels] = warm - cold
        assert warm >= cold - 0.005, (n_labels, warm, cold)
    # scarce-label regime: pretraining must deliver a real gain
    assert gains[320] > 0.01, gains
    assert gains[128] > 0.02, gains


def test_dbm_generative_stack_beats_independent_baseline(digits,
                                                         tmp_path_factory):
    """Full generative stack on real data: greedy pretraining -> joint
    PCD/MF training -> AIS partition function -> variational ELBO.  The
    trained DBM's held-out ELBO must beat the independent-pixel baseline
    (the reference validates its DBMs the same way, via AIS + ELBO against
    published numbers, README.md:186-198)."""
    from boltzmann_machines_tpu import DBM
    X_train, X_test, _, _ = digits
    X_train = X_train[:1408]
    root = str(tmp_path_factory.mktemp('digits_dbm')) + '/'

    r1 = BernoulliRBM(n_visible=64, n_hidden=64, dbm_first=True,
                      learning_rate=0.05, momentum=0.9, max_epoch=40,
                      batch_size=32, l2=1e-4, random_seed=1, verbose=False,
                      save_after_each_epoch=False, model_path=root + 'r1/')
    r1.fit(X_train)
    Q = r1.transform(X_train)
    r2 = BernoulliRBM(n_visible=64, n_hidden=32, dbm_last=True,
                      learning_rate=0.05, momentum=0.9, max_epoch=40,
                      batch_size=32, l2=1e-4, random_seed=2, verbose=False,
                      save_after_each_epoch=False, model_path=root + 'r2/')
    r2.fit(Q)
    G = r2.transform(Q)

    dbm = DBM(rbms=[r1, r2], n_particles=64, v_particle_init=X_train[:64],
              h_particles_init=(Q[:64], G[:64]), n_gibbs_steps=1,
              max_mf_updates=20, mf_tol=1e-7,
              learning_rate=np.geomspace(0.01, 1e-3, 50), momentum=0.9,
              max_epoch=50, batch_size=32, max_norm=6., random_seed=3,
              verbose=False, save_after_each_epoch=False,
              model_path=root + 'dbm/')
    dbm.fit(X_train)

    log_Z, (lo, hi), _ = dbm.log_Z(n_betas=2000, n_runs=48, n_gibbs_steps=1)
    assert np.isfinite(lo) and hi - lo < 2.  # tight estimator interval
    # AIS self-consistency on real data: an independent estimate with a
    # 5x finer temperature ladder (fresh RNG draw) agrees within the
    # reference's quality-gate tolerance of +-0.5 nats (README.md:192-193
    # shows 1040.39 vs 1040.58 for its 200k- vs 20k-beta ladders)
    log_Z2, _, _ = dbm.log_Z(n_betas=10000, n_runs=48, n_gibbs_steps=1)
    assert abs(log_Z2 - log_Z) < 0.5, (log_Z, log_Z2)
    elbo = float(np.mean(dbm.log_proba(X_test, log_Z=log_Z)))

    p = X_train.mean(axis=0).clip(1e-3, 1. - 1e-3)
    indep = float(np.mean(X_test @ np.log(p) + (1. - X_test) @ np.log1p(-p)))
    # measured: elbo -19.2 vs baseline -24.7 (seed-stable by >5 nats)
    assert elbo > indep + 2.
