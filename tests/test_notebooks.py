"""Headless CI smoke for the analysis notebooks (SURVEY 2.24).

Executes both notebooks end-to-end with nbclient against tiny models
trained on synthetic data, so the notebook deliverable cannot rot: every
API they touch (load_model, transform, free_energy, sample_v, log_Z,
log_proba, reconstruct, plot utils) runs for real.  The notebooks read
BMT_NB_* environment knobs (model dirs, AIS ladder sizes, Gibbs steps)
that this test shrinks to smoke scale; without the knobs they default to
the full published workflow.
"""

import os

import numpy as np
import pytest

nbclient = pytest.importorskip('nbclient')
nbformat = pytest.importorskip('nbformat')

from boltzmann_machines_tpu import DBM, BernoulliRBM
from boltzmann_machines_tpu.utils.dataset import make_synthetic_mnist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _execute(name, env):
    path = os.path.join(REPO, 'notebooks', name)
    nb = nbformat.read(path, as_version=4)
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        client = nbclient.NotebookClient(
            nb, timeout=600, kernel_name='python3',
            resources={'metadata': {'path': os.path.join(REPO,
                                                         'notebooks')}})
        client.execute()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return nb


@pytest.fixture(scope='module')
def tiny_models(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('nb_models'))
    X, _ = make_synthetic_mnist(1024)
    X = (X / 255.).astype(np.float32)

    rbm_dir = os.path.join(root, 'rbm_mnist') + '/'
    rbm = BernoulliRBM(n_visible=784, n_hidden=64, max_epoch=2,
                       batch_size=64, random_seed=1337, verbose=False,
                       save_after_each_epoch=False, model_path=rbm_dir)
    rbm.fit(X)

    r1 = BernoulliRBM(n_visible=784, n_hidden=64, dbm_first=True,
                      max_epoch=2, batch_size=64, random_seed=1,
                      verbose=False, save_after_each_epoch=False,
                      model_path=os.path.join(root, 'r1') + '/')
    r1.fit(X)
    Q = r1.transform(X)
    r2 = BernoulliRBM(n_visible=64, n_hidden=32, dbm_last=True,
                      max_epoch=2, batch_size=64, random_seed=2,
                      verbose=False, save_after_each_epoch=False,
                      model_path=os.path.join(root, 'r2') + '/')
    r2.fit(Q)
    G = r2.transform(Q)

    dbm_dir = os.path.join(root, 'dbm_mnist') + '/'
    dbm = DBM(rbms=[r1, r2], n_particles=32, v_particle_init=X[:32],
              h_particles_init=(Q[:32], G[:32]), n_gibbs_steps=1,
              max_mf_updates=10, mf_tol=1e-7, learning_rate=1e-3,
              momentum=0.5, max_epoch=2, batch_size=64, max_norm=6.,
              random_seed=3, verbose=False, save_after_each_epoch=False,
              model_path=dbm_dir)
    dbm.fit(X)
    return rbm_dir, dbm_dir


def test_rbm_analysis_notebook_executes(tiny_models):
    rbm_dir, _ = tiny_models
    nb = _execute('rbm_mnist_analysis.ipynb', {
        'BMT_NB_RBM_DIR': rbm_dir,
        'BMT_NB_N': '512',
        'MPLBACKEND': 'Agg',
        'JAX_PLATFORMS': os.environ.get('JAX_PLATFORMS', 'cpu'),
    })
    assert any(c.cell_type == 'code' and c.outputs for c in nb.cells)


def test_dbm_analysis_notebook_executes(tiny_models):
    _, dbm_dir = tiny_models
    nb = _execute('dbm_mnist_analysis.ipynb', {
        'BMT_NB_DBM_DIR': dbm_dir,
        'BMT_NB_GIBBS': '50',
        'BMT_NB_BETAS': '100,200',
        'BMT_NB_RUNS': '16',
        'MPLBACKEND': 'Agg',
        'JAX_PLATFORMS': os.environ.get('JAX_PLATFORMS', 'cpu'),
    })
    assert any(c.cell_type == 'code' and c.outputs for c in nb.cells)
