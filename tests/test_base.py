"""Model-runtime tests: working-path derivation (pins reference
base/tests/test_tf_model.py:6-93 behavior) and the param protocol."""

import pytest

from boltzmann_machines_tpu.base import JAXModel, is_param_name, is_attribute_name


def paths_of(model_path):
    return JAXModel.compute_working_paths(model_path)


def test_filename_only():
    p = paths_of('model')
    assert p['model_dirpath'] == './'
    assert p['model_filepath'] == './model'
    assert p['params_filepath'] == './params.json'
    assert p['random_state_filepath'] == './random_state.json'
    assert p['train_summary_dirpath'] == './logs/train'
    assert p['val_summary_dirpath'] == './logs/val'

    p = paths_of('model-1')
    assert p['model_filepath'] == './model-1'


def test_dirname_only():
    p = paths_of('a/')
    assert p['model_dirpath'] == 'a/'
    assert p['model_filepath'] == 'a/model'
    assert p['params_filepath'] == 'a/params.json'

    p = paths_of('./')
    assert p['model_dirpath'] == './'
    assert p['model_filepath'] == './model'

    p = paths_of('b/a/')
    assert p['model_dirpath'] == 'b/a/'
    assert p['model_filepath'] == 'b/a/model'
    assert p['val_summary_dirpath'] == 'b/a/logs/val'


def test_empty():
    p = paths_of('')
    assert p['model_dirpath'] == './'
    assert p['model_filepath'] == './model'


def test_dir_and_file():
    p = paths_of('a/b')
    assert p['model_dirpath'] == 'a/'
    assert p['model_filepath'] == 'a/b'

    p = paths_of('./b')
    assert p['model_dirpath'] == './'
    assert p['model_filepath'] == './b'

    p = paths_of('a/b/c')
    assert p['model_dirpath'] == 'a/b/'
    assert p['model_filepath'] == 'a/b/c'
    assert p['params_filepath'] == 'a/b/params.json'


def test_naming_protocol():
    assert is_param_name('learning_rate')
    assert not is_param_name('epoch_')
    assert not is_param_name('_W')
    assert is_attribute_name('epoch_')
    assert not is_attribute_name('learning_rate')
    assert not is_attribute_name('_state')


def test_set_params_validation(tiny_data):
    from boltzmann_machines_tpu import BernoulliRBM
    rbm = BernoulliRBM(n_visible=12, n_hidden=8, verbose=False)
    rbm.set_params(max_epoch=5)
    assert rbm.max_epoch == 5
    with pytest.raises(ValueError):
        rbm.set_params(no_such_param=1)


def test_async_epoch_writer_orders_and_raises():
    """AsyncEpochWriter: single-worker pipeline runs jobs in submission
    order and re-raises worker exceptions on the training thread."""
    import time
    from boltzmann_machines_tpu.base.jax_model import AsyncEpochWriter

    aw = AsyncEpochWriter()
    seen = []

    def job(i, delay=0.01):
        def run():
            time.sleep(delay)
            seen.append(i)
        return run

    for i in range(4):
        assert aw.submit(job(i))
    aw.join()
    assert seen == [0, 1, 2, 3]

    def boom():
        raise RuntimeError('worker failed')

    aw.submit(boom)
    with pytest.raises(RuntimeError, match='worker failed'):
        aw.join()
    # the writer is reusable after an exception
    aw.submit(job(99, delay=0.0))
    aw.join()
    assert seen[-1] == 99


def test_async_epoch_writer_drops_heavy_under_backpressure():
    """Heavy (checkpoint-fetch) items are admission-controlled: while one
    is queued or running, further non-forced heavy submits are dropped so
    a slow link degrades checkpoint cadence, never training throughput.
    Light (summary) items are always accepted, and ``force=True`` (the
    end-of-fit checkpoint) bypasses the control."""
    import threading
    import time
    from boltzmann_machines_tpu.base.jax_model import AsyncEpochWriter

    aw = AsyncEpochWriter()
    seen = []
    gate = threading.Event()

    def slow_ckpt():
        gate.wait(5.0)
        seen.append('ckpt0')

    assert aw.submit(slow_ckpt, heavy=True)
    assert aw.heavy_busy()
    # a second heavy submit while the first is in flight is dropped ...
    assert not aw.submit(lambda: seen.append('ckpt1'), heavy=True)
    assert aw.n_dropped == 1
    # ... light work is still accepted ...
    assert aw.submit(lambda: seen.append('summary'))
    # ... and a forced heavy (final checkpoint) is accepted
    assert aw.submit(lambda: seen.append('final'), heavy=True, force=True)
    gate.set()
    aw.join()
    assert seen == ['ckpt0', 'summary', 'final']
    assert not aw.heavy_busy()


def test_sync_fetch_mode_runs_inline(monkeypatch, tiny_data, tmp_path):
    """BMT_SYNC_FETCH=1: both async lanes run inline on the calling thread
    (no background device touches -- the reliability mode for fragile
    remote workers), heavy submissions are never dropped, and a full fit
    with per-epoch checkpoints still round-trips."""
    import threading
    import numpy as np
    from boltzmann_machines_tpu import BernoulliRBM
    from boltzmann_machines_tpu.base.jax_model import (AsyncEpochWriter,
                                                       MetricsPipeline)

    monkeypatch.setenv('BMT_SYNC_FETCH', '1')
    main = threading.get_ident()
    ran_on = []

    aw = AsyncEpochWriter()
    assert aw.submit(lambda: ran_on.append(threading.get_ident()),
                     heavy=True)
    # inline: already executed, nothing in flight, next heavy accepted
    assert ran_on == [main]
    assert not aw.heavy_busy()
    assert aw.submit(lambda: ran_on.append(threading.get_ident()),
                     heavy=True)
    assert ran_on == [main, main]
    assert aw.n_dropped == 0
    aw.join()

    mp = MetricsPipeline()
    got = []
    mp.submit([np.arange(3.)], lambda fetched: got.append(
        (threading.get_ident(), [np.asarray(a) for a in fetched])))
    assert got and got[0][0] == main
    np.testing.assert_array_equal(got[0][1][0], np.arange(3.))
    mp.join()

    X, _ = tiny_data
    rbm = BernoulliRBM(n_visible=12, n_hidden=8, max_epoch=3, batch_size=8,
                       random_seed=1, verbose=False,
                       save_after_each_epoch=True, checkpoint_every_epoch=1,
                       metrics_config=dict(msre=True),
                       model_path=str(tmp_path) + '/')
    rbm.fit(X)
    loaded = BernoulliRBM.load_model(str(tmp_path) + '/')
    assert loaded.epoch_ == 3


def test_checkpoint_payload_snapshot(tiny_data, tmp_path):
    """The checkpoint metadata passed to the async worker reflects the epoch
    it was captured at, even if attributes advance afterwards."""
    from boltzmann_machines_tpu import BernoulliRBM
    X, _ = tiny_data
    rbm = BernoulliRBM(n_visible=12, n_hidden=8, max_epoch=1, batch_size=8,
                       random_seed=1, verbose=False,
                       model_path=str(tmp_path) + '/')
    rbm.fit(X)
    params, rng_state = rbm._checkpoint_payload()
    assert params['epoch_'] == 1
    rbm.epoch_ = 77  # training thread moves on; payload must not change
    assert params['epoch_'] == 1
    assert rng_state is not None
