"""Fragile device-link auto-recovery: a dead-worker/stalled-fetch error
during the block-dispatch fit loop must downgrade the process to
synchronous inline fetch, reload the last checkpoint, and retry -- with
the retried trajectory bitwise-identical to a fresh-process resume.
(The tunneled dev chip's worker dies under concurrent readbacks; round 4
required operators to pre-set BMT_SYNC_FETCH, round 5 auto-detects.)"""

import time

import numpy as np
import pytest

from boltzmann_machines_tpu import BernoulliRBM
from boltzmann_machines_tpu.base import jax_model as jm
from boltzmann_machines_tpu.utils import RNG

N_VISIBLE, N_HIDDEN = 12, 8

CONFIG = dict(n_visible=N_VISIBLE, n_hidden=N_HIDDEN,
              sample_v_states=True, sample_h_states=True,
              verbose=False, random_seed=1337,
              max_epoch=4, batch_size=8,
              checkpoint_every_epoch=2,
              metrics_config=dict(msre=True, train_metrics_every_iter=2))


@pytest.fixture(autouse=True)
def _reset_forced_sync(monkeypatch):
    """The downgrade latch is process-global by design; isolate tests."""
    monkeypatch.setenv('BMT_LINK_RETRY_BACKOFF', '0')
    yield
    jm._FORCED_SYNC = False


@pytest.fixture
def X():
    return RNG(seed=1337).rand(16, N_VISIBLE)


def weights_of(rbm):
    return rbm.get_params_arrays(scope='weights')


def test_is_link_failure_classification():
    assert jm._is_link_failure(RuntimeError('UNAVAILABLE: socket closed'))
    assert jm._is_link_failure(RuntimeError('DEADLINE_EXCEEDED: 10s'))
    assert jm._is_link_failure(
        RuntimeError('INTERNAL: failed to complete all kernels'))
    assert jm._is_link_failure(OSError('Connection reset by peer'))
    # chained cause is inspected too
    outer = RuntimeError('while fetching metrics')
    outer.__cause__ = ConnectionError('broken pipe')
    assert jm._is_link_failure(outer)
    # ordinary bugs are NOT link failures
    assert not jm._is_link_failure(ValueError('shapes (3,) and (4,)'))
    assert not jm._is_link_failure(KeyError('W'))
    assert not jm._is_link_failure(ZeroDivisionError())


def _inject_dispatch_failure(rbm, exc, at_epoch):
    """Make the first block program dispatched at `rbm.epoch_ == at_epoch`
    raise `exc` (simulating the remote worker dying mid-dispatch)."""
    orig = rbm._block_program
    fired = {'n': 0}

    def failing(kind, kk, n_full, use_val, use_feg):
        prog = orig(kind, kk, n_full, use_val, use_feg)

        def wrapped(*a, **kw):
            if fired['n'] == 0 and rbm.epoch_ == at_epoch:
                fired['n'] += 1
                raise exc
            return prog(*a, **kw)

        return wrapped

    rbm._block_program = failing
    return fired


def test_link_failure_downgrades_and_retries(X, tmp_model_dir, capfd):
    """A link failure mid-fit: the fit survives, the process downgrades to
    sync fetch, and the result is bitwise the documented resume
    trajectory (fit-to-checkpoint, then load_model + fit)."""
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'flaky/', **CONFIG)
    fired = _inject_dispatch_failure(
        rbm, RuntimeError('UNAVAILABLE: socket closed (injected)'),
        at_epoch=2)
    rbm.fit(X)

    assert fired['n'] == 1
    assert rbm.epoch_ == 4
    assert jm._FORCED_SYNC  # downgrade latched for the process
    err = capfd.readouterr().err
    assert 'downgrading to synchronous inline fetch' in err
    assert 'resuming from checkpoint at epoch 2' in err

    # reference trajectory: uninterrupted fit to the checkpoint epoch,
    # then a fresh-process resume (each fit draws a fresh fit key from
    # the restored host RNG -- the documented per-call op-seed semantics)
    jm._FORCED_SYNC = False
    ref = BernoulliRBM(model_path=tmp_model_dir + 'ref/',
                       **dict(CONFIG, max_epoch=2))
    ref.fit(X)
    ref = BernoulliRBM.load_model(tmp_model_dir + 'ref/')
    ref.set_params(max_epoch=4).fit(X)

    wa, wb = weights_of(rbm), weights_of(ref)
    np.testing.assert_array_equal(wa['W'], wb['W'])
    np.testing.assert_array_equal(wa['vb'], wb['vb'])
    np.testing.assert_array_equal(wa['hb'], wb['hb'])
    assert rbm.iter_ == ref.iter_


def test_link_failure_without_checkpoint_retries_in_memory(X, tmp_model_dir,
                                                           capfd):
    """No checkpoint on disk yet: recovery retries from the in-memory
    state instead of failing."""
    cfg = dict(CONFIG, save_after_each_epoch=False)
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'nockpt/', **cfg)
    fired = _inject_dispatch_failure(
        rbm, RuntimeError('UNAVAILABLE: socket closed (injected)'),
        at_epoch=0)
    rbm.fit(X)
    assert fired['n'] == 1
    assert rbm.epoch_ == 4
    assert 'no checkpoint on disk' in capfd.readouterr().err


def test_poisoned_state_rolls_back_to_fit_start_snapshot(X, tmp_model_dir,
                                                         capfd):
    """No checkpoint AND the in-memory state died with the worker (its
    device arrays are unreadable): recovery must roll back to the
    fit-start host snapshot instead of burning every retry on a poisoned
    pointer -- and the rolled-back run repeats the fit-start trajectory,
    so the final weights equal an uninterrupted fit's."""
    cfg = dict(CONFIG, save_after_each_epoch=False)
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'poison/', **cfg)
    fired = _inject_dispatch_failure(
        rbm, RuntimeError('UNAVAILABLE: socket closed (injected)'),
        at_epoch=2)
    orig_get = rbm._get_state_arrays
    calls = {'n': 0}

    def poisoned_get():
        calls['n'] += 1
        if calls['n'] == 2:  # call 1 = fit-start snapshot; 2 = recovery
            raise RuntimeError('UNAVAILABLE: worker crashed (injected)')
        return orig_get()

    rbm._get_state_arrays = poisoned_get
    rbm.fit(X)
    assert fired['n'] == 1
    assert rbm.epoch_ == 4
    err = capfd.readouterr().err
    assert 'rolled back to the fit-start snapshot at epoch 0' in err

    jm._FORCED_SYNC = False
    ref = BernoulliRBM(model_path=tmp_model_dir + 'poison_ref/', **cfg)
    ref.fit(X)
    wa, wb = weights_of(rbm), weights_of(ref)
    np.testing.assert_array_equal(wa['W'], wb['W'])
    np.testing.assert_array_equal(wa['vb'], wb['vb'])
    np.testing.assert_array_equal(wa['hb'], wb['hb'])
    assert rbm.iter_ == ref.iter_


def test_non_link_error_propagates(X, tmp_model_dir):
    """Ordinary exceptions must NOT trigger the downgrade/retry path."""
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'bug/', **CONFIG)
    fired = _inject_dispatch_failure(rbm, ValueError('a real bug'),
                                     at_epoch=2)
    with pytest.raises(ValueError, match='a real bug'):
        rbm.fit(X)
    assert fired['n'] == 1
    assert not jm._FORCED_SYNC


def test_retry_budget_exhausts(X, tmp_model_dir, monkeypatch):
    """A link that never comes back re-raises after BMT_LINK_RETRIES."""
    monkeypatch.setenv('BMT_LINK_RETRIES', '2')
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'dead/', **CONFIG)
    calls = {'n': 0}

    def always_fail(kind, kk, n_full, use_val, use_feg):
        def wrapped(*a, **kw):
            calls['n'] += 1
            raise RuntimeError('UNAVAILABLE: socket closed (injected)')
        return wrapped

    rbm._block_program = always_fail
    with pytest.raises(RuntimeError, match='UNAVAILABLE'):
        rbm.fit(X)
    assert calls['n'] == 3  # initial attempt + 2 retries


def test_recorded_fetch_error_surfaces_and_recovers(X, tmp_model_dir):
    """An error recorded by the async metrics lane (the worker-thread
    fetch path) surfaces at the next submit and goes through the same
    downgrade + retry."""
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'lane/', **CONFIG)
    orig_fit_epochs = rbm._fit_epochs
    state = {'armed': False, 'mp': None}

    def arming(X_val, use_pallas, use_shardmap, epoch_prog, step_prog,
               full, rem, staged_train, staged_val, aw, mp):
        if not state['armed']:
            state['armed'] = True
            # simulate: a fetch in the metrics lane died on the worker
            # thread after the first block; the error is recorded and
            # must surface at the NEXT submit (deterministic stand-in
            # for the inherently racy worker-thread timing)
            orig_submit = mp.submit
            seen = {'n': 0}

            def submit(arrays, consume):
                seen['n'] += 1
                if seen['n'] == 2:
                    mp._record(RuntimeError(
                        'UNAVAILABLE: socket closed (injected lane)'))
                return orig_submit(arrays, consume)

            mp.submit = submit
        return orig_fit_epochs(X_val, use_pallas, use_shardmap, epoch_prog,
                               step_prog, full, rem, staged_train,
                               staged_val, aw, mp)

    rbm._fit_epochs = arming
    rbm.fit(X)
    assert rbm.epoch_ == 4
    assert jm._FORCED_SYNC


def test_chunked_staging_bitwise(X, tmp_model_dir, monkeypatch):
    """Slab-staged uploads (forced via a tiny BMT_STAGE_SLAB_MB) stage
    bitwise-identical batches to the direct single-transfer path.  (The
    one-shot ~6 GB device_put that staged the dbm_cifar G-RBM training
    set crashed the tunneled worker; large arrays now stream in slabs.)"""
    import jax.numpy as jnp
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'slab/', **CONFIG)
    monkeypatch.setenv('BMT_STAGE_SLAB_MB', '0')  # 1 row per slab
    full, rem, n_full = rbm._stage_batches(X)
    monkeypatch.delenv('BMT_STAGE_SLAB_MB')
    ref_full, ref_rem, ref_n = rbm._stage_batches(X)
    assert n_full == ref_n
    np.testing.assert_array_equal(np.asarray(full), np.asarray(ref_full))
    assert (rem is None) == (ref_rem is None)
    # f16 widening keeps going through the same slab path, exactly
    Xh = X.astype(np.float16)
    monkeypatch.setenv('BMT_STAGE_SLAB_MB', '0')
    wide = rbm._put(Xh)
    np.testing.assert_array_equal(
        np.asarray(wide), np.asarray(jnp.asarray(Xh, jnp.float32)))


def test_f16_staging_kept_narrow_is_bitwise(X, tmp_model_dir, monkeypatch):
    """When the widened training set would not fit HBM
    (BMT_STAGE_WIDEN_MAX_GB forced to 0 here), the staged data stays f16
    on device and every program widens per batch -- f16 -> f32 is exact,
    so training and transform are bitwise-identical to staging wide."""
    Xh = X.astype(np.float16)

    def run(tag):
        rbm = BernoulliRBM(model_path=tmp_model_dir + tag + '/', **CONFIG)
        rbm.fit(Xh, Xh[:8])
        return rbm, rbm.transform(Xh)

    monkeypatch.setenv('BMT_STAGE_WIDEN_MAX_GB', '0')
    narrow, Hn = run('narrow')
    monkeypatch.delenv('BMT_STAGE_WIDEN_MAX_GB')
    wide, Hw = run('wide')

    wa, wb = weights_of(narrow), weights_of(wide)
    np.testing.assert_array_equal(wa['W'], wb['W'])
    np.testing.assert_array_equal(wa['vb'], wb['vb'])
    np.testing.assert_array_equal(wa['hb'], wb['hb'])
    np.testing.assert_array_equal(Hn, Hw)


def test_chunked_transform_bitwise(X, tmp_model_dir, monkeypatch):
    """A transform chunked to one batch per dispatch (budget forced to 0)
    matches the single-scan dispatch bitwise -- the i0 key offset keeps
    the per-batch fold chain identical."""
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'chunked/', **CONFIG)
    rbm.fit(X)
    # transform draws its op-seed from the persisted host RNG, so two
    # fresh loads of the same model see identical keys
    monkeypatch.setenv('BMT_TRANSFORM_CHUNK_GB', '0')  # 1 batch per chunk
    chunked = BernoulliRBM.load_model(
        tmp_model_dir + 'chunked/').transform(X)
    monkeypatch.delenv('BMT_TRANSFORM_CHUNK_GB')
    single = BernoulliRBM.load_model(
        tmp_model_dir + 'chunked/').transform(X)
    np.testing.assert_array_equal(chunked, single)


def test_staging_upload_retries_on_link_failure(X, tmp_model_dir,
                                                monkeypatch, capfd):
    """A link failure mid-upload restarts the whole slab-staged upload
    (the donated destination died with the worker) after downgrading the
    process to sync mode; the retried upload is still bitwise-correct."""
    import jax
    rbm = BernoulliRBM(model_path=tmp_model_dir + 'slabfail/', **CONFIG)
    monkeypatch.setenv('BMT_STAGE_SLAB_MB', '0')
    monkeypatch.setenv('BMT_STAGE_RETRY_BACKOFF', '0')
    orig_block = jax.block_until_ready
    fired = {'n': 0}

    def failing_once(x):
        if fired['n'] == 0:
            fired['n'] += 1
            raise RuntimeError('UNAVAILABLE: socket closed (injected)')
        return orig_block(x)

    monkeypatch.setattr(jax, 'block_until_ready', failing_once)
    out = rbm._device_upload(X)
    assert fired['n'] == 1
    assert jm._FORCED_SYNC
    assert 'retrying whole upload' in capfd.readouterr().err
    np.testing.assert_array_equal(np.asarray(out), X.astype(np.float32))

    # a non-link bug must propagate, not retry
    jm._FORCED_SYNC = False

    def always_bug(x):
        raise ValueError('a real bug')

    monkeypatch.setattr(jax, 'block_until_ready', always_bug)
    with pytest.raises(ValueError, match='a real bug'):
        rbm._device_upload(X)
    assert not jm._FORCED_SYNC


def test_sync_downgrade_preserves_pipeline_order(monkeypatch):
    """Queued lane items must fully drain before any inline item runs
    when the mode flips mid-run (advisor round 4: ordering contract)."""
    order = []
    mp = jm.MetricsPipeline()
    slow = {'first': True}

    def consume_factory(i):
        def consume(fetched):
            if slow['first']:
                slow['first'] = False
                time.sleep(0.2)  # hold the worker so items 2-3 stay queued
            order.append(i)
        return consume

    for i in range(3):
        mp.submit([np.zeros(1)], consume_factory(i))
    monkeypatch.setenv('BMT_SYNC_FETCH', '1')
    mp.submit([np.zeros(1)], consume_factory(3))  # inline after drain
    mp.join()
    assert order == [0, 1, 2, 3]

    aw = jm.AsyncEpochWriter()
    monkeypatch.delenv('BMT_SYNC_FETCH')
    order2 = []
    hold = {'first': True}

    def work_factory(i):
        def work():
            if hold['first']:
                hold['first'] = False
                time.sleep(0.2)
            order2.append(i)
        return work

    for i in range(3):
        assert aw.submit(work_factory(i))
    monkeypatch.setenv('BMT_SYNC_FETCH', '1')
    assert aw.submit(work_factory(3))
    aw.join()
    assert order2 == [0, 1, 2, 3]
