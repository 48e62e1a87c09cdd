"""Pure-function goldens: log-space math, iteration, one-hot, RNG, images
(tier 1 of the reference's test strategy, SURVEY.md section 4)."""

import doctest

import numpy as np
import pytest

import boltzmann_machines_tpu.utils.utils as U
import boltzmann_machines_tpu.utils.rng as rng_mod
import boltzmann_machines_tpu.utils.dataset as ds
import boltzmann_machines_tpu.utils.stopwatch as sw
from boltzmann_machines_tpu.utils import RNG
from boltzmann_machines_tpu.utils.augmentation import shift, horizontal_mirror


@pytest.mark.parametrize('mod', [U, rng_mod, ds, sw])
def test_doctests(mod):
    results = doctest.testmod(mod)
    assert results.failed == 0
    assert results.attempted > 0


def test_log_sum_exp_goldens():
    assert np.isclose(U.log_sum_exp([0, 1, 0]), 1.5514447)
    assert np.isclose(U.log_sum_exp([1000, 1001, 1000]), 1001.5514447)
    assert np.isclose(U.log_sum_exp([-1000, -999, -1000]), -998.4485553)


def test_log_mean_exp():
    assert np.isclose(U.log_mean_exp([1, 2, 3]),
                      np.log(np.mean(np.exp([1., 2., 3.]))))


def test_log_diff_exp():
    np.testing.assert_allclose(
        U.log_diff_exp([1, 2, 3]),
        [np.log(np.exp(2) - np.exp(1)), np.log(np.exp(3) - np.exp(2))])


def test_log_std_exp():
    x = np.arange(8.)
    assert np.isclose(U.log_std_exp(x), np.log(np.std(np.exp(x))))


def test_batch_iter_partial():
    X = np.arange(36).reshape(12, 3)
    batches = list(U.batch_iter(X, batch_size=5))
    assert [len(b) for b in batches] == [5, 5, 2]
    np.testing.assert_array_equal(np.vstack(batches), X)


def test_schedule_value_clamps():
    sched = [1, 2, 3]
    assert U.schedule_value(sched, 0) == 1
    assert U.schedule_value(sched, 2) == 3
    assert U.schedule_value(sched, 100) == 3


def test_one_hot_roundtrip():
    y = [2, 1, 0, 2, 0]
    np.testing.assert_array_equal(U.unhot(U.one_hot(y)), y)


def test_rng_json_roundtrip():
    import json
    rng = RNG(1337)
    state = rng.get_state()
    a = rng.rand()
    state2 = json.loads(json.dumps(state))
    assert RNG().set_state(state2).rand() == a


def test_shift_and_mirror():
    img = np.arange(9.).reshape(3, 3)
    s = shift(img, (1, 0))
    assert s[0].sum() == 0 and np.array_equal(s[1], img[0])
    s = shift(img, (0, -1))
    assert np.array_equal(s[:, 0], img[:, 1]) and s[:, 2].sum() == 0
    m = horizontal_mirror(img)
    assert np.array_equal(m[:, 0], img[:, 2])
    assert np.array_equal(horizontal_mirror(m), img)


def test_im_flatten_unflatten_roundtrip():
    X = np.random.rand(5, 8, 8, 3)
    np.testing.assert_allclose(ds.im_unflatten(ds.im_flatten(X)), X)
