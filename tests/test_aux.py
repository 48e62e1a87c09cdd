"""Coverage for the auxiliary runtime surface: profiler traces,
jax.distributed initialization, and hidden-activation image summaries."""

import os
import struct
import subprocess
import sys

import numpy as np

from boltzmann_machines_tpu.utils import profiler


def test_profiler_trace_writes_events(tmp_path):
    """`profiler.trace` captures a device trace viewable in TB/Perfetto."""
    import jax.numpy as jnp
    logdir = str(tmp_path / 'prof')
    with profiler.trace(logdir):
        x = jnp.ones((128, 128))
        float(jnp.sum(x @ x))
    found = []
    for root, _, files in os.walk(logdir):
        found += [os.path.join(root, f) for f in files]
    assert found, 'profiler trace produced no files'
    assert any(os.path.getsize(f) > 0 for f in found)


def test_profiler_annotate_and_timer():
    import jax.numpy as jnp
    t = profiler.StepTimer()
    with profiler.annotate('step'):
        t.start()
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        dt = t.stop(sync_value=x)
    assert dt >= 0.
    assert t.mean() >= 0.


def test_distributed_single_process_smoke():
    """`parallel.distributed.initialize` brings up a one-process
    coordination service (run in a subprocess: jax.distributed can only be
    initialized once per process)."""
    code = r'''
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
from boltzmann_machines_tpu.parallel import distributed
info = distributed.initialize(coordinator_address='localhost:43219',
                              num_processes=1, process_id=0)
assert info['process_index'] == 0
assert info['process_count'] == 1
assert info['global_devices'] >= 1
start, stop = distributed.process_local_slice(10)
assert (start, stop) == (0, 10)
print('DIST_OK')
'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # prevent sitecustomize from registering the remote-TPU PJRT
    # plugin in the subprocess: a wedged device link would hang
    # jax import in an otherwise CPU-only test
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('BMT_TEST_TPU', None)
    out = subprocess.run([sys.executable, '-c', code], env=env,
                         capture_output=True, text=True, timeout=180,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert 'DIST_OK' in out.stdout, out.stderr[-2000:]


def test_hidden_activation_image_summary(tmp_model_dir):
    """display_hidden_activations streams a (batch x n) activation image
    with the train summaries (reference base_rbm.py:429-435)."""
    from boltzmann_machines_tpu import BernoulliRBM
    from boltzmann_machines_tpu.utils.rng import RNG
    X = RNG(1).rand(32, 12).astype('float32')
    rbm = BernoulliRBM(n_visible=12, n_hidden=8, max_epoch=1, batch_size=16,
                       random_seed=1, verbose=False,
                       display_hidden_activations=6,
                       save_after_each_epoch=False,
                       metrics_config=dict(msre=True,
                                           train_metrics_every_iter=1),
                       model_path=tmp_model_dir)
    rbm.fit(X)
    logdir = rbm._train_summary_dirpath
    events = [p for p in os.listdir(logdir) if p.startswith('events')]
    assert events
    with open(os.path.join(logdir, events[0]), 'rb') as f:
        data = f.read()
    assert b'hidden_activation_means' in data
    assert b'\x89PNG' in data


def test_semi_supervised_driver_smoke(tmp_path):
    """examples/semi_supervised.py runs the warm-vs-cold matrix end to end
    and emits the README-style table (reference README.md:170-175,
    docs/rbm_discriminative.md).  Smallest subset only, tiny epochs."""
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # prevent sitecustomize from registering the remote-TPU PJRT
    # plugin in the subprocess: a wedged device link would hang
    # jax import in an otherwise CPU-only test
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('BMT_TEST_TPU', None)
    out_md = str(tmp_path / 'table.md')
    r = subprocess.run(
        [sys.executable, 'semi_supervised.py', '--quick', '--subsets',
         '100', '--model-dirpath', str(tmp_path / 'rbm') + '/',
         '--out', out_md],
        env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.join(repo, 'examples'))
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_md) as f:
        table = f.read()
    assert 'random initialization' in table and '100 (90 + 10)' in table
    with open(out_md.replace('.md', '.json')) as f:
        data = json.load(f)
    row = data['rows'][0]
    assert 0. <= row['warm'] <= 1. and 0. <= row['cold'] <= 1.


_TWO_PROC_WORKER = r'''
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax
jax.config.update('jax_platforms', 'cpu')
pid = int(sys.argv[1])
from boltzmann_machines_tpu.parallel import distributed
info = distributed.initialize(coordinator_address='localhost:43223',
                              num_processes=2, process_id=pid)
assert info['process_count'] == 2, info
assert info['global_devices'] == 4, info
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()).reshape(4), ('data',))
start, stop = distributed.process_local_slice(8)
local = np.arange(8, dtype=np.float32)[start:stop]
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), local, (8,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
print('PSUM2_OK', float(np.asarray(total.addressable_data(0))))
'''


def test_distributed_two_process_psum():
    """Two-process DCN smoke: both processes join one coordination
    service over localhost, build a global 4-device mesh spanning the
    processes, and a jitted global sum over a cross-process-sharded array
    returns the full-array total in BOTH processes (the collective
    actually crossed the process boundary).  This is the multi-host
    launch recipe from docs/tpu.md exercised end-to-end on CPU."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # prevent sitecustomize from registering the remote-TPU PJRT
    # plugin in the subprocess: a wedged device link would hang
    # jax import in an otherwise CPU-only test
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('BMT_TEST_TPU', None)
    procs = [subprocess.Popen(
        [sys.executable, '-c', _TWO_PROC_WORKER, str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=repo) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
        assert 'PSUM2_OK 28.0' in out, (out, err[-2000:])


def test_device_histogram_nonfinite(tmp_path):
    """NaN/Inf values must not poison the histogram buckets; they are
    counted separately and surfaced as a scalar (advisor round 2)."""
    import numpy as np
    import jax.numpy as jnp
    from boltzmann_machines_tpu.base.jax_model import device_histogram
    from boltzmann_machines_tpu.utils.summary_writer import SummaryWriter

    x = jnp.asarray(np.array([1., 2., np.nan, 3., np.inf, -np.inf, 4.],
                             np.float32))
    stats = {k: np.asarray(v) for k, v in device_histogram(x, 8).items()}
    assert int(stats['n_nonfinite']) == 3
    assert int(stats['counts'].sum()) == 4          # only finite entries
    assert float(stats['min']) == 1. and float(stats['max']) == 4.
    assert np.isfinite(stats['sum']) and np.isfinite(stats['sum_sq'])

    # all-bad tensor degrades gracefully (no NaN edges)
    bad = jnp.asarray(np.full(5, np.nan, np.float32))
    sbad = {k: np.asarray(v) for k, v in device_histogram(bad, 8).items()}
    assert int(sbad['n_nonfinite']) == 5
    assert int(sbad['counts'].sum()) == 0
    assert np.isfinite(sbad['min']) and np.isfinite(sbad['max'])

    # writer consumes the stats and emits the n_nonfinite scalar
    w = SummaryWriter(str(tmp_path))
    w.add_device_histogram('t', stats, 1)
    w.close()
    events = [p for p in os.listdir(str(tmp_path)) if p.startswith('events')]
    with open(os.path.join(str(tmp_path), events[0]), 'rb') as f:
        data = f.read()
    assert b'n_nonfinite' in data


def test_hang_watchdog_fires_and_disarms(monkeypatch):
    """The hang watchdog converts a silently hung device RPC (no
    exception, thread parked on a futex) into a supervised restart: it
    fires after BMT_HANG_TIMEOUT_SECONDS of zero heartbeats inside an
    armed window, stays quiet outside windows, and heartbeats keep an
    armed window alive."""
    import time
    from boltzmann_machines_tpu.base import jax_model as jm

    fired = []
    monkeypatch.setitem(jm._WATCHDOG, 'action',
                        lambda dt: fired.append(dt))
    monkeypatch.setenv('BMT_HANG_TIMEOUT_SECONDS', '1')

    with jm.hang_watchdog_window():
        time.sleep(2.6)            # monitor period is timeout/4 = 0.25 s
    assert fired and fired[0] >= 1.0

    fired[:] = []                  # disarmed: nothing fires while idle
    time.sleep(1.6)
    assert not fired

    with jm.hang_watchdog_window():    # heartbeats keep it alive
        for _ in range(5):
            time.sleep(0.3)
            jm.heartbeat()
    assert not fired
