"""Event-file writer tests: TFRecord framing + proto encoding round-trip."""

import json
import os
import struct

from boltzmann_machines_tpu.utils.summary_writer import (SummaryWriter,
                                                         _masked_crc)


def test_scalars_jsonl_and_event_framing(tmp_path):
    logdir = str(tmp_path / 'logs')
    w = SummaryWriter(logdir)
    w.add_scalar('loss', 0.5, 1)
    w.add_scalar('loss', 0.25, 2)
    w.close()

    with open(os.path.join(logdir, 'scalars.jsonl')) as f:
        rows = [json.loads(line) for line in f]
    assert [r['value'] for r in rows] == [0.5, 0.25]
    assert [r['step'] for r in rows] == [1, 2]

    # verify TFRecord framing: every record's length/payload CRCs check out
    event_files = [p for p in os.listdir(logdir) if p.startswith('events.out')]
    assert len(event_files) == 1
    with open(os.path.join(logdir, event_files[0]), 'rb') as f:
        data = f.read()
    pos = 0
    n_records = 0
    while pos < len(data):
        header = data[pos:pos + 8]
        length, = struct.unpack('<Q', header)
        crc_h, = struct.unpack('<I', data[pos + 8:pos + 12])
        assert crc_h == _masked_crc(header)
        payload = data[pos + 12:pos + 12 + length]
        crc_p, = struct.unpack('<I', data[pos + 12 + length:pos + 16 + length])
        assert crc_p == _masked_crc(payload)
        pos += 16 + length
        n_records += 1
    assert n_records == 3  # version event + 2 scalars
    # first record carries the TensorBoard version marker
    assert b'brain.Event:2' in data[:64]


def test_image_and_histogram_events(tmp_path):
    import numpy as np
    logdir = str(tmp_path / 'logs2')
    w = SummaryWriter(logdir)
    img = (np.arange(64 * 64, dtype=np.uint64) % 256).astype('uint8') \
        .reshape(64, 64)
    w.add_image('filters', img, 1)
    w.add_histogram('W', np.random.RandomState(0).randn(1000), 1)
    w.close()
    event_files = [p for p in os.listdir(logdir) if p.startswith('events')]
    with open(os.path.join(logdir, event_files[0]), 'rb') as f:
        data = f.read()
    # framing still valid for mixed record types
    pos = n = 0
    while pos < len(data):
        length, = struct.unpack('<Q', data[pos:pos + 8])
        assert struct.unpack('<I', data[pos + 8:pos + 12])[0] == \
            _masked_crc(data[pos:pos + 8])
        payload = data[pos + 12:pos + 12 + length]
        assert struct.unpack('<I',
                             data[pos + 12 + length:pos + 16 + length])[0] \
            == _masked_crc(payload)
        pos += 16 + length
        n += 1
    assert n == 3
    assert b'\x89PNG' in data  # the embedded image


def test_png_roundtrip():
    import numpy as np
    from boltzmann_machines_tpu.utils.png import encode_png
    img = np.random.RandomState(0).randint(0, 256, (16, 24, 3), dtype=np.uint8)
    png = encode_png(img)
    assert png.startswith(b'\x89PNG')
    # decode with PIL if available, else just check structure
    try:
        from PIL import Image
        import io
        back = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(back, img)
    except ImportError:
        assert b'IHDR' in png and b'IDAT' in png and b'IEND' in png


def test_filter_grid_image():
    import numpy as np
    from boltzmann_machines_tpu.utils.plot_utils import filter_grid_image
    W = np.random.RandomState(0).randn(28 * 28, 10).astype('float32')
    img = filter_grid_image(W, (28, 28, 1), 9)
    assert img.shape == (28 * 3, 28 * 3)
    assert img.dtype == np.uint8
    W3 = np.random.RandomState(0).randn(8 * 8 * 3, 5).astype('float32')
    img3 = filter_grid_image(W3, (8, 8, 3), 4)
    assert img3.shape == (16, 16, 3)


def test_device_histogram_matches_numpy():
    import numpy as np
    from boltzmann_machines_tpu.base.jax_model import device_histogram
    x = np.random.RandomState(0).randn(4096).astype('float32')
    st = {k: np.asarray(v) for k, v in device_histogram(x, 32).items()}
    edges = np.linspace(x.min(), x.max(), 33)
    ref, _ = np.histogram(x, bins=edges)
    np.testing.assert_allclose(float(st['sum']), x.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(st['min']), x.min())
    np.testing.assert_allclose(float(st['max']), x.max())
    assert st['counts'].sum() == 4096
    # bucket boundaries bin identically up to edge-rounding: compare with
    # 1-off tolerance per bucket
    assert np.abs(st['counts'] - ref).max() <= 1


def _event_payloads(logdir):
    import os, struct
    out = b''
    for p in sorted(os.listdir(logdir)):
        if p.startswith('events.out'):
            with open(os.path.join(logdir, p), 'rb') as f:
                out += f.read()
    return out


def test_fit_writes_device_histograms_and_filter_images(tmp_model_dir):
    """The end-of-epoch summary pipeline reduces on device: a fit with
    summaries enabled must land histogram + image events without ever
    fetching the full state for them."""
    import numpy as np
    from boltzmann_machines_tpu import BernoulliRBM
    X = (np.random.RandomState(0).rand(64, 36) < 0.5).astype('float32')
    rbm = BernoulliRBM(n_visible=36, n_hidden=9, max_epoch=2, batch_size=16,
                       random_seed=1, verbose=False, display_filters=4,
                       v_shape=(6, 6, 1),
                       metrics_config=dict(msre=True,
                                           train_metrics_every_iter=2),
                       model_path=tmp_model_dir)
    rbm.fit(X)
    data = _event_payloads(rbm._train_summary_dirpath)
    assert b'W_filters' in data
    assert b'\x89PNG' in data
    assert b'dW' in data and b'vb' in data  # histogram tags


def test_dbm_fit_writes_cumulative_filters_and_particles(tmp_model_dir):
    import numpy as np
    from boltzmann_machines_tpu import BernoulliRBM, DBM
    X = (np.random.RandomState(0).rand(64, 16) < 0.5).astype('float32')
    r1 = BernoulliRBM(n_visible=16, n_hidden=8, dbm_first=True, max_epoch=1,
                      batch_size=16, random_seed=1, verbose=False,
                      model_path=tmp_model_dir + 'r1/')
    r1.fit(X)
    r2 = BernoulliRBM(n_visible=8, n_hidden=6, dbm_last=True, max_epoch=1,
                      batch_size=16, random_seed=2, verbose=False,
                      model_path=tmp_model_dir + 'r2/')
    r2.fit(r1.transform(X))
    dbm = DBM(rbms=[r1, r2], n_particles=8, n_gibbs_steps=1,
              max_mf_updates=3, learning_rate=0.01, momentum=0.5,
              max_epoch=2, batch_size=16, random_seed=3, verbose=False,
              display_filters=4, display_particles=4, v_shape=(4, 4, 1),
              train_metrics_every_iter=2,
              model_path=tmp_model_dir + 'dbm/')
    dbm.fit(X)
    data = _event_payloads(dbm._train_summary_dirpath)
    assert b'W_filters_0' in data and b'W_filters_1' in data
    assert b'negative_particles' in data
    assert b'W_0' in data and b'hb_1' in data


def test_fetch_as_chunked_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from boltzmann_machines_tpu.base.jax_model import fetch_as
    x = jnp.arange(2_000_000, dtype=jnp.float32).reshape(2000, 1000) \
        % 2048.  # exactly representable in f16
    h = fetch_as(x, np.float16, chunk_mb=1)  # 4 MB cast > 1 MB: sliced path
    assert h.dtype == np.float16 and h.shape == (2000, 1000)
    np.testing.assert_array_equal(
        h, np.asarray(x).astype(np.float16))
    assert fetch_as(np.ones((4, 4)), np.float32).dtype == np.float32
