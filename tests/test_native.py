"""Native (C++) data-path tests: golden vs numpy implementations."""

import os
import struct
import tempfile

import numpy as np
import pytest

from boltzmann_machines_tpu.utils.native import (load_native, augment_x10,
                                                 load_idx3, load_idx1)
from boltzmann_machines_tpu.utils.augmentation import shift, horizontal_mirror

native_available = load_native() is not None


def test_augment_x10_matches_numpy():
    X = np.random.RandomState(0).rand(10, 8, 8, 3).astype(np.float32)
    A = augment_x10(X)
    assert A.shape == (100, 8, 8, 3)
    ref = np.zeros_like(A)
    ref[:10] = X
    for k, off in enumerate(((1, 0), (-1, 0), (0, 1), (0, -1))):
        for i in range(10):
            ref[(k + 1) * 10 + i] = shift(X[i], off)
    for i in range(50):
        ref[50 + i] = horizontal_mirror(ref[i])
    np.testing.assert_array_equal(A, ref)


@pytest.mark.skipif(not native_available, reason='g++ toolchain unavailable')
def test_native_idx_roundtrip():
    d = tempfile.mkdtemp()
    img = np.random.RandomState(1).randint(0, 256, (7, 5, 4), dtype=np.uint8)
    with open(os.path.join(d, 'im'), 'wb') as f:
        f.write(struct.pack('>IIII', 0x803, 7, 5, 4))
        f.write(img.tobytes())
    out = load_idx3(os.path.join(d, 'im'), scale=1.0)
    np.testing.assert_array_equal(out, img.reshape(7, 20).astype(np.float32))

    out = load_idx3(os.path.join(d, 'im'), scale=1. / 255)
    np.testing.assert_allclose(out, img.reshape(7, 20) / 255., atol=1e-6)

    lbl = np.random.RandomState(2).randint(0, 10, 7).astype(np.int8)
    with open(os.path.join(d, 'lb'), 'wb') as f:
        f.write(struct.pack('>II', 0x801, 7))
        f.write(lbl.tobytes())
    out = load_idx1(os.path.join(d, 'lb'))
    np.testing.assert_array_equal(out, lbl.astype(np.int32))


@pytest.mark.skipif(not native_available, reason='g++ toolchain unavailable')
def test_native_idx_bad_magic():
    d = tempfile.mkdtemp()
    with open(os.path.join(d, 'bad'), 'wb') as f:
        f.write(struct.pack('>IIII', 0xdead, 1, 2, 2))
        f.write(b'\x00' * 4)
    assert load_idx3(os.path.join(d, 'bad')) is None


@pytest.mark.skipif(not native_available, reason='g++ toolchain unavailable')
def test_augment_x10_u8_flat_matches_reference_composition():
    """The fused uint8 augmentation must equal the original pipeline
    augment -> *255 -> uint8 truncation -> im_flatten bitwise (it writes
    the on-disk cache layout directly)."""
    from boltzmann_machines_tpu.utils.native import augment_x10_u8_flat
    from boltzmann_machines_tpu.utils.dataset import im_flatten

    X = np.random.RandomState(3).rand(10, 8, 8, 3).astype(np.float32)
    fused = augment_x10_u8_flat(X)
    assert fused is not None and fused.shape == (100, 3 * 8 * 8) \
        and fused.dtype == np.uint8
    ref = im_flatten((augment_x10(X) * 255.).astype('uint8'))
    np.testing.assert_array_equal(fused, ref)
