"""Native C++ data generator tests (skipped when no toolchain)."""

import numpy as np
import pytest

from hdmoe_tpu.train.native_data import native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")


def test_native_batch_contract():
    from hdmoe_tpu.train.native_data import NativeSyntheticDataset

    ds = NativeSyntheticDataset(resolution=64, size=128, seed=0)
    b = ds.get_batch(np.arange(8))
    assert b.shape == (8, 64, 64, 3) and b.dtype == np.uint8
    assert b.min() >= 0 and b.max() <= 255
    # deterministic + index-stable regardless of batch composition
    b2 = ds.get_batch(np.arange(8))
    np.testing.assert_array_equal(b, b2)
    single = ds.get_batch(np.asarray([3]))
    np.testing.assert_array_equal(single[0], b[3])
    # different indices give different images; wraparound by size
    assert not np.array_equal(b[0], b[1])
    np.testing.assert_array_equal(ds.get_batch(np.asarray([128]))[0], b[0])


def test_native_through_make_dataset_and_iterator():
    from hdmoe_tpu.train.data import batch_iterator, make_dataset

    ds = make_dataset("synthetic-native", resolution=32)
    it = batch_iterator(ds, 4, seed=0)
    batch = next(it)
    assert batch.shape == (4, 32, 32, 3) and batch.dtype == np.uint8
