"""Native loader core (data/native) + h5 storage-layout fast paths.

The loader redesign replaces h5py point-selection gathers (the
reference's access pattern, core/dataset.py:83-101) with memmap/row
gathers; these tests pin (a) native-vs-numpy parity, (b) byte-identical
batches across storage layouts, (c) the fast path actually engaging.
"""
import numpy as np
import pytest

from anerf_tpu.data import native
from anerf_tpu.data.dataset import BaseH5Dataset
from anerf_tpu.data.h5_writer import make_synthetic_h5


@pytest.fixture(scope='module')
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp('layouts')
    cont = make_synthetic_h5(str(d / 'cont.h5'), n_frames=6, H=48, W=40)
    gzip = make_synthetic_h5(str(d / 'gzip.h5'), n_frames=6, H=48, W=40,
                             img_layout='chunked')
    return cont, gzip


def test_native_builds():
    assert native.available(), 'g++ build of gather.cc failed'


def test_gather_f32_matches_numpy():
    rng = np.random.default_rng(0)
    row = rng.integers(0, 256, size=(1000, 3), dtype=np.uint8)
    idxs = rng.integers(0, 1000, size=257)
    for scale in (1.0, 1. / 255.):
        got = native.gather_f32(row, idxs, scale=scale)
        want = row[idxs].astype(np.float32) * np.float32(scale)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, want)


def test_gather_f32_fallback_non_u8():
    rng = np.random.default_rng(1)
    row = rng.random((100, 1)).astype(np.float32)
    idxs = rng.integers(0, 100, size=33)
    np.testing.assert_array_equal(native.gather_f32(row, idxs),
                                  row[idxs].astype(np.float32))


def test_nonzero_matches_numpy():
    rng = np.random.default_rng(2)
    mask = (rng.random(10_000) < 0.1).astype(np.uint8)
    np.testing.assert_array_equal(native.nonzero(mask),
                                  np.where(mask > 0)[0])
    # float fallback
    np.testing.assert_array_equal(native.nonzero(mask.astype(np.float32)),
                                  np.where(mask > 0)[0])


def test_mmap_fast_path_engages(paths):
    cont, gzip = paths
    d_cont = BaseH5Dataset(cont, N_samples=64)
    d_gzip = BaseH5Dataset(gzip, N_samples=64)
    d_cont.init_dataset()
    d_gzip.init_dataset()
    assert set(d_cont._mmaps) == {'imgs', 'masks', 'sampling_masks'}
    assert d_gzip._mmaps == {}


def test_batches_identical_across_layouts(paths):
    cont, gzip = paths
    d_cont = BaseH5Dataset(cont, N_samples=64)
    d_gzip = BaseH5Dataset(gzip, N_samples=64)
    for i in range(4):
        b1 = d_cont.get_item(i, rng=np.random.default_rng(100 + i))
        b2 = d_gzip.get_item(i, rng=np.random.default_rng(100 + i))
        assert set(b1) == set(b2)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


def test_row_read_matches_h5py(paths):
    cont, _ = paths
    ds = BaseH5Dataset(cont, N_samples=16)
    ds.init_dataset()
    for key in ('imgs', 'masks', 'sampling_masks'):
        np.testing.assert_array_equal(np.asarray(ds._read_row(key, 2)),
                                      ds.dataset[key][2], err_msg=key)
