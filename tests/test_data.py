"""Tests for the data layer on a synthetic h5 dataset."""
import os

import numpy as np
import pytest

from anerf_tpu.data.dataset import BaseH5Dataset, TemporalDatasetWrapper
from anerf_tpu.data.h5_writer import make_synthetic_h5
from anerf_tpu.data.loaders import SurrealDataset, SyntheticDataset
from anerf_tpu.data.pipeline import Prefetcher, RayImageSampler, ray_collate


@pytest.fixture(scope='module')
def h5_path(tmp_path_factory):
    p = tmp_path_factory.mktemp('data') / 'synthetic.h5'
    return make_synthetic_h5(str(p), n_frames=6, H=24, W=24)


@pytest.fixture(scope='module')
def surreal_h5(tmp_path_factory):
    p = tmp_path_factory.mktemp('data') / 'surreal_train_h5py.h5'
    return make_synthetic_h5(str(p), n_frames=4, n_cams=3, H=24, W=24,
                             layout='surreal')


def test_dataset_get_item_shapes(h5_path):
    ds = BaseH5Dataset(h5_path, N_samples=16)
    rng = np.random.default_rng(0)
    item = ds.get_item(2, rng)
    assert item['rays_o'].shape == (16, 3)
    assert item['rays_d'].shape == (16, 3)
    assert item['target_s'].shape == (16, 3)
    assert item['kp_idx'].shape == (16,)
    assert (item['kp_idx'] == 2).all()
    assert item['kp3d'].shape == (16, 24, 3)
    assert item['skts'].shape == (16, 24, 4, 4)
    assert item['cyls'].shape == (16, 5)
    assert item['bgs'].shape == (16, 3)
    assert item['fgs'].shape == (16, 1)


def test_rays_match_reference_convention(h5_path):
    """Rays built from the precomputed dir mesh must match get_rays_np."""
    from anerf_tpu.ops.rays import get_rays_np
    ds = BaseH5Dataset(h5_path, N_samples=8)
    ds.init_dataset()
    c2w, focal, center, _ = ds.get_camera_data(0, 0, 1)
    pixel_idxs = np.array([0, 13, 100, 24 * 24 - 1])
    rays_o, rays_d = ds.get_rays(c2w, focal, pixel_idxs, center)
    ro_full, rd_full = get_rays_np(24, 24, float(focal), c2w)
    np.testing.assert_allclose(rays_d,
                               rd_full.reshape(-1, 3)[pixel_idxs], atol=1e-5)
    np.testing.assert_allclose(rays_o,
                               ro_full.reshape(-1, 3)[pixel_idxs], atol=1e-6)


def test_sample_pixels_respects_mask(h5_path):
    ds = BaseH5Dataset(h5_path, N_samples=8)
    ds.init_dataset()
    # restrict sampling mask to foreground only for this check
    mask = ds.dataset['sampling_masks'][1].reshape(-1)
    rng = np.random.default_rng(0)
    idxs = ds.sample_pixels(1, 1, rng)
    assert len(idxs) == 8
    assert (mask[idxs] > 0).all()
    assert (np.diff(idxs) >= 0).all()  # sorted for fast h5 gather


def test_get_meta(h5_path):
    ds = BaseH5Dataset(h5_path, N_samples=8)
    meta = ds.get_meta()
    assert meta['kp3d'].shape == (6, 24, 3)
    assert meta['rest_pose'].shape == (24, 3)
    assert meta['joint_coords'].shape == (24, 3, 3)
    assert meta['n_views'] == 6


def test_surreal_idx_mapping(surreal_h5):
    ds = SurrealDataset(surreal_h5, N_samples=8, split='train')
    # 12 images = 3 cams x 4 kps
    assert len(ds) == 12
    # image 7 -> kp 3, cam 1
    real_kp, kp_idx = ds.get_kp_idx(7, 7)
    real_cam, cam_idx = ds.get_cam_idx(7, 7)
    assert real_kp == 3 and kp_idx == 3
    assert cam_idx == 1
    item = ds.get_item(7, np.random.default_rng(0))
    assert (item['kp_idx'] == 3).all()
    assert (item['cam_idxs'] == 1).all()


def test_temporal_wrapper(h5_path):
    ds = SyntheticDataset(h5_path, N_samples=8)
    ds.temp_validity = np.array([0, 1, 1, 1, 1, 1])
    w = TemporalDatasetWrapper(ds)
    item = w.get_item(3, np.random.default_rng(0))
    assert item['temp_val'].shape == (8,)
    assert (item['temp_val'] == 1).all()
    item0 = w.get_item(0, np.random.default_rng(0))
    assert (item0['temp_val'] == 0).all()


def test_sampler_covers_all_images():
    s = RayImageSampler(n_data=10, N_images=4, N_iter=5, seed=0)
    batches = list(s)
    assert len(batches) == 5
    # the first ceil(10/4)=3 batches consume one full permutation (+2)
    seen = np.concatenate(batches[:3])
    assert set(range(10)) <= set(seen.tolist())
    for b in batches:
        assert (np.diff(b) >= 0).all()


def test_prefetcher_and_collate(h5_path):
    ds = BaseH5Dataset(h5_path, N_samples=8)
    pf = Prefetcher(ds, N_images=4, n_workers=2, N_iter=3, seed=0)
    batches = list(pf)
    assert len(batches) == 3
    b = batches[0]
    assert b['rays_o'].shape == (32, 3)
    assert b['kps'].shape == (32, 24, 3)
    assert b['kp_idx'].dtype == np.int32
    assert b['target_s'].shape == (32, 3)


def test_batch_trains(h5_path):
    """A real data batch must flow through the jitted train step."""
    import jax
    import jax.numpy as jnp
    from anerf_tpu.models.factory import build_raycast_config
    from anerf_tpu.skeleton import SMPLSkeleton
    from anerf_tpu.training import pose_opt as P
    from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                            make_train_step)
    from anerf_tpu.utils.config import Config

    cfg = Config(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                 use_viewdirs=True, multires=3, multires_views=2,
                 netdepth=2, netwidth=16, N_samples=6, N_importance=3,
                 N_rand=32, N_sample_images=4, opt_framecode=True,
                 framecode_size=4, use_background=True, opt_pose=True,
                 opt_pose_step=2, opt_pose_coef=0.1)
    ds = BaseH5Dataset(h5_path, N_samples=8)
    meta = ds.get_meta()
    rc = build_raycast_config(cfg, n_framecodes=meta['n_views'])
    setup = TrainSetup(cfg=cfg, rc=rc, skel=SMPLSkeleton,
                       rest_pose=jnp.asarray(meta['rest_pose']),
                       anchors=P.make_anchors(meta['kp3d'], meta['bones']),
                       near=0.1, far=6.0)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=meta['kp3d'],
                             init_bones=meta['bones'])
    step = jax.jit(make_train_step(setup))
    pf = Prefetcher(ds, N_images=4, n_workers=1, N_iter=2, seed=0)
    for i, batch in enumerate(pf):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(stats['total_loss']))
    assert int(state['step']) == 2


def test_prefetcher_deterministic_across_worker_counts(h5_path):
    """Two runs with the same seed must yield the identical batch stream
    regardless of worker count: batch i's pixels are drawn from an RNG
    keyed on (seed, i) and the consumer releases batches in index
    order."""
    ds = BaseH5Dataset(h5_path, N_samples=8)
    streams = []
    for n_workers in (1, 3):
        pf = Prefetcher(ds, N_images=4, n_workers=n_workers, N_iter=4,
                        seed=7)
        streams.append(list(pf))
        pf.stop()
    assert len(streams[0]) == len(streams[1]) == 4
    for a, b in zip(*streams):
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_prefetcher_per_host_slices_are_distinct(h5_path):
    """Hosts agree on image indices per batch but sample different
    pixels (the per-host slice of the logical global batch)."""
    ds = BaseH5Dataset(h5_path, N_samples=8)
    batches = []
    for pidx in (0, 1):
        pf = Prefetcher(ds, N_images=4, n_workers=2, N_iter=2, seed=3,
                        process_index=pidx, process_count=2)
        batches.append(list(pf))
        pf.stop()
    for a, b in zip(*batches):
        np.testing.assert_array_equal(a['kp_idx'], b['kp_idx'])
        assert np.abs(a['rays_d'] - b['rays_d']).max() > 0


def test_multihost_pixel_disjointness(h5_path):
    """Hosts' per-image pixel draws are disjoint-by-construction slices
    of one global sample (dataset.sample_pixels host_slice): same image
    schedule, zero overlapping rays."""
    n_hosts = 2
    streams = []
    for p in range(n_hosts):
        ds = BaseH5Dataset(h5_path, N_samples=8)
        pf = Prefetcher(ds, N_images=4, n_workers=2, N_iter=3, seed=0,
                        process_index=p, process_count=n_hosts)
        streams.append(list(pf))
        pf.stop()
    for b0, b1 in zip(*streams):
        # same logical global batch: identical image/frame schedule
        np.testing.assert_array_equal(b0['kp_idx'], b1['kp_idx'])
        # disjoint pixels: rays_d rows identify pixels uniquely per
        # image; compare per-image blocks
        for s in range(0, len(b0['kp_idx']), 8):
            r0 = {bytes(r) for r in b0['rays_d'][s:s + 8]}
            r1 = {bytes(r) for r in b1['rays_d'][s:s + 8]}
            assert not (r0 & r1), 'hosts sampled overlapping pixels'


def test_host_slices_partition_global_draw(h5_path):
    """The union of all hosts' slices equals the single global draw a
    1-host run would take in block order."""
    ds = BaseH5Dataset(h5_path, N_samples=8)
    ds.init_dataset()
    rng_a = np.random.default_rng([0, 5])
    a = ds.sample_pixels(1, 1, rng_a, host_slice=(0, 2))
    rng_b = np.random.default_rng([0, 5])
    b = ds.sample_pixels(1, 1, rng_b, host_slice=(1, 2))
    assert len(set(a.tolist()) & set(b.tolist())) == 0
    rng_g = np.random.default_rng([0, 5])
    sampling_mask = ds.dataset['sampling_masks'][1].reshape(-1)
    valid, = np.where(sampling_mask > 0)
    draw = rng_g.choice(valid, 16, replace=False)
    assert set(a.tolist()) == set(draw[:8].tolist())
    assert set(b.tolist()) == set(draw[8:].tolist())


def test_get_item_with_tiny_sampling_mask(tmp_path):
    """Images with fewer valid mask pixels than N_rand sample with
    replacement — the h5 gather must survive duplicate indices."""
    import h5py
    p = make_synthetic_h5(str(tmp_path / 't.h5'), n_frames=3, H=16, W=16)
    with h5py.File(p, 'r+') as f:
        sm = np.zeros_like(f['sampling_masks'][:])
        sm[:, :5] = 1          # 5 valid pixels only
        f['sampling_masks'][...] = sm
    ds = BaseH5Dataset(p, N_samples=16)
    item = ds.get_item(1, np.random.default_rng(0))
    assert item['rays_o'].shape == (16, 3)
    assert item['target_s'].shape == (16, 3)
    # all sampled pixels come from the 5 valid ones (duplicates allowed)
    assert len({bytes(r) for r in item['rays_d']}) <= 5


# --- vectorized batch assembly (dataset.get_batch) -----------------------

def test_get_batch_matches_item_schema(h5_path):
    """get_batch = vectorized [get_item]*collate: identical keys,
    shapes, dtypes; every sampled pixel valid under the mask; rays
    consistent with a per-item rebuild for the same pixel ids."""
    ds = BaseH5Dataset(h5_path, N_samples=8)
    idxs = np.array([1, 3, 4, 5])
    batch = ds.get_batch(idxs, np.random.default_rng(5))
    items = [ds.get_item(int(i), np.random.default_rng(5)) for i in idxs]
    ref = ray_collate(items)
    assert sorted(batch.keys()) == sorted(ref.keys())
    for k in ref:
        assert batch[k].shape == ref[k].shape, k
        assert batch[k].dtype == ref[k].dtype, k
    # frame schedule identical (pixels differ: different rng stream)
    np.testing.assert_array_equal(batch['kp_idx'], ref['kp_idx'])
    np.testing.assert_array_equal(batch['cam_idxs'], ref['cam_idxs'])
    np.testing.assert_array_equal(batch['kps'], ref['kps'])
    np.testing.assert_array_equal(batch['skts'], ref['skts'])
    # recover each ray's pixel and cross-check rgb/fg/rays against a
    # direct per-pixel rebuild
    ds.init_dataset()
    H, W = ds.HW
    for b, q in enumerate(idxs):
        sl = slice(b * 8, (b + 1) * 8)
        dirs = batch['rays_d'][sl]
        # pixel id from the direction mesh (c2w here may rotate; invert)
        R = ds.c2ws[q][:3, :3]
        local = dirs @ np.linalg.inv(R.T).astype(np.float32)
        fo = ds.focals[q] if not np.isscalar(ds.focals) else ds.focals
        i = np.round(local[:, 0] * fo + W * 0.5).astype(int)
        j = np.round(-local[:, 1] * fo + H * 0.5).astype(int)
        pix = j * W + i
        sm = np.asarray(ds.dataset['sampling_masks'][q]).reshape(-1)
        assert (sm[pix] > 0).all(), 'sampled pixel outside mask'
        img = np.asarray(ds.dataset['imgs'][q]).reshape(-1, 3)
        np.testing.assert_allclose(batch['target_s'][sl],
                                   img[pix].astype(np.float32) / 255.,
                                   atol=1e-6)
        assert (np.diff(pix) > 0).all(), 'pixels not sorted/distinct'


def test_get_batch_multihost_partition(h5_path):
    """Host blocks of get_batch partition one shared global draw:
    disjoint across hosts, identical frame schedule."""
    ds = BaseH5Dataset(h5_path, N_samples=8)
    idxs = np.array([0, 2, 5])
    b0 = ds.get_batch(idxs, np.random.default_rng(9), host_slice=(0, 2))
    b1 = ds.get_batch(idxs, np.random.default_rng(9), host_slice=(1, 2))
    np.testing.assert_array_equal(b0['kp_idx'], b1['kp_idx'])
    for s in range(0, 24, 8):
        r0 = {bytes(r) for r in b0['rays_d'][s:s + 8]}
        r1 = {bytes(r) for r in b1['rays_d'][s:s + 8]}
        assert not (r0 & r1), 'hosts sampled overlapping pixels'


def test_get_batch_falls_back_for_patch_and_nms(h5_path):
    assert BaseH5Dataset(h5_path, N_samples=16, patch_size=2).get_batch(
        np.array([0]), np.random.default_rng(0)) is None
    assert BaseH5Dataset(h5_path, N_samples=16, N_nms=2).get_batch(
        np.array([0]), np.random.default_rng(0)) is None


def test_get_batch_tiny_mask_fallback(tmp_path):
    """Images with fewer valid pixels than the draw fall back to a
    per-host with-replacement stream, still inside the mask."""
    import h5py
    p = make_synthetic_h5(str(tmp_path / 't.h5'), n_frames=3, H=16, W=16)
    with h5py.File(p, 'r+') as f:
        sm = np.zeros_like(f['sampling_masks'][:])
        sm[:, :5] = 1
        f['sampling_masks'][...] = sm
    ds = BaseH5Dataset(p, N_samples=16)
    batch = ds.get_batch(np.array([0, 1]), np.random.default_rng(0))
    assert batch['rays_o'].shape == (32, 3)
    assert np.isfinite(batch['target_s']).all()


def test_sample_distinct_native_matches_numpy():
    """The native partial Fisher-Yates draw is bit-identical to the
    numpy fallback and uniform-without-replacement."""
    from anerf_tpu.data import native
    rng = np.random.default_rng(3)
    valid = [np.sort(rng.choice(500, size=L, replace=False)).astype(np.int32)
             for L in (40, 200, 17)]
    u = rng.random((3, 16))
    out = native.sample_distinct(valid, u)
    # distinct within each row, all from the row's valid list
    for r in range(3):
        assert len(set(out[r].tolist())) == 16
        assert set(out[r].tolist()) <= set(valid[r].tolist())
    if native.available():
        os.environ['ANERF_NO_NATIVE'] = '1'
        try:
            import importlib
            importlib.reload(native)
            out_py = native.sample_distinct(valid, u)
        finally:
            del os.environ['ANERF_NO_NATIVE']
            importlib.reload(native)
        np.testing.assert_array_equal(out, out_py)
