"""Multi-subject training end-to-end (reference raycasters.py:425,540-548,
726-729 + ConcatH5Dataset, dataset.py:570-693).

The reference *intends* to append the subject index as a view-input
channel but its NeRF.forward split never accounts for the extra channel
and crashes (verified empirically: split_with_sizes error at
nerf.py:133-137 whenever subject_idxs is not None).  We implement the
intended semantics with correctly sized views_linear.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anerf_tpu.data.dataset import BaseH5Dataset, ConcatH5Dataset
from anerf_tpu.data.h5_writer import make_synthetic_h5
from anerf_tpu.data.pipeline import Prefetcher
from anerf_tpu.models.factory import (build_raycast_config, embed_state,
                                      init_raycaster_params)
from anerf_tpu.models.raycaster import render_rays
from anerf_tpu.skeleton import SMPLSkeleton
from anerf_tpu.training import pose_opt as P
from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                        make_train_step)
from anerf_tpu.utils.config import Config

from test_trainer import make_setup_and_batch, tiny_config


@pytest.fixture(scope='module')
def two_subject_h5(tmp_path_factory):
    d = tmp_path_factory.mktemp('ms')
    a = make_synthetic_h5(str(d / 'a.h5'), n_frames=4, H=24, W=24, seed=1)
    b = make_synthetic_h5(str(d / 'b.h5'), n_frames=5, H=24, W=24, seed=2)
    return a, b


def test_subject_channel_changes_output():
    """The subject-idx view channel must reach the radiance head: the
    same rays with different subject_idxs give different colors."""
    cfg = tiny_config()
    setup, batch, _ = make_setup_and_batch(cfg)
    rc = build_raycast_config(cfg, n_framecodes=3, n_subjects=2)
    assert rc.nerf.n_subjects == 2
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    pose = {'kps': batch['kps'], 'skts': batch['skts'],
            'bones': batch['bones'], 'cyls': batch['cyls']}
    est = embed_state(cfg, rc, 0)
    kw = dict(state=est, cam_idxs=batch['cam_idxs'],
              rng=jax.random.PRNGKey(7))
    n = batch['rays_o'].shape[0]
    out0 = render_rays(rc, params, batch['rays_o'], batch['rays_d'],
                       0.1, 6.0, pose,
                       subject_idxs=jnp.zeros((n,), jnp.int32), **kw)
    out1 = render_rays(rc, params, batch['rays_o'], batch['rays_d'],
                       0.1, 6.0, pose,
                       subject_idxs=jnp.ones((n,), jnp.int32), **kw)
    assert np.abs(np.asarray(out0['rgb_map'])
                  - np.asarray(out1['rgb_map'])).max() > 1e-4
    # density path has no view branch: alpha must be identical
    np.testing.assert_allclose(np.asarray(out0['alpha']),
                               np.asarray(out1['alpha']), atol=1e-6)


def test_single_subject_param_shapes_unchanged():
    cfg = tiny_config()
    rc1 = build_raycast_config(cfg, n_subjects=1)
    rc2 = build_raycast_config(cfg, n_subjects=2)
    assert rc2.nerf.vnet_input == rc1.nerf.vnet_input + 1


def test_concat_dataset_trains_end_to_end(two_subject_h5):
    """ConcatH5Dataset -> Prefetcher -> jitted train step with pose opt:
    subject_idxs flow into the model, per-subject rest poses into FK."""
    pa, pb = two_subject_h5
    ds = ConcatH5Dataset([BaseH5Dataset(pa, N_samples=8),
                          BaseH5Dataset(pb, N_samples=8)])
    meta = ds.get_meta()
    assert meta['n_subjects'] == 2
    assert meta['rest_pose'].shape[0] == 2
    assert len(meta['rest_pose_idxs']) == len(meta['kp3d']) == 9

    cfg = Config(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                 use_viewdirs=True, multires=3, multires_views=2,
                 netdepth=2, netwidth=16, N_samples=6, N_importance=3,
                 N_rand=32, N_sample_images=4, opt_framecode=True,
                 framecode_size=4, use_background=True, opt_pose=True,
                 opt_pose_step=1, opt_pose_coef=0.1)
    rc = build_raycast_config(cfg, n_framecodes=meta['n_views'],
                              n_subjects=meta['n_subjects'])
    setup = TrainSetup(
        cfg=cfg, rc=rc, skel=SMPLSkeleton,
        rest_pose=jnp.asarray(meta['rest_pose']),
        rest_pose_idxs=jnp.asarray(meta['rest_pose_idxs'], jnp.int32),
        anchors=P.make_anchors(meta['kp3d'], meta['bones']),
        near=0.1, far=6.0)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=meta['kp3d'],
                             init_bones=meta['bones'])
    assert state['pose_params']['pelvis'].shape[0] == 9
    step = jax.jit(make_train_step(setup))
    pf = Prefetcher(ds, N_images=4, n_workers=2, N_iter=3, seed=0)
    subj_seen = set()
    for i, batch in enumerate(pf):
        assert 'subject_idxs' in batch and batch['subject_idxs'].dtype == \
            np.int32
        subj_seen.update(np.unique(batch['subject_idxs']).tolist())
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(stats['total_loss']))
    pf.stop()
    assert subj_seen == {0, 1}
    assert int(state['step']) == 3


def test_subjects_converge_to_distinct_radiance():
    """Two subjects sharing identical pose/ray data but different target
    colors must separate through the subject channel alone."""
    cfg = tiny_config(lrate=5e-3, perturb=0., opt_framecode=False,
                      use_background=False)
    setup, batch, _ = make_setup_and_batch(cfg, n_rays=32)
    rc = build_raycast_config(cfg, n_subjects=2)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=setup.skel,
                       rest_pose=setup.rest_pose, near=setup.near,
                       far=setup.far)
    n = batch['rays_o'].shape[0]
    subj = jnp.asarray(np.arange(n) % 2, jnp.int32)
    batch = dict(batch)
    batch['subject_idxs'] = subj
    batch['target_s'] = jnp.where((subj % 2 == 0)[:, None], 0.2, 0.8) * \
        jnp.ones((n, 3))
    state = init_train_state(setup, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(setup))
    for i in range(150):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
    pred = np.asarray(
        jax.jit(lambda p: render_rays(
            rc, p, batch['rays_o'], batch['rays_d'], setup.near, setup.far,
            {'kps': batch['kps'], 'skts': batch['skts'],
             'bones': batch['bones'], 'cyls': batch['cyls']},
            embed_state(cfg, rc, 150),
            subject_idxs=subj)['rgb_map'])(state['params']))
    m0 = pred[::2].mean()
    m1 = pred[1::2].mean()
    assert m1 - m0 > 0.2, (m0, m1)
