"""SPIN ingestion + ZJU dataset family tests.

Oracles restate the reference math independently
(core/process_spin.py:46-233, core/load_zju.py:536-644).
"""
import h5py
import numpy as np
import pytest

from anerf_tpu.data import spin
from anerf_tpu.data.h5_writer import make_synthetic_h5, write_to_h5py
from anerf_tpu.data.loaders import ZJUH36MDataset, ZJUMocapDataset
from anerf_tpu.ops.fk import get_smpl_l2ws_np
from anerf_tpu.skeleton import SMPL_REST_POSE


def torch_oracle_crop_cam(cam, bbox, img_width, img_height,
                          focal=5000., resized_width=224):
    """Reference VIBE formula, restated (process_spin.py:46-98)."""
    cz = 2 * focal / (resized_width * cam[:, 0])
    cx, cy, h = bbox[:, 0], bbox[:, 1], bbox[:, 2]
    hw, hh = img_width / 2., img_height / 2.
    f = h / resized_width * focal
    sx = cam[:, 0] * (1. / (img_width / h))
    sy = cam[:, 0] * (1. / (img_height / h))
    tx = ((cx - hw) / hw / sx) + cam[:, 1]
    ty = ((cy - hh) / hh / sy) + cam[:, 2]
    return np.stack([f, tx, ty, cz], -1)


def test_crop_cam_matches_reference_formula():
    rng = np.random.RandomState(0)
    cam = np.abs(rng.rand(5, 3)) + 0.3
    bbox = np.stack([rng.uniform(100, 400, 5), rng.uniform(100, 400, 5),
                     rng.uniform(100, 300, 5)], -1)
    ours = spin.convert_crop_cam_to_orig_img_and_focal(cam, bbox, 512, 512)
    ref = torch_oracle_crop_cam(cam, bbox, 512, 512)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_crop_cam_new_focal_rescales_depth():
    cam = np.array([[1.0, 0.1, -0.2]])
    bbox = np.array([[256., 256., 224.]])
    base = spin.convert_crop_cam_to_orig_img_and_focal(cam, bbox, 512, 512)
    refoc = spin.convert_crop_cam_to_orig_img_and_focal(
        cam, bbox, 512, 512, new_focal=2 * base[0, 0])
    assert np.isclose(refoc[0, 0], 2 * base[0, 0])
    # depth doubles with focal so the projected size is unchanged
    assert np.isclose(refoc[0, 3], 2 * base[0, 3])


def test_pred_cams_nerf_convention():
    """c2ws must be in NeRF (swap_mat) convention: y up, z back."""
    cam = np.array([[1.0, 0.0, 0.0]])
    bbox = np.array([[256., 256., 224.]])
    focals, c2ws = spin.pred_cams_to_orig_cam_params(cam, bbox, 512, 512)
    assert c2ws.shape == (1, 4, 4)
    R = c2ws[0, :3, :3]
    # rotation stays orthonormal after the axis swap
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_process_spin_data_fk_consistency():
    """kp3d from process_spin_data must equal standalone FK of the
    returned bones + rest_pose shifted by the scaled pelvis."""
    rng = np.random.RandomState(1)
    n = 3
    rest = SMPL_REST_POSE.copy() * 2.0   # wrong scale on purpose
    bones_in = rng.normal(scale=0.2, size=(n, 24, 3)).astype(np.float32)
    # rotation matrices of those bones
    import jax.numpy as jnp

    from anerf_tpu.ops.rotations import axisang_to_rot
    rot_mats = np.asarray(axisang_to_rot(jnp.asarray(
        bones_in.reshape(-1, 3)))).reshape(n, 24, 3, 3)
    joints = rng.normal(scale=0.3, size=(n, 49, 3)).astype(np.float32)
    cams = np.abs(rng.rand(n, 3)) + 0.5
    bboxes = np.stack([rng.uniform(100, 400, n), rng.uniform(100, 400, n),
                       rng.uniform(150, 250, n)], -1)

    out = spin.process_spin_data(None, cams, joints, rot_mats, bboxes,
                                 rest_pose=rest)

    # rest pose was rescaled to the canonical mean bone length
    ref = SMPL_REST_POSE * out['ext_scale'] / (0.25 / 0.00035) * \
        (0.25 / 0.00035)
    np.testing.assert_allclose(
        spin.calculate_bone_length(out['rest_pose']).mean(),
        spin.calculate_bone_length(
            SMPL_REST_POSE * out['ext_scale']).mean(), rtol=1e-5)

    # bones round-trip through axis-angle
    np.testing.assert_allclose(out['bones'], bones_in, atol=1e-4)

    # FK consistency
    for i in range(n):
        l2ws = get_smpl_l2ws_np(out['bones'][i], out['rest_pose'])
        l2ws[:, :3, -1] += joints[i, 8] * out['pose_scale']
        np.testing.assert_allclose(out['kp3d'][i], l2ws[:, :3, -1],
                                   atol=1e-4)
        np.testing.assert_allclose(out['skts'][i] @ l2ws,
                                   np.broadcast_to(np.eye(4), (24, 4, 4)),
                                   atol=1e-4)


@pytest.fixture(scope='module')
def zju_h5(tmp_path_factory):
    """Synthetic multi-cam h5 in the ZJU layout: n_cams cameras x
    n_poses poses, with kp_idxs / img_pose_indices LUTs."""
    d = tmp_path_factory.mktemp('zju')
    path = str(d / 'S1_train_h5py.h5')
    n_poses, n_cams = 4, 3
    make_synthetic_h5(path, n_frames=n_poses * n_cams, H=16, W=16)
    # rewrite with LUTs: image i shows pose i % n_poses from cam i // n_poses
    with h5py.File(path, 'r+') as f:
        n_imgs = f['imgs'].shape[0]
        kp_idxs = np.arange(n_imgs) % n_poses
        cam_idxs = np.arange(n_imgs)
        f.create_dataset('kp_idxs', data=kp_idxs)
        f.create_dataset('img_pose_indices', data=cam_idxs)
    return path, n_poses, n_cams


def test_zju_dataset_lut_indexing(zju_h5):
    path, n_poses, n_cams = zju_h5
    ds = ZJUMocapDataset(path, subject='S1', N_samples=8, split='full')
    # image 5 -> pose 5 % n_poses through the kp_idxs LUT
    batch = ds.get_item(5, np.random.default_rng(0))
    # pose-opt bank idx stays the query idx (reference load_zju.py:563-567;
    # ZJU doesn't support pose refinement), but the pose DATA row goes
    # through the kp_idxs LUT
    assert int(batch['kp_idx'][0]) == 5
    kp_expected = ds.kp3d[5 % n_poses]
    # get_pose_data must have used the LUT row, not the raw image idx
    np.testing.assert_allclose(batch['kp3d'][0], kp_expected, atol=1e-6)


def test_zju_h36m_val_split(zju_h5):
    path, n_poses, n_cams = zju_h5
    tr = ZJUH36MDataset(path, subject='S1', N_samples=8, split='train')
    va = ZJUH36MDataset(path, subject='S1', N_samples=8, split='val')
    n_imgs = n_poses * n_cams
    assert len(tr._idx_map) == max(0, n_imgs - 30) or len(tr._idx_map) == 0
    # tiny dataset: all 12 images land in val's last-30 window
    assert len(va._idx_map) == min(30, n_imgs)
