"""Offline preprocessing helpers (the raw-dataset converters' pure-math
parts; oracles restate reference behavior)."""
import numpy as np

from anerf_tpu.data import preprocess as pp
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder


def test_dilate_masks_matches_binary_dilation():
    """5x5-ones dilation oracle via scipy.ndimage (reference uses
    cv2.dilate with the same kernel, load_surreal.py:50-59)."""
    from scipy import ndimage
    rng = np.random.RandomState(0)
    masks = (rng.rand(3, 20, 20) > 0.9).astype(np.uint8)
    for it in (1, 2):
        ours = pp.dilate_masks(masks, extend_iter=it)
        ref = np.stack([
            ndimage.binary_dilation(m, structure=np.ones((5, 5)),
                                    iterations=it)
            for m in masks]).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref)


def test_dilate_masks_keeps_channel_dim():
    m = np.zeros((1, 8, 8, 1), np.uint8)
    m[0, 4, 4, 0] = 1
    out = pp.dilate_masks(m, extend_iter=1)
    assert out.shape == m.shape
    assert out[0, 2:7, 2:7, 0].all()
    assert out.sum() == 25


def test_temporal_validity():
    paths = [b'a/Image0001.png', b'a/Image0002.png', b'a/Image0004.png',
             b'b/Image0005.png', b'b/Image0006.png']
    valid, seq_map = pp.get_temporal_validity(paths)
    np.testing.assert_array_equal(valid, [0, 1, 0, 0, 1])
    np.testing.assert_array_equal(seq_map, [0, 0, 1, 2, 2])


def test_remap_mixamo_kp_idxs():
    # two sequences of 8 images = 4 cams x 2 poses each
    kp = np.array([0, 0, 0, 0, 1, 1, 1, 1,   # seq A poses 0..1
                   0, 0, 0, 0, 1, 1, 1, 1])  # seq B poses 0..1
    out = pp.remap_mixamo_kp_idxs(kp, [8, 8], n_cam=4)
    np.testing.assert_array_equal(out[:8], kp[:8])
    np.testing.assert_array_equal(out[8:], kp[8:] + 2)


def test_skeleton3d_to_2d_center_projection():
    """A point straight ahead of a NeRF camera projects to the image
    center."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.0   # camera at z=2 looking down -z
    kps = np.array([[[0., 0., 0.]]], np.float32)
    kp2d = pp.skeleton3d_to_2d(kps, c2w[None], 64, 64, [100.])
    np.testing.assert_allclose(kp2d[0, 0], [32., 32.], atol=1e-4)


def test_cylinder_mask_prefilter_keeps_subject_pixels():
    """Rays through the subject keep their mask; far-corner rays are
    zeroed (reference load_surreal.py:252-276)."""
    H = W = 32
    focal = 0.8 * W
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.7
    kps = np.array([[[0., 0., 0.], [0.05, 0.1, 0.02], [-0.05, -0.1, 0.]]],
                   np.float32)
    cyls = get_kp_bounding_cylinder(kps, ext_scale=0.001, head='-y')
    masks = np.ones((1, H, W, 1), np.uint8)
    out = pp.cylinder_mask_prefilter(masks, cyls, c2w[None],
                                     np.zeros(1, np.int64), H, W, focal)
    # center pixel ray passes through the cylinder
    assert out[0, H // 2, W // 2, 0] == 1
    # corner rays miss it
    assert out[0, 0, 0, 0] == 0 and out[0, -1, -1, 0] == 0
    assert 0 < out.sum() < H * W


# ---------------------------------------------------------------------------
# ZJU-MoCap converter (reference load_zju.py:179-380)
# ---------------------------------------------------------------------------

def test_zju_pose_geometry_root_composition():
    """The ZJU->NeRF pose correction: root joint lands at
    Rn R' T + Rn T' and the root bone becomes Rn @ R' (reference
    load_zju.py:102-166)."""
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(3)
    N = 4
    bones = rng.randn(N, 24, 3).astype(np.float32) * 0.1
    rhs = rng.randn(N, 3).astype(np.float32) * 0.5
    ths = rng.randn(N, 3).astype(np.float32)
    # uncentered rest pose: canonical + a pelvis offset T
    from anerf_tpu.skeleton import SMPL_REST_POSE
    T = np.array([0.02, -0.35, 0.01], np.float32)
    rest_raw = SMPL_REST_POSE * 0.9 + T

    out = pp.zju_smpl_to_pose_data(bones, rhs, ths, rest_raw)

    Rn = pp.ZJU_TO_NERF_ROT
    Rp = Rotation.from_rotvec(rhs).as_matrix()
    want_root = np.einsum('ij,njk,k->ni', Rn, Rp, T) + ths @ Rn.T
    np.testing.assert_allclose(out['kp3d'][:, 0], want_root, atol=1e-5)
    # composed root rotation
    got_R0 = Rotation.from_rotvec(out['bones'][:, 0]).as_matrix()
    np.testing.assert_allclose(got_R0, Rn[None] @ Rp, atol=1e-5)
    # non-root bones untouched; skts invert l2ws
    np.testing.assert_allclose(out['bones'][:, 1:], bones[:, 1:], atol=1e-6)
    l2ws = np.linalg.inv(out['skts'])
    np.testing.assert_allclose(l2ws[..., :3, -1], out['kp3d'], atol=1e-4)
    # rest pose is pelvis-centered and scaled by 1 (scale_to_ref=False)
    np.testing.assert_allclose(out['rest_pose'][0], 0, atol=1e-7)
    np.testing.assert_allclose(out['rest_pose'],
                               rest_raw - rest_raw[0:1], atol=1e-6)


def test_zju_extrinsics_roundtrip():
    """c2w from (R, T): camera center = Rn @ (-R^T T/1000), NeRF axis
    swap applied (reference load_zju.py:283-310)."""
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(1)
    R = Rotation.from_rotvec(rng.randn(2, 3) * 0.3).as_matrix()
    T = rng.randn(2, 3, 1) * 1000.0
    K = np.tile(np.diag([500., 500., 1.]), (2, 1, 1))
    K[:, 0, 2], K[:, 1, 2] = 512., 510.
    c2ws, focals, centers = pp.zju_extrinsics_to_nerf(R, T, K)
    Rn = pp.ZJU_TO_NERF_ROT.astype(np.float64)
    cam_center = -(np.transpose(R, (0, 2, 1)) @ (T / 1000.))[..., 0]
    want = (Rn @ cam_center.T).T
    np.testing.assert_allclose(c2ws[:, :3, -1], want, atol=1e-5)
    np.testing.assert_allclose(focals, [[500., 500.]] * 2)
    np.testing.assert_allclose(centers, [[512., 510.]] * 2)
    # swap_mat flips the y/z camera axes (NeRF convention): columns 1,2
    # of the rotation are negated relative to the unswapped inverse
    ext = np.zeros((2, 4, 4)); ext[:, :3, :3] = R
    ext[:, :3, 3:] = T / 1000.; ext[:, 3, 3] = 1
    plain = np.linalg.inv(ext)
    plain[:, :3, :3] = Rn @ plain[:, :3, :3]
    np.testing.assert_allclose(c2ws[:, :3, 0], plain[:, :3, 0], atol=1e-6)
    np.testing.assert_allclose(c2ws[:, :3, 1], -plain[:, :3, 1], atol=1e-6)
    np.testing.assert_allclose(c2ws[:, :3, 2], -plain[:, :3, 2], atol=1e-6)


def test_zju_background_median():
    """Vectorized masked median equals the reference's per-pixel loop
    (load_zju.py:267-281)."""
    rng = np.random.RandomState(0)
    N, H, W = 6, 8, 8
    imgs = rng.randint(0, 255, (N, H, W, 3)).astype(np.uint8)
    masks = (rng.rand(N, H, W, 1) > 0.5).astype(np.uint8)
    cam_idxs = np.array([0, 0, 0, 1, 1, 1])
    got = pp.zju_background_median(imgs, masks, cam_idxs, num_cams=3)
    # reference-style loop
    want = np.zeros((3, H, W, 3), np.uint8)
    for c in (0, 1):
        ci = imgs[cam_idxs == c]
        cm = masks[cam_idxs == c]
        for h in range(H):
            for w in range(W):
                is_bg = np.where(cm[:, h, w] < 1)[0]
                med = (np.zeros(3) if len(is_bg) == 0
                       else np.median(ci[is_bg, h, w], axis=0))
                want[c, h, w] = med.astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    assert (got[2] == 0).all()   # camera with no frames stays zero


def _write_synthetic_zju(root, n_frames=3, n_cams=2, size=32):
    """Tiny on-disk ZJU-MoCap layout (CoreView_377) for the end-to-end
    converter test."""
    import imageio.v2 as imageio
    import os
    rng = np.random.RandomState(0)
    subj = os.path.join(root, 'CoreView_377')
    ims = []
    for f in range(n_frames):
        frame_paths = []
        for c in range(n_cams):
            rel = f'cam{c}/{f:06d}.jpg'
            os.makedirs(os.path.join(subj, f'cam{c}'), exist_ok=True)
            img = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
            imageio.imwrite(os.path.join(subj, rel), img)
            mask = np.zeros((size, size), np.uint8)
            mask[8:24, 8:24] = 255
            mp = os.path.join(subj, 'mask', f'cam{c}')
            os.makedirs(mp, exist_ok=True)
            imageio.imwrite(os.path.join(subj, 'mask', f'cam{c}',
                                         f'{f:06d}.png'), mask)
            frame_paths.append(rel)
        ims.append({'ims': frame_paths})
        params = {'poses': rng.randn(1, 72).astype(np.float32) * 0.05,
                  'shapes': rng.randn(1, 10).astype(np.float32) * 0.1,
                  'Rh': rng.randn(1, 3).astype(np.float32) * 0.2,
                  'Th': rng.randn(1, 3).astype(np.float32)}
        os.makedirs(os.path.join(subj, 'params'), exist_ok=True)
        np.save(os.path.join(subj, 'params', f'{f}.npy'), params)
    from scipy.spatial.transform import Rotation
    Rs = Rotation.from_rotvec(rng.randn(n_cams, 3) * 0.2).as_matrix()
    Ts = rng.randn(n_cams, 3, 1) * 500.0 + 2000.0
    Ks = np.tile(np.diag([800., 800., 1.]), (n_cams, 1, 1))
    Ks[:, 0, 2] = Ks[:, 1, 2] = 512.0
    annots = {'cams': {'K': list(Ks), 'D': [np.zeros(5)] * n_cams,
                       'R': list(Rs), 'T': list(Ts)},
              'ims': ims}
    np.save(os.path.join(subj, 'annots.npy'), annots)
    return subj


def test_process_zju_data_end_to_end(tmp_path, monkeypatch):
    """Full converter on a synthetic raw layout: h5 written with the ZJU
    schema and ZJUMocapDataset can index it."""
    import h5py
    from anerf_tpu.data.loaders import ZJUMocapDataset
    from anerf_tpu.skeleton import SMPL_REST_POSE

    root = str(tmp_path)
    _write_synthetic_zju(root, n_frames=3, n_cams=2, size=32)
    # 3 frames instead of the real 300
    monkeypatch.setitem(pp.ZJU_NUM_TRAIN_FRAMES, '377', 3)
    rest_raw = (SMPL_REST_POSE * 0.9
                + np.array([0.01, -0.3, 0.02], np.float32))
    h5_path = pp.process_zju_data(
        root, subject='377', training_view=(0, 1), split='train',
        res=32 / 1024.0, rest_pose_raw=rest_raw)

    with h5py.File(h5_path, 'r') as f:
        n_img = f['imgs'].shape[0]
        assert n_img == 6                       # 3 frames x 2 cams
        assert f['kp3d'].shape == (3, 24, 3)    # pose bank: unique frames
        assert f['c2ws'].shape == (2, 4, 4)
        assert f['focals'].shape == (2, 2)
        np.testing.assert_array_equal(f['kp_idxs'][:], [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(f['img_pose_indices'][:],
                                      [0, 1, 0, 1, 0, 1])
        # the writer flattens images to (N, H*W, C) for fast pixel gather
        assert f['bkgds'].shape == (2, 32 * 32, 3)
        assert f['masks'][:].max() == 1
        assert f['sampling_masks'][:].sum() >= f['masks'][:].sum()

    ds = ZJUMocapDataset(h5_path, subject='377', N_samples=8, split='full')
    out = ds.get_item(2, np.random.default_rng(0))   # frame 1, cam 0
    assert out['rays_o'].shape == (8, 3)
    np.testing.assert_allclose(out['kp3d'][0], ds.kp3d[1], atol=1e-6)
    # the camera LUT maps image 2 (frame 1, first view) to camera 0
    assert int(ds.cam_idxs_lut[2]) == 0
