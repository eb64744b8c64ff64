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
