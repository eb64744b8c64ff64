"""Tests for skeleton-relative input encoders."""
import numpy as np
import jax.numpy as jnp

from anerf_tpu.ops import encoders
from anerf_tpu.ops.fk import fk
from anerf_tpu.skeleton import SMPL_REST_POSE


def make_pose(n=2, seed=0):
    rng = np.random.RandomState(seed)
    bones = rng.normal(scale=0.3, size=(n, 24, 3)).astype(np.float32)
    pelvis = rng.normal(size=(n, 3)).astype(np.float32)
    kps, skts, l2ws, rots = fk(jnp.asarray(bones), jnp.asarray(pelvis),
                               jnp.asarray(SMPL_REST_POSE))
    return kps, skts, bones


def test_transform_batch_pts_oracle():
    kps, skts, _ = make_pose(3)
    rng = np.random.RandomState(1)
    pts = rng.normal(size=(3, 5, 3)).astype(np.float32)
    out = np.asarray(encoders.transform_batch_pts(jnp.asarray(pts), skts))
    assert out.shape == (3, 5, 24, 3)
    skts_np = np.asarray(skts)
    for r in range(3):
        for s in range(5):
            for j in range(24):
                p = np.append(pts[r, s], 1.0)
                ref = (skts_np[r, j] @ p)[:3]
                np.testing.assert_allclose(out[r, s, j], ref, atol=1e-5)


def test_transform_pts_puts_joint_at_origin():
    """A query point at a joint location maps to ~0 in that joint's frame."""
    kps, skts, _ = make_pose(1)
    pts = np.asarray(kps)[:, 3:4, :]  # at joint 3
    out = np.asarray(encoders.transform_batch_pts(jnp.asarray(pts), skts))
    np.testing.assert_allclose(out[0, 0, 3], 0., atol=1e-5)


def test_transform_batch_rays_rotation_only():
    kps, skts, _ = make_pose(2)
    rng = np.random.RandomState(2)
    rays_d = rng.normal(size=(2, 1, 3)).astype(np.float32)
    out = np.asarray(encoders.transform_batch_rays(jnp.asarray(rays_d), skts))
    assert out.shape == (2, 1, 24, 3)
    skts_np = np.asarray(skts)
    for r in range(2):
        for j in range(24):
            ref = skts_np[r, j, :3, :3] @ rays_d[r, 0]
            np.testing.assert_allclose(out[r, 0, j], ref, atol=1e-5)


def test_rel_dist_equals_norm_and_matches_kps():
    kps, skts, _ = make_pose(2)
    rng = np.random.RandomState(3)
    pts = rng.normal(size=(2, 6, 3)).astype(np.float32)
    pts_t = encoders.transform_batch_pts(jnp.asarray(pts), skts)
    v1 = np.asarray(encoders.rel_dist(jnp.asarray(pts), pts_t, kps))
    v2 = np.asarray(encoders.rel_dist(jnp.asarray(pts), None, kps))
    # distance in local frame == distance to the joint in world (rigid)
    np.testing.assert_allclose(v1, v2, atol=1e-4)
    assert v1.shape == (2, 6, 24)


def test_vec_norm_view_encoding():
    kps, skts, _ = make_pose(1)
    rays_d = np.array([[[0., 0., -2.]]], np.float32)
    rays_t = encoders.transform_batch_rays(jnp.asarray(rays_d), skts)
    pts_t = jnp.zeros((1, 7, 24, 3))
    d = np.asarray(encoders.vec_norm(rays_t, refs=pts_t))
    # per-ray quantities keep the singleton sample axis (broadcast is
    # deferred to after the positional encoding; see vec_norm docstring)
    assert d.shape == (1, 1, 72)
    d = np.broadcast_to(d, (1, 7, 72))
    # normalized per joint
    per_joint = d.reshape(1, 7, 24, 3)
    np.testing.assert_allclose(np.linalg.norm(per_joint, axis=-1), 1.,
                               atol=1e-5)


def test_ray_ang_range():
    kps, skts, _ = make_pose(1)
    rng = np.random.RandomState(4)
    pts = rng.normal(size=(1, 5, 3)).astype(np.float32)
    pts_t = encoders.transform_batch_pts(jnp.asarray(pts), skts)
    rays_d = rng.normal(size=(1, 1, 3)).astype(np.float32)
    rays_t = encoders.transform_batch_rays(jnp.asarray(rays_d), skts)
    ang = np.asarray(encoders.ray_ang(rays_t, pts_t))
    assert ang.shape == (1, 5, 24)
    assert (ang >= -np.pi / 2 - 1e-4).all() and (ang <= np.pi / 2 + 1e-4).all()


def test_factories_dims():
    fn, dims, cdims = encoders.get_kp_input_fn('reldist', 24)
    assert (dims, cdims) == (24, 24)
    fn, dims, cdims = encoders.get_kp_input_fn('relpos', 24)
    assert (dims, cdims) == (72, 24)
    fn, dims, cdims = encoders.get_kp_input_fn('querypts', 24)
    assert (dims, cdims) == (3, 3)
    _, vdims = encoders.get_view_input_fn('relray', 24)
    assert vdims == 72
    _, bdims = encoders.get_bone_input_fn('reldir', 24)
    assert bdims == 72
    _, bdims = encoders.get_bone_input_fn('Nope', 24)
    assert bdims == 0


def test_transform_batch_pts_cm_matches_joint_major():
    """Component-major transform == transpose of the joint-major one
    (values AND gradients; it feeds the fused kernel's bitcast path)."""
    import jax
    from anerf_tpu.ops.encoders import (transform_batch_pts,
                                        transform_batch_pts_cm)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.normal(size=(5, 7, 3)).astype(np.float32))
    from anerf_tpu.ops.fk import fk
    from anerf_tpu.skeleton import SMPL_REST_POSE
    bones = jnp.asarray(rng.normal(scale=0.2, size=(5, 24, 3))
                        .astype(np.float32))
    pelvis = jnp.asarray(rng.normal(scale=0.02, size=(5, 3))
                         .astype(np.float32))
    _, skts, _, _ = fk(bones, pelvis,
                       jnp.asarray(SMPL_REST_POSE.astype(np.float32)))
    a = transform_batch_pts(pts, skts)
    b = transform_batch_pts_cm(pts, skts)
    np.testing.assert_allclose(
        np.asarray(b),
        np.asarray(a.transpose(0, 1, 3, 2).reshape(5, 7, 72)), atol=1e-6)
    g_a = jax.grad(lambda p: transform_batch_pts(p, skts).sum())(pts)
    g_b = jax.grad(lambda p: transform_batch_pts_cm(p, skts).sum())(pts)
    # different einsum contraction order: f32 accumulation noise only
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a),
                               rtol=1e-5, atol=1e-5)


def test_tform_rows_affine_identity():
    """The fused kernels' per-ray affine rows (pallas_encmlp.tform_rows:
    A = W@o + t, B = W@d) must reproduce the materialized component-
    major transform for points ON the ray: A + z*B == cm(o + z*d).
    Unit-level companion of the render-level fuse_tform parity test —
    both builders share encoders.cm_transform_rows so the lane order
    cannot silently diverge."""
    from anerf_tpu.ops.encoders import transform_batch_pts_cm
    from anerf_tpu.ops.pallas_encmlp import tform_rows
    rng = np.random.RandomState(1)
    R, S = 5, 7
    o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.5, 2.0, size=(R, S))
                    .astype(np.float32))
    bones = jnp.asarray(rng.normal(scale=0.2, size=(R, 24, 3))
                        .astype(np.float32))
    pelvis = jnp.asarray(rng.normal(scale=0.02, size=(R, 3))
                         .astype(np.float32))
    _, skts, _, _ = fk(bones, pelvis,
                       jnp.asarray(SMPL_REST_POSE.astype(np.float32)))
    ab = tform_rows(skts, o, d)                      # (R, 2, 72)
    assert ab.shape == (R, 2, 72)
    p_affine = ab[:, None, 0] + z[:, :, None] * ab[:, None, 1]
    pts = o[:, None] + d[:, None] * z[..., None]     # (R, S, 3)
    p_cm = transform_batch_pts_cm(pts, skts)
    np.testing.assert_allclose(np.asarray(p_affine), np.asarray(p_cm),
                               rtol=2e-5, atol=2e-5)
