"""Golden tests for forward kinematics against a slow numpy oracle."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from anerf_tpu.skeleton import SMPLSkeleton, SMPL_REST_POSE
from anerf_tpu.ops import fk
from anerf_tpu.ops.rotations import axisang_to_rot


def oracle_l2ws(pose_aa, rest_pose, pelvis=None):
    """Sequential-loop FK oracle (independent reimplementation of the
    kinematic chain definition)."""
    J = rest_pose.shape[0]
    rots = Rotation.from_rotvec(pose_aa.reshape(-1, 3)).as_matrix().reshape(
        J, 3, 3)
    parents = np.asarray(SMPLSkeleton.joint_trees)
    l2ws = [None] * J

    def hom(r, t):
        m = np.eye(4)
        m[:3, :3] = r
        m[:3, 3] = t
        return m

    l2ws[0] = hom(rots[0], rest_pose[0])
    # joints are ordered so parents come first in SMPL
    for j in range(1, J):
        p = parents[j]
        l2ws[j] = l2ws[p] @ hom(rots[j], rest_pose[j] - rest_pose[p])
    l2ws = np.stack(l2ws)
    if pelvis is not None:
        l2ws[:, :3, 3] += pelvis
    return l2ws


def test_kinematic_levels_smpl():
    levels = SMPLSkeleton.kinematic_levels()
    # depth structure matches the reference's 8-stage unroll + root
    assert [sorted(l.tolist()) for l in levels] == [
        [0], [1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12, 13, 14],
        [15, 16, 17], [18, 19], [20, 21], [22, 23]]


def test_fk_l2ws_matches_oracle():
    rng = np.random.RandomState(0)
    pose = rng.normal(scale=0.5, size=(24, 3)).astype(np.float32)
    ours = np.asarray(fk.fk_l2ws(axisang_to_rot(jnp.asarray(pose)),
                                 jnp.asarray(SMPL_REST_POSE)))
    ref = oracle_l2ws(pose, SMPL_REST_POSE)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fk_batched_with_pelvis():
    rng = np.random.RandomState(1)
    N = 4
    bones = rng.normal(scale=0.4, size=(N, 24, 3)).astype(np.float32)
    pelvis = rng.normal(size=(N, 3)).astype(np.float32)
    kps, skts, l2ws, rots = fk.fk(jnp.asarray(bones), jnp.asarray(pelvis),
                                  jnp.asarray(SMPL_REST_POSE))
    assert kps.shape == (N, 24, 3)
    assert skts.shape == (N, 24, 4, 4)
    for i in range(N):
        ref = oracle_l2ws(bones[i], SMPL_REST_POSE, pelvis[i])
        np.testing.assert_allclose(np.asarray(l2ws[i]), ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(skts[i]),
                                   np.linalg.inv(ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(kps[i]), ref[:, :3, 3],
                                   atol=1e-5)


def test_rigid_inverse_matches_linalg_inv():
    rng = np.random.RandomState(2)
    aa = rng.normal(size=(16, 3)).astype(np.float32)
    rot = np.asarray(axisang_to_rot(jnp.asarray(aa)))
    mats = np.zeros((16, 4, 4), np.float32)
    mats[:, :3, :3] = rot
    mats[:, :3, 3] = rng.normal(size=(16, 3))
    mats[:, 3, 3] = 1.
    ours = np.asarray(fk.rigid_inverse(jnp.asarray(mats)))
    ref = np.linalg.inv(mats)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fk_gradients_match_finite_difference():
    """Pose gradients through FK + rigid inverse (the A-NeRF pose-refine
    path, reference core/pose_opt.py:435 differentiates torch.inverse)."""
    rng = np.random.RandomState(3)
    bones = rng.normal(scale=0.3, size=(1, 24, 3)).astype(np.float32)
    pelvis = rng.normal(size=(1, 3)).astype(np.float32)

    def loss(b):
        kps, skts, l2ws, rots = fk.fk(b, jnp.asarray(pelvis),
                                      jnp.asarray(SMPL_REST_POSE))
        return jnp.sum(skts * skts) + jnp.sum(kps)

    g = np.asarray(jax.grad(loss)(jnp.asarray(bones)))
    eps = 1e-3
    for (j, d) in [(0, 0), (4, 1), (16, 2), (23, 0)]:
        bp, bm = bones.copy(), bones.copy()
        bp[0, j, d] += eps
        bm[0, j, d] -= eps
        fd = (float(loss(jnp.asarray(bp))) - float(loss(jnp.asarray(bm)))) / (
            2 * eps)
        np.testing.assert_allclose(g[0, j, d], fd, rtol=2e-2, atol=2e-2)


def test_numpy_fk_matches_jax():
    rng = np.random.RandomState(4)
    pose = rng.normal(scale=0.5, size=(24, 3)).astype(np.float32)
    np_l2ws = fk.get_smpl_l2ws_np(pose, scale=1.0)
    jax_l2ws = np.asarray(fk.fk_l2ws(axisang_to_rot(jnp.asarray(pose)),
                                     jnp.asarray(SMPL_REST_POSE)))
    np.testing.assert_allclose(np_l2ws, jax_l2ws, atol=1e-5)


def test_rest_pose_roundtrip():
    rng = np.random.RandomState(5)
    pose = rng.normal(scale=0.5, size=(24, 3)).astype(np.float32)
    l2ws = fk.get_smpl_l2ws_np(pose)
    rest = fk.get_rest_pose_from_l2ws_np(l2ws)
    np.testing.assert_allclose(rest, SMPL_REST_POSE, atol=1e-4)
