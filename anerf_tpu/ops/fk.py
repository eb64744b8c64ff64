"""Differentiable forward kinematics in pure JAX.

TPU-first redesign of the reference FK path
(core/pose_opt.py:372-445 ``calculate_kinematic`` and :482-521
``unrolled_kinematic_chain``; numpy variant core/utils/
skeleton_utils.py:334-376 ``get_smpl_l2ws``).

Differences from the reference, both exact for rigid transforms:
  * the per-level unroll is derived generically from ``joint_trees``
    (the SMPL case reproduces the same 8 matmul levels);
  * ``skts = inverse(l2ws)`` uses the closed-form rigid inverse
    (R^T, -R^T t) instead of a general 4x4 inverse — mathematically
    identical for rotation+translation matrices, cheaper, and with a
    better-conditioned gradient.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..skeleton import Skeleton, SMPLSkeleton, SMPL_REST_POSE
from .rotations import bones_to_rot


def mat_to_hom(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4)."""
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0., 0., 0., 1.], dtype=rot.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_inverse(mats: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid (..., 4, 4) transforms."""
    rot = mats[..., :3, :3]
    trans = mats[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    new_t = -jnp.einsum('...ij,...j->...i', rot_t, trans)
    return mat_to_hom(rot_t, new_t)


def fk_l2ws(rots: jnp.ndarray, rest_pose: jnp.ndarray,
            skel: Skeleton = SMPLSkeleton) -> jnp.ndarray:
    """Local-to-world transforms from per-joint rotations.

    Args:
      rots: (..., J, 3, 3) per-joint rotation matrices.
      rest_pose: (..., J, 3) rest-pose joint locations (broadcastable).
    Returns:
      l2ws: (..., J, 4, 4), root at ``rest_pose[root]`` (no pelvis shift).

    Level-parallel batched matmuls; with SMPL this compiles to the same
    9-stage chain as the reference's hand unroll (pose_opt.py:482-521).
    """
    joint_trees = np.asarray(skel.joint_trees)
    root = skel.root_id
    rest_pose = jnp.broadcast_to(rest_pose, rots.shape[:-2] + (3,))

    parent_locs = rest_pose[..., joint_trees, :]
    rel_trans = rest_pose - parent_locs
    # Per-joint transform relative to parent; the root row is its own l2w.
    rel = mat_to_hom(rots, jnp.where(
        (jnp.arange(rots.shape[-3]) == root)[..., None],
        rest_pose, rel_trans))

    levels = skel.kinematic_levels()
    out = [None] * skel.n_joints
    out[root] = rel[..., root, :, :]
    for level in levels[1:]:
        parents = joint_trees[level]
        parent_mats = jnp.stack([out[p] for p in parents], axis=-3)
        child_rel = rel[..., level, :, :]
        child_mats = parent_mats @ child_rel
        for i, j in enumerate(level):
            out[j] = child_mats[..., i, :, :]
    return jnp.stack(out, axis=-3)


def fk(bones: jnp.ndarray,
       pelvis: jnp.ndarray,
       rest_pose: jnp.ndarray,
       skel: Skeleton = SMPLSkeleton,
       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full differentiable FK: bone params -> (kps, skts, l2ws, rots).

    Mirrors reference ``PoseOptLayer.calculate_kinematic``
    (core/pose_opt.py:372-445): rotations from axis-angle or rot6d,
    kinematic chain, pelvis shift added to the translation column, then
    world-to-local transforms and joint locations.

    Args:
      bones: (N, J, 3) axis-angle or (N, J, 6) rot6d.
      pelvis: (N, 3) root location.
      rest_pose: (J, 3) or (N, J, 3).
    """
    rots = bones_to_rot(bones)
    l2ws = fk_l2ws(rots, rest_pose, skel)
    # Add pelvis shift to the translation column only.
    shift = jnp.zeros(l2ws.shape[:-3] + (4, 4), l2ws.dtype)
    shift = shift.at[..., :3, 3].set(pelvis)
    l2ws = l2ws + shift[..., None, :, :]
    skts = rigid_inverse(l2ws)
    kps = l2ws[..., :3, 3]
    return kps, skts, l2ws, rots


def get_smpl_l2ws_np(pose: np.ndarray, rest_pose: np.ndarray = None,
                     scale: float = 1.,
                     skel: Skeleton = SMPLSkeleton) -> np.ndarray:
    """Numpy FK used by offline data prep / pose generators.

    Matches reference ``get_smpl_l2ws`` (skeleton_utils.py:334-376):
    axis-angle pose (J, 3), scaled rest pose, no pelvis shift.
    """
    from scipy.spatial.transform import Rotation
    if rest_pose is None:
        rest_pose = SMPL_REST_POSE
    rest_kp = rest_pose * scale
    rots = Rotation.from_rotvec(pose.reshape(-1, 3)).as_matrix().astype(
        np.float32).reshape(-1, 3, 3)

    joint_trees = np.asarray(skel.joint_trees)
    l2ws = [None] * skel.n_joints

    def hom(rot, t):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot
        m[:3, 3] = t
        return m

    root = skel.root_id
    l2ws[root] = hom(rots[root], rest_kp[root])
    for level in skel.kinematic_levels()[1:]:
        for j in level:
            p = joint_trees[j]
            l2ws[j] = l2ws[p] @ hom(rots[j], rest_kp[j] - rest_kp[p])
    return np.stack(l2ws, axis=0)


def get_rest_pose_from_l2ws_np(l2ws: np.ndarray,
                               skel: Skeleton = SMPLSkeleton) -> np.ndarray:
    """Recover rest pose from l2ws (reference skeleton_utils.py:378-395)."""
    joint_trees = np.asarray(skel.joint_trees)
    kp = l2ws[:, :3, -1]
    rest = [None] * skel.n_joints
    rest[skel.root_id] = kp[skel.root_id]
    for level in skel.kinematic_levels()[1:]:
        for j in level:
            p = joint_trees[j]
            rel = l2ws[p, :3, :3].T @ (kp[j] - kp[p])
            rest[j] = rest[p] + rel
    return np.stack(rest, axis=0)
