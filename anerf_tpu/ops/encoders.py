"""Skeleton-relative input encoders in pure JAX.

Functional TPU redesign of reference core/encoders.py.  The reference
wraps each encoding in an nn.Module with explicit (4, N_samples) matmul
reshuffling; here each encoder is a pure function over
``(pts, pts_t, rays_t, kps, ...)`` built on einsum so XLA fuses the tiny
per-joint transforms into the surrounding computation.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp


def transform_batch_pts(pts: jnp.ndarray, skts: jnp.ndarray) -> jnp.ndarray:
    """World points -> per-joint local coordinates.

    Matches reference ``transform_batch_pts`` (encoders.py:8-23):
    homogeneous pts hit by each joint's world-to-local (N_rays, J, 4, 4).

    Args:
      pts: (N_rays, N_samples, 3).
      skts: (N_rays, J, 4, 4) or (1, J, 4, 4).
    Returns:
      pts_t: (N_rays, N_samples, J, 3).
    """
    rot = skts[..., :3, :3]
    trans = skts[..., :3, 3]
    out = jnp.einsum('rjab,rsb->rsja', rot, pts) + trans[:, None]
    return out


def cm_transform_rows(skts: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray world->local transforms as COMPONENT-major row
    matrices: ``(rcat (R, 3J, 3), tcat (R, 3J))`` with row c*J+j =
    component c of joint j (the ops/pallas_encmlp.py lane layout), so
    ``p_cm = pts @ rcat^T + tcat``.

    Single source of the layout-sensitive row ordering — consumed by
    :func:`transform_batch_pts_cm` AND the fused kernels' affine-row
    build (pallas_encmlp.tform_rows); keeping one builder means the
    two paths cannot silently disagree on the lane order.
    """
    R, J = skts.shape[0], skts.shape[1]
    rot = skts[..., :3, :3]
    rcat = rot.transpose(0, 2, 1, 3).reshape(R, 3 * J, 3)
    tcat = skts[..., :3, 3].transpose(0, 2, 1).reshape(R, 3 * J)
    return rcat, tcat


def transform_batch_pts_cm(pts: jnp.ndarray, skts: jnp.ndarray
                           ) -> jnp.ndarray:
    """:func:`transform_batch_pts` emitted directly as the fused
    kernel's flattened COMPONENT-major features (N_rays, N_samples, 3J)
    with channel c*J+j = component c of joint j's local coords
    (ops/pallas_encmlp.py lane layout).

    Expressed as ONE batched matmul per ray — (S, 3) @ (3, 3J) — whose
    row-major output reshapes to the kernel's (n, 3J) operand for free;
    the joint-major transform + transpose path costs ~0.5 ms/step of
    XLA layout copies on the 37 MB pts_t tensor at the flagship recipe.
    Same math as the reference transform (encoders.py:8-23).
    """
    rcat, tcat = cm_transform_rows(skts)
    return jnp.einsum('rsd,rkd->rsk', pts, rcat) + tcat[:, None]


def transform_batch_rays(rays_d: jnp.ndarray, skts: jnp.ndarray) -> jnp.ndarray:
    """Ray directions -> per-joint local frame (rotation only).

    Matches reference ``transform_batch_rays`` (encoders.py:25-37).

    Args:
      rays_d: (N_rays, 1, 3).
      skts: (N_rays, J, 4, 4).
    Returns:
      rays_t: (N_rays, 1, J, 3).
    """
    rot = skts[..., :3, :3]
    return jnp.einsum('rjab,rsb->rsja', rot, rays_d)


# --- keypoint-position encoders (reference encoders.py:101-169) ---

def rel_dist(pts, pts_t, kps):
    """Per-joint distance: (N_rays, N_samples, J)
    (reference RelDistEncoder, encoders.py:101-122)."""
    if pts_t is not None:
        return jnp.linalg.norm(pts_t, axis=-1)
    return jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)


def rel_pos(pts, pts_t, kps):
    """Per-joint offsets flattened: (N_rays, N_samples, J*3)
    (reference RelPosEncoder, encoders.py:124-142)."""
    if pts_t is not None:
        return pts_t.reshape(pts_t.shape[:-2] + (-1,))
    d = pts[:, :, None] - kps[:, None]
    return d.reshape(d.shape[:-2] + (-1,))


def kp_cat(pts, pts_t, kps):
    """World pts concatenated with all keypoints: (..., J*3 + 3)
    (reference KPCatEncoder, encoders.py:144-169)."""
    flat_kps = jnp.broadcast_to(kps[:, None],
                                pts.shape[:2] + kps.shape[-2:])
    flat_kps = flat_kps.reshape(flat_kps.shape[:-2] + (-1,))
    return jnp.concatenate([pts, flat_kps], axis=-1)


def identity_pts(pts, pts_t, kps):
    """Raw query points (reference IdentityEncoder, encoders.py:57-68)."""
    return pts


# --- view/bone encoders (reference encoders.py:172-212) ---

def vec_norm(vecs, refs=None):
    """L2-normalize last dim and flatten per-joint vectors.

    Matches reference VecNormEncoder (encoders.py:172-193): used for
    view 'relray' (input rays_t (N_rays, 1, J, 3)) and bone 'reldir'
    (input pts_t (N_rays, N_samples, J, 3)).

    Unlike the reference (which expands to the sample count of ``refs``
    here), the singleton sample axis is kept: per-ray quantities stay
    per-ray through the (sample-independent) positional encoding, so the
    sin/cos run at 1/N_samples the size; the caller broadcasts the
    embedded result instead.  ``refs`` is accepted for signature parity.
    """
    n = vecs / jnp.linalg.norm(vecs, axis=-1, keepdims=True).clip(1e-12)
    return n.reshape(n.shape[:2] + (-1,))


def ray_ang(rays_t, pts_t):
    """Angle between local point and local ray dir, minus pi/2.

    Matches reference RayAngEncoder -> calculate_angle
    (encoders.py:195-212, skeleton_utils.py:594-605).
    Returns (N_rays, N_samples, J).
    """
    dot = jnp.sum(pts_t * rays_t, axis=-1)
    na = jnp.linalg.norm(pts_t, axis=-1)
    nb = jnp.linalg.norm(rays_t, axis=-1)
    cos = jnp.clip(dot / (na * nb), -1. + 1e-6, 1. - 1e-6)
    return jnp.arccos(cos) - 0.5 * jnp.pi


def identity_expand(x, refs):
    """Broadcast a per-ray feature across samples
    (reference IdentityExpandEncoder, encoders.py:71-79)."""
    flat = x.reshape(x.shape[0], 1, -1)
    return jnp.broadcast_to(flat, refs.shape[:2] + flat.shape[-1:])


# --- factory helpers (reference core/raycasters.py:242-305) ---

def get_kp_input_fn(kp_dist_type: str, n_joints: int
                    ) -> Tuple[Callable, int, int]:
    """Returns (fn(pts, pts_t, kps), input_dims, cutoff_dims)."""
    if kp_dist_type == 'reldist':
        return rel_dist, n_joints, n_joints
    if kp_dist_type == 'relpos':
        return rel_pos, n_joints * 3, n_joints
    if kp_dist_type == 'cat':
        return kp_cat, n_joints * 3 + 3, n_joints
    if kp_dist_type == 'querypts':
        return identity_pts, 3, 3
    raise NotImplementedError(f'{kp_dist_type} is not implemented.')


def get_view_input_fn(view_type: str, n_joints: int) -> Tuple[Callable, int]:
    """Returns (fn(rays_t, pts_t), view_dims)."""
    if view_type == 'relray':
        return (lambda rays_t, pts_t: vec_norm(rays_t, refs=pts_t),
                n_joints * 3)
    if view_type == 'rayangle':
        return ray_ang, n_joints
    if view_type == 'world':
        return (lambda rays_t, pts_t: identity_expand(rays_t, pts_t),
                n_joints * 3)
    raise NotImplementedError(f'{view_type} is not implemented.')


def get_bone_input_fn(bone_type: str, n_joints: int) -> Tuple[Callable, int]:
    """Returns (fn(pts_t, bones), bone_dims)."""
    if bone_type == 'reldir':
        return (lambda pts_t, bones: vec_norm(pts_t)), n_joints * 3
    if bone_type == 'axisang':
        return (lambda pts_t, bones: identity_expand(bones, pts_t)), n_joints * 3
    if bone_type == 'Nope':
        return (lambda pts_t, bones: None), 0
    raise NotImplementedError(f'{bone_type} bone function is not implemented')
