"""Rotation representation conversions in pure JAX.

Replaces the reference's pytorch3d dependency
(core/utils/skeleton_utils.py:397-436) with jit/vmap-friendly,
numerically-stable closed forms.  All functions accept arbitrary leading
batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix, (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def axisang_to_rot(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues formula with Taylor expansion near zero so both values and
    gradients are stable at theta -> 0 (matches pytorch3d's
    ``axis_angle_to_matrix`` used at reference skeleton_utils.py:411-412).
    """
    theta_sq = jnp.sum(axisang * axisang, axis=-1)
    small = theta_sq < 1e-8
    # Guard the non-series branch's inputs so its (unused) gradient stays
    # finite where the series branch is selected (the where-NaN trap).
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks.
    sin_over = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    cos_over = jnp.where(small, 0.5 - theta_sq / 24.0,
                         (1.0 - jnp.cos(theta)) / theta_sq_safe)
    k = skew(axisang)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisang.dtype), k.shape)
    return eye + sin_over[..., None, None] * k + cos_over[..., None, None] * k2


def rot_to_axisang(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Via quaternion for stability (mirrors pytorch3d semantics of
    ``matrix_to_axis_angle`` at reference skeleton_utils.py:405-406).
    """
    quat = rot_to_quat(rot)
    return quat_to_axisang(quat)


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (w, x, y, z)."""
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    # Four candidate formulations (each proportional to the quaternion,
    # scaled by 2*sqrt(1 + diag term)); pick the most stable per element.
    q_w = jnp.stack([1.0 + trace,
                     m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q_x = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22,
                     m01 + m10, m02 + m20], axis=-1)
    q_y = jnp.stack([m02 - m20, m01 + m10,
                     1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21,
                     1.0 - m00 - m11 + m22], axis=-1)

    cases = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    diag = jnp.stack([trace, m00, m11, m22], axis=-1)
    best = jnp.argmax(diag, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_axisang(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> axis-angle (..., 3)."""
    w = quat[..., 0].clip(-1.0, 1.0)
    xyz = quat[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    half = jnp.arctan2(norm[..., 0], w)[..., None]
    small = norm < 1e-6
    # theta/sin(theta/2) scaling; series near 0: 2 + theta^2/12 * ...
    scale = jnp.where(small, 2.0 + (2.0 / 3.0) * half * half,
                      2.0 * half / norm.clip(1e-12))
    return xyz * scale


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (..., 6) -> (..., 3, 3).

    Gram-Schmidt per Zhou et al. CVPR'19, matching the reference's
    layout where the 6D vector is ``rot[..., :3, :2]`` flattened row-major
    (reference skeleton_utils.py:408-409,420-436): x = (r00, r01, r10,
    r11, r20, r21), i.e. two *column* vectors interleaved.
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rot_to_rot6d(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D representation (..., 6)."""
    return rot[..., :3, :2].reshape(rot.shape[:-2] + (6,))


def rot6d_to_axisang(x: jnp.ndarray) -> jnp.ndarray:
    return rot_to_axisang(rot6d_to_rotmat(x))


def bones_to_rot(bones: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on representation width (reference skeleton_utils.py:397-403)."""
    if bones.shape[-1] == 3:
        return axisang_to_rot(bones)
    if bones.shape[-1] == 6:
        return rot6d_to_rotmat(bones)
    raise NotImplementedError(f'unknown bone rep dim {bones.shape[-1]}')
