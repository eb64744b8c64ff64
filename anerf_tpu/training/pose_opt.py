"""Per-frame pose refinement: the learnable pose bank + FK + losses.

TPU redesign of reference core/pose_opt.py (PoseOptLayer :240-445,
create_popt :14-83) and the in-trainer pose losses
(core/trainer.py:382-441).

The reference keeps pose parameters as nn.Parameter rows and dedups
batch indices on host (pose_opt.py:380).  Here the bank is a plain
pytree {'pelvis': (N, 3), 'bones': (N, J, 3|6)}; a train batch gathers
its rows per ray and differentiable FK runs inside the jitted step —
the gather's transpose is exactly the sparse scatter-add gradient
exchange the reference gets from embedding-row sparsity.

Multiview mode (H36M): non-root bones are shared across cameras via a
``kp_map`` (pose_opt.py:290-295,318-332): the bank stores
``root_bones`` (N, rep) per view plus ``bones`` (N_unique, J-1, rep),
and frame i uses ``bones[kp_map[i]]``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fk import fk
from ..ops.rotations import axisang_to_rot, rot_to_rot6d
from ..skeleton import Skeleton, SMPLSkeleton


def init_pose_params(kp3d: np.ndarray, bones: np.ndarray,
                     use_rot6d: bool = False,
                     kp_map: Optional[np.ndarray] = None,
                     kp_uidxs: Optional[np.ndarray] = None,
                     skel: Skeleton = SMPLSkeleton) -> Dict[str, Any]:
    """Build the learnable pose bank from initial (SPIN) estimates.

    Matches reference ``PoseOptLayer.init_kp_params``
    (pose_opt.py:276-295).
    """
    pelvis = jnp.asarray(kp3d[:, skel.root_id])
    bones = jnp.asarray(bones)
    if use_rot6d:
        rots = axisang_to_rot(bones)
        bones = rot_to_rot6d(rots)
    if kp_map is None:
        return {'pelvis': pelvis, 'bones': bones}
    root_id = skel.root_id
    return {'pelvis': pelvis,
            'root_bones': bones[:, root_id],
            'bones': bones[jnp.asarray(kp_uidxs)][:, root_id + 1:]}


def gather_bones(pose_params: Dict[str, Any], idxs: jnp.ndarray,
                 kp_map: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-frame full bone tensor (reference ``idx_to_params``,
    pose_opt.py:318-332)."""
    if kp_map is None:
        return pose_params['bones'][idxs]
    root = pose_params['root_bones'][idxs][:, None]
    shared = pose_params['bones'][kp_map[idxs]]
    return jnp.concatenate([root, shared], axis=1)


def pose_fk(pose_params: Dict[str, Any], idxs: jnp.ndarray,
            rest_pose: jnp.ndarray,
            skel: Skeleton = SMPLSkeleton,
            kp_map: Optional[jnp.ndarray] = None,
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                       jnp.ndarray]:
    """Differentiable FK for the indexed frames.

    Matches reference ``PoseOptLayer.calculate_kinematic``
    (pose_opt.py:372-445) minus the host-side unique-index dedup (an
    optimization XLA's gather/scatter-add handles for us).

    Returns (kps, bones, skts, l2ws, rots), each leading dim len(idxs).
    """
    pelvis = pose_params['pelvis'][idxs]
    bones = gather_bones(pose_params, idxs, kp_map)
    kps, skts, l2ws, rots = fk(bones, pelvis, rest_pose, skel)
    return kps, bones, skts, l2ws, rots


def make_anchors(kp3d: np.ndarray, bones: np.ndarray) -> Dict[str, jnp.ndarray]:
    """Regularization anchors = the initial pose estimates
    (reference create_popt, pose_opt.py:48-72)."""
    bones = jnp.asarray(bones)
    return {'kps': jnp.asarray(kp3d), 'bones': bones,
            'rots': axisang_to_rot(bones)}


def kp_reg_loss(bones: jnp.ndarray, rots: jnp.ndarray,
                anchors: Dict[str, jnp.ndarray], kp_idx: jnp.ndarray,
                tol: float, coef: float,
                use_rot6d: bool = False,
                per_ray: bool = False) -> jnp.ndarray:
    """Tolerance-hinged bone deviation from anchors, root excluded.

    Matches reference ``Trainer._compute_kp_loss`` (trainer.py:388-403):
    sq-diff per channel, zeroed below ``tol``, summed over channels,
    meaned over (rays, joints), scaled by ``opt_pose_coef``.

    ``per_ray=True`` returns the (N_rays,) joint-meaned values (whose
    mean is the scalar loss) — the per-frame signal the FlipFlop CMA
    trackers accumulate (reference accumulate_loss,
    pose_opt.py:638-662).
    """
    if use_rot6d:
        reg_bones = rot_to_rot6d(anchors['rots'][kp_idx])
        pred = rot_to_rot6d(rots)
    else:
        reg_bones = anchors['bones'][kp_idx]
        pred = bones
    sq = (reg_bones - pred) ** 2
    sq = sq[:, 1:]  # exclude root joint
    hinged = jnp.where(sq > tol, sq - tol, 0.)
    if per_ray:
        return hinged.sum(-1).mean(-1) * coef
    return hinged.sum(-1).mean() * coef


def kp_reg_loss_legacy(preds: Dict[str, jnp.ndarray],
                       regs: Dict[str, jnp.ndarray],
                       opt_pose_type: str = 'B',
                       opt_pose_tol: float = 0.,
                       opt_pose_coef: float = 1.0,
                       use_rot6d: bool = False,
                       temp_coef: float = 0.,
                       use_temp_vel: bool = False,
                       ext_scale: float = 0.001,
                       gt_kps: Optional[jnp.ndarray] = None,
                       root_id: int = 0) -> Dict[str, jnp.ndarray]:
    """The reference's richer pose-regularization family
    (``get_kp_reg_loss``, pose_opt.py:124-201), used by the FlipFlop
    scheduler.  ``opt_pose_type`` grammar:

      * ``B…``  — bone-space loss vs anchor bones (rot6d-projected when
        ``use_rot6d``), plus a pelvis-position term;
      * ``RD…`` — rotation-matrix loss vs anchor rotations;
      * ``…L1`` anywhere — L1 instead of squared error;
      * ``…E``  — coefficient NOT on the global sum: only non-root bone
        terms are kept (pelvis term dropped).

    ``preds``/``regs`` need keys {'kps','bones','rots'}; ``regs`` may add
    {'temp_bones','temp_kps','temp_rots','temp_valid','temp_valid_next'}
    (prev/next stacked on dim 0) for the temporal terms.
    """
    kps, bones, rots = preds['kps'], preds['bones'], preds['rots']
    reg_kps, reg_bones, reg_rots = regs['kps'], regs['bones'], regs['rots']

    loss_fn = ((lambda a, b: jnp.abs(a - b)) if 'L1' in opt_pose_type
               else (lambda a, b: (a - b) ** 2))
    coef_on_global = 'E' not in opt_pose_type

    if use_rot6d:
        reg_bones = rot_to_rot6d(reg_rots)

    if opt_pose_type.startswith('RD'):
        # (N, J, 3, 3): hinge+sum over the last axis only, like the
        # reference (keeps the extra row axis in the final mean)
        bone_loss = loss_fn(rots, reg_rots)
    elif opt_pose_type.startswith('B'):
        bone_loss = loss_fn(reg_bones, bones)
    else:
        raise NotImplementedError(
            f'opt_pose_type {opt_pose_type}: regularization target '
            'un-specified')
    pelv_loss = loss_fn(reg_kps[:, root_id], kps[:, root_id]).sum(-1)

    # hinge: 0 below tol, loss - tol above (pose_opt.py:156-160)
    mask = (bone_loss > opt_pose_tol).astype(bone_loss.dtype)
    bone_loss = ((bone_loss - opt_pose_tol) * mask).sum(-1)

    if coef_on_global:
        kp_loss = (bone_loss.mean() + pelv_loss.mean()) * opt_pose_coef
    else:
        kp_loss = bone_loss[:, root_id + 1:].mean() * opt_pose_coef

    temp_loss = jnp.asarray(0., kp_loss.dtype)
    if temp_coef > 0. and 'temp_bones' in regs:
        temp_valid = regs['temp_valid']
        temp_bones = (rot_to_rot6d(regs['temp_rots']) if use_rot6d
                      else regs['temp_bones'])
        prev_bones, next_bones = jnp.split(temp_bones, 2, axis=0)
        prev_kps, next_kps = jnp.split(regs['temp_kps'], 2, axis=0)
        if not use_temp_vel:
            t = loss_fn(prev_bones, bones).sum(-1)
            temp_loss = (t * temp_valid[..., None]).mean() * temp_coef
        else:
            valid = (temp_valid + regs['temp_valid_next']) // 2
            ang_vel = ((bones - prev_bones) -
                       (next_bones - bones)) ** 2
            joint_vel = ((kps - prev_kps) - (next_kps - kps)) ** 2
            t = ang_vel.sum(-1) + joint_vel.sum(-1)
            temp_loss = (t * valid[..., None]).mean() * temp_coef
        kp_loss = kp_loss + temp_loss

    sg = jax.lax.stop_gradient
    # Detach the whole diff (reference detaches (reg_kps - kps) entirely,
    # trainer.py:437-441) so no gradient can leak into reg_kps anchors.
    mpjpc = jnp.sqrt((sg(reg_kps - kps) ** 2).sum(-1)).mean() / ext_scale
    out = {'kp_loss': kp_loss, 'temp_loss': temp_loss, 'mpjpc': mpjpc}
    if gt_kps is not None:
        out['kp_gt_dist'] = jnp.linalg.norm(
            sg(kps) - gt_kps, axis=-1).mean() / ext_scale
    return out


def temporal_loss(bones: jnp.ndarray, kps: jnp.ndarray,
                  prev_bones: jnp.ndarray, prev_kps: jnp.ndarray,
                  next_bones: jnp.ndarray, next_kps: jnp.ndarray,
                  temp_valid: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Second-derivative (velocity-change) smoothness on bones + joints.

    Matches reference trainer.py:407-435; prev/next are detached by the
    caller.
    """
    ang_vel = ((bones - prev_bones) - (next_bones - bones)) ** 2
    joint_vel = ((kps - prev_kps) - (next_kps - kps)) ** 2
    loss = (ang_vel.sum(-1) + joint_vel.sum(-1)) * temp_valid[..., None]
    return loss.mean() * coef


def mpjpc_stat(kps: jnp.ndarray, anchors: Dict[str, jnp.ndarray],
               kp_idx: jnp.ndarray, ext_scale: float) -> jnp.ndarray:
    """Mean per-joint position change vs anchors, in mm
    (reference trainer.py:437-441)."""
    d = jnp.linalg.norm(anchors['kps'][kp_idx] -
                        jax.lax.stop_gradient(kps), axis=-1)
    return d.mean() / ext_scale


def pose_params_to_pose_data(pose_params: Dict[str, Any],
                             rest_pose: np.ndarray,
                             ext_scale: float = 0.001,
                             skel: Skeleton = SMPLSkeleton,
                             kp_map: Optional[np.ndarray] = None,
                             ) -> Tuple[np.ndarray, ...]:
    """Rebuild (kp3d, bones, skts, cyls, rest_pose, pelvis) arrays from a
    refined pose bank, for --load_refined datasets and refined renders.

    Matches reference ``pose_ckpt_to_pose_data`` (pose_opt.py:523-559).
    """
    from ..ops.cylinder import get_kp_bounding_cylinder
    from ..ops.rotations import rot6d_to_axisang

    n = pose_params['pelvis'].shape[0]
    idxs = jnp.arange(n)
    kmap = jnp.asarray(kp_map) if kp_map is not None else None
    kps, bones, skts, l2ws, rots = pose_fk(
        pose_params, idxs, jnp.asarray(rest_pose), skel, kmap)
    bones_aa = bones if bones.shape[-1] == 3 else rot6d_to_axisang(bones)
    kp3d = np.asarray(kps, np.float32)
    cyls = get_kp_bounding_cylinder(kp3d, ext_scale=ext_scale, skel=skel,
                                    extend_mm=250, head='-y').astype(
        np.float32)
    return (kp3d, np.asarray(bones_aa, np.float32),
            np.asarray(skts, np.float32), cyls,
            np.asarray(rest_pose, np.float32),
            np.asarray(pose_params['pelvis'], np.float32))
