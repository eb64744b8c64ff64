"""Checkpoint save/load: msgpack state + reference .tar import.

Follows the reference's crash-resume contract (SURVEY §5): the logdir is
the source of truth; on restart the newest checkpoint is auto-loaded
(reference core/raycasters.py:124-143).  One file holds the global step,
both networks, embedder buffers, NeRF optimizer state, and the pose
bank + its optimizer + anchors (reference core/trainer.py:485-516).

``load_torch_checkpoint`` reads the reference's torch ``.tar`` files
(key mangling per raycasters.py:752-788) into our param pytrees so
pretrained reference models can be rendered / fine-tuned for parity
testing.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

try:
    from flax import serialization
except ImportError:  # pragma: no cover
    serialization = None


CKPT_RE = re.compile(r'ckpt_(\d+)\.msgpack$')


def save_checkpoint(logdir: str, state: Dict[str, Any], step: int,
                    anchors: Optional[Dict] = None,
                    keep: int = 3) -> str:
    os.makedirs(logdir, exist_ok=True)
    payload = dict(state)
    if anchors is not None:
        payload['anchors'] = anchors
    payload = serialization.to_state_dict(jax_to_numpy(payload))
    path = os.path.join(logdir, f'ckpt_{step:08d}.msgpack')
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))
    _prune_old(logdir, keep)
    return path


def save_pose_checkpoint(logdir: str, state: Dict[str, Any], step: int,
                         anchors: Optional[Dict] = None) -> str:
    """Pose-only periodic checkpoint (reference trainer.py:508-516)."""
    os.makedirs(logdir, exist_ok=True)
    payload = serialization.to_state_dict(jax_to_numpy({
        'step': step,
        'pose_params': state['pose_params'],
        'anchors': anchors,
    }))
    path = os.path.join(logdir, f'pose_ckpt_{step:08d}.msgpack')
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def _prune_old(logdir: str, keep: int):
    ckpts = sorted(glob.glob(os.path.join(logdir, 'ckpt_*.msgpack')))
    for p in ckpts[:-keep]:
        os.remove(p)


def latest_checkpoint(logdir: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(logdir, 'ckpt_*.msgpack')))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def restore_train_state(state: Dict[str, Any], ckpt: Dict[str, Any],
                        finetune: bool = False,
                        no_poseopt_reload: bool = False
                        ) -> Tuple[Dict[str, Any], int]:
    """Restore a train state pytree from a checkpoint payload.

    ``finetune`` loads weights but resets step + optimizer state
    (reference raycasters.py:140-142).  ``no_poseopt_reload`` keeps the
    data-derived pose bank instead of the checkpoint's
    (reference pose_opt.py:51).
    """
    ckpt = dict(ckpt)
    ckpt.pop('anchors', None)
    restored = serialization.from_state_dict(state, ckpt)
    if finetune:
        # weights only: reset step + optimizer states
        # (reference raycasters.py:140-142)
        restored = dict(restored)
        restored['step'] = state['step']
        restored['opt_state'] = state['opt_state']
        if state.get('pose_opt_state') is not None:
            restored['pose_opt_state'] = state['pose_opt_state']
            restored['pose_accum'] = state['pose_accum']
    if no_poseopt_reload:
        restored = dict(restored)
        for k in ('pose_params', 'pose_opt_state', 'pose_accum'):
            restored[k] = state.get(k)
    step = int(ckpt['step']) if not finetune else 0
    return restored, step


def load_pose_payload(path: str) -> Dict[str, Any]:
    """Pose bank (+ anchors) from any checkpoint file: our msgpack
    (full or pose-only) or a reference ``.tar``
    (reference --init_poseopt, pose_opt.py:51-60)."""
    if path.endswith('.tar'):
        loaded = load_torch_checkpoint(path)
    else:
        loaded = load_checkpoint(path)
    out: Dict[str, Any] = {}
    if loaded.get('pose_params') is not None:
        out['pose_params'] = loaded['pose_params']
    if loaded.get('anchors') is not None:
        out['anchors'] = loaded['anchors']
    if 'pose_params' not in out:
        raise ValueError(f'{path} holds no pose bank '
                         '(expected pose_params / poseopt_layer_state_dict)')
    return out


def jax_to_numpy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# --- reference torch .tar import -----------------------------------------

def _t(arr) -> np.ndarray:
    """torch Linear weight (out, in) -> ours (in, out)."""
    return np.ascontiguousarray(np.asarray(arr).T)


def _convert_nerf_sd(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Torch NeRF state dict -> our param pytree
    (reference core/networks/nerf.py layer naming)."""
    n_pts = len({k.split('.')[1] for k in sd if k.startswith('pts_linears.')})
    params: Dict[str, Any] = {
        'pts_linears': [
            {'w': _t(sd[f'pts_linears.{i}.weight']),
             'b': np.asarray(sd[f'pts_linears.{i}.bias'])}
            for i in range(n_pts)],
    }
    for ours, theirs in [('alpha_linear', 'alpha_linear'),
                         ('feature_linear', 'feature_linear'),
                         ('views_linear', 'views_linears.0'),
                         ('rgb_linear', 'rgb_linear'),
                         ('output_linear', 'output_linear')]:
        if f'{theirs}.weight' in sd:
            params[ours] = {'w': _t(sd[f'{theirs}.weight']),
                            'b': np.asarray(sd[f'{theirs}.bias'])}
    if 'framecodes.codes.weight' in sd:
        params['framecodes'] = np.asarray(sd['framecodes.codes.weight'])
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference ``.tar`` checkpoint into our pytree layout.

    Returns dict with params {coarse, fine, cutoff_dist}, global_step,
    and pose_params/anchors when present.
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    ckpt = {k: ({kk: vv.numpy() if hasattr(vv, 'numpy') else vv
                 for kk, vv in v.items()} if isinstance(v, dict) else v)
            for k, v in ckpt.items()}

    params: Dict[str, Any] = {
        'coarse': _convert_nerf_sd(ckpt['network_fn_state_dict']),
        'fine': (_convert_nerf_sd(ckpt['network_fine_state_dict'])
                 if 'network_fine_state_dict' in ckpt else None),
    }
    if 'embed_state_dict' in ckpt and \
            'cutoff_dist' in ckpt['embed_state_dict']:
        params['cutoff_dist'] = np.asarray(
            ckpt['embed_state_dict']['cutoff_dist'])

    out: Dict[str, Any] = {
        'params': params,
        'global_step': int(ckpt.get('global_step', 0)),
    }
    popt = ckpt.get('poseopt_layer_state_dict')
    if popt is not None:
        pose_params = {'pelvis': np.asarray(popt['pelvis']),
                       'bones': np.asarray(popt['bones'])}
        if 'root_bones' in popt:
            pose_params['root_bones'] = np.asarray(popt['root_bones'])
        out['pose_params'] = pose_params
        out['rest_pose'] = np.asarray(popt['rest_pose']) \
            if 'rest_pose' in popt else None
    anchors = ckpt.get('poseopt_anchors')
    if anchors is not None and isinstance(anchors, dict):
        out['anchors'] = {k: np.asarray(v) for k, v in anchors.items()
                          if v is not None and not isinstance(v, dict)}
    return out


def load_refined_pose_data(path: str, legacy: bool = False,
                           ext_scale: float = 0.001):
    """(kp3d, bones, skts, cyls, ...) from a refined-pose checkpoint —
    ours or the reference's torch .tar (reference pose_opt.py:523-559,
    including the legacy coordinate flip)."""
    from ..ops.cylinder import get_kp_bounding_cylinder
    from ..ops.fk import get_smpl_l2ws_np
    from ..ops.rotations import (axisang_to_rot, rot6d_to_axisang,
                                 rot_to_axisang)
    import jax.numpy as jnp

    if path.endswith('.tar'):
        loaded = load_torch_checkpoint(path)
        pose_params = loaded['pose_params']
        rest_pose = loaded.get('rest_pose')
    else:
        ckpt = load_checkpoint(path)
        pose_params = ckpt['pose_params']
        rest_pose = ckpt.get('rest_pose')
    if rest_pose is None:
        from ..skeleton import SMPL_REST_POSE
        rest_pose = SMPL_REST_POSE * ext_scale * 2.2

    pelvis = np.asarray(pose_params['pelvis'], np.float32)
    bones = np.asarray(pose_params['bones'], np.float32)
    if bones.shape[-1] == 6:
        bones = np.asarray(rot6d_to_axisang(jnp.asarray(bones)), np.float32)

    if legacy:
        pelvis = pelvis.copy()
        pelvis[..., 1:] *= -1
        rest_pose = np.concatenate([rest_pose[..., :1], -rest_pose[..., 2:3],
                                    rest_pose[..., 1:2]], axis=-1)
        bones = np.concatenate([bones[..., :1], -bones[..., 2:3],
                                bones[..., 1:2]], axis=-1)
        root_rot = np.asarray(axisang_to_rot(jnp.asarray(
            bones[..., 0, :].reshape(-1, 3))))
        flip = np.array([[1., 0., 0.], [0., 0., -1.], [0., 1., 0.]],
                        np.float32)
        root_rot = np.asarray(rot_to_axisang(jnp.asarray(
            flip[None] @ root_rot))).reshape(-1, 3)
        bones = bones.copy()
        bones[..., 0, :] = root_rot

    rest_pose = np.asarray(rest_pose, np.float32).reshape(-1, 3)
    l2ws = np.stack([get_smpl_l2ws_np(b, rest_pose=rest_pose)
                     for b in bones])
    l2ws[..., :3, -1] += pelvis[:, None]
    kp3d = l2ws[..., :3, -1].astype(np.float32)
    skts = np.linalg.inv(l2ws).astype(np.float32)
    cyls = get_kp_bounding_cylinder(kp3d, ext_scale=ext_scale,
                                    extend_mm=250, head='-y').astype(
        np.float32)
    return kp3d, bones, skts, cyls, rest_pose, pelvis
