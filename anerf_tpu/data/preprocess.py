"""Offline raw-dataset -> h5 preprocessing.

Converts the raw capture formats (SURREAL renders, Human3.6M frames,
Mixamo renders, MonoPerfCap sequences, ZJU-MoCap, MPI-INF-3DHP) into the
unified h5 schema consumed by the data layer.  Behavior mirrors the
reference's ``process_*`` functions (core/load_surreal.py:98-300,
core/load_h36m.py:17-249, core/load_mixamo.py:14-106,
core/load_perfcap.py:12-52, core/load_zju.py:179-534,
core/load_3dhp.py:81-141) with vectorized numpy replacing the
per-element python loops.

These run on the host (pure numpy) — they are one-time converters, not
part of the TPU compute path.  Heavy optional deps (imageio, cv2,
scipy.io, smplx) are imported inside the functions that need them so
the rest of the package stays importable without them.
"""
from __future__ import annotations

import glob
import os
import pickle
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.cylinder import (get_kp_bounding_cylinder, nerf_c2w_to_extrinsic,
                            swap_mat, world_to_cam_np)
from ..ops.fk import get_smpl_l2ws_np
from ..ops.rays import get_rays_np
from ..skeleton import SMPL_REST_POSE, SMPLSkeleton
from .h5_writer import write_to_h5py
from .spin import (DATASET_EXT_SCALE, calculate_bone_length,
                   read_spin_data, rot_to_axisang_np)


def _imread(path):
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path))


def dilate_masks(masks: np.ndarray, extend_iter: int = 1,
                 kernel_size: int = 5) -> np.ndarray:
    """Binary dilation with a ``kernel_size``² ones kernel, iterated
    (reference load_surreal.py:50-59 via cv2.dilate) — pure numpy so the
    converters don't require OpenCV.

    masks: (N, H, W) or (N, H, W, 1) in {0, 1}.
    """
    squeeze = masks.ndim == 4
    m = (masks[..., 0] if squeeze else masks) > 0
    r = kernel_size // 2
    for _ in range(extend_iter):
        acc = np.zeros_like(m)
        for dy in range(-r, r + 1):
            shifted = np.roll(m, dy, axis=1)
            if dy > 0:
                shifted[:, :dy] = False
            elif dy < 0:
                shifted[:, dy:] = False
            for dx in range(-r, r + 1):
                s2 = np.roll(shifted, dx, axis=2)
                if dx > 0:
                    s2[:, :, :dx] = False
                elif dx < 0:
                    s2[:, :, dx:] = False
                acc |= s2
        m = acc
    out = m.astype(masks.dtype)
    return out[..., None] if squeeze else out


def skeleton3d_to_2d(kps: np.ndarray, c2ws: np.ndarray, H, W, focals,
                     centers=None) -> np.ndarray:
    """Project world keypoints into per-frame image coordinates
    (reference skeleton_utils.py:475-488)."""
    kp2ds = []
    for i, (kp, c2w) in enumerate(zip(kps, c2ws)):
        f = focals[i] if not np.isscalar(focals) else focals
        h = H if np.isscalar(H) else H[i]
        w = W if np.isscalar(W) else W[i]
        center = centers[i] if centers is not None else None
        ext = nerf_c2w_to_extrinsic(c2w)
        kp2ds.append(world_to_cam_np(kp, ext, h, w, f, center))
    return np.array(kp2ds)


def get_temporal_validity(img_paths) -> Tuple[np.ndarray, np.ndarray]:
    """valid[i]=0 when frame i-1 is not the consecutive previous frame
    of the same sequence; also a per-frame sequence id (reference
    load_mixamo.py:136-159)."""
    def get_num(name):
        base = os.path.splitext(os.path.basename(name))[0]
        digits = ''.join(c for c in str(base) if c.isdigit())
        return int(digits) if digits else 0

    n = len(img_paths)
    valid = np.ones(n)
    seq_map = np.zeros(n, np.int32)
    valid[0] = 0
    seq_cnt = 0
    paths = [p.decode() if isinstance(p, bytes) else str(p)
             for p in img_paths]
    for i in range(1, n):
        if (os.path.dirname(paths[i - 1]) != os.path.dirname(paths[i])
                or abs(get_num(paths[i]) - get_num(paths[i - 1])) > 1):
            valid[i] = 0
            seq_cnt += 1
        seq_map[i] = seq_cnt
    return valid, seq_map


# ---------------------------------------------------------------------------
# SURREAL
# ---------------------------------------------------------------------------

# axis fixes applied to the SURREAL export (reference load_surreal.py:104-115)
_SURREAL_ROT_ROOTBONE = np.array([[1., 0., 0.], [0., 0., -1.], [0., 1., 0.]],
                                 np.float32)
_SURREAL_ROT_GLOB = np.diag([1., -1., -1.]).astype(np.float32)
# shape betas used by the SURREAL generation code (load_surreal.py:114-116)
SURREAL_BETAS = np.array([[-0.8010307, 0.6838105, 0.7480726, -1.1379223,
                           -0.32415348, -0.8404733, -0.4795286, -0.63125765,
                           -0.13453396, 1.4934114]], np.float32)


def cylinder_mask_prefilter(sampling_masks: np.ndarray,
                            cyls: np.ndarray,
                            c2ws: np.ndarray,
                            img_cam_indices: np.ndarray,
                            H: int, W: int, focal: float) -> np.ndarray:
    """Zero sampling-mask pixels whose rays never enter the subject's
    bounding cylinder, so the pixel sampler only proposes useful rays
    (reference load_surreal.py:252-276).  Vectorized over images.

    cyls rows are (cx, cz, radius, top, bot); the 2D distance test uses
    the ground-plane (x, z) components of the rays.
    """
    n_imgs = len(sampling_masks)
    n_kps = len(cyls)
    out = sampling_masks.copy()
    rays_cache = {}
    for i in range(n_imgs):
        cam_idx = int(img_cam_indices[i])
        if cam_idx not in rays_cache:
            ro, rd = get_rays_np(H, W, focal, c2ws[cam_idx])
            ro2 = ro.reshape(-1, 3)[:, [0, 2]]
            rd2 = rd.reshape(-1, 3)[:, [0, 2]]
            far = ro2 + rd2 * 100.
            of = far - ro2
            of_norm = np.linalg.norm(of, axis=-1)
            rays_cache[cam_idx] = (ro2, of, of_norm)
        ro2, of, of_norm = rays_cache[cam_idx]
        cyl = cyls[i % n_kps]
        od = cyl[:2] - ro2
        # 2D cross product (z-component): point-to-line distance
        dist = np.abs(of[:, 0] * od[:, 1] - of[:, 1] * od[:, 0]) / of_norm
        out[i, ..., 0] *= (dist < cyl[2]).reshape(H, W).astype(out.dtype)
    return out


def process_surreal_data(h5_file: str, data_path: str,
                         extend_iter: int = 2, ext_scale: float = 0.001
                         ) -> Dict[str, np.ndarray]:
    """SURREAL render dirs -> h5 (reference load_surreal.py:98-300).

    Each ``<seq>_<id>/`` dir holds a ``metadata.pkl`` (cams, joints3D,
    poses, focal) plus ``*-*/imageSequences/*.png`` renders and
    ``*-*/*segm.mat`` segmentation masks.  Images are laid out
    (N_cams, N_seqs * N_kp_per_seq).
    """
    from scipy.io import loadmat

    ext_scale = ext_scale * DATASET_EXT_SCALE
    sg = lambda p: sorted(glob.glob(p))
    data_dirs = sg(os.path.join(data_path, '*_*/'))

    cams, kp_3d, bone_poses, render_types, seq_cam_type, focals = \
        [], [], [], [], [], []
    fg_masks, imgs = None, None
    for i, data_dir in enumerate(data_dirs):
        with open(os.path.join(data_dir, 'metadata.pkl'), 'rb') as f:
            meta = pickle.load(f)
        focals.append(meta['focal'] * meta['int_scale'])

        render_type = meta['render_type']
        cam = meta['cams']
        if render_type not in render_types:
            render_types.append(render_type)
            cam[..., :3, -1] *= ext_scale
            cams.append(cam)
        seq_cam_type.append(render_types.index(render_type))

        n_kp_seq = meta['N_kp']
        n_cam_seq = meta['N_cams']
        n_cam_sub = meta['N_cam_per_subdir']
        kp_3d.append(meta['joints3D'] * ext_scale)
        bone_poses.append(meta['poses'].reshape(n_kp_seq, -1, 3))

        fg_seq = []
        for fg_path in sg(os.path.join(data_dir, '*-*/', '*segm.mat')):
            fg = loadmat(fg_path)['data']
            fg = fg.reshape(n_cam_sub, n_kp_seq, *fg.shape[-2:])
            fg_seq.append((fg > 0).astype(np.uint8))
        fg_seq = np.concatenate(fg_seq, axis=0)
        if fg_masks is None:
            fg_masks = np.zeros((min(n_cam_seq, fg_seq.shape[0]),
                                 len(data_dirs) * fg_seq.shape[1],
                                 *fg_seq.shape[-2:]), np.uint8)
        fg_masks[:, i * fg_seq.shape[1]:(i + 1) * fg_seq.shape[1]] = \
            fg_seq[:len(fg_masks)]

        img_paths = np.array(
            sg(os.path.join(data_dir, '*-*/', 'imageSequences/*.png')))
        img_seq = np.stack([_imread(p)[..., :3] for p in img_paths])
        img_seq = img_seq.reshape(-1, n_kp_seq, *img_seq.shape[1:])
        if imgs is None:
            imgs = np.zeros((*fg_masks.shape, 3), np.uint8)
        imgs[:, i * n_kp_seq:(i + 1) * n_kp_seq] = img_seq[:len(imgs)]

    kp_3d = np.concatenate(kp_3d).reshape(-1, 24, 3)
    bone_poses = np.concatenate(bone_poses).reshape(-1, 24, 3)
    n_kps = kp_3d.shape[0]
    focal = float(np.mean(focals))
    H, W = imgs.shape[-3:-1]
    imgs = imgs.reshape(-1, H, W, 3)
    fg_masks = fg_masks.reshape(-1, H, W)

    # per-image camera index within the per-type camera bank
    seq_cam_type = np.array(seq_cam_type)
    n_seqs, n_kp_seq = len(data_dirs), n_kps // max(len(data_dirs), 1)
    n_cams_per_type = imgs.shape[0] // n_kps
    idx = np.arange(n_cams_per_type).reshape(-1, 1, 1)
    idx = np.broadcast_to(idx, (n_cams_per_type, n_seqs, n_kp_seq)).copy()
    img_cam_indices = (idx + seq_cam_type[None, :, None]
                       * n_cams_per_type).reshape(-1)

    sampling_masks = (fg_masks if extend_iter == 0
                      else dilate_masks(fg_masks, extend_iter))
    fg_masks = fg_masks[..., None]
    sampling_masks = sampling_masks[..., None]

    c2ws = np.array(cams).reshape(-1, 4, 4)
    glob4 = np.eye(4, dtype=np.float32)
    glob4[:3, :3] = _SURREAL_ROT_GLOB
    c2ws = glob4[None] @ c2ws

    # re-root the global orientation into the NeRF coordinate frame
    # (load_surreal.py:231-238)
    import jax.numpy as jnp

    from ..ops.rotations import axisang_to_rot
    root_rots = (_SURREAL_ROT_ROOTBONE[None] @
                 np.asarray(axisang_to_rot(jnp.asarray(bone_poses[:, 0]))))
    bone_poses[:, 0] = rot_to_axisang_np(root_rots)
    kp_3d = kp_3d @ _SURREAL_ROT_GLOB.T

    l2ws = np.stack([get_smpl_l2ws_np(b, SMPL_REST_POSE, scale=ext_scale)
                     for b in bone_poses])
    l2ws[:, :, :3, -1] = kp_3d
    skts = np.linalg.inv(l2ws)

    cyls = get_kp_bounding_cylinder(
        kp_3d, ext_scale=ext_scale / DATASET_EXT_SCALE, skel=SMPLSkeleton,
        extend_mm=250, head='-y')
    sampling_masks = cylinder_mask_prefilter(
        sampling_masks, cyls, c2ws, img_cam_indices, H, W, focal)

    data = {
        'imgs': imgs, 'masks': fg_masks, 'sampling_masks': sampling_masks,
        'bkgds': (np.ones((1, H, W, 3)) * 255).astype(np.uint8),
        'bkgd_idxs': np.zeros(len(imgs), np.int64),
        'kp3d': kp_3d.astype(np.float32),
        'gt_kp3d': kp_3d.astype(np.float32),
        'bones': bone_poses.astype(np.float32),
        'skts': skts.astype(np.float32),
        'cyls': cyls.astype(np.float32),
        'rest_pose': (SMPL_REST_POSE * ext_scale).astype(np.float32),
        'betas': SURREAL_BETAS,
        'c2ws': c2ws[img_cam_indices].astype(np.float32),
        'focals': np.full(len(imgs), focal, np.float32),
        'ext_scale': ext_scale,
    }
    write_to_h5py(h5_file, data)
    return data


# ---------------------------------------------------------------------------
# MonoPerfCap
# ---------------------------------------------------------------------------

def process_perfcap_data(data_path: str, subject: str = 'Weipeng_outdoor',
                         ext_scale: float = 0.001, img_res=(1080, 1920),
                         bbox_res: int = 224, extend_iter: int = 2) -> str:
    """MonoPerfCap frames + masks + SPIN h5 -> processed h5 (reference
    load_perfcap.py:12-52)."""
    spin_data = read_spin_data(
        os.path.join(data_path, 'MonoPerfCap', f'MonoPerfCap-{subject}.h5'),
        ext_scale=ext_scale, img_res=img_res, bbox_res=bbox_res)
    img_paths = spin_data['img_path']

    bkgd = _imread(os.path.join(data_path, 'MonoPerfCap',
                                f'{subject}/bkgd.png'))
    imgs, masks = [], []
    for p in img_paths:
        p = p.decode() if isinstance(p, bytes) else str(p)
        img = _imread(os.path.join(data_path, p))
        mask = _imread(os.path.join(
            data_path, p.replace('/images/', '/masks/')))[..., None]
        masks.append((mask >= 2).astype(np.uint8))
        imgs.append(img)
    masks = np.array(masks)

    data = {
        'imgs': np.array(imgs),
        'masks': masks,
        'sampling_masks': dilate_masks(masks[..., 0], extend_iter)[..., None],
        'kp_idxs': np.arange(len(masks)),
        'cam_idxs': np.arange(len(masks)),
        'bkgds': bkgd[None],
        'bkgd_idxs': np.zeros(len(masks), np.int64),
        **{k: v for k, v in spin_data.items() if k != 'img_path'},
        'img_paths': np.array([str(p).encode() for p in img_paths]),
    }
    h5_name = os.path.join(data_path, 'MonoPerfCap',
                           f'{subject}/{subject}_processed_h5py.h5')
    write_to_h5py(h5_name, data, img_chunk_size=16)
    return h5_name


# ---------------------------------------------------------------------------
# Mixamo
# ---------------------------------------------------------------------------

def remap_mixamo_kp_idxs(kp_idxs: np.ndarray, seq_lens: Sequence[int],
                         n_cam: int = 4) -> np.ndarray:
    """Offset per-sequence frame ids into a global pose-bank index
    (reference load_mixamo.py:64-73): each sequence contributes
    ``seq_len // n_cam`` unique poses."""
    kp_idxs = kp_idxs.copy()
    i = 0
    start = 0
    for seq_len in seq_lens:
        kp_idxs[start:start + seq_len] += i
        start += seq_len
        i += seq_len // n_cam
    return kp_idxs


def process_mixamo_data(data_path: str, subject: str = 'James',
                        ext_scale: float = 0.001, bbox_res: int = 224,
                        extend_iter: int = 2, n_cam: int = 4) -> str:
    """Mixamo 4-camera renders + SPIN h5 -> processed h5 (reference
    load_mixamo.py:14-106).  Images are white-composited through their
    masks; ground-truth joints come from per-sequence metadata.pickle."""
    spin_data = read_spin_data(
        os.path.join(data_path, subject, f'{subject}.h5'),
        ext_scale=ext_scale, img_res=1000, bbox_res=bbox_res)
    img_paths = spin_data['img_path']

    imgs, masks, kp_idxs, cam_idxs = [], [], [], []
    seq_dict: 'OrderedDict[str, List[int]]' = OrderedDict()
    for i, p in enumerate(img_paths):
        p = p.decode() if isinstance(p, bytes) else str(p)
        parts = p.split('/')
        d = '/'.join(parts[:3])
        seq_name, img_name = parts[1], parts[-1]
        cam_idxs.append(int(parts[2].split('_')[-1]))
        kp_idxs.append(int(img_name[5:-4]) - 1)
        seq_dict.setdefault(seq_name, []).append(i)

        img = _imread(os.path.join(data_path, p))[..., :3]
        mask = (_imread(os.path.join(data_path, f'{d}/Masks/{img_name}'))
                [..., :1] >= 2).astype(np.uint8)
        imgs.append(img * mask + (1 - mask) * 255)
        masks.append(mask)

    gt_kps, joint_names = [], None
    for k in seq_dict:
        with open(os.path.join(data_path, subject, k, 'Camera_0',
                               'metadata.pickle'), 'rb') as f:
            meta = pickle.load(f)
        for pose in meta['gt_pose']:
            pose = pose.item() if hasattr(pose, 'item') else pose
            if joint_names is None:
                joint_names = list(pose.keys())
            gt_kps.append(np.array([pose[j] for j in joint_names]))

    kp_idxs = remap_mixamo_kp_idxs(
        np.array(kp_idxs), [len(v) for v in seq_dict.values()], n_cam)
    masks = np.array(masks)
    temp_val, _ = get_temporal_validity(img_paths)

    data = {
        'imgs': np.array(imgs),
        'masks': masks,
        'sampling_masks': dilate_masks(masks[..., 0], extend_iter)[..., None],
        'kp_idxs': kp_idxs,
        'cam_idxs': np.array(cam_idxs),
        'gt_kp3d': np.array(gt_kps, np.float32) * ext_scale,
        'bkgds': (np.ones((1, *masks.shape[1:3], 3)) * 255).astype(np.uint8),
        'bkgd_idxs': np.zeros(len(masks), np.int64),
        'temp_validity': temp_val,
        **{k: v for k, v in spin_data.items() if k != 'img_path'},
        'img_paths': np.array([str(p).encode() for p in img_paths]),
    }
    h5_name = os.path.join(data_path, subject,
                           f'{subject}_processed_h5py.h5')
    write_to_h5py(h5_name, data)
    return h5_name


# ---------------------------------------------------------------------------
# Human3.6M
# ---------------------------------------------------------------------------

H36M_CAMERAS = ('54138969', '55011271', '58860488', '60457274')
H36M_CHAIR_SEQS = ('Sitting-', 'Eating-', 'Phoning-', 'Smoking-')


def extract_background(data_path: str, subject: str = 'S9',
                       use_chair_seqs: bool = False) -> np.ndarray:
    """Per-camera clean plates: average (or median, for chair
    sequences) of non-person pixels over all frames (reference
    load_h36m.py:17-112)."""
    from .spin import _load_deepdish_h5
    mask_data = _load_deepdish_h5(
        os.path.join(data_path, f'{subject}_mask_fixed.h5'))
    mask_img_path = mask_data['index']
    H = W = mask_data['masks'].shape[-2]

    if use_chair_seqs:
        per_cam: List[List[np.ndarray]] = [[] for _ in H36M_CAMERAS]
    else:
        bkgds = np.zeros((len(H36M_CAMERAS), H, W, 3), np.float32)
        cnts = np.zeros((len(H36M_CAMERAS), H, W, 1), np.float32)

    for i, img_path in enumerate(mask_img_path):
        img_path = (img_path.decode() if isinstance(img_path, bytes)
                    else str(img_path))
        has_chair = any(s in img_path for s in H36M_CHAIR_SEQS)
        if has_chair != use_chair_seqs:
            continue
        img = _imread(os.path.join(data_path, img_path))
        if img.shape[0] != H:   # one camera is 1002x1000
            img = img[1:-1]
        cam_idx = next(e for e, c in enumerate(H36M_CAMERAS)
                       if c in img_path)
        mask = mask_data['masks'][i]
        if use_chair_seqs:
            per_cam[cam_idx].append(img)
        else:
            bkgds[cam_idx] += (img / 255.) * (1 - mask)
            cnts[cam_idx] += (1 - mask)

    if use_chair_seqs:
        out = np.array([np.median(b, axis=0) for b in per_cam]
                       ).astype(np.uint8)
        np.save(os.path.join(data_path, f'{subject}_chair_bkgds_.npy'), out)
    else:
        out = ((bkgds / np.maximum(cnts, 1)) * 255.).astype(np.uint8)
        np.save(os.path.join(data_path, f'{subject}_clean_bkgds_.npy'), out)
    return out


def process_h36m_data(data_path: str, subject: str = 'S9',
                      ext_scale: float = 0.001, res: float = 1.0,
                      bbox_res: int = 224, extend_iter: int = 2,
                      camera_name: Optional[str] = None) -> str:
    """H36M frames + DeepLab masks + SPIN h5 -> processed h5 (reference
    load_h36m.py:114-249).  Background index = camera id, offset by
    len(cameras) for chair sequences (they use the chair clean plates).
    """
    from .spin import _load_deepdish_h5

    if camera_name is None:
        spin_h5 = os.path.join(data_path,
                               f'{subject}_SPIN_rect_output-maxmin.h5')
        mask_h5 = os.path.join(data_path,
                               f'{subject}_mask_deeplab_crop.h5')
    else:
        sub = 1 if subject == 'S1' else 5
        spin_h5 = os.path.join(
            data_path, f'{subject}-camera=[{camera_name}]-subsample={sub}.h5')
        mask_h5 = os.path.join(
            data_path, f'{subject}_{camera_name}_mask_deeplab_crop.h5')

    bkgds = np.load(os.path.join(
        data_path, f"{subject.replace('s', '')}_clean_bkgds.npy"))
    chair_bkgds = np.load(os.path.join(
        data_path, f"{subject.replace('s', '')}_chair_bkgds.npy"))
    bkgds = np.concatenate([bkgds, chair_bkgds], axis=0)

    mask_data = _load_deepdish_h5(mask_h5)
    masks = mask_data['masks'].astype(np.uint8)
    if masks.ndim <= 3:
        masks = masks[..., None]
    if masks.max() > 1:
        masks = (masks >= 2).astype(np.uint8)
    H = W = masks.shape[-2]
    if 'res' in mask_data:
        res = float(mask_data['res'])
    if res != 1.0:
        H, W = int(H / res), int(W / res)

    est = read_spin_data(spin_h5, ext_scale, img_res=H, bbox_res=bbox_res)
    if res != 1.0:
        est['focals'] = est['focals'] * res

    sampling_masks = dilate_masks(masks[..., 0], extend_iter)[..., None]

    cameras = H36M_CAMERAS if subject != 'S1' else (H36M_CAMERAS[-1],)
    imgs, cam_idxs = [], []
    for p in est['img_path']:
        p = p.decode() if isinstance(p, bytes) else str(p)
        offset = len(cameras) * any(s in p for s in H36M_CHAIR_SEQS)
        cam_idxs.append(next(e for e, c in enumerate(cameras) if c in p)
                        + offset)
        img = _imread(os.path.join(data_path, p))
        if img.shape[0] != H and res == 1.0:
            img = img[1:-1]
        if res != 1.0:
            import cv2
            img = cv2.resize(img, (int(res * W), int(res * H)),
                             interpolation=cv2.INTER_AREA)
        imgs.append(img)

    data = {
        'imgs': np.array(imgs),
        'masks': masks,
        'sampling_masks': sampling_masks,
        'bkgd_idxs': np.array(cam_idxs),
        'bkgds': bkgds,
        'img_paths': np.array([str(p).encode()
                               for p in mask_data['index']]),
        **{k: v for k, v in est.items() if k != 'img_path'},
    }
    name = (f'{subject}_processed_h5py.h5' if camera_name is None
            else f'{subject}_{camera_name}_processed_h5py.h5')
    h5_name = os.path.join(data_path, name)
    write_to_h5py(h5_name, data)
    return h5_name


# ---------------------------------------------------------------------------
# ZJU-MoCap
# ---------------------------------------------------------------------------

def process_zju_data(data_path: str, subject: str = '377',
                     training_view: Sequence[int] = (0, 6, 12, 18),
                     ext_scale: float = 0.001, split: str = 'train',
                     ) -> str:
    """ZJU-MoCap (neuralbody layout) -> h5 (reference
    load_zju.py:179-380).  Needs the optional ``smplx`` package for the
    SMPL forward; composes the ZJU global rotation/translation into the
    per-frame poses so FK in our canonical frame reproduces their
    vertices (see the coordinate notes at load_zju.py:102-122)."""
    raise NotImplementedError(
        'ZJU preprocessing needs the raw ZJU-MoCap release (annots.npy + '
        'per-camera frames + per-frame SMPL params) and the optional '
        'smplx package. The *training* path consumes the processed h5 '
        'through ZJUMocapDataset; convert with the neuralbody tooling or '
        'port load_zju.py:179-380 once raw data is present.')


# ---------------------------------------------------------------------------
# MPI-INF-3DHP
# ---------------------------------------------------------------------------

def process_3dhp_data(data_path: str, subject: str = 'S1',
                      ext_scale: float = 0.001, bbox_res: int = 224,
                      extend_iter: int = 2) -> str:
    """MPI-INF-3DHP SPIN estimates + frames -> h5 (reference
    load_3dhp.py:81-141)."""
    spin_data = read_spin_data(
        os.path.join(data_path, f'{subject}_SPIN_output.h5'),
        ext_scale=ext_scale, img_res=2048, bbox_res=bbox_res)
    img_paths = spin_data['img_path']

    imgs, masks = [], []
    for p in img_paths:
        p = p.decode() if isinstance(p, bytes) else str(p)
        imgs.append(_imread(os.path.join(data_path, p))[..., :3])
        mask_p = p.replace('/imageSequence/', '/FGmasks/')
        mask = _imread(os.path.join(data_path, mask_p))
        masks.append((mask[..., :1] >= 128).astype(np.uint8))
    masks = np.array(masks)

    data = {
        'imgs': np.array(imgs),
        'masks': masks,
        'sampling_masks': dilate_masks(masks[..., 0], extend_iter)[..., None],
        'bkgds': np.zeros((1, *masks.shape[1:3], 3), np.uint8),
        'bkgd_idxs': np.zeros(len(masks), np.int64),
        **{k: v for k, v in spin_data.items() if k != 'img_path'},
        'img_paths': np.array([str(p).encode() for p in img_paths]),
    }
    h5_name = os.path.join(data_path, f'{subject}_processed.h5')
    write_to_h5py(h5_name, data)
    return h5_name
