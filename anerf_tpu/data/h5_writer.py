"""H5 dataset writer + synthetic dataset generator.

``write_to_h5py`` mirrors the reference's schema
(core/process_spin.py:234-296): images flattened to (N, H*W, C).  The
STORAGE layout diverges deliberately: the reference gzip-compresses
small chunks and pays h5py's point-selection machinery on every pixel
gather (~40 ms/2048-pixel batch at 512x512, measured); we default to
CONTIGUOUS UNCOMPRESSED image datasets so the loader can np.memmap the
raw bytes and gather through the page cache (~0.05 ms — the TPU step is
~19 ms, so the compressed layout makes real-resolution training
host-bound).  ``img_layout='chunked'`` restores the reference-style
gzip layout for disk-constrained setups; the reader handles both (plus
third-party files) via a full-row-read fallback.

``make_synthetic_h5`` renders a procedural articulated scene into that
schema so the full train/render path can be exercised (and golden-
tested) without the real datasets.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import h5py
import numpy as np

from ..ops.cylinder import get_kp_bounding_cylinder
from ..ops.fk import get_smpl_l2ws_np
from ..skeleton import SMPL_REST_POSE, SMPLSkeleton


IMG_KEYS = ('imgs', 'masks', 'sampling_masks', 'bkgds')


def write_to_h5py(h5_path: str, data: Dict[str, np.ndarray],
                  img_chunk_size: int = 64,
                  compression: Optional[str] = 'gzip',
                  img_layout: str = 'contiguous') -> None:
    """Write a dataset dict to h5.

    ``img_layout='contiguous'`` (default) stores image datasets
    contiguous + uncompressed so ``BaseH5Dataset`` can memory-map them;
    ``'chunked'`` stores reference-style gzip chunks (module docstring
    has the measured trade-off)."""
    os.makedirs(os.path.dirname(h5_path) or '.', exist_ok=True)
    img_shape = None
    if 'imgs' in data:
        img_shape = np.array(data['imgs'].shape)  # (N, H, W, C)

    with h5py.File(h5_path, 'w') as f:
        for k, v in data.items():
            if v is None:
                continue
            v = np.asarray(v)
            if k in IMG_KEYS and v.ndim == 4:
                n, h, w, c = v.shape
                flat = v.reshape(n, h * w, c)
                if img_layout == 'contiguous':
                    f.create_dataset(k, data=flat)
                else:
                    f.create_dataset(
                        k, data=flat,
                        chunks=(1, min(img_chunk_size * img_chunk_size,
                                       h * w), c),
                        compression=compression)
            else:
                f.create_dataset(k, data=v, compression=(
                    compression if v.ndim > 0 and v.size > 64 else None))
        if img_shape is not None and 'img_shape' not in data:
            f.create_dataset('img_shape', data=img_shape)


def make_synthetic_h5(h5_path: str, n_frames: int = 6, n_cams: int = 1,
                      H: int = 32, W: int = 32, ext_scale: float = 0.001,
                      seed: int = 0, layout: str = 'frames',
                      body_scale: float = 2.2,
                      blob_radius: int = 1,
                      img_layout: str = 'contiguous') -> str:
    """A tiny procedural dataset in the reference schema.

    ``layout='surreal'`` arranges images as (N_cams, N_kps) like
    SURREAL; ``'frames'`` is one camera per frame.

    ``body_scale``: rest-pose multiplier (x ext_scale).  The default
    keeps the historical tiny-body geometry (sub-pixel in image space
    — fine for smoke tests); pass ~450 for a REALISTIC body (~1.7
    units tall at the z=2.7 camera, like SURREAL's mm x 0.001 data)
    whose joints project ~70 px apart — required when the photometric
    signal itself must carry pose information (scripts/quality_run.py).
    ``blob_radius``: half-size of each joint's colored square
    (default 1 -> 3x3 px).
    """
    rng = np.random.RandomState(seed)
    rest_pose = (SMPL_REST_POSE * ext_scale * body_scale).astype(np.float32)

    bones = rng.normal(scale=0.12, size=(n_frames, 24, 3)).astype(np.float32)
    pelvis = rng.normal(scale=0.03, size=(n_frames, 3)).astype(np.float32)
    l2ws = np.stack([get_smpl_l2ws_np(b, rest_pose) for b in bones])
    l2ws[..., :3, 3] += pelvis[:, None]
    kp3d = l2ws[..., :3, 3].astype(np.float32)
    skts = np.linalg.inv(l2ws).astype(np.float32)
    cyls = get_kp_bounding_cylinder(kp3d, ext_scale=ext_scale,
                                    head='-y').astype(np.float32)

    # one fixed camera looking down -z from z=2.7 (plus orbit cams)
    c2ws = []
    for c in range(n_cams):
        ang = 2 * np.pi * c / max(n_cams, 1) * 0.25
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                                [0, 1, 0],
                                [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        c2w[:3, 3] = c2w[:3, :3] @ np.array([0., 0., 2.7], np.float32)
        c2ws.append(c2w)
    c2ws = np.array(c2ws)

    if layout == 'surreal':
        n_imgs = n_cams * n_frames
        img_c2ws = np.repeat(c2ws, n_frames, axis=0)
        img_kp = np.tile(np.arange(n_frames), n_cams)
    else:
        n_imgs = n_frames
        img_c2ws = np.broadcast_to(c2ws[0], (n_frames, 4, 4)).copy()
        img_kp = np.arange(n_frames)

    focal = 0.8 * W
    imgs = np.zeros((n_imgs, H, W, 3), np.uint8)
    masks = np.zeros((n_imgs, H, W, 1), np.uint8)
    for i in range(n_imgs):
        kp = kp3d[img_kp[i]]
        w2c = np.linalg.inv(img_c2ws[i])
        cam = (np.concatenate([kp, np.ones_like(kp[:, :1])], -1)
               @ w2c.T)[:, :3]
        # NeRF convention: looking down -z
        px = (cam[:, 0] / -cam[:, 2]) * focal + W * 0.5
        py = (-cam[:, 1] / -cam[:, 2]) * focal + H * 0.5
        for j, (x, y) in enumerate(zip(px, py)):
            xi, yi = int(round(x)), int(round(y))
            r = blob_radius
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = yi + dy, xi + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        imgs[i, yy, xx] = (40 + 8 * j, 200 - 6 * j, 120)
                        masks[i, yy, xx] = 1

    sampling_masks = np.ones_like(masks)
    bkgds = np.full((1, H, W, 3), 16, np.uint8)
    bkgd_idxs = np.zeros(n_imgs, np.int64)
    img_paths = np.array(
        [f'seq/a/{i:05d}.png'.encode() for i in range(n_imgs)])

    data = {
        'imgs': imgs, 'masks': masks, 'sampling_masks': sampling_masks,
        'bkgds': bkgds, 'bkgd_idxs': bkgd_idxs,
        'kp3d': kp3d, 'gt_kp3d': kp3d, 'bones': bones, 'skts': skts,
        'cyls': cyls, 'rest_pose': rest_pose,
        'betas': np.zeros((1, 10), np.float32),
        'c2ws': img_c2ws.astype(np.float32),
        'focals': np.full(n_imgs, focal, np.float32),
        'img_paths': img_paths,
        'ext_scale': np.float32(ext_scale),
    }
    write_to_h5py(h5_path, data, img_layout=img_layout)
    return h5_path
