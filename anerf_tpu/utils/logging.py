"""Metrics logging + visualization helpers.

Replaces the reference's tensorboard SummaryWriter usage
(run_nerf.py:529,590-615): scalars every ``i_print``, validation
images/videos + PSNR/SSIM at ``i_testset``, plus a jsonl mirror for
headless runs.  Skeleton overlays are drawn in 2D with cv2 (replacing
the pyrender overlay in core/misc/renderer.py).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class MetricLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self.tb = SummaryWriter(logdir) if (use_tensorboard and
                                            SummaryWriter) else None
        self.jsonl = open(os.path.join(logdir, 'metrics.jsonl'), 'a')
        self.t0 = time.time()

    def log_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = ''):
        rec = {'step': int(step), 'time': time.time() - self.t0}
        for k, v in scalars.items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            rec[k] = v
            if self.tb is not None:
                self.tb.add_scalar(f'{prefix}{k}', v, step)
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()

    def log_images(self, step: int, tag: str, images: np.ndarray):
        """images: (N, H, W, 3) float [0,1]."""
        if self.tb is not None:
            for i, img in enumerate(images):
                self.tb.add_image(f'{tag}/{i}', img, step,
                                  dataformats='HWC')

    def log_video(self, step: int, tag: str, frames: np.ndarray,
                  fps: int = 14):
        if self.tb is not None:
            v = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
            v = v.transpose(0, 3, 1, 2)[None]  # (1, T, C, H, W)
            try:
                self.tb.add_video(tag, v, step, fps=fps)
            except Exception:
                pass

    def close(self):
        if self.tb is not None:
            self.tb.close()
        self.jsonl.close()


def save_video(path: str, frames: np.ndarray, fps: int = 14):
    """mp4/gif export via imageio (reference run_render.py:1030-1045)."""
    import imageio
    frames8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    try:
        imageio.mimwrite(path, frames8, fps=fps)
    except Exception:
        # fall back to per-frame pngs
        base = os.path.splitext(path)[0]
        for i, f in enumerate(frames8):
            imageio.imwrite(f'{base}_{i:04d}.png', f)


def save_images(outdir: str, frames: np.ndarray, prefix: str = ''):
    import imageio
    os.makedirs(outdir, exist_ok=True)
    for i, f in enumerate(frames):
        imageio.imwrite(os.path.join(outdir, f'{prefix}{i:04d}.png'),
                        (np.clip(f, 0, 1) * 255).astype(np.uint8))


def draw_skeleton_2d(img: np.ndarray, kp3d: np.ndarray, c2w: np.ndarray,
                     focal, center=None, skel=None) -> np.ndarray:
    """Project 3D joints and draw the kinematic tree on the image
    (2D replacement for the reference's pyrender overlay,
    core/misc/renderer.py)."""
    import cv2
    from ..ops.cylinder import nerf_c2w_to_extrinsic, world_to_cam_np
    from ..skeleton import SMPLSkeleton

    skel = skel or SMPLSkeleton
    H, W = img.shape[:2]
    ext = nerf_c2w_to_extrinsic(np.asarray(c2w))
    pix = world_to_cam_np(np.asarray(kp3d), ext, H, W, focal, center)
    out = (np.clip(img, 0, 1) * 255).astype(np.uint8).copy()
    for j, p in enumerate(skel.joint_trees):
        x0, y0 = pix[j]
        x1, y1 = pix[p]
        if np.isfinite([x0, y0, x1, y1]).all():
            cv2.line(out, (int(x0), int(y0)), (int(x1), int(y1)),
                     (0, 255, 0), 1)
    for x, y in pix:
        if np.isfinite([x, y]).all():
            cv2.circle(out, (int(x), int(y)), 2, (255, 0, 0), -1)
    return out.astype(np.float32) / 255.
