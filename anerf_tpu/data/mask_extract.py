"""Person-mask extraction for raw video frames (offline preprocessing).

Equivalent of reference core/process_mask.py, which runs a TensorFlow
DeepLab-v3 PASCAL model over frames and keeps the 'person' class, and
core/misc/save_mask_vid.py, which exports the extracted masks as a
video for inspection.

TPU-native redesign: the segmentation backbone is PLUGGABLE — any
callable ``seg_fn(imgs_uint8) -> (N, H, W) int labels`` works (e.g. a
jax/flax segmenter, or a torchvision/transformers model when weights
are available offline).  Two backends ship built-in:

  * ``masks_from_background``: static-camera background subtraction
    (the same signal the reference's H36M pipeline uses to extract
    per-camera backgrounds, load_h36m.py:17-112) with morphological
    cleanup — fully offline, no model weights needed;
  * ``segment_person``: drives a user-provided PASCAL-labelled model
    and keeps class 15 ('person'), mirroring the reference's DeepLab
    postprocessing (process_mask.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

# PASCAL VOC class list used by the reference's DeepLab model
# (process_mask.py LABEL_NAMES); 'person' is class 15.
LABEL_NAMES = (
    'background', 'aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
    'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse', 'motorbike',
    'person', 'pottedplant', 'sheep', 'sofa', 'train', 'tv')
PERSON_LABEL = LABEL_NAMES.index('person')


def create_pascal_label_colormap() -> np.ndarray:
    """PASCAL VOC label colormap (bit-shuffled index colors), as used by
    the reference for mask visualization (process_mask.py)."""
    colormap = np.zeros((256, 3), dtype=int)
    ind = np.arange(256, dtype=int)
    for shift in reversed(range(8)):
        for channel in range(3):
            colormap[:, channel] |= ((ind >> channel) & 1) << shift
        ind >>= 3
    return colormap


def label_to_color_image(label: np.ndarray) -> np.ndarray:
    """Color-code a 2D label map with the PASCAL colormap."""
    if label.ndim != 2:
        raise ValueError('Expect 2-D input label')
    colormap = create_pascal_label_colormap()
    if np.max(label) >= len(colormap):
        raise ValueError('label value too large.')
    return colormap[label]


def segment_person(imgs: np.ndarray,
                   seg_fn: Callable[[np.ndarray], np.ndarray],
                   person_label: int = PERSON_LABEL) -> np.ndarray:
    """Run a segmentation model and keep the person class.

    Args:
      imgs: (N, H, W, 3) uint8 frames.
      seg_fn: callable mapping frames -> (N, H, W) integer PASCAL labels.
    Returns:
      (N, H, W, 1) uint8 binary masks in {0, 1}.
    """
    labels = np.asarray(seg_fn(imgs))
    return (labels == person_label).astype(np.uint8)[..., None]


def _binary_morph(mask: np.ndarray, kernel: int, op: str) -> np.ndarray:
    """Separable box erosion/dilation via numpy (no cv2 dependency in
    the core path)."""
    from numpy.lib.stride_tricks import sliding_window_view
    if kernel % 2 != 1:
        raise ValueError(f'_binary_morph requires an odd kernel, got {kernel}')
    pad = kernel // 2
    agg = np.max if op == 'dilate' else np.min
    m = np.pad(mask, ((pad, pad), (0, 0)),
               mode='constant', constant_values=(0 if op == 'dilate' else 1))
    m = agg(sliding_window_view(m, kernel, axis=0), axis=-1)
    m = np.pad(m, ((0, 0), (pad, pad)),
               mode='constant', constant_values=(0 if op == 'dilate' else 1))
    return agg(sliding_window_view(m, kernel, axis=1), axis=-1)


def masks_from_background(imgs: np.ndarray, bkgd: np.ndarray,
                          thresh: float = 25.0,
                          open_kernel: int = 3,
                          close_kernel: int = 7) -> np.ndarray:
    """Static-camera person masks by background subtraction.

    Args:
      imgs: (N, H, W, 3) uint8 frames.
      bkgd: (H, W, 3) uint8 clean-plate background (e.g. the per-camera
        median background the H36M pipeline extracts).
      thresh: per-pixel L2 color-distance threshold (uint8 scale).
    Returns:
      (N, H, W, 1) uint8 binary masks, morphologically opened (despeckle)
      then closed (fill holes).
    """
    diff = imgs.astype(np.float32) - bkgd.astype(np.float32)[None]
    dist = np.sqrt((diff ** 2).sum(-1))
    masks = (dist > thresh).astype(np.uint8)
    out = np.empty_like(masks)
    for i, m in enumerate(masks):
        m = _binary_morph(_binary_morph(m, open_kernel, 'erode'),
                          open_kernel, 'dilate')          # open
        m = _binary_morph(_binary_morph(m, close_kernel, 'dilate'),
                          close_kernel, 'erode')          # close
        out[i] = m
    return out[..., None]


def save_mask_video(path: str, masks: np.ndarray, imgs: Optional[np.ndarray]
                    = None, fps: int = 14) -> None:
    """Export masks (optionally composited over the frames) as a video
    for inspection (reference core/misc/save_mask_vid.py)."""
    from ..utils.logging import save_video
    m = masks.astype(np.float32)
    if m.ndim == 3:
        m = m[..., None]
    if imgs is not None:
        frames = imgs.astype(np.float32) / 255. * (0.3 + 0.7 * m)
    else:
        frames = np.repeat(m, 3, axis=-1)
    save_video(path, frames, fps=fps)
