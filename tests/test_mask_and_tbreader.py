"""Mask extraction (reference core/process_mask.py equivalent) and the
self-contained tensorboard event re-reader (evaluation_helpers.py:28-67)."""
import os

import numpy as np
import pytest

from anerf_tpu.data.mask_extract import (PERSON_LABEL, label_to_color_image,
                                         masks_from_background,
                                         segment_person)
from anerf_tpu.utils.logging import (MetricLogger, read_tag_scalars,
                                     read_tb_scalars)


def test_background_subtraction_masks():
    rng = np.random.default_rng(0)
    bk = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    imgs = np.repeat(bk[None], 2, 0).copy()
    imgs[:, 10:25, 12:28] = 250
    m = masks_from_background(imgs, bk)
    assert m.shape == (2, 40, 40, 1) and m.dtype == np.uint8
    assert m[0, 17, 20, 0] == 1          # inside the box
    assert m[0, 2, 2, 0] == 0            # background
    # morphological close filled the box solidly
    assert m[0, 11:24, 13:27, 0].mean() > 0.95


def test_segment_person_keeps_person_class():
    imgs = np.zeros((1, 8, 8, 3), np.uint8)
    lab = np.zeros((1, 8, 8), np.int32)
    lab[0, :4] = PERSON_LABEL
    m = segment_person(imgs, lambda x: lab)
    assert m[0, :4].all() and not m[0, 4:].any()


def test_pascal_colormap_person_color():
    # person (15) maps to (192, 128, 128) in the PASCAL colormap
    np.testing.assert_array_equal(
        label_to_color_image(np.array([[PERSON_LABEL]]))[0, 0],
        [192, 128, 128])


def test_tb_event_roundtrip(tmp_path):
    pytest.importorskip('tensorboardX')
    logdir = str(tmp_path / 'run')
    logger = MetricLogger(logdir)
    for step, v in [(10, 1.5), (20, 2.5), (30, -3.0)]:
        logger.log_scalars(step, {'psnr': v}, prefix='Val/')
    logger.close()
    series = read_tb_scalars(logdir)
    assert series['Val/psnr'] == [(10, 1.5), (20, 2.5), (30, -3.0)]
    r = read_tag_scalars('Val/psnr', logdir)
    assert r['Val/psnr'] == [[1.5, 2.5, -3.0]]
    assert r['Val/psnr_steps'] == [[10, 20, 30]]
    assert r['num_events'] == 1


def _person_frames(n=2, H=40, W=32):
    """Frames with a bright square 'person' on black background."""
    imgs = np.zeros((n, H, W, 3), np.uint8)
    imgs[:, 10:30, 8:24] = 200
    gt = np.zeros((n, H, W), np.uint8)
    gt[:, 10:30, 8:24] = 1
    return imgs, gt


def test_torchscript_backend_end_to_end(tmp_path):
    """A real TorchScript module through torchscript_seg_fn +
    extract_masks: brightness-thresholding 'model' that emits PASCAL
    logits with person=15 where the normalized input is bright."""
    import torch
    from anerf_tpu.data.mask_extract import (extract_masks,
                                             torchscript_seg_fn)

    class Thresh(torch.nn.Module):
        def forward(self, x: torch.Tensor):
            # x is ImageNet-normalized; person where raw value > 0.5
            raw = x[:, :1] * 0.229 + 0.485
            person = (raw > 0.5).float()
            logits = torch.zeros(x.shape[0], 21, x.shape[2], x.shape[3])
            logits[:, 15:16] = person * 10.
            logits[:, 0:1] = (1. - person) * 10.
            return {'out': logits}

    path = str(tmp_path / 'thresh.ts')
    torch.jit.script(Thresh()).save(path)

    imgs, gt = _person_frames()
    seg_fn = torchscript_seg_fn(path)
    masks = extract_masks(imgs, seg_fn, input_size=None, dilate=0)
    np.testing.assert_array_equal(masks[..., 0], gt)

    # resize-to-input_size path + dilation recovers the person region
    masks2 = extract_masks(imgs, seg_fn, input_size=24, dilate=1)
    inter = (masks2[..., 0] & gt).sum() / gt.sum()
    assert inter > 0.9


def test_bbox_cropped_masks(tmp_path):
    """extract_bbox_masks segments only the SPIN crop and pastes back
    (reference process_bbox_masks, process_mask.py:174-225)."""
    import torch
    from anerf_tpu.data.mask_extract import (extract_bbox_masks,
                                             torchscript_seg_fn)

    class All15(torch.nn.Module):
        def forward(self, x: torch.Tensor):
            logits = torch.zeros(x.shape[0], 21, x.shape[2], x.shape[3])
            logits[:, 15] = 1.
            return {'out': logits}

    path = str(tmp_path / 'all15.ts')
    torch.jit.script(All15()).save(path)

    imgs, _ = _person_frames()
    bboxes = np.array([[16, 20, 16], [16, 20, 16]], np.float32)
    masks = extract_bbox_masks(imgs, bboxes, torchscript_seg_fn(path),
                               input_size=None, mul=1.0, dilate=0)
    m = masks[0, ..., 0]
    # inside the crop: person; outside: zero
    assert m[20, 16] == 1
    assert m[2, 2] == 0 and m[38, 30] == 0
    ys, xs = np.where(m > 0)
    assert ys.min() >= 12 and ys.max() < 28
    assert xs.min() >= 8 and xs.max() < 24


def test_transformers_backend_smoke():
    """transformers_seg_fn drives a real (randomly initialized, tiny)
    SegFormer offline — exercises the logits-upsample-argmax path."""
    from transformers import SegformerConfig, \
        SegformerForSemanticSegmentation
    from anerf_tpu.data.mask_extract import (extract_masks,
                                             transformers_seg_fn)
    cfg = SegformerConfig(num_channels=3, num_encoder_blocks=2,
                          depths=[1, 1], sr_ratios=[2, 1],
                          hidden_sizes=[8, 16], num_attention_heads=[1, 1],
                          decoder_hidden_size=16, num_labels=21)
    model = SegformerForSemanticSegmentation(cfg)
    imgs, _ = _person_frames()
    seg_fn = transformers_seg_fn(model=model)
    masks = extract_masks(imgs, seg_fn, input_size=32, dilate=0)
    assert masks.shape == imgs.shape[:3] + (1,)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}
