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
