"""Evaluation: image-quality and pose-accuracy metrics."""

from . import metrics  # noqa: F401
from .metrics import evaluate_images, pose_metrics, psnr, ssim  # noqa: F401
