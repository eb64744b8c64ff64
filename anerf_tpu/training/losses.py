"""Photometric losses and schedules.

Matches reference core/trainer.py:8-62 (loss fns), :147-170 (loss/reg
factories), :173-183 (exponential lr decay with integer-division step
units).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def mse2psnr(x):
    return -10. * jnp.log(x) / jnp.log(10.)


def rgb_to_yuv(rgb: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray([[0.299, 0.587, 0.114],
                     [-0.14713, -0.28886, 0.436],
                     [0.615, -0.51499, -0.10001]], rgb.dtype)
    return rgb @ m.T


def img2mse(x, y, reduction='mean', to_yuv=False,
            scale_yuv=(0.1, 1.0, 1.0)):
    if to_yuv:
        x, y = rgb_to_yuv(x), rgb_to_yuv(y)
        d = (x - y) ** 2 * jnp.asarray(scale_yuv)
    else:
        d = (x - y) ** 2
    if reduction == 'mean':
        return d.mean()
    if reduction == 'sum':
        return d.sum()
    return d


def img2l1(x, y, reduction='mean', to_yuv=False, scale_yuv=(0.1, 1.0, 1.0)):
    if to_yuv:
        x, y = rgb_to_yuv(x), rgb_to_yuv(y)
        d = jnp.abs(x - y) * jnp.asarray(scale_yuv)
    else:
        d = jnp.abs(x - y)
    if reduction == 'mean':
        return d.mean()
    if reduction == 'sum':
        return d.sum()
    return d


def img2huber(x, y, reduction='mean', beta=0.1):
    d = jnp.abs(x - y)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    if reduction == 'mean':
        return loss.mean()
    if reduction == 'sum':
        return loss.sum()
    return loss


def acc2bce(x, y, reduction='mean', eps=1e-8):
    """Binary cross-entropy of accumulated opacity vs foreground mask.

    ``reduction='off'`` averages only over non-foreground pixels
    (reference trainer.py:44-54) — expressed as a masked mean so the
    shape stays static under jit.

    The complement term is written ``max(1 - x, 0) + eps`` rather than
    the reference's ``1 - x + eps``: under jit XLA constant-folds the
    latter to ``(1 + eps) - x``, and in f32 ``1 + 1e-8 == 1`` exactly,
    so fully-opaque rays (x == 1) would hit ``log(0) = -inf``.  The max
    blocks the reassociation and is value-identical for x in [0, 1]
    (acc is clamped to <= 1 upstream, compositing.py:74).
    """
    bce = -(y * jnp.log(x + eps) +
            (1. - y) * jnp.log(jnp.maximum(1. - x, 0.) + eps))
    if reduction == 'mean':
        return bce.mean()
    if reduction == 'sum':
        return bce.sum()
    if reduction == 'off':
        mask = (y < 1.0).astype(bce.dtype)
        return (bce * mask).sum() / jnp.maximum(mask.sum(), 1.)
    return bce


def img2psnr(img, target):
    return mse2psnr(img2mse(img, target))


def get_loss_fn(name: str, beta: float = 0.1,
                use_yuv: bool = False) -> Callable:
    if name == 'MSE':
        return lambda x, y, reduction='mean': img2mse(x, y, reduction,
                                                      to_yuv=use_yuv)
    if name == 'L1':
        return lambda x, y, reduction='mean': img2l1(x, y, reduction,
                                                     to_yuv=use_yuv)
    if name == 'Huber':
        return lambda x, y, reduction='mean': img2huber(x, y, reduction, beta)
    raise NotImplementedError(f'loss {name} not implemented')


def get_reg_fn(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    if name == 'L1':
        # masked-mean variant of the reference's (unreduced) 'off' path
        return lambda x, y, reduction='off': _masked_mean(
            jnp.abs(x - y), y) if reduction == 'off' else img2l1(x, y,
                                                                reduction)
    if name == 'MSE':
        return lambda x, y, reduction='off': _masked_mean(
            (x - y) ** 2, y) if reduction == 'off' else img2mse(x, y,
                                                               reduction)
    if name == 'BCE':
        return acc2bce
    raise NotImplementedError(f'reg {name} not implemented')


def _masked_mean(loss, y):
    mask = (y < 1.0).astype(loss.dtype)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.)


def nerf_lr_schedule(lrate: float, lrate_decay: int, decay_rate: float,
                     decay_unit: int = 1000) -> Callable:
    """``lrate * decay_rate^((step // decay_unit) / lrate_decay)`` —
    the reference's piecewise-constant exponential decay
    (trainer.py:173-183, note the integer division on the step)."""
    def sched(step):
        u = jnp.asarray(step, jnp.float32) // decay_unit
        return lrate * decay_rate ** (u / lrate_decay)
    return sched


def pose_lr_schedule(lrate: float, lrate_decay: int, decay_rate: float,
                     decay_unit: int, opt_pose_step: int) -> Callable:
    """Pose-optimizer decay (reference pose_opt.py:562-571): continuous
    exponent over the pose optimizer's own step count (= train step /
    opt_pose_step)."""
    def sched(step):
        pose_steps = jnp.asarray(step, jnp.float32) / opt_pose_step
        return lrate * decay_rate ** (pose_steps / (lrate_decay * decay_unit))
    return sched
