"""Alternating NeRF / pose optimization (FlipFlop) scheduler.

TPU redesign of reference ``PoseOptFlipFlop`` (core/pose_opt.py:584-727)
and ``update_pose_opt_params`` (pose_opt.py:560-582).  The reference
toggles ``requires_grad`` on modules and calls ``optimizer.step()``
imperatively; under jit we instead express the schedule as pure
functions of the global step producing multiplicative update gates, so
one compiled train step covers both turns with zero retracing.

Semantics preserved (pose_opt.py:676-727):
  * ``opt_pose_joint``: NeRF steps every iter, pose every
    ``opt_pose_step`` — the default trainer already implements this;
    the flipflop adds only the per-frame loss trackers.
  * alternating mode: the turn flips every ``opt_pose_interval`` steps;
    on the iteration the turn flips nerf->pose, NeRF still receives one
    last update ("just_turned" rule, pose_opt.py:712-715); pose updates
    fire on the pose turn every ``opt_pose_step`` iters.
  * ``peek_pose_turn`` gating by warmup/stop (pose_opt.py:625-630).
  * per-frame cumulative-moving-average loss trackers via scatter-add
    (pose_opt.py:632-662), initialized at 10 so un-optimized frames are
    not favored early.
  * ``opt_pose_reset``: snapshot the pose bank when a pose turn starts
    so it can be restored (set_poseopt_ckpt/reset_poseopt,
    pose_opt.py:603-605,663-666).

Note: the reference's flipflop flags were removed from its final
argument parser (only ``--testopt`` survives in run_nerf.py:348), so
this subsystem is exercised through explicit ``FlipFlopConfig`` rather
than the global Config.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlipFlopConfig:
    opt_pose_interval: int = 100   # steps between turn flips
    opt_pose_step: int = 1         # pose update cadence within a pose turn
    opt_pose_joint: bool = False   # both nets each step (tracker-only mode)
    opt_pose_warmup: int = 0
    opt_pose_stop: Optional[int] = None
    opt_pose_reset: bool = False   # snapshot pose bank at pose-turn start
    testopt: bool = False          # freeze NeRF entirely (test-time popt)


def init_tracker_state(n_kps: int) -> Dict[str, jnp.ndarray]:
    """CMA loss trackers (reference reset_kp_loss_tracker,
    pose_opt.py:632-636)."""
    return {
        'kp_loss_tracker': jnp.full((n_kps,), 10., jnp.float32),
        'kp_loss_cnt': jnp.zeros((n_kps,), jnp.float32),
    }


def accumulate_loss(tracker: Dict[str, jnp.ndarray],
                    loss: jnp.ndarray, kp_idx: jnp.ndarray
                    ) -> Dict[str, jnp.ndarray]:
    """Scatter-add per-frame losses into the CMA trackers
    (reference accumulate_loss, pose_opt.py:638-662)."""
    loss = loss.reshape(-1)
    kp_idx = kp_idx.reshape(-1)
    n = tracker['kp_loss_tracker'].shape[0]
    acc = jax.ops.segment_sum(loss, kp_idx, num_segments=n)
    cnt = tracker['kp_loss_cnt'] + jax.ops.segment_sum(
        jnp.ones_like(loss), kp_idx, num_segments=n)
    denom = jnp.maximum(cnt, 1.)
    cma = tracker['kp_loss_tracker']
    return {
        'kp_loss_tracker': cma + (acc - cma) / denom,
        'kp_loss_cnt': cnt,
    }


def get_trackers(tracker: Dict[str, jnp.ndarray],
                 idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-frame mean loss (reference get_trackers, pose_opt.py:673-680)."""
    t = tracker['kp_loss_tracker']
    c = jnp.maximum(tracker['kp_loss_cnt'], 1.)
    out = t / c
    return out if idx is None else out[idx]


def pose_turn(ff: FlipFlopConfig, step) -> jnp.ndarray:
    """Whether `step` is inside a pose turn (before warmup/stop gating).

    The reference initializes ``pose_turn=False`` (pose_opt.py:596) but
    flips it on the very first iteration (0 % interval == 0,
    pose_opt.py:697-700), so even blocks of ``opt_pose_interval`` steps
    are pose turns.
    """
    step = jnp.asarray(step)
    if ff.opt_pose_joint:
        return jnp.ones_like(step, jnp.bool_)
    return ((step // ff.opt_pose_interval) % 2) == 0


def just_turned(ff: FlipFlopConfig, step) -> jnp.ndarray:
    step = jnp.asarray(step)
    return (step % ff.opt_pose_interval) == 0


def peek_pose_turn(ff: FlipFlopConfig, step) -> jnp.ndarray:
    """Turn gated by warmup/stop (reference peek_pose_turn,
    pose_opt.py:625-630)."""
    turn = pose_turn(ff, step)
    step = jnp.asarray(step)
    if ff.opt_pose_stop is not None:
        turn = jnp.logical_and(turn, step <= ff.opt_pose_stop)
    turn = jnp.logical_and(turn, step >= ff.opt_pose_warmup)
    return turn


def update_gates(ff: FlipFlopConfig, step
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(nerf_gate, pose_gate) float32 multipliers for this step.

    Encodes the reference's step() control flow (pose_opt.py:682-727):
      joint: NeRF every iter, pose every opt_pose_step;
      alternating (pose_opt.py:712-727): NeRF updates when
      ``turn == just_turned`` — i.e. through its own turn, plus one last
      update on the first iteration of a pose turn; otherwise the pose
      optimizer fires every ``opt_pose_step`` iters — which includes the
      first iteration back on the NeRF turn (flushing the accumulated
      pose gradients).
    """
    step = jnp.asarray(step)
    turn = pose_turn(ff, step)
    jt = just_turned(ff, step)
    kth = (step % ff.opt_pose_step) == 0
    if ff.opt_pose_joint:
        nerf_g = jnp.ones_like(step, jnp.float32)
        pose_g = kth.astype(jnp.float32)
    else:
        nerf_on = turn == jt
        pose_on = jnp.logical_and(jnp.logical_not(nerf_on), kth)
        nerf_g = nerf_on.astype(jnp.float32)
        pose_g = pose_on.astype(jnp.float32)
    if ff.testopt:
        nerf_g = jnp.zeros_like(nerf_g)
    # warmup / stop window on the pose side
    window = step >= ff.opt_pose_warmup
    if ff.opt_pose_stop is not None:
        window = jnp.logical_and(window, step <= ff.opt_pose_stop)
    pose_g = pose_g * window.astype(jnp.float32)
    return nerf_g, pose_g


def snapshot_gate(ff: FlipFlopConfig, step) -> jnp.ndarray:
    """True on the first iteration of a pose turn — when the reference
    snapshots the pose bank for a potential reset (pose_opt.py:700-703)."""
    if ff.opt_pose_joint or not ff.opt_pose_reset:
        return jnp.asarray(False)
    return jnp.logical_and(pose_turn(ff, step), just_turned(ff, step))


def maybe_snapshot(ff: FlipFlopConfig, step, pose_params,
                   snapshot: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Functional set_poseopt_ckpt: carry a device-side copy of the pose
    bank, refreshed at each pose-turn start."""
    if snapshot is None:
        return jax.tree_util.tree_map(lambda x: x.copy(), pose_params)
    gate = snapshot_gate(ff, step)
    return jax.tree_util.tree_map(
        lambda cur, snap: jnp.where(gate, cur, snap), pose_params, snapshot)


def reset_poseopt(pose_params, snapshot) -> Dict[str, Any]:
    """Restore the pose bank from the snapshot (reference reset_poseopt,
    pose_opt.py:603-605).  Copies, so the restored bank and the live
    snapshot never alias (donation safety)."""
    return jax.tree_util.tree_map(lambda _, s: s.copy(), pose_params,
                                  snapshot)


def anneal_pose_reg(opt_pose_coef: float, step, reg_step: Optional[int],
                    reg_rate: float = 5.) -> jnp.ndarray:
    """Pose-regularization coefficient annealing (reference
    update_pose_opt_params, pose_opt.py:560-582): every ``reg_step``
    optimizer steps the coefficient multiplies by ``reg_rate``."""
    if reg_step is None:
        return jnp.asarray(opt_pose_coef, jnp.float32)
    k = jnp.asarray(step, jnp.float32) // float(reg_step)
    return opt_pose_coef * reg_rate ** k
