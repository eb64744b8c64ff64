"""End-to-end tests for the alternating FlipFlop pose/NeRF scheduler.

The reference's PoseOptFlipFlop (core/pose_opt.py:584-727) is a legacy
subsystem with no surviving CLI driver; here it is wired through
``make_train_step`` behind ``--opt_pose_flipflop`` and these tests prove
the end-to-end behavior: turns actually alternate (NeRF parameters
freeze on pose turns and vice versa, modulo the just-turned boundary
rule), the CMA loss trackers update, the pose-bank snapshot refreshes at
pose-turn starts, and a reset restores the snapshot.
"""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from anerf_tpu.data.h5_writer import make_synthetic_h5
from anerf_tpu.models.factory import build_raycast_config
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.ops.fk import fk
from anerf_tpu.skeleton import SMPL_REST_POSE, SMPLSkeleton
from anerf_tpu.training import flipflop as FF
from anerf_tpu.training import pose_opt as P
from anerf_tpu.training.trainer import TrainSetup, init_train_state, \
    make_train_step
from anerf_tpu.utils.config import Config

N_RAYS, N_FRAMES = 16, 4
K = 9


def _build(interval=2, reset=True):
    cfg = Config(
        N_rand=N_RAYS, N_samples=8, N_importance=4, netwidth=32, netdepth=2,
        multires=2, multires_views=1, use_cutoff=True, cutoff_inputs=True,
        cutoff_viewdir=True, use_viewdirs=True, opt_framecode=True,
        perturb=0., raw_noise_std=0., ext_scale=0.001,
        opt_pose=True, opt_pose_flipflop=True, opt_pose_interval=interval,
        opt_pose_step=1, opt_pose_coef=1.0, opt_pose_tol=0.,
        opt_pose_reset=reset, lrate=5e-3, opt_pose_lrate=5e-3)
    rng = np.random.RandomState(3)
    rest = SMPL_REST_POSE.astype(np.float32)
    bones0 = rng.normal(scale=0.2, size=(N_FRAMES, 24, 3)).astype(np.float32)
    kps0, _, _, _ = fk(jnp.asarray(bones0),
                       jnp.asarray(rng.normal(scale=0.02, size=(N_FRAMES, 3))
                                   .astype(np.float32)),
                       jnp.asarray(rest))
    kps0 = np.asarray(kps0)
    cyls0 = get_kp_bounding_cylinder(kps0, ext_scale=0.001,
                                     head='-y').astype(np.float32)
    rc = build_raycast_config(cfg, n_framecodes=N_FRAMES)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=SMPLSkeleton,
                       rest_pose=jnp.asarray(rest),
                       anchors=P.make_anchors(kps0, bones0),
                       near=0.0, far=1.0)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps0, init_bones=bones0)
    # bias the density head up so the scene is non-transparent and the
    # photometric loss actually reaches the MLP (dead-ReLU guard)
    for net in ('coarse', 'fine'):
        state['params'][net]['alpha_linear']['b'] = \
            state['params'][net]['alpha_linear']['b'] + 1.0
    # perturb the bank away from the anchors so kp_loss/grads are live
    state['pose_params']['bones'] = state['pose_params']['bones'] + 0.05
    if reset:
        # keep the initial snapshot consistent with the perturbed bank
        state['pose_snapshot'] = jax.tree_util.tree_map(
            lambda x: x.copy(), state['pose_params'])

    kp_idx = rng.randint(0, N_FRAMES, size=(N_RAYS,)).astype(np.int32)
    t = np.linspace(-0.1, 0.1, N_RAYS, dtype=np.float32)
    batch = {
        'rays_o': jnp.asarray(np.tile([[0., 0., 3.]], (N_RAYS, 1))
                              .astype(np.float32)),
        'rays_d': jnp.asarray(np.stack([t, t * .5, -np.ones_like(t)], -1)),
        'target_s': jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3))
                                .astype(np.float32)),
        'kp_idx': jnp.asarray(kp_idx),
        'cam_idxs': jnp.asarray(kp_idx),
        'cyls': jnp.asarray(cyls0[kp_idx]),
    }
    ff = FF.FlipFlopConfig(opt_pose_interval=interval, opt_pose_step=1,
                           opt_pose_reset=reset)
    return cfg, setup, state, batch, ff


def test_turns_alternate_end_to_end():
    """NeRF params move exactly on update_gates' NeRF steps, the pose
    bank exactly on its pose steps — over several turn flips."""
    cfg, setup, state, batch, ff = _build(interval=2)
    assert 'kp_tracker' in state and 'pose_snapshot' in state
    step_fn = jax.jit(make_train_step(setup))

    nerf_moved, pose_moved, trackers = [], [], []
    for s in range(K):
        w0 = np.asarray(state['params']['coarse']['rgb_linear']['w'])
        b0 = np.asarray(state['pose_params']['bones'])
        state, stats = step_fn(state, batch, jax.random.PRNGKey(s))
        w1 = np.asarray(state['params']['coarse']['rgb_linear']['w'])
        b1 = np.asarray(state['pose_params']['bones'])
        nerf_moved.append(float(np.abs(w1 - w0).max()) > 0)
        pose_moved.append(float(np.abs(b1 - b0).max()) > 0)
        trackers.append(float(np.asarray(stats['kp_tracker_mean'])))

    for s in range(K):
        nerf_g, pose_g = FF.update_gates(ff, s + 1)
        assert nerf_moved[s] == bool(nerf_g > 0), f'step {s}: NeRF gate'
        assert pose_moved[s] == bool(pose_g > 0), f'step {s}: pose gate'
    # both sides actually trained at least once, and turns flipped
    assert any(nerf_moved) and any(pose_moved)
    assert not all(nerf_moved) and not all(pose_moved)
    # trackers left their init (CMA of real kp losses, init=10)
    assert trackers[-1] != pytest.approx(10.0)


def test_snapshot_and_reset():
    """The pose snapshot refreshes at pose-turn starts (pre-update bank,
    reference set_poseopt_ckpt pose_opt.py:700-703) and reset_poseopt
    restores it."""
    cfg, setup, state, batch, ff = _build(interval=3)
    step_fn = jax.jit(make_train_step(setup))

    snaps, banks_pre = [], []
    for s in range(K):
        banks_pre.append(np.asarray(state['pose_params']['bones']).copy())
        state, _ = step_fn(state, batch, jax.random.PRNGKey(s))
        snaps.append(np.asarray(state['pose_snapshot']['bones']).copy())

    expected = np.asarray(banks_pre[0]).copy()
    saw_refresh = False
    for s in range(K):
        if bool(FF.snapshot_gate(ff, s + 1)):
            expected = banks_pre[s]
            saw_refresh = True
        np.testing.assert_array_equal(snaps[s], expected,
                                      err_msg=f'snapshot at step {s}')
    assert saw_refresh, 'no pose-turn start inside the window'

    # reset restores the snapshot exactly
    assert np.abs(np.asarray(state['pose_params']['bones']) -
                  snaps[-1]).max() > 0
    restored = FF.reset_poseopt(state['pose_params'],
                                state['pose_snapshot'])
    np.testing.assert_array_equal(np.asarray(restored['bones']), snaps[-1])


def test_flipflop_cli(tmp_path):
    """--opt_pose_flipflop is reachable from the training CLI."""
    from anerf_tpu.utils.config import load_config
    from run_train import train

    make_synthetic_h5(str(tmp_path / 'synthetic.h5'), n_frames=6,
                      H=24, W=24)
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'synthetic_tiny.txt'))
    cfg.basedir = str(tmp_path / 'logs')
    cfg.datadir = str(tmp_path / 'synthetic.h5')
    cfg.n_iters = 6
    cfg.num_workers = 1
    cfg.opt_pose_flipflop = True
    cfg.opt_pose_interval = 2
    cfg.opt_pose_reset = True
    state = train(cfg)
    assert int(state['step']) == 6
    assert 'kp_tracker' in state
    logdir = os.path.join(cfg.basedir, cfg.expname)
    metrics = os.path.join(logdir, 'metrics.jsonl')
    with open(metrics) as f:
        recs = [json.loads(l) for l in f]
    assert any('kp_tracker_mean' in r for r in recs)
