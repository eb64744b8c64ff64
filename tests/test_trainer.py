"""Tests for the jitted train step: convergence, pose gating, sharding."""
import chex
import numpy as np
import jax
import jax.numpy as jnp

from anerf_tpu.models.factory import build_raycast_config
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.ops.fk import fk
from anerf_tpu.parallel.sharding import (make_mesh, replicate_state,
                                         shard_train_step)
from anerf_tpu.skeleton import SMPL_REST_POSE, SMPLSkeleton
from anerf_tpu.training import pose_opt as P
from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                        make_train_step)
from anerf_tpu.utils.config import Config


def tiny_config(**kw):
    base = dict(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                use_viewdirs=True, multires=4, multires_views=2,
                netdepth=2, netwidth=32,
                N_samples=8, N_importance=4, N_rand=16,
                opt_framecode=True, framecode_size=4,
                ext_scale=0.001, use_background=True,
                lrate=5e-4, raw_noise_std=0.)
    base.update(kw)
    return Config(**base)


def make_setup_and_batch(cfg, n_frames=3, n_rays=16, seed=0):
    rng = np.random.RandomState(seed)
    rest = SMPL_REST_POSE * 0.0022
    bones = rng.normal(scale=0.1, size=(n_frames, 24, 3)).astype(np.float32)
    pelvis = rng.normal(scale=0.05, size=(n_frames, 3)).astype(np.float32)
    kps, skts, _, _ = fk(jnp.asarray(bones), jnp.asarray(pelvis),
                         jnp.asarray(rest))
    cyls = get_kp_bounding_cylinder(np.asarray(kps), ext_scale=0.001,
                                    head='-y')
    rc = build_raycast_config(cfg, n_framecodes=n_frames)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=SMPLSkeleton,
                       rest_pose=jnp.asarray(rest),
                       anchors=P.make_anchors(np.asarray(kps), bones),
                       near=0.1, far=6.0)

    kp_idx = rng.randint(0, n_frames, size=(n_rays,))
    t = np.linspace(-0.05, 0.05, n_rays, dtype=np.float32)
    batch = {
        'rays_o': jnp.asarray(np.tile([[0., 0., 2.5]], (n_rays, 1))
                              .astype(np.float32)),
        'rays_d': jnp.asarray(np.stack([t, t, -np.ones_like(t)], -1)),
        'target_s': jnp.asarray(rng.uniform(0, 1, (n_rays, 3))
                                .astype(np.float32)),
        'fgs': jnp.ones((n_rays, 1)),
        'bgs': jnp.ones((n_rays, 3)) * 0.2,
        'cyls': jnp.asarray(cyls)[kp_idx],
        'kp_idx': jnp.asarray(kp_idx, jnp.int32),
        'cam_idxs': jnp.asarray(kp_idx, jnp.int32),
        'temp_val': jnp.ones((n_rays,)),
        'kps': jnp.asarray(kps)[kp_idx],
        'skts': jnp.asarray(skts)[kp_idx],
        'bones': jnp.asarray(bones)[kp_idx],
    }
    return setup, batch, (np.asarray(kps), bones)


def test_train_step_no_pose_opt_decreases_loss():
    cfg = tiny_config(lrate=5e-3, perturb=0.)
    setup, batch, _ = make_setup_and_batch(cfg)
    # constant gray target matching the background: fittable by a tiny
    # net in a few dozen steps (drive density to zero)
    batch['target_s'] = jnp.full_like(batch['target_s'], 0.6)
    batch['bgs'] = jnp.full_like(batch['bgs'], 0.6)
    state = init_train_state(setup, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(setup))
    losses = []
    for i in range(60):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(stats['total_loss']))
    assert losses[-1] < losses[0] * 0.5, losses[::20]
    assert int(state['step']) == 60


def test_train_step_with_pose_opt_updates_bank():
    cfg = tiny_config(opt_pose=True, opt_pose_step=2, opt_pose_coef=0.1,
                      opt_pose_lrate=1e-3, use_temp_loss=True,
                      temp_coef=0.01)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    b0 = np.asarray(state['pose_params']['bones']).copy()

    # step counter 0 == reference iteration 1: accumulate only — the first
    # pose step happens after opt_pose_step grads (ref trainer.py:475-477)
    state, stats = step(state, batch, jax.random.PRNGKey(1))
    b1 = np.asarray(state['pose_params']['bones'])
    np.testing.assert_array_equal(b1, b0)
    assert float(jnp.linalg.norm(state['pose_accum']['bones'])) > 0
    assert 'kp_loss' in stats and 'mpjpc' in stats

    # counter 1 (ref iter 2, 2 % 2 == 0): fires and resets the accumulator
    state, stats = step(state, batch, jax.random.PRNGKey(2))
    b2 = np.asarray(state['pose_params']['bones'])
    assert np.abs(b2 - b1).max() > 0
    np.testing.assert_allclose(
        np.asarray(state['pose_accum']['bones']), 0.)

    # counter 2 (ref iter 3): accumulate only, no pose change
    state, stats = step(state, batch, jax.random.PRNGKey(3))
    b3 = np.asarray(state['pose_params']['bones'])
    np.testing.assert_array_equal(b3, b2)
    assert float(jnp.linalg.norm(state['pose_accum']['bones'])) > 0


def test_pose_stop_freezes_bank():
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_stop=0)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    b0 = np.asarray(state['pose_params']['bones']).copy()
    for i in range(3):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(np.asarray(state['pose_params']['bones']),
                                  b0)
    # kp loss is gated to 0
    np.testing.assert_allclose(float(stats['kp_loss']), 0.)


def test_sharded_train_step_matches_single_device():
    """Ray sharding over the 8-device CPU mesh must not change the math."""
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state_a = init_train_state(setup, jax.random.PRNGKey(0),
                               init_kp3d=kps, init_bones=bones)
    state_b = jax.tree_util.tree_map(lambda x: x.copy() if x is not None
                                     else None, state_a)
    fn = make_train_step(setup)

    single = jax.jit(fn)
    state_a, stats_a = single(state_a, batch, jax.random.PRNGKey(5))

    mesh = make_mesh(8)
    state_b = replicate_state(mesh, state_b)
    sharded = shard_train_step(fn, mesh)
    state_b, stats_b = sharded(state_b, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(stats_a['total_loss']),
                               float(stats_b['total_loss']), rtol=2e-5)
    pa = np.asarray(state_a['params']['coarse']['rgb_linear']['w'])
    pb = np.asarray(state_b['params']['coarse']['rgb_linear']['w'])
    np.testing.assert_allclose(pa, pb, atol=2e-6)
    ba = np.asarray(state_a['pose_params']['bones'])
    bb = np.asarray(state_b['pose_params']['bones'])
    np.testing.assert_allclose(ba, bb, atol=2e-6)


def test_photometric_gradient_reaches_pose_bank():
    """With zero kp/temp coefs, pose grads come only through rendering —
    the core A-NeRF property."""
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.0,
                      perturb=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    b0 = np.asarray(state['pose_params']['bones']).copy()
    p0 = np.asarray(state['pose_params']['pelvis']).copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert np.abs(np.asarray(state['pose_params']['bones']) - b0).max() > 0
    assert np.abs(np.asarray(state['pose_params']['pelvis']) - p0).max() > 0


def test_global_batch_train_step_matches_single_device():
    """The multi-host input path (per-process local slices stitched into
    global sharded arrays by make_global_batch /
    jax.make_array_from_process_local_data) must reproduce single-device
    math on the 8-device CPU mesh."""
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state_a = init_train_state(setup, jax.random.PRNGKey(0),
                               init_kp3d=kps, init_bones=bones)
    state_b = jax.tree_util.tree_map(lambda x: x.copy() if x is not None
                                     else None, state_a)
    fn = make_train_step(setup)

    single = jax.jit(fn)
    state_a, stats_a = single(state_a, batch, jax.random.PRNGKey(5))

    mesh = make_mesh(8)
    state_b = replicate_state(mesh, state_b)
    sharded = shard_train_step(fn, mesh, global_batch=True)
    local = {k: np.asarray(v) for k, v in batch.items()}
    state_b, stats_b = sharded(state_b, local, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(stats_a['total_loss']),
                               float(stats_b['total_loss']), rtol=2e-5)
    pa = np.asarray(state_a['params']['coarse']['rgb_linear']['w'])
    pb = np.asarray(state_b['params']['coarse']['rgb_linear']['w'])
    np.testing.assert_allclose(pa, pb, atol=2e-6)
    ba = np.asarray(state_a['pose_params']['bones'])
    bb = np.asarray(state_b['pose_params']['bones'])
    np.testing.assert_allclose(ba, bb, atol=2e-6)


def test_init_distributed_single_process_noop():
    from anerf_tpu.parallel.sharding import init_distributed
    pidx, pcnt = init_distributed()
    assert pidx == 0 and pcnt == 1


def test_sharded_pallas_train_step_matches_xla():
    """The fused Pallas encode+MLP kernel under the 8-device mesh:
    sharding x pallas_call must compile, execute (interpret mode on
    CPU), and match the XLA backend's math — the exact interaction the
    multichip dryrun's small netwidth routes around."""
    kw = dict(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1,
              netwidth=256, multires=7, multires_views=4,
              raw_noise_std=0., perturb=0.)
    cfg_p = tiny_config(mlp_backend='pallas', **kw)
    cfg_x = tiny_config(mlp_backend='xla', **kw)
    setup_p, batch, (kps, bones) = make_setup_and_batch(cfg_p)
    setup_x, _, _ = make_setup_and_batch(cfg_x)
    assert setup_p.rc.mlp_backend == 'pallas'
    from anerf_tpu.ops import pallas_encmlp as PE
    assert PE.supported_config(setup_p.rc), \
        'flagship encoding family must route into the fused kernel'

    state_p = init_train_state(setup_p, jax.random.PRNGKey(0),
                               init_kp3d=kps, init_bones=bones)
    state_x = jax.tree_util.tree_map(lambda x: x.copy() if x is not None
                                     else None, state_p)

    fn_p = make_train_step(setup_p)
    # the kernel must actually be in the traced program
    jaxpr = str(jax.make_jaxpr(fn_p)(state_p, batch, jax.random.PRNGKey(5)))
    assert jaxpr.count('pallas_call') >= 2, 'fused kernel not engaged'

    mesh = make_mesh(8)
    state_p = replicate_state(mesh, state_p)
    sharded = shard_train_step(fn_p, mesh)
    state_p, stats_p = sharded(state_p, batch, jax.random.PRNGKey(5))

    single = jax.jit(make_train_step(setup_x))
    state_x, stats_x = single(state_x, batch, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(stats_p['total_loss']),
                               float(stats_x['total_loss']), rtol=3e-2)
    pa = np.asarray(state_p['params']['coarse']['rgb_linear']['w'])
    pb = np.asarray(state_x['params']['coarse']['rgb_linear']['w'])
    # Adam normalizes the gradient scale, so param deltas are O(lr);
    # backends share quantization chain -> tight agreement expected
    np.testing.assert_allclose(pa, pb, atol=5e-4)


def test_multi_train_step_matches_sequential():
    """make_multi_train_step(k) == k sequential train_steps with the
    same per-step rng folding: bit-equal NeRF params; the pose bank to
    f32-LSB tolerance (XLA may reassociate the one-hot merge einsums of
    compositing.raw2outputs_merged differently inside the scan body —
    measured max divergence 6e-11 on a 0.25-scale bank)."""
    from anerf_tpu.training.trainer import (make_multi_train_step,
                                            stack_batches)
    cfg = tiny_config(opt_pose=True, opt_pose_step=2, opt_pose_coef=0.1,
                      perturb=0., raw_noise_std=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state_a = init_train_state(setup, jax.random.PRNGKey(0),
                               init_kp3d=kps, init_bones=bones)
    state_b = jax.tree_util.tree_map(
        lambda x: x.copy() if x is not None else None, state_a)

    k = 3
    rng = jax.random.PRNGKey(7)
    batches = []
    for s in range(k):
        b = dict(batch)
        b['target_s'] = batch['target_s'] + 0.01 * s
        batches.append({kk: np.asarray(v) for kk, v in b.items()})

    single = jax.jit(make_train_step(setup))
    for s in range(k):
        jb = {kk: jnp.asarray(v) for kk, v in batches[s].items()}
        state_a, stats_a = single(
            state_a, jb, jax.random.fold_in(rng, state_a['step']))

    multi = jax.jit(make_multi_train_step(setup, k))
    state_b, stats_b = multi(state_b, stack_batches(batches), rng)

    assert int(state_b['step']) == int(state_a['step']) == k
    np.testing.assert_array_equal(
        np.asarray(state_a['params']['coarse']['rgb_linear']['w']),
        np.asarray(state_b['params']['coarse']['rgb_linear']['w']))
    np.testing.assert_allclose(
        np.asarray(state_a['pose_params']['bones']),
        np.asarray(state_b['pose_params']['bones']), rtol=0, atol=1e-8)
    np.testing.assert_allclose(float(stats_a['total_loss']),
                               float(stats_b['total_loss']), rtol=1e-6)


def test_multi_train_step_sharded():
    """The bundled step under the 8-device mesh (stacked batch axes:
    rays sharded on axis 1)."""
    from anerf_tpu.training.trainer import (make_multi_train_step,
                                            stack_batches)
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1,
                      perturb=0., raw_noise_std=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    mesh = make_mesh(8)
    state = replicate_state(mesh, state)
    step = shard_train_step(make_multi_train_step(setup, 2), mesh,
                            stacked=True)
    batches = stack_batches([
        {k: np.asarray(v) for k, v in batch.items()}] * 2)
    state, stats = step(state, batches, jax.random.PRNGKey(1))
    assert int(state['step']) == 2
    assert np.isfinite(float(stats['total_loss']))


def test_train_step_accepts_bank_pose_batch():
    """With opt_pose, run_train ships batches WITHOUT per-ray
    kps/skts/bones (loaders.load_data -> set_pose_per_ray: pose is
    rebuilt from the pose bank inside the step).  The step must accept
    the trimmed schema and match the full-schema step bit-for-bit."""
    from anerf_tpu import testing_utils as T
    setup, state, batch, step = T.build_flagship(
        n_rays=32, n_frames=4, opt_pose=True, netwidth=32, netdepth=2,
        N_samples=6, N_importance=4, multires=3, multires_views=2)
    step = jax.jit(make_train_step(setup))
    rng = jax.random.PRNGKey(3)
    trimmed = {k: v for k, v in batch.items()
               if k not in ('kps', 'skts', 'bones')}
    s1, st1 = step(state, batch, rng)
    s2, st2 = step(state, trimmed, rng)
    assert float(st1['total_loss']) == float(st2['total_loss'])
    chex.assert_trees_all_equal(s1['params'], s2['params'])
    chex.assert_trees_all_equal(s1['pose_params'], s2['pose_params'])
