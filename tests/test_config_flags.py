"""Tests for the formerly-dead config flags (VERDICT round-1 item 6):
normalize_cutoff, fix_layer, testopt, init_poseopt/no_poseopt_reload,
strict config parsing."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from anerf_tpu.ops.embedding import EmbedConfig, embed
from anerf_tpu.training.trainer import init_train_state, make_train_step
from anerf_tpu.utils.config import Config, parse_config_txt

from test_trainer import make_setup_and_batch, tiny_config


# --- normalize_cutoff ------------------------------------------------------

def test_normalize_cutoff_unit_groups():
    """Each 3-channel feature group is L2-normalized; groups whose
    window weight vanished are zeroed (the intent of reference
    cutoff_embedder.py:161-170, whose own branch is unreachable via a
    kwargs-name mismatch at raycasters.py:31-34 and crashes when forced)."""
    J, F = 6, 3
    rng = np.random.RandomState(0)
    x = rng.uniform(0.05, 0.4, size=(4, 5, J)).astype(np.float32)
    x[..., 3:] = 9.0   # far joints: window ~ 0
    cutoff = np.full(J, 0.5, np.float32)
    cfg = EmbedConfig(input_dims=J, num_freqs=F, cutoff=True,
                      cutoff_inputs=True, cutoff_dim=J, normalize=True)
    out, w = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.asarray(2000.))
    assert out.shape == (4, 5, (1 + 2 * F) * J)
    g = np.asarray(out).reshape(4, 5, 1 + 2 * F, J // 3, 3)
    norms = np.linalg.norm(g, axis=-1)
    # near-joint groups: unit norm; far-joint groups: exactly zero
    np.testing.assert_allclose(norms[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(norms[..., 1], 0.0, atol=1e-6)


def test_normalize_cutoff_view_broadcast_path():
    """Per-ray inputs with per-sample windows still normalize correctly
    (the lazy-broadcast fast path is bypassed)."""
    J, D, F = 4, 3, 2
    C = J * D
    rng = np.random.RandomState(1)
    x = rng.normal(size=(5, 1, C)).astype(np.float32)
    dists = rng.uniform(0.05, 0.4, size=(5, 7, J)).astype(np.float32)
    cfg = EmbedConfig(input_dims=C, num_freqs=F, cutoff=True,
                      dist_inputs=True, cutoff_inputs=True, cutoff_dim=J,
                      normalize=True)
    out, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(dists),
                   cutoff_dist=jnp.asarray(np.full(J, 0.5, np.float32)),
                   tau=jnp.asarray(20.))
    assert out.shape == (5, 7, (1 + 2 * F) * C)
    norms = np.linalg.norm(np.asarray(out).reshape(5, 7, -1, 3), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


# --- fix_layer -------------------------------------------------------------

def test_fix_layer_freezes_trunk_layers():
    cfg = tiny_config(finetune=True, fix_layer=1, lrate=5e-3)
    setup, batch, _ = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0))
    # bias the density head up so the relu isn't dead at init and the
    # trunk actually receives gradient
    for net in ('coarse', 'fine'):
        state['params'][net]['alpha_linear']['b'] = \
            state['params'][net]['alpha_linear']['b'] + 1.0
    step = jax.jit(make_train_step(setup))
    p0 = jax.tree_util.tree_map(np.asarray, state['params']['coarse'])
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    p1 = state['params']['coarse']
    # layer 0 frozen bit-exact; layer 1 moved
    np.testing.assert_array_equal(np.asarray(p1['pts_linears'][0]['w']),
                                  p0['pts_linears'][0]['w'])
    assert np.abs(np.asarray(p1['pts_linears'][1]['w'])
                  - p0['pts_linears'][1]['w']).max() > 0


# --- testopt ---------------------------------------------------------------

def test_testopt_freezes_nerf_refines_pose():
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.0,
                      testopt=True, perturb=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    w0 = np.asarray(state['params']['coarse']['rgb_linear']['w']).copy()
    b0 = np.asarray(state['pose_params']['bones']).copy()
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(state['params']['coarse']['rgb_linear']['w']), w0)
    assert np.abs(np.asarray(state['pose_params']['bones']) - b0).max() > 0


# --- opt_pose_joint (FlipFlop joint scheduler through the trainer) ---------

def test_opt_pose_joint_fires_on_flipflop_gates():
    """--opt_pose_joint routes pose updates through the FlipFlop joint
    gates (reference PoseOptFlipFlop opt_pose_joint path,
    pose_opt.py:676-727): NeRF steps every iter, the pose Adam fires
    every opt_pose_step iters inside the warmup/stop window."""
    # softplus density: the tiny seed leaves the coarse net's relu
    # density fully dead at init (all sigma<0 -> legitimately zero
    # NeRF gradients), which would make the movement asserts vacuous
    cfg = tiny_config(opt_pose=True, opt_pose_step=2, opt_pose_coef=0.1,
                      opt_pose_joint=True, perturb=0.,
                      density_type='softplus')
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    w0 = np.asarray(state['params']['coarse']['rgb_linear']['w']).copy()
    b0 = np.asarray(state['pose_params']['bones']).copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # step 0 -> reference iter 1: 1 % 2 != 0, pose bank must not move
    np.testing.assert_array_equal(
        np.asarray(state['pose_params']['bones']), b0)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # iter 2: pose fires on the accumulated gradient
    assert np.abs(np.asarray(state['pose_params']['bones']) - b0).max() > 0
    # NeRF stepped every iteration throughout
    assert np.abs(np.asarray(
        state['params']['coarse']['rgb_linear']['w']) - w0).max() > 0


# --- init_poseopt / no_poseopt_reload / use_ckpt_anchor --------------------

def test_pose_payload_roundtrip_and_no_reload(tmp_path):
    from anerf_tpu.training.checkpoint import (load_checkpoint,
                                               load_pose_payload,
                                               restore_train_state,
                                               save_checkpoint,
                                               save_pose_checkpoint)
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    step = jax.jit(make_train_step(setup))
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    anchors = setup.anchors
    save_checkpoint(str(tmp_path), state, 2, anchors=anchors)
    save_pose_checkpoint(str(tmp_path), state, 2, anchors=anchors)

    # init_poseopt source: pose-only checkpoint restores the bank
    payload = load_pose_payload(str(tmp_path / 'pose_ckpt_00000002.msgpack'))
    np.testing.assert_allclose(np.asarray(payload['pose_params']['bones']),
                               np.asarray(state['pose_params']['bones']))
    assert 'anchors' in payload

    # no_poseopt_reload: full restore keeps the fresh (data) bank
    fresh = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    ckpt = load_checkpoint(str(tmp_path / 'ckpt_00000002.msgpack'))
    restored, s = restore_train_state(fresh, ckpt, no_poseopt_reload=True)
    assert s == 2
    np.testing.assert_allclose(
        np.asarray(restored['pose_params']['bones']),
        np.asarray(fresh['pose_params']['bones']))
    # ...but the NeRF weights come from the checkpoint
    np.testing.assert_allclose(
        np.asarray(restored['params']['coarse']['rgb_linear']['w']),
        np.asarray(state['params']['coarse']['rgb_linear']['w']))


# --- strict config parsing ---------------------------------------------------

def test_parse_config_unknown_key_raises(tmp_path):
    p = tmp_path / 'c.txt'
    p.write_text('netwidth = 64\nnot_a_flag = 3\n')
    with pytest.raises(ValueError, match='not_a_flag'):
        parse_config_txt(str(p))
    assert parse_config_txt(str(p), allow_unknown=True) == {'netwidth': 64}


def test_parse_config_bad_value_raises(tmp_path):
    p = tmp_path / 'c.txt'
    p.write_text('lrate = fast\n')
    with pytest.raises(ValueError, match='lrate'):
        parse_config_txt(str(p))


def test_dead_reference_flags_guarded():
    with pytest.raises(ValueError, match='weight_decay'):
        Config(weight_decay=1e-4)
    with pytest.raises(NotImplementedError, match='nerf_type'):
        Config(nerf_type='minerf')
    with pytest.warns(UserWarning, match='NO consumer'):
        Config(fg_ratio=1.0)


def test_reference_recipe_configs_still_parse():
    import glob
    for path in glob.glob('/root/repo/configs/*.txt'):
        kwargs = parse_config_txt(path)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            cfg = Config(**kwargs)
        assert cfg.nerf_type == 'nerf'


# --- SMPL-param pose eval (VERDICT item 7) ----------------------------------

def test_pose_metrics_from_smpl_params():
    from anerf_tpu.eval.metrics import pose_metrics_from_smpl_params, \
        procrustes
    from anerf_tpu.ops.fk import fk
    from anerf_tpu.skeleton import SMPL_REST_POSE
    rng = np.random.RandomState(0)
    rest = (SMPL_REST_POSE * 0.0022).astype(np.float32)
    bones = rng.normal(scale=0.2, size=(4, 24, 3)).astype(np.float32)
    pelvis = rng.normal(scale=0.01, size=(4, 3)).astype(np.float32)
    kps, _, _, _ = fk(jnp.asarray(bones), jnp.asarray(pelvis),
                      jnp.asarray(rest))
    gt = np.asarray(kps)

    # exact params -> ~0 errors, full pck/auc
    m = pose_metrics_from_smpl_params(gt, bones, pelvis=pelvis,
                                      rest_pose=rest)
    assert m['mpjpe'] < 1e-2 and m['pa_mpjpe'] < 1e-2
    assert m['pck@150'] == 1.0 and m['auc'] > 0.96

    # rigid-transformed gt: PA-MPJPE stays ~0, MPJPE does not
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    gt_rot = gt @ R.T + np.array([0.05, -0.02, 0.01], np.float32)
    m2 = pose_metrics_from_smpl_params(gt_rot, bones, pelvis=pelvis,
                                       rest_pose=rest)
    assert m2['pa_mpjpe'] < 1e-2
    assert m2['mpjpe'] > 1.0

    # golden: pa_mpjpe equals a hand-computed per-frame procrustes mean
    gt_noisy = gt + rng.normal(scale=0.002, size=gt.shape).astype(np.float32)
    m3 = pose_metrics_from_smpl_params(gt_noisy, bones, pelvis=pelvis,
                                       rest_pose=rest)
    pred = np.asarray(kps)
    manual = np.mean([np.linalg.norm(procrustes(p, g), axis=-1).mean() * 0
                      + np.linalg.norm(procrustes(p, g) - g, axis=-1).mean()
                      for p, g in zip(pred, gt_noisy)]) * 1000.
    np.testing.assert_allclose(m3['pa_mpjpe'], manual, rtol=1e-6)
