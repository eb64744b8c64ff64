"""Fused encode+MLP kernel parity vs the unfused (XLA) path, through
the full render_rays pipeline (interpret mode on CPU)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anerf_tpu import testing_utils as T
from anerf_tpu.models import raycaster as rcm
from anerf_tpu.models.factory import build_raycast_config, embed_state, \
    init_raycaster_params
from anerf_tpu.ops import pallas_encmlp as PE
from anerf_tpu.skeleton import SMPLSkeleton


def build(n_rays=8, **over):
    cfg = T.surreal_config(N_rand=n_rays, **over)
    rest, bones, pelvis, kps, skts, cyls = T.synthetic_pose(
        4, ext_scale=cfg.ext_scale)
    rc = build_raycast_config(cfg, n_framecodes=4)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg,
                                   SMPLSkeleton)
    batch = T.synthetic_batch(n_rays, 4, kps, skts, bones, cyls)
    est = embed_state(cfg, rc, 10000)
    pose = {'kps': batch['kps'], 'skts': batch['skts'],
            'bones': batch['bones'], 'cyls': batch['cyls']}
    return rc, params, batch, est, pose


def render(rc, params, batch, est, pose, backend, **rc_over):
    rc2 = dataclasses.replace(rc, mlp_backend=backend, **rc_over)
    return rcm.render_rays(
        rc2, params, batch['rays_o'], batch['rays_d'], 0.0, 1.0, pose,
        est, cam_idxs=batch['cam_idxs'], rng=jax.random.PRNGKey(1))


def test_supported_config_flagship():
    rc, *_ = build()
    assert PE.supported_config(rc)


def test_fused_matches_xla_forward():
    rc, params, batch, est, pose = build()
    a = render(rc, params, batch, est, pose, 'xla')
    b = render(rc, params, batch, est, pose, 'pallas')
    for k in ('rgb_map', 'acc_map', 'rgb0', 'acc0', 'disp_map'):
        ref, got = np.asarray(a[k]), np.asarray(b[k])
        scale = np.abs(ref).max() + 1e-6
        # measured max rel error is ~3e-4 (the two backends share the
        # bf16 quantization chain; residual is accumulation order)
        assert np.max(np.abs(ref - got)) < 1e-3 * scale, (
            k, np.max(np.abs(ref - got)), scale)


def test_viewfac_matches_default_forward():
    """rc.viewfac=True (per-ray view factorization) must reproduce the
    DENSE fused forward at bf16-level tolerance: the factorized form
    is algebraically identical but never materializes the bf16-rounded
    xv, so the two chains differ only in quantization points.

    The dense baseline must be forced explicitly: Config.viewfac
    defaults to True since round 5, so a bare render already runs the
    factorized path and the comparison would be vacuous (caught by the
    round-5 code review — the measured dense-vs-factorized deviation
    is ~1.2e-4, well inside the bars below)."""
    rc, params, batch, est, pose = build()
    a = render(rc, params, batch, est, pose, 'pallas', viewfac=False)
    b = render(rc, params, batch, est, pose, 'pallas', viewfac=True)
    assert any(not np.array_equal(np.asarray(a[k]), np.asarray(b[k]))
               for k in ('rgb_map', 'rgb0')), \
        'viewfac did not engage — comparison is vacuous'
    for k in ('rgb_map', 'acc_map', 'rgb0', 'acc0', 'disp_map'):
        ref, got = np.asarray(a[k]), np.asarray(b[k])
        scale = np.abs(ref).max() + 1e-6
        # density path is untouched (acc/disp agree to f32 level); the
        # rgb path differs by one bf16 rounding of the views operand
        tol = 1e-5 if k in ('acc_map', 'acc0', 'disp_map') else 2e-2
        assert np.max(np.abs(ref - got)) < tol * scale, (
            k, np.max(np.abs(ref - got)), scale)


def test_fuse_tform_matches_default():
    """rc.fuse_tform (in-kernel rigid transform via the per-ray affine
    p = A + z*B) must reproduce the default fused path: the same math,
    merely reassociated — W(o + z d) + t vs W p + t — so forward and
    gradients agree to f32 reassociation noise.

    The flag is an OPT-IN measured rejection on v5e (BASELINE.md round
    5: train 118-120k vs 125.5k rays/s across three kernel
    formulations; eval statistically tied at +0.5-1%), kept because
    the parity is proven and other TPU generations may price the
    VPU/DMA trade differently.
    """
    rc, params, batch, est, pose = build()
    a = render(rc, params, batch, est, pose, 'pallas')
    b = render(rc, params, batch, est, pose, 'pallas', fuse_tform=True)
    for k in ('rgb_map', 'acc_map', 'rgb0', 'acc0', 'disp_map'):
        ref, got = np.asarray(a[k]), np.asarray(b[k])
        scale = np.abs(ref).max() + 1e-6
        assert np.max(np.abs(ref - got)) < 1e-4 * scale, (
            k, np.max(np.abs(ref - got)), scale)

    def gradset(**over):
        l = _grad_fn(dataclasses.replace(rc, **over), params, batch,
                     est, pose)
        return jax.grad(l, argnums=(1, 2))('pallas', params,
                                           pose['skts'])

    la, _ = jax.tree_util.tree_flatten(gradset())
    lb, _ = jax.tree_util.tree_flatten(gradset(fuse_tform=True))
    for a, b in zip(la, lb):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na = np.linalg.norm(a)
        if na < 1e-12:
            continue
        cos = a @ b / (na * np.linalg.norm(b) + 1e-30)
        assert cos > 0.9999, cos
        assert abs(np.linalg.norm(b) / na - 1) < 5e-3


def test_fuse_tform_ray_noise_gate():
    """ray_noise is a per-POINT 3D jitter, so points leave the ray and
    the z-affine identity breaks — the raycaster must fall back to the
    materialized-transform path (exact equality with fuse_tform off,
    same rng)."""
    rc, params, batch, est, pose = build()
    a = render(rc, params, batch, est, pose, 'pallas',
               ray_noise_std=0.01)
    b = render(rc, params, batch, est, pose, 'pallas',
               ray_noise_std=0.01, fuse_tform=True)
    for k in ('rgb_map', 'acc_map', 'rgb0'):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_viewfac_cost_gate():
    """The per-kernel cost gate engages the factorization exactly where
    it wins (J*(nblkJ+tile) < 0.9*S*nblkJ): coarse S=64/tile-512 yes;
    fine S=16 and eval tile-1024 no (measured losers, BASELINE.md r5)."""
    rc, params, batch, est, pose = build()
    rc = dataclasses.replace(rc, viewfac=True)
    R = 32   # big enough that the tile-shrink loop keeps tile 1024

    def gate(S, tile):
        pts_t = jnp.zeros((R, S, 3 * rc.n_joints))
        built = PE._build_call(rc, pts_t, jnp.zeros((R, 72)),
                               params['cutoff_dist'], 100.0, None,
                               None, tile, cm=True)
        assert built is not None
        return built[1].viewfac

    assert gate(64, 512)          # coarse train kernels: 0.67x MACs
    assert not gate(16, 512)      # fine-16 pass: rptJ 768 > nblkJ 648
    assert not gate(64, 1024)     # eval tile: 0.97x — not worth it
    # rc.viewfac=False never engages regardless of shape
    rc_off = dataclasses.replace(rc, viewfac=False)
    pts_t = jnp.zeros((R, 64, 72))
    built = PE._build_call(rc_off, pts_t, jnp.zeros((R, 72)),
                           params['cutoff_dist'], 100.0, None,
                           None, 512, cm=True)
    assert not built[1].viewfac


def test_viewfac_matches_default_gradients():
    """TRAIN-path parity of the factorized views branch: gradients of
    the full fused fwd+bwd (dual kernel, bands stash, encode pullback)
    with rc.viewfac=True vs the default fused path.

    Justified threshold revision (VERDICT r4 #2 / BASELINE.md note):
    the factorization cannot reproduce the bf16 quantization of the
    materialized xv — it contracts the never-rounded encoding through
    f32-accumulated bf16 matmuls, making it the MORE exact chain — so
    the split-vs-fused 0.9999-cosine bar does not apply.  The deviation
    is bf16 forward noise propagating everywhere (even density-trunk
    weight grads shift, since hv_pre's rounding moves all activations);
    measured worst leaf cos 0.99946, norm ratio within 1% (round 5,
    interpret mode).  Bar set at cos > 0.998, |ratio-1| < 3%.
    """
    rc, params, batch, est, pose = build()

    def gradset(viewfac):
        rc2 = dataclasses.replace(rc, viewfac=viewfac)
        l = _grad_fn(rc2, params, batch, est, pose)
        return jax.grad(l, argnums=(1, 2))('pallas', params, pose['skts'])

    la, _ = jax.tree_util.tree_flatten(gradset(False))
    lb, _ = jax.tree_util.tree_flatten(gradset(True))
    for a, b in zip(la, lb):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na = np.linalg.norm(a)
        if na < 1e-12:
            continue
        cos = a @ b / (na * np.linalg.norm(b) + 1e-30)
        assert cos > 0.998, cos
        assert abs(np.linalg.norm(b) / na - 1) < 0.03


def _grad_fn(rc, params, batch, est, pose):
    def loss(backend, params, skts):
        p2 = dict(pose, skts=skts)
        rc2 = dataclasses.replace(rc, mlp_backend=backend)
        out = rcm.render_rays(rc2, params, batch['rays_o'],
                              batch['rays_d'], 0.0, 1.0, p2, est,
                              cam_idxs=batch['cam_idxs'],
                              rng=jax.random.PRNGKey(1))
        return (out['rgb_map'].astype(jnp.float32) ** 2).mean() + \
            (out['rgb0'].astype(jnp.float32) ** 2).mean()
    return loss


def test_fused_matches_split_pallas_gradients():
    """The fused kernel must reproduce the split-kernel pallas backend's
    gradients (same bf16-cotangent semantics) essentially exactly."""
    rc, params, batch, est, pose = build()
    loss = _grad_fn(rc, params, batch, est, pose)
    g_fused = jax.grad(loss, argnums=(1, 2))('pallas', params, pose['skts'])
    orig = PE.supported_config
    try:
        PE.supported_config = lambda rc: False   # force split-kernel path
        g_split = jax.grad(loss, argnums=(1, 2))('pallas', params,
                                                 pose['skts'])
    finally:
        PE.supported_config = orig
    la, _ = jax.tree_util.tree_flatten(g_split)
    lb, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(la, lb):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na = np.linalg.norm(a)
        if na < 1e-12:
            continue
        cos = a @ b / (na * np.linalg.norm(b) + 1e-30)
        assert cos > 0.9999, cos
        assert abs(np.linalg.norm(b) / na - 1) < 5e-3


def test_fused_matches_xla_gradient_direction():
    """vs the f32-cotangent XLA path: direction agrees (the pallas
    backends round cotangents to bf16 per layer, flash-style, so exact
    per-element equality is not expected on tiny-magnitude leaves)."""
    rc, params, batch, est, pose = build()
    loss = _grad_fn(rc, params, batch, est, pose)
    g_ref = jax.grad(loss, argnums=(1, 2))('xla', params, pose['skts'])
    g_got = jax.grad(loss, argnums=(1, 2))('pallas', params, pose['skts'])
    ref_l, _ = jax.tree_util.tree_flatten(g_ref)
    got_l, _ = jax.tree_util.tree_flatten(g_got)
    for a, b in zip(ref_l, got_l):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na = np.linalg.norm(a)
        if na < 1e-12:
            continue
        cos = a @ b / (na * np.linalg.norm(b) + 1e-30)
        assert cos > 0.98, cos
        assert abs(np.linalg.norm(b) / na - 1) < 0.1


def test_dual_matches_single_calls():
    """The dual-net kernel (shared encode) must reproduce two single-net
    fused calls: forward exactly, gradients up to the one extra f32-sum-
    before-bf16-cast of the shared encode cotangent."""
    from anerf_tpu.ops import encoders
    rc, params, batch, est, pose = build()
    skts = pose['skts']
    rays_t = encoders.transform_batch_rays(batch['rays_d'][:, None], skts)
    rays_t_norm = encoders.vec_norm(rays_t)[:, 0]
    z = jnp.linspace(0.2, 1.5, rc.N_samples)
    pts = batch['rays_o'][:, None] + batch['rays_d'][:, None] * z[None, :, None]
    cut = params['cutoff_dist']
    cam = batch['cam_idxs']

    def single(params_net, pts_t):
        return PE.nerf_encmlp_pallas(params_net, rc, pts_t, rays_t_norm,
                                     cut, 100.0, cam)

    def dual(pc, pf, pts_t):
        return PE.nerf_encmlp_dual_pallas(pc, pf, rc, pts_t, rays_t_norm,
                                          cut, 100.0, cam)

    pts_t = encoders.transform_batch_pts(pts, skts).astype(jnp.float32)
    a_c = single(params['coarse'], pts_t)
    a_f = single(params['fine'], pts_t)
    b_c, b_f = dual(params['coarse'], params['fine'], pts_t)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(b_c),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(b_f),
                               rtol=0, atol=1e-5)

    def loss_single(pc, pf, pts_t):
        return (single(pc, pts_t) ** 2).mean() + \
            (single(pf, pts_t) ** 2).mean()

    def loss_dual(pc, pf, pts_t):
        rc_, rf_ = dual(pc, pf, pts_t)
        return (rc_ ** 2).mean() + (rf_ ** 2).mean()

    g_a = jax.grad(loss_single, argnums=(0, 1, 2))(
        params['coarse'], params['fine'], pts_t)
    g_b = jax.grad(loss_dual, argnums=(0, 1, 2))(
        params['coarse'], params['fine'], pts_t)
    la, _ = jax.tree_util.tree_flatten(g_a)
    lb, _ = jax.tree_util.tree_flatten(g_b)
    for a, b in zip(la, lb):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na = np.linalg.norm(a)
        if na < 1e-12:
            assert np.linalg.norm(b) < 1e-10
            continue
        cos = a @ b / (na * np.linalg.norm(b) + 1e-30)
        assert cos > 0.9999, cos
        assert abs(np.linalg.norm(b) / na - 1) < 5e-3


def test_fallback_on_untileable_shapes():
    # 5 rays x 64 samples = 320 points: tiles to 64 (rpt=1) fine — use a
    # sample count that cannot tile instead
    rc, params, batch, est, pose = build()
    pts_t = jnp.zeros((3, 7, 24, 3))   # S=7 never divides a pow2 tile
    out = PE.nerf_encmlp_pallas(params['coarse'], rc, pts_t,
                                jnp.zeros((3, 72)),
                                params['cutoff_dist'], 100.0, None)
    assert out is None


def test_sin_recurrence_bands_numerics():
    """The double-angle recurrence reproduces direct sin/cos PE bands
    to f32 round-off across the full doubling grid, and non-doubling
    grids are refused by the guard."""
    est = PE.EncStatic(J=4, kp_freqs=tuple(float(2 ** k) for k in range(7)),
                       view_nb=3, S=2, rpt=2, has_codes=False)
    assert PE._doubling_freqs(est.kp_freqs)
    assert not PE._doubling_freqs((1.0, 2.0, 3.0))

    rng = np.random.RandomState(0)
    T, J = 4, est.J
    p = jnp.asarray(rng.uniform(-2, 2, (T, 3 * J)).astype(np.float32))
    enc = jnp.asarray(rng.normal(size=(est.rpt, est.view_nb * 3 * J))
                      .astype(np.float32))
    cutoff = jnp.full((1, J), 0.5, jnp.float32)
    tau = jnp.float32(100.)

    old = PE.SIN_RECURRENCE
    try:
        PE.SIN_RECURRENCE = True
        (_, _, _), (_, _, bands_rec, _) = PE._encode_fwd_res(
            est, p, enc, cutoff, tau)
        PE.SIN_RECURRENCE = False
        (_, _, _), (_, _, bands_sin, _) = PE._encode_fwd_res(
            est, p, enc, cutoff, tau)
    finally:
        PE.SIN_RECURRENCE = old

    # f64 oracle: [sin f d | cos f d] blocks per octave
    x, y, z = (np.asarray(p, np.float64)[:, :J],
               np.asarray(p, np.float64)[:, J:2 * J],
               np.asarray(p, np.float64)[:, 2 * J:])
    dists = np.sqrt(x * x + y * y + z * z)
    oracle = np.concatenate(
        [np.concatenate([np.sin(f * dists), np.cos(f * dists)], -1)
         for f in est.kp_freqs], -1)
    # direct-sin path: f32 sin accuracy; recurrence: ~2x error growth
    # per octave from machine eps — both well under 1e-4 at 2^6
    np.testing.assert_allclose(np.asarray(bands_sin, np.float64), oracle,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(bands_rec, np.float64), oracle,
                               atol=1e-4)
