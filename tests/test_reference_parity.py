"""Parity harness against the ACTUAL reference code (/root/reference).

The north-star checks from BASELINE.md: rendered pixels, pixel gradients
(MLP parameters) and pose gradients (through the FK + inverse chain)
must allclose against the reference run with its own deterministic
``pytest=True`` sampling hooks (ray_utils.py:171-180,240-244,
nerf.py:178-182, threaded through raycasters.py:361-474).

The reference modules are imported directly (see ref_oracle.py); nothing
is restated.  Weights are initialized on our side and injected into the
reference's NeRF modules, so any architectural or math divergence shows
up as a numeric diff.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

import ref_oracle
from anerf_tpu.models.factory import (build_raycast_config,
                                      init_raycaster_params, embed_state)
from anerf_tpu.models.raycaster import render_rays
from anerf_tpu.ops.fk import fk
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.ops.embedding import EmbedConfig, embed
from anerf_tpu.skeleton import SMPL_REST_POSE
from anerf_tpu.training.pose_opt import pose_fk
from anerf_tpu.utils.config import Config

N_RAYS, N_FRAMES = 12, 3
NS, NI = 14, 6
NEAR, FAR = 0.1, 8.0
T = torch.from_numpy


class Setup:
    """Both sides of the parity harness, same weights, same scene."""

    def __init__(self, tmpdir, raw_noise_std=0.0, n_rays=N_RAYS,
                 ns=NS, ni=NI, netwidth=64, mlp_backend='xla',
                 compute_dtype='float32'):
        self.n_rays, self.ns, self.ni = n_rays, ns, ni
        self.cfg = Config(
            use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
            use_viewdirs=True, multires=7, multires_views=4,
            N_samples=ns, N_importance=ni, N_rand=n_rays,
            netwidth=netwidth, netdepth=8, opt_framecode=True,
            ext_scale=0.001, mlp_backend=mlp_backend,
            compute_dtype=compute_dtype,
            perturb=1.0, raw_noise_std=raw_noise_std)
        self.rc = build_raycast_config(self.cfg, n_framecodes=N_FRAMES)
        self.params = init_raycaster_params(jax.random.PRNGKey(3), self.rc,
                                            self.cfg)
        # bias the density head up so compositing has real signal
        for net in ('coarse', 'fine'):
            self.params[net]['alpha_linear']['b'] = \
                self.params[net]['alpha_linear']['b'] + 1.0

        self.rest_pose = SMPL_REST_POSE.astype(np.float32)
        args = ref_oracle.ref_args(str(tmpdir), netwidth=netwidth,
                                   netdepth=8,
                                   N_samples=ns, N_importance=ni,
                                   perturb=1.0, raw_noise_std=raw_noise_std)
        self.caster, self.rkt = ref_oracle.build_ref_raycaster(
            args, N_FRAMES, self.rest_pose, near=NEAR, far=FAR)
        ref_oracle.copy_params_to_ref_nerf(self.params['coarse'],
                                           self.caster.network)
        ref_oracle.copy_params_to_ref_nerf(self.params['fine'],
                                           self.caster.network_fine)

        rng = np.random.RandomState(0)
        self.bones = rng.normal(scale=0.2,
                                size=(N_FRAMES, 24, 3)).astype(np.float32)
        self.pelvis = rng.normal(scale=0.02,
                                 size=(N_FRAMES, 3)).astype(np.float32)
        kps, skts, _, _ = fk(jnp.asarray(self.bones),
                             jnp.asarray(self.pelvis),
                             jnp.asarray(self.rest_pose))
        self.kps, self.skts = np.asarray(kps), np.asarray(skts)
        self.cyls = get_kp_bounding_cylinder(
            self.kps, ext_scale=0.001, head='-y').astype(np.float32)

        self.kp_idx = rng.randint(0, N_FRAMES, size=(n_rays,))
        self.rays_o = np.tile(np.array([[0., 0., 3.]], np.float32),
                              (n_rays, 1))
        t = np.linspace(-0.12, 0.12, n_rays, dtype=np.float32)
        self.rays_d = np.stack([t, t * 0.5, -np.ones_like(t)], -1)
        self.cam_idxs = self.kp_idx.astype(np.int32)
        self.target = rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)

        self.u_c = ref_oracle.pytest_uniforms((n_rays, ns))
        self.u_f = ref_oracle.pytest_uniforms((n_rays, ni))
        self.raw_noise_std = raw_noise_std
        self.fixed = {'coarse_u': jnp.asarray(self.u_c),
                      'fine_u': jnp.asarray(self.u_f)}
        if raw_noise_std > 0:
            self.fixed['coarse_noise'] = jnp.asarray(
                ref_oracle.pytest_uniforms((n_rays, ns)) * raw_noise_std)
            self.fixed['fine_noise'] = jnp.asarray(
                ref_oracle.pytest_uniforms((n_rays, ns + ni)) *
                raw_noise_std)

    # ---- reference side -------------------------------------------------
    def ref_render(self, kps=None, skts=None, bones=None):
        viewdirs = self.rays_d / np.linalg.norm(self.rays_d, axis=-1,
                                                keepdims=True)
        ray_batch = np.concatenate(
            [self.rays_o, self.rays_d,
             np.full((self.n_rays, 1), NEAR, np.float32),
             np.full((self.n_rays, 1), FAR, np.float32), viewdirs],
            -1).astype(np.float32)
        return self.caster.render_rays(
            T(ray_batch), self.ns,
            T(self.kps[self.kp_idx]) if kps is None else kps,
            skts=T(self.skts[self.kp_idx]) if skts is None else skts,
            cyls=T(self.cyls[self.kp_idx]),
            bones=T(self.bones[self.kp_idx]) if bones is None else bones,
            cams=T(self.cam_idxs.astype(np.float32)),
            lindisp=False, perturb=1.0, N_importance=self.ni,
            raw_noise_std=self.raw_noise_std, ray_noise_std=0.,
            pytest=True, preproc_kwargs=self.rkt['preproc_kwargs'])

    # ---- our side --------------------------------------------------------
    def our_render(self, params=None, pose=None):
        if pose is None:
            pose = {'kps': jnp.asarray(self.kps[self.kp_idx]),
                    'skts': jnp.asarray(self.skts[self.kp_idx]),
                    'bones': jnp.asarray(self.bones[self.kp_idx]),
                    'cyls': jnp.asarray(self.cyls[self.kp_idx])}
        return render_rays(
            self.rc, self.params if params is None else params,
            jnp.asarray(self.rays_o), jnp.asarray(self.rays_d),
            NEAR, FAR, pose, embed_state(self.cfg, self.rc, 0),
            cam_idxs=jnp.asarray(self.cam_idxs), fixed=self.fixed)


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    return Setup(tmp_path_factory.mktemp('parity'))


def test_forward_pixel_parity(setup):
    """Rendered pixels / disparity / opacity match the reference
    RayCaster.render_rays (raycasters.py:361-474) bit-tight at f32."""
    ref_out = {k: v.detach().numpy() for k, v in setup.ref_render().items()}
    ours = {k: np.asarray(v) for k, v in setup.our_render().items()}
    assert float(np.abs(ref_out['acc_map']).max()) > 0.5  # non-trivial scene
    for k in ['rgb_map', 'disp_map', 'acc_map', 'alpha',
              'rgb0', 'disp0', 'acc0', 'alpha0']:
        np.testing.assert_allclose(ours[k], ref_out[k], atol=2e-5,
                                   err_msg=k)


def test_forward_pixel_parity_with_noise(tmp_path):
    """Density-noise path: the reference pytest-mode noise
    (nerf.py:178-182) pinned through our ``fixed`` hooks."""
    s = Setup(tmp_path, raw_noise_std=1.0)
    ref_out = {k: v.detach().numpy() for k, v in s.ref_render().items()}
    ours = {k: np.asarray(v) for k, v in s.our_render().items()}
    for k in ['rgb_map', 'acc_map', 'alpha', 'rgb0']:
        np.testing.assert_allclose(ours[k], ref_out[k], atol=2e-5,
                                   err_msg=k)


def _loss_ref(out, target):
    t = T(target)
    return ((out['rgb_map'] - t) ** 2).mean() + \
        ((out['rgb0'] - t) ** 2).mean()


def test_gradient_parity_mlp_params(setup):
    """Pixel-loss gradients on every MLP weight match the reference's
    autograd through render_rays + raw2outputs."""
    setup.caster.zero_grad()
    loss = _loss_ref(setup.ref_render(), setup.target)
    loss.backward()
    ref_gc = ref_oracle.ref_grads_to_pytree(setup.caster.network)
    ref_gf = ref_oracle.ref_grads_to_pytree(setup.caster.network_fine)

    def loss_fn(params):
        out = setup.our_render(params=params)
        t = jnp.asarray(setup.target)
        return jnp.mean((out['rgb_map'] - t) ** 2) + \
            jnp.mean((out['rgb0'] - t) ** 2)

    grads = jax.grad(loss_fn)(setup.params)

    for ref_g, ours_g in [(ref_gc, grads['coarse']),
                          (ref_gf, grads['fine'])]:
        flat_r, _ = jax.tree_util.tree_flatten(ref_g)
        flat_o, _ = jax.tree_util.tree_flatten(
            {k: ours_g[k] for k in ref_g})
        assert len(flat_r) == len(flat_o)
        for r, o in zip(flat_r, flat_o):
            r, o = np.asarray(r), np.asarray(o)
            scale = max(np.abs(r).max(), 1e-8)
            np.testing.assert_allclose(o, r, atol=5e-4 * scale + 1e-9)
    # gradients are non-trivial
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree_util.tree_leaves(grads['coarse']))
    assert total > 0


def test_gradient_parity_pose(setup, tmp_path):
    """THE A-NeRF property: photometric-loss gradients on per-frame pose
    parameters (pelvis + axis-angle bones) through bones -> rots -> FK
    -> skts = inverse(l2ws) -> encodings, vs the reference
    PoseOptLayer.calculate_kinematic (pose_opt.py:372-445).  Our closed-
    form rigid inverse must produce the same gradients as the
    reference's torch.inverse."""
    ref = ref_oracle.load_reference()
    popt = ref.pose_opt.PoseOptLayer(
        T(self_kps := setup.kps.copy()), T(setup.bones.copy()),
        T(setup.rest_pose[None].copy()))
    kp, bone, skts_t, l2ws, rots = popt(setup.kp_idx)
    setup.caster.zero_grad()
    out = setup.ref_render(kps=kp, skts=skts_t, bones=bone)
    loss = _loss_ref(out, setup.target)
    loss.backward()
    ref_g_pelvis = popt.pelvis.grad.detach().numpy()
    ref_g_bones = popt.bones.grad.detach().numpy()

    pose_params = {'pelvis': jnp.asarray(self_kps[:, 0]),
                   'bones': jnp.asarray(setup.bones)}

    def loss_fn(pose_params):
        kps, bones_g, skts, _, _ = pose_fk(pose_params,
                                           jnp.asarray(setup.kp_idx),
                                           jnp.asarray(setup.rest_pose))
        pose = {'kps': kps, 'skts': skts, 'bones': bones_g,
                'cyls': jnp.asarray(setup.cyls[setup.kp_idx])}
        out = setup.our_render(pose=pose)
        t = jnp.asarray(setup.target)
        return jnp.mean((out['rgb_map'] - t) ** 2) + \
            jnp.mean((out['rgb0'] - t) ** 2)

    grads = jax.grad(loss_fn)(pose_params)
    g_pelvis = np.asarray(grads['pelvis'])
    g_bones = np.asarray(grads['bones'])

    assert np.abs(ref_g_bones).max() > 0
    scale_b = np.abs(ref_g_bones).max()
    scale_p = np.abs(ref_g_pelvis).max()
    np.testing.assert_allclose(g_bones, ref_g_bones,
                               atol=1e-3 * scale_b)
    np.testing.assert_allclose(g_pelvis, ref_g_pelvis,
                               atol=1e-3 * scale_p)


# ---------------------------------------------------------------------------
# Cutoff embedder: every flag combo, reference get_embedder as oracle
# ---------------------------------------------------------------------------

COMBOS = [
    # (name, dist_inputs, cutoff_inputs, cut_to, shift, freq_sched, nfreq, C)
    ('kp_default', False, True, False, False, False, 7, 24),
    ('kp_no_cutoff_inputs', False, False, False, False, False, 7, 24),
    ('kp_cut_to_dist', False, True, True, False, False, 7, 24),
    ('kp_shift', False, True, False, True, False, 7, 24),
    ('kp_shift_and_cut', False, True, True, True, False, 7, 24),
    ('view_like', True, True, False, False, False, 4, 72),
    ('bone_like_dist', True, False, False, False, False, 2, 72),
    ('freq_schedule', False, True, False, False, True, 7, 24),
    ('freq_schedule_dist', True, True, False, False, True, 4, 72),
]


@pytest.mark.parametrize('name,dist_inputs,cutoff_inputs,cut_to,shift,'
                         'fsched,nfreq,C',
                         COMBOS, ids=[c[0] for c in COMBOS])
def test_cutoff_embedder_parity(name, dist_inputs, cutoff_inputs, cut_to,
                                shift, fsched, nfreq, C):
    """Our embed() vs the reference CutoffEmbedder._embed
    (cutoff_embedder.py:111-174) for each flag combination reachable
    from the config surface."""
    ref = ref_oracle.load_reference()
    J = 24
    cutoff_kwargs = {
        'cutoff': True, 'normalize_cutoff': False, 'cutoff_dist': 0.5,
        'cutoff_inputs': cutoff_inputs, 'opt_cutoff': False,
        'cutoff_dim': J, 'dist_inputs': dist_inputs,
        'freq_schedule': fsched, 'init_alpha': 0.,
        'cut_to_cutoff': cut_to, 'shift_inputs': shift,
    }
    embedder, out_dim = ref.cutoff_embedder.get_embedder(
        nfreq, 0, input_dims=C, cutoff_kwargs=cutoff_kwargs)
    alpha_val = None
    if fsched:
        alpha_val = 1.7
        embedder.sched_alpha = torch.tensor(alpha_val)

    cfg = EmbedConfig(input_dims=C, num_freqs=nfreq, cutoff=True,
                      dist_inputs=dist_inputs, cutoff_inputs=cutoff_inputs,
                      cut_to_cutoff=cut_to, shift_inputs=shift,
                      freq_schedule=fsched, init_alpha=0., cutoff_dim=J)
    assert cfg.out_dim == out_dim

    rng = np.random.RandomState(5)
    R, S = 6, 5
    if dist_inputs and cutoff_inputs:
        # per-ray inputs broadcast against per-sample windows (our view-PE
        # layout; the reference broadcasts inside the `embedded * w` mul)
        x = rng.normal(size=(R, 1, C)).astype(np.float32)
    elif dist_inputs:
        # without cutoff_inputs the reference torch.cat's the raw-input row
        # against the windowed bands (cutoff_embedder.py:156-157), which
        # requires per-sample inputs — as bone inputs are in practice.
        x = rng.normal(size=(R, S, C)).astype(np.float32)
    else:
        x = rng.uniform(0.01, 1.2, size=(R, S, C)).astype(np.float32)
    dists = rng.uniform(0.01, 1.2, size=(R, S, J)).astype(np.float32)
    cutoff = np.full((J,), 0.5, np.float32)

    ref_out, ref_w = embedder(T(x), dists=T(dists))
    ours, w = embed(jnp.asarray(x), cfg, dists=jnp.asarray(dists),
                    cutoff_dist=jnp.asarray(cutoff),
                    tau=jnp.asarray(20.),
                    alpha=None if alpha_val is None
                    else jnp.asarray(alpha_val))
    ref_np = ref_out.detach().numpy()
    ours_np = np.asarray(jnp.broadcast_to(
        ours, ref_np.shape))  # per-ray view PE broadcasts over samples
    np.testing.assert_allclose(ours_np, ref_np, atol=3e-6)


def test_plain_embedder_parity():
    """Plain PE (reference Embedder, cutoff_embedder.py:9-58)."""
    ref = ref_oracle.load_reference()
    embedder, out_dim = ref.cutoff_embedder.get_embedder(
        5, 0, input_dims=24, cutoff_kwargs={'cutoff': False})
    cfg = EmbedConfig(input_dims=24, num_freqs=5, cutoff=False)
    assert cfg.out_dim == out_dim
    x = np.random.RandomState(2).normal(size=(7, 3, 24)).astype(np.float32)
    ref_out, _ = embedder(T(x))
    ours, _ = embed(jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-6)


def test_sample_pdf_oracle():
    """Inverse-CDF sampling vs the reference's sample_pdf
    (ray_utils.py:157-201) under its pytest determinism."""
    ref = ref_oracle.load_reference()
    from anerf_tpu.ops.rays import sample_pdf
    rng = np.random.RandomState(1)
    bins = np.sort(rng.uniform(0, 4, size=(9, 13)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(9, 12)).astype(np.float32)
    ref_s = ref.ray_utils.sample_pdf(T(bins), T(weights), 8,
                                     det=False, pytest=True).numpy()
    u = ref_oracle.pytest_uniforms((9, 8))
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 8,
                                 u=jnp.asarray(u)))
    np.testing.assert_allclose(ours, ref_s, atol=1e-5)


# ---------------------------------------------------------------------------
# Flagship-recipe parity: 8x256 MLP, 64+16 samples, 128 rays
# (configs/surreal/surreal.txt settings, reference raycasters.py:361-474)
# -- f32/XLA, f32/Pallas (interpret), and bf16 with a measured bound.
# ---------------------------------------------------------------------------

FLAG_KEYS = ['rgb_map', 'disp_map', 'acc_map', 'alpha',
             'rgb0', 'disp0', 'acc0', 'alpha0']


@pytest.fixture(scope='module')
def setup_flagship(tmp_path_factory):
    return Setup(tmp_path_factory.mktemp('flagship'), n_rays=128,
                 ns=64, ni=16, netwidth=256)


@pytest.fixture(scope='module')
def ref_flagship_out(setup_flagship):
    return {k: v.detach().numpy()
            for k, v in setup_flagship.ref_render().items()}


def test_flagship_forward_pixel_parity(setup_flagship, ref_flagship_out):
    """f32 forward at the SURREAL recipe scale, tight tolerance."""
    ours = {k: np.asarray(v) for k, v in setup_flagship.our_render().items()}
    assert float(np.abs(ref_flagship_out['acc_map']).max()) > 0.5
    for k in FLAG_KEYS:
        np.testing.assert_allclose(ours[k], ref_flagship_out[k], atol=3e-5,
                                   err_msg=k)


def test_flagship_gradient_parity(setup_flagship):
    """MLP parameter gradients at flagship scale."""
    setup_flagship.caster.zero_grad()
    loss = _loss_ref(setup_flagship.ref_render(), setup_flagship.target)
    loss.backward()
    ref_gc = ref_oracle.ref_grads_to_pytree(setup_flagship.caster.network)
    ref_gf = ref_oracle.ref_grads_to_pytree(
        setup_flagship.caster.network_fine)

    def loss_fn(params):
        out = setup_flagship.our_render(params=params)
        t = jnp.asarray(setup_flagship.target)
        return jnp.mean((out['rgb_map'] - t) ** 2) + \
            jnp.mean((out['rgb0'] - t) ** 2)

    grads = jax.grad(loss_fn)(setup_flagship.params)
    for ref_g, ours_g in [(ref_gc, grads['coarse']),
                          (ref_gf, grads['fine'])]:
        flat_r, _ = jax.tree_util.tree_flatten(ref_g)
        flat_o, _ = jax.tree_util.tree_flatten(
            {k: ours_g[k] for k in ref_g})
        for r, o in zip(flat_r, flat_o):
            r, o = np.asarray(r), np.asarray(o)
            scale = max(np.abs(r).max(), 1e-8)
            np.testing.assert_allclose(o, r, atol=1e-3 * scale + 1e-9)


def test_flagship_pallas_interpret_parity(tmp_path, setup_flagship,
                                          ref_flagship_out):
    """The fused encode+MLP Pallas kernel (ops/pallas_encmlp.py) checked
    against the REFERENCE, not just our XLA path: mlp_backend='pallas'
    runs the kernel in interpret mode on CPU
    (pallas_encmlp.py:658-659)."""
    s = setup_flagship
    cfg = Config(**{**s.cfg.__dict__, 'mlp_backend': 'pallas'})
    rc = build_raycast_config(cfg, n_framecodes=N_FRAMES)
    assert rc.mlp_backend == 'pallas'
    from anerf_tpu.ops import pallas_encmlp as PE
    assert PE.supported_config(rc)
    pose = {'kps': jnp.asarray(s.kps[s.kp_idx]),
            'skts': jnp.asarray(s.skts[s.kp_idx]),
            'bones': jnp.asarray(s.bones[s.kp_idx]),
            'cyls': jnp.asarray(s.cyls[s.kp_idx])}
    ours = render_rays(rc, s.params, jnp.asarray(s.rays_o),
                       jnp.asarray(s.rays_d), NEAR, FAR, pose,
                       embed_state(cfg, rc, 0),
                       cam_idxs=jnp.asarray(s.cam_idxs), fixed=s.fixed)
    for k in FLAG_KEYS:
        np.testing.assert_allclose(np.asarray(ours[k]),
                                   ref_flagship_out[k], atol=2e-4,
                                   err_msg=k)


def test_flagship_bf16_error_bound(setup_flagship, ref_flagship_out):
    """The bench recipe trains in bfloat16 (bench.py): measure and pin
    the bf16 forward error against the f32 reference.  bf16 has 8
    mantissa bits (~0.4% relative); through the 8-layer MLP and
    compositing the observed rgb error is <~2e-2 absolute.  This test
    documents that bound and fails if it ever regresses."""
    s = setup_flagship
    cfg = Config(**{**s.cfg.__dict__, 'compute_dtype': 'bfloat16'})
    rc = build_raycast_config(cfg, n_framecodes=N_FRAMES)
    assert rc.nerf.compute_dtype == jnp.bfloat16
    pose = {'kps': jnp.asarray(s.kps[s.kp_idx]),
            'skts': jnp.asarray(s.skts[s.kp_idx]),
            'bones': jnp.asarray(s.bones[s.kp_idx]),
            'cyls': jnp.asarray(s.cyls[s.kp_idx])}
    ours = render_rays(rc, s.params, jnp.asarray(s.rays_o),
                       jnp.asarray(s.rays_d), NEAR, FAR, pose,
                       embed_state(cfg, rc, 0),
                       cam_idxs=jnp.asarray(s.cam_idxs), fixed=s.fixed)
    rgb_err = float(np.abs(np.asarray(ours['rgb_map'], np.float32)
                           - ref_flagship_out['rgb_map']).max())
    acc_err = float(np.abs(np.asarray(ours['acc_map'], np.float32)
                           - ref_flagship_out['acc_map']).max())
    assert rgb_err < 2e-2, f'bf16 rgb error bound regressed: {rgb_err}'
    assert acc_err < 2e-2, f'bf16 acc error bound regressed: {acc_err}'
    # and bf16 is actually in play (error above f32 round-off)
    assert rgb_err > 1e-5
