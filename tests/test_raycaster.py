"""End-to-end tests for the functional raycaster."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from anerf_tpu.models.factory import (build_raycast_config,
                                      init_raycaster_params, embed_state)
from anerf_tpu.models.nerf_mlp import count_params, nerf_forward
from anerf_tpu.models.raycaster import render_rays, render_pts_density
from anerf_tpu.ops.fk import fk
from anerf_tpu.skeleton import SMPL_REST_POSE
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.utils.config import Config


def surreal_like_config(**kw):
    base = dict(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                use_viewdirs=True, multires=7, multires_views=4,
                N_samples=14, N_importance=6, N_rand=32,
                opt_framecode=True, ext_scale=0.001)
    base.update(kw)
    return Config(**base)


def make_scene(n_rays=8, seed=0):
    rng = np.random.RandomState(seed)
    bones = rng.normal(scale=0.2, size=(1, 24, 3)).astype(np.float32)
    pelvis = np.zeros((1, 3), np.float32)
    kps, skts, l2ws, rots = fk(jnp.asarray(bones), jnp.asarray(pelvis),
                               jnp.asarray(SMPL_REST_POSE * 0.001 * 2.2))
    cyls = get_kp_bounding_cylinder(np.asarray(kps), ext_scale=0.001,
                                    head='-y')
    rays_o = np.tile(np.array([[0., 0., 3.]], np.float32), (n_rays, 1))
    t = np.linspace(-0.1, 0.1, n_rays, dtype=np.float32)
    rays_d = np.stack([t, t * 0.5, -np.ones_like(t)], -1)
    pose = {
        'kps': jnp.broadcast_to(kps, (n_rays, 24, 3)),
        'skts': jnp.broadcast_to(skts, (n_rays, 24, 4, 4)),
        'bones': jnp.broadcast_to(jnp.asarray(bones), (n_rays, 24, 3)),
        'cyls': jnp.broadcast_to(jnp.asarray(cyls), (n_rays, 5)),
    }
    return jnp.asarray(rays_o), jnp.asarray(rays_d), pose


def test_config_dims_match_reference_surreal():
    """Widths must match the reference SURREAL setup: kp 24*(1+14)=360,
    bones 72 (identity, multires_bones=0), views 72*(1+8)=648."""
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=9)
    assert rc.nerf.input_ch == 360
    assert rc.nerf.input_ch_bones == 72
    assert rc.nerf.input_ch_views == 648
    assert rc.nerf.dnet_input == 432
    assert rc.nerf.vnet_input == 648 + 16 + 256


def test_param_count_matches_reference_magnitude():
    """The reference prints ~0.5M params/net (raycasters.py:179)."""
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=9)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    n = count_params(params['coarse'])
    assert 0.4e6 < n < 1.2e6


def test_render_rays_shapes_and_finite():
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=4)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    rays_o, rays_d, pose = make_scene(8)
    state = embed_state(cfg, rc, 0)
    out = jax.jit(
        lambda p, ro, rd: render_rays(
            rc, p, ro, rd, 0.1, 8.0, pose, state,
            cam_idxs=jnp.zeros(8, jnp.int32), rng=jax.random.PRNGKey(1))
    )(params, rays_o, rays_d)
    assert out['rgb_map'].shape == (8, 3)
    assert out['rgb0'].shape == (8, 3)
    assert out['acc_map'].shape == (8,)
    assert out['alpha'].shape == (8, rc.N_samples + rc.N_importance)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f'{k} not finite'


def test_render_rays_deterministic_eval():
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=4).eval_variant()
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    rays_o, rays_d, pose = make_scene(6)
    state = embed_state(cfg, rc, 10000)
    f = lambda: render_rays(rc, params, rays_o, rays_d, 0.1, 8.0, pose,
                            state, cam_idxs=-jnp.ones(6, jnp.int32))
    a = np.asarray(f()['rgb_map'])
    b = np.asarray(f()['rgb_map'])
    np.testing.assert_array_equal(a, b)


def test_gradients_flow_to_pose_through_render():
    """The A-NeRF signature property: photometric loss backprops through
    the FK chain into bones/pelvis (reference SURVEY §3.4)."""
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=4).eval_variant()
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    rays_o, rays_d, _ = make_scene(4)
    rng = np.random.RandomState(0)
    bones = jnp.asarray(rng.normal(scale=0.2, size=(1, 24, 3)).astype(
        np.float32))
    pelvis = jnp.zeros((1, 3))
    state = embed_state(cfg, rc, 0)

    def loss(bones, pelvis):
        kps, skts, l2ws, rots = fk(bones, pelvis,
                                   jnp.asarray(SMPL_REST_POSE * 0.0022))
        cyl = jnp.asarray([[0., 0., 1.2, 1.6, -1.6]])
        pose = {
            'kps': jnp.broadcast_to(kps, (4, 24, 3)),
            'skts': jnp.broadcast_to(skts, (4, 24, 4, 4)),
            'bones': jnp.broadcast_to(bones, (4, 24, 3)),
            'cyls': jnp.broadcast_to(cyl, (4, 5)),
        }
        out = render_rays(rc, params, rays_o, rays_d, 0.1, 8.0, pose, state,
                          cam_idxs=jnp.zeros(4, jnp.int32))
        return jnp.mean((out['rgb_map'] - 0.5) ** 2) + \
            jnp.mean((out['rgb0'] - 0.5) ** 2)

    gb, gp = jax.grad(loss, argnums=(0, 1))(bones, pelvis)
    gb, gp = np.asarray(gb), np.asarray(gp)
    assert np.isfinite(gb).all() and np.isfinite(gp).all()
    assert np.abs(gb).max() > 0, 'no gradient reached the bones'
    assert np.abs(gp).max() > 0, 'no gradient reached the pelvis'


def test_single_net_mode():
    cfg = surreal_like_config(single_net=True)
    rc = build_raycast_config(cfg, n_framecodes=4)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    assert params['fine'] is None
    rays_o, rays_d, pose = make_scene(4)
    state = embed_state(cfg, rc, 0)
    out = render_rays(rc, params, rays_o, rays_d, 0.1, 8.0, pose, state,
                      cam_idxs=jnp.zeros(4, jnp.int32),
                      rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out['rgb_map'])).all()


def test_mlp_matches_torch_oracle():
    """Lock the MLP architecture against an independently-built torch
    replica with copied weights."""
    import torch
    import torch.nn as tnn

    cfg = surreal_like_config(opt_framecode=False)
    rc = build_raycast_config(cfg, n_framecodes=0)
    params = init_raycaster_params(jax.random.PRNGKey(3), rc, cfg)
    ncfg = rc.nerf

    class TorchNeRF(tnn.Module):
        def __init__(self):
            super().__init__()
            layers = [tnn.Linear(ncfg.dnet_input, 256)]
            for i in range(7):
                inp = 256 + ncfg.dnet_input if i == 4 else 256
                layers.append(tnn.Linear(inp, 256))
            self.pts = tnn.ModuleList(layers)
            self.alpha = tnn.Linear(256, 1)
            self.feat = tnn.Linear(256, 256)
            self.views = tnn.Linear(ncfg.vnet_input, 128)
            self.rgb = tnn.Linear(128, 3)

        def forward(self, xp, xv):
            h = xp
            for i, l in enumerate(self.pts):
                h = torch.relu(l(h))
                if i == 4:
                    h = torch.cat([xp, h], -1)
            a = self.alpha(h)
            f = self.feat(h)
            hv = torch.relu(self.views(torch.cat([f, xv], -1)))
            return torch.cat([self.rgb(hv), a], -1)

    tm = TorchNeRF()
    with torch.no_grad():
        p = params['coarse']
        for i, l in enumerate(tm.pts):
            l.weight.copy_(torch.from_numpy(
                np.asarray(p['pts_linears'][i]['w']).T))
            l.bias.copy_(torch.from_numpy(np.asarray(p['pts_linears'][i]['b'])))
        for tl, key in [(tm.alpha, 'alpha_linear'), (tm.feat, 'feature_linear'),
                        (tm.views, 'views_linear'), (tm.rgb, 'rgb_linear')]:
            tl.weight.copy_(torch.from_numpy(np.asarray(p[key]['w']).T))
            tl.bias.copy_(torch.from_numpy(np.asarray(p[key]['b'])))

    rng = np.random.RandomState(7)
    xp = rng.normal(size=(10, ncfg.dnet_input)).astype(np.float32)
    xv = rng.normal(size=(10, ncfg.input_ch_views)).astype(np.float32)
    ours = np.asarray(nerf_forward(params['coarse'], ncfg, jnp.asarray(xp),
                                   jnp.asarray(xv)))
    ref = tm(torch.from_numpy(xp), torch.from_numpy(xv)).detach().numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_render_pts_density():
    cfg = surreal_like_config()
    rc = build_raycast_config(cfg, n_framecodes=4)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    _, _, pose = make_scene(1)
    pose1 = {k: v[:1] for k, v in pose.items()}
    pts = jnp.asarray(np.random.RandomState(0).normal(
        scale=0.5, size=(50, 1, 3)).astype(np.float32))
    sigma = render_pts_density(rc, params, pts, pose1)
    assert sigma.shape == (50, 1, 1)
    assert np.isfinite(np.asarray(sigma)).all()
