"""Tests for the render engine, pose generators, mesh, metrics, ckpts."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anerf_tpu.models.factory import (build_raycast_config, embed_state,
                                      init_raycaster_params)
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.ops.fk import get_smpl_l2ws_np
from anerf_tpu.render import poses as pose_gen
from anerf_tpu.render.mesh import (extract_mesh, marching_tetrahedra,
                                   rasterize_mesh, save_ply, load_ply)
from anerf_tpu.render.renderer import ImageRenderer, kp_to_valid_rays
from anerf_tpu.skeleton import SMPL_REST_POSE
from anerf_tpu.eval.metrics import (evaluate_images, pose_metrics, psnr,
                                    ssim)
from anerf_tpu.utils.config import Config


def small_cfg():
    return Config(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                  use_viewdirs=True, multires=3, multires_views=2,
                  netdepth=2, netwidth=16, N_samples=8, N_importance=4,
                  opt_framecode=False, ext_scale=0.001)


@pytest.fixture(scope='module')
def scene():
    rng = np.random.RandomState(0)
    rest = SMPL_REST_POSE * 0.0022
    bones = rng.normal(scale=0.1, size=(2, 24, 3)).astype(np.float32)
    l2ws = np.stack([get_smpl_l2ws_np(b, rest) for b in bones])
    kps = l2ws[..., :3, 3].astype(np.float32)
    skts = np.linalg.inv(l2ws).astype(np.float32)
    cyls = get_kp_bounding_cylinder(kps, ext_scale=0.001, head='-y')
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.7
    cfg = small_cfg()
    rc = build_raycast_config(cfg)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    state = embed_state(cfg, rc, 5000)
    return dict(rest=rest, bones=bones, kps=kps, skts=skts, cyls=cyls,
                c2w=c2w, cfg=cfg, rc=rc, params=params, state=state)


def test_kp_to_valid_rays(scene):
    rays, valid_idxs, cyl_params, bboxes = kp_to_valid_rays(
        [scene['c2w']], 32, 32, 20.0, kps=scene['kps'][:1], ext_scale=0.001)
    assert len(rays) == 1
    ro, rd = rays[0]
    assert ro.shape == rd.shape
    assert len(valid_idxs[0]) == len(ro)
    assert 0 < len(ro) <= 32 * 32
    (tl, br) = bboxes[0]
    assert (br >= tl).all()


def test_render_image(scene):
    r = ImageRenderer(scene['rc'], scene['params'], scene['state'],
                      chunk=256, near=0.1, far=6.0)
    out = r.render_image(24, 24, 18.0, scene['c2w'], scene['kps'][0],
                         scene['skts'][0], scene['bones'][0],
                         bg=np.full((24, 24, 3), 0.3, np.float32))
    assert out['rgb'].shape == (24, 24, 3)
    assert np.isfinite(out['rgb']).all()
    assert out['acc'].shape == (24, 24)
    # outside the bbox, image is pure background
    mask = np.zeros((24, 24), bool)
    tl, br = out['bbox']
    mask[tl[1]:br[1], tl[0]:br[0]] = True
    np.testing.assert_allclose(out['rgb'][~mask], 0.3, atol=1e-6)


def test_render_path_and_eval(scene):
    r = ImageRenderer(scene['rc'], scene['params'], scene['state'],
                      chunk=256, near=0.1, far=6.0)
    rd = {'hwf': (np.array([24, 24]), np.array([24, 24]),
                  np.array([18.0, 18.0])),
          'c2ws': np.stack([scene['c2w']] * 2),
          'kp3d': scene['kps'], 'skts': scene['skts'],
          'bones': scene['bones'], 'cyls': scene['cyls']}
    out = r.render_path(rd, ext_scale=0.001)
    assert out['rgbs'].shape == (2, 24, 24, 3)
    metrics = evaluate_images(out['rgbs'], out['rgbs'],
                              bboxes=out['bboxes'])
    assert metrics['psnr'][0] > 100  # identical images
    assert metrics['ssim'][0] > 0.99


def test_bullet_time_generator(scene):
    out = pose_gen.load_bullettime(scene['kps'], scene['bones'],
                                   np.stack([scene['c2w']] * 2),
                                   20.0, scene['rest'],
                                   selected_idxs=[0], n_bullet=4)
    assert out['c2ws'].shape == (4, 4, 4)
    assert out['kp3d'].shape == (4, 24, 3)
    assert out['skts'].shape == (4, 24, 4, 4)
    # subject centered: root at origin-ish for all views
    np.testing.assert_allclose(
        out['kp3d'][:, 0],
        np.broadcast_to(out['kp3d'][0, 0], (4, 3)), atol=1e-5)
    # orbit preserves distance to origin
    d = np.linalg.norm(out['c2ws'][:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, d[0], rtol=1e-5)


def test_interpolate_generator(scene):
    out = pose_gen.load_interpolate(scene['kps'], scene['bones'],
                                    np.stack([scene['c2w']] * 2), 20.0,
                                    scene['rest'], selected_idxs=[0, 1],
                                    n_step=5)
    assert len(out['kp3d']) == 6  # 5 interp + final
    np.testing.assert_allclose(out['bones'][0], scene['bones'][0], atol=1e-6)
    np.testing.assert_allclose(out['bones'][-1], scene['bones'][1],
                               atol=1e-6)


def test_animate_generator(scene):
    out = pose_gen.load_animate(scene['kps'], scene['bones'],
                                np.stack([scene['c2w']] * 2), 20.0,
                                scene['rest'], selected_idxs=[0, 1],
                                joints=[16, 18, 20], n_step=3)
    # non-animated joints stay at first pose
    n = len(out['bones'])
    np.testing.assert_allclose(
        out['bones'][:, 1],
        np.broadcast_to(scene['bones'][0, 1], (n, 3)), atol=1e-6)


def test_bubble_and_poserot_and_selected(scene):
    c2ws = np.stack([scene['c2w']] * 2)
    out = pose_gen.load_bubble(scene['kps'], scene['bones'], c2ws, 20.0,
                               scene['rest'], [0], n_step=3)
    assert out['c2ws'].shape == (3, 4, 4)
    out = pose_gen.load_pose_rotate(scene['kps'], scene['bones'], c2ws,
                                    np.array([20., 20.]), scene['rest'],
                                    np.array([0]), n_bullet=6)
    assert len(out['kp3d']) == 6
    out = pose_gen.load_selected(scene['kps'], scene['bones'], c2ws,
                                 np.array([20., 20.]), scene['rest'],
                                 np.array([1]))
    np.testing.assert_allclose(out['kp3d'][0], scene['kps'][1], atol=1e-5)


def test_marching_tetrahedra_sphere():
    # sphere SDF-ish density: inside = high
    n = 24
    t = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(t, t, t, indexing='ij')
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    sigma = 100. * (0.6 - r)
    verts, faces = marching_tetrahedra(sigma, threshold=0.,
                                       origin=np.array([-1., -1., -1.]),
                                       spacing=2. / (n - 1))
    assert len(verts) > 100 and len(faces) > 100
    rad = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(rad.mean(), 0.6, atol=0.05)
    assert rad.std() < 0.02


def test_extract_mesh_and_ply_roundtrip(scene, tmp_path):
    from anerf_tpu.render.mesh import extract_density_grid
    pose = {'kps': jnp.asarray(scene['kps'][:1]),
            'skts': jnp.asarray(scene['skts'][:1]),
            'bones': jnp.asarray(scene['bones'][:1])}
    sigma = extract_density_grid(scene['rc'], scene['params'], pose,
                                 radius=1.0, res=12, state=scene['state'])
    assert sigma.shape == (13, 13, 13)
    # pick a threshold guaranteed to cut the (untrained) field
    thr = float(np.median(sigma))
    verts, faces = extract_mesh(scene['rc'], scene['params'], pose,
                                radius=1.0, res=12, threshold=thr,
                                state=scene['state'])
    assert len(verts) > 0 and len(faces) > 0
    p = str(tmp_path / 'mesh.ply')
    save_ply(p, verts, faces)
    v2, f2 = load_ply(p)
    assert v2.shape == verts.shape
    np.testing.assert_allclose(v2, verts, atol=1e-5)


def test_rasterize_mesh():
    # single triangle facing the camera
    verts = np.array([[-.5, -.5, 0.], [.5, -.5, 0.], [0., .5, 0.]])
    faces = np.array([[0, 1, 2]])
    img = rasterize_mesh(verts, faces, H=32, W=32)
    assert img.shape == (32, 32, 3)
    assert (img != 1.).any()  # something was drawn


def test_psnr_ssim_basics():
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert psnr(a, a) > 100
    assert abs(ssim(a, a) - 1.0) < 1e-9
    noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    assert 15 < psnr(noisy, a) < 30
    assert ssim(noisy, a) < 0.99


def test_pose_metrics():
    rng = np.random.RandomState(0)
    gt = rng.normal(size=(4, 24, 3))
    # pred = similarity-transformed gt -> PA-MPJPE ~ 0
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    pred = 1.3 * gt @ R.T + np.array([0.1, -0.2, 0.3])
    m = pose_metrics(pred, gt, scale_to_mm=1000.)
    assert m['pa_mpjpe'] < 1e-6
    assert m['mpjpe'] > 10
    assert m['auc'] > 0.9


def test_checkpoint_roundtrip(tmp_path, scene):
    from anerf_tpu.skeleton import SMPLSkeleton
    from anerf_tpu.training import pose_opt as P
    from anerf_tpu.training.checkpoint import (latest_checkpoint,
                                               load_checkpoint,
                                               restore_train_state,
                                               save_checkpoint)
    from anerf_tpu.training.trainer import TrainSetup, init_train_state

    cfg = small_cfg()
    cfg.opt_pose = True
    rc = build_raycast_config(cfg)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=SMPLSkeleton,
                       rest_pose=jnp.asarray(scene['rest']),
                       anchors=P.make_anchors(scene['kps'], scene['bones']))
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=scene['kps'],
                             init_bones=scene['bones'])
    state['step'] = jnp.asarray(123, jnp.int32)
    logdir = str(tmp_path / 'logs')
    save_checkpoint(logdir, state, 123)
    path = latest_checkpoint(logdir)
    assert path is not None
    ckpt = load_checkpoint(path)
    fresh = init_train_state(setup, jax.random.PRNGKey(1),
                             init_kp3d=scene['kps'] + 1,
                             init_bones=scene['bones'] + 1)
    restored, step = restore_train_state(fresh, ckpt)
    assert step == 123
    np.testing.assert_allclose(
        np.asarray(restored['params']['coarse']['rgb_linear']['w']),
        np.asarray(state['params']['coarse']['rgb_linear']['w']))
    np.testing.assert_allclose(np.asarray(restored['pose_params']['bones']),
                               scene['bones'], atol=1e-6)
    # finetune: weights restored, step reset
    restored_ft, step_ft = restore_train_state(fresh, ckpt, finetune=True)
    assert step_ft == 0


def test_torch_tar_import(tmp_path, scene):
    """Write a reference-layout torch .tar and read it back."""
    import torch
    from anerf_tpu.training.checkpoint import load_torch_checkpoint

    cfg = small_cfg()
    cfg.netdepth, cfg.netwidth = 8, 32
    rc = build_raycast_config(cfg)
    D, W = cfg.netdepth, cfg.netwidth
    din = rc.nerf.dnet_input

    def lin(i, o):
        return {'weight': torch.randn(o, i), 'bias': torch.randn(o)}

    sd = {}
    in_dim = din
    for i in range(D):
        layer = lin(in_dim, W)
        sd[f'pts_linears.{i}.weight'] = layer['weight']
        sd[f'pts_linears.{i}.bias'] = layer['bias']
        in_dim = W + din if i == 4 else W
    for name, i, o in [('alpha_linear', W, 1), ('feature_linear', W, W),
                       ('views_linears.0', rc.nerf.vnet_input, W // 2),
                       ('rgb_linear', W // 2, 3)]:
        layer = lin(i, o)
        sd[f'{name}.weight'] = layer['weight']
        sd[f'{name}.bias'] = layer['bias']

    path = str(tmp_path / 'ref.tar')
    torch.save({
        'global_step': 150000,
        'network_fn_state_dict': sd,
        'network_fine_state_dict': sd,
        'embed_state_dict': {'cutoff_dist': torch.full((24,), 0.5)},
        'poseopt_layer_state_dict': {
            'pelvis': torch.randn(3, 3),
            'bones': torch.randn(3, 24, 3),
            'rest_pose': torch.tensor(scene['rest']),
        },
    }, path)

    loaded = load_torch_checkpoint(path)
    assert loaded['global_step'] == 150000
    p = loaded['params']['coarse']
    assert p['pts_linears'][0]['w'].shape == (din, W)
    assert p['pts_linears'][5]['w'].shape == (W + din, W)
    np.testing.assert_allclose(p['rgb_linear']['w'],
                               sd['rgb_linear.weight'].numpy().T)
    assert loaded['params']['cutoff_dist'].shape == (24,)
    assert loaded['pose_params']['bones'].shape == (3, 24, 3)

    # and the imported params drive our forward pass
    from anerf_tpu.models.nerf_mlp import nerf_forward
    x = jnp.zeros((2, rc.nerf.dnet_input))
    v = jnp.zeros((2, rc.nerf.input_ch_views))
    out = nerf_forward(
        {k: (v if k != 'fine' else None) for k, v in p.items()} if False
        else p, rc.nerf, x, v)
    assert out.shape == (2, 4)


def test_overlay_mesh_composites():
    """Software replacement for the pyrender overlay
    (reference core/misc/renderer.py)."""
    import numpy as np
    from anerf_tpu.render.mesh import overlay_mesh, rasterize_mesh
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32) * 0.3
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    img = np.zeros((64, 64, 3), np.float32)
    c2w = np.eye(4)
    c2w[2, 3] = 2.0
    out = overlay_mesh(img, verts, faces, c2w, focal=60.)
    assert out.shape == (64, 64, 3)
    cov = (out.sum(-1) > 0).mean()
    assert 0.0 < cov < 0.5            # mesh visible, image not wiped
    _, mask = rasterize_mesh(verts, faces, 64, 64, c2w=c2w, focal=60.,
                             return_mask=True)
    assert mask.any()
    # untouched pixels keep the original image
    assert (out[~mask] == 0.).all()
    # principal point defaults to (W/2, H/2): the origin-adjacent mesh seen
    # by a camera on the +z axis must land near the image center, not the
    # top-left corner (regression for the shadowed-`center` bug).
    ys, xs = np.nonzero(mask)
    assert 16 < xs.mean() < 48 and 16 < ys.mean() < 48
    # an explicit principal point shifts the projection accordingly
    _, mask_pp = rasterize_mesh(verts, faces, 64, 64, c2w=c2w, focal=60.,
                                center=np.array([48., 32.]),
                                return_mask=True)
    ys2, xs2 = np.nonzero(mask_pp)
    assert xs2.mean() > xs.mean() + 8
    assert abs(ys2.mean() - ys.mean()) < 2


def test_render_catalog_structure():
    """init_catalog mirrors the reference's curated entries
    (run_render.py:301-471)."""
    from anerf_tpu.render.catalog import init_catalog, resolve_entry
    cat = init_catalog(data_root='data')
    assert set(cat) == {'h36m', 'surreal', 'perfcap', 'mixamo',
                        'neuralbody'}
    assert set(cat['h36m']) == {'S9', 'S11', 'gt_to_mask_map'}
    assert set(cat['mixamo']) == {'james', 'archer'}
    assert len(cat['neuralbody']) == 8

    ent = resolve_entry('surreal/easy', 'bullet', catalog=cat)
    assert ent['data_h5'] == 'data/surreal/surreal_train_h5py.h5'
    np.testing.assert_array_equal(
        ent['selected_idxs'], [10, 70, 350, 420, 490, 910, 980, 1050])
    assert ent['n_bullet'] == 10

    ent = resolve_entry('h36m/S9', 'animate', catalog=cat)
    assert ent['refined'].endswith('h36m/s9_sub64_500k.tar')
    assert ent['joints'] == [17, 19, 21, 23]
    assert ent['center_cam'] and ent['center_kps']

    ent = resolve_entry('perfcap/nadia', 'val', catalog=cat)
    assert len(ent['selected_idxs']) == 327

    import pytest
    with pytest.raises(KeyError, match='dataset'):
        resolve_entry('nope/easy', 'bullet', catalog=cat)
    with pytest.raises(KeyError, match='entry'):
        resolve_entry('surreal/nope', 'bullet', catalog=cat)
    with pytest.raises(KeyError, match='bullet'):
        resolve_entry('surreal/val', 'bullet', catalog=cat)
    with pytest.raises(KeyError, match='dataset/entry'):
        resolve_entry('surreal', 'bullet', catalog=cat)


def test_find_idxs_with_map():
    from anerf_tpu.render.catalog import find_idxs_with_map
    idx_map = np.array([5, 9, 20, 78, 140])
    out = find_idxs_with_map(np.array([20, 78, 999]), idx_map)
    np.testing.assert_array_equal(out, [2, 3])   # 999 dropped
    np.testing.assert_array_equal(
        find_idxs_with_map(np.array([1, 2]), None), [1, 2])


def test_framecode_mixing(scene):
    """framecode_select dispatch + the interpolate-render consumer
    (reference Optcodes 2-idx lerp, embedding.py:24-28)."""
    from anerf_tpu.models.nerf_mlp import (framecode_lerp, framecode_lookup,
                                           framecode_select)
    from anerf_tpu.models.raycaster import render_rays

    codes = jnp.asarray(np.random.RandomState(3).normal(
        size=(4, 6)).astype(np.float32))
    # int path == lookup; (R,3) path == lerp with matching endpoints
    idx = jnp.asarray([0, 2, -1], jnp.int32)
    np.testing.assert_allclose(framecode_select(codes, idx),
                               framecode_lookup(codes, idx))
    mix = jnp.asarray([[0., 2., 0.], [0., 2., 1.], [1., 3., 0.25]],
                      jnp.float32)
    got = framecode_select(codes, mix)
    np.testing.assert_allclose(got[0], codes[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], codes[2], rtol=1e-6)
    np.testing.assert_allclose(
        got[2], framecode_lerp(codes, jnp.asarray(1), jnp.asarray(3),
                               jnp.asarray(0.25)), rtol=1e-6)

    # end-to-end: a (R,3) w=0 mix renders identically to the int index
    cfg = small_cfg()
    cfg = type(cfg)(**{**cfg.__dict__, 'opt_framecode': True})
    rc = build_raycast_config(cfg, n_framecodes=4)
    params = init_raycaster_params(jax.random.PRNGKey(1), rc, cfg)
    est = embed_state(cfg, rc, 5000)
    R = 4
    rays_o = jnp.asarray(np.tile([[0., 0., 2.7]], (R, 1)), jnp.float32)
    rays_d = jnp.asarray(np.random.RandomState(0).normal(
        size=(R, 3)).astype(np.float32))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pose = {'kps': jnp.asarray(np.tile(scene['kps'][:1], (R, 1, 1))),
            'skts': jnp.asarray(np.tile(scene['skts'][:1], (R, 1, 1, 1))),
            'bones': jnp.asarray(np.tile(scene['bones'][:1], (R, 1, 1))),
            'cyls': jnp.asarray(np.tile(scene['cyls'][:1], (R, 1)))}
    rc_ev = rc.eval_variant()
    out_int = render_rays(rc_ev, params, rays_o, rays_d, 0., 1., pose, est,
                          cam_idxs=jnp.full((R,), 2, jnp.int32))
    out_mix = render_rays(rc_ev, params, rays_o, rays_d, 0., 1., pose, est,
                          cam_idxs=jnp.broadcast_to(
                              jnp.asarray([2., 0., 0.], jnp.float32),
                              (R, 3)))
    np.testing.assert_allclose(out_mix['rgb_map'], out_int['rgb_map'],
                               atol=1e-6)
    # and a genuinely mixed render differs from both endpoints
    out_half = render_rays(rc_ev, params, rays_o, rays_d, 0., 1., pose, est,
                           cam_idxs=jnp.broadcast_to(
                               jnp.asarray([2., 0., 0.5], jnp.float32),
                               (R, 3)))
    assert not np.allclose(out_half['rgb_map'], out_int['rgb_map'])


def test_interpolate_generator_mix_framecodes(scene):
    out = pose_gen.load_interpolate(scene['kps'], scene['bones'],
                                    np.stack([scene['c2w']] * 2), 20.0,
                                    scene['rest'], selected_idxs=[0, 1],
                                    n_step=5, mix_framecodes=True)
    cam = out['cam_idxs']
    assert cam.shape == (6, 3)
    np.testing.assert_allclose(cam[0], [0, 1, 0.0])
    np.testing.assert_allclose(cam[4], [0, 1, 0.8])
    np.testing.assert_allclose(cam[5], [1, 1, 0.0])
