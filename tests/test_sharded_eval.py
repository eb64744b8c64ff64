"""Mesh-sharded eval path: sharded renders equal single-device renders.

The reference's test/render path is strictly single-GPU — it
deliberately unwraps DataParallel because kp batches of size 1 don't
scatter (reference core/raycasters.py:172-175).  Our ImageRenderer
instead shards the padded ray chunk over the mesh 'data' axis with
params replicated; these tests pin pixel equality and full-image
equality on the virtual 8-device CPU mesh (conftest).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anerf_tpu.models.factory import (build_raycast_config, embed_state,
                                      init_raycaster_params)
from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
from anerf_tpu.ops.fk import get_smpl_l2ws_np
from anerf_tpu.parallel.sharding import make_mesh
from anerf_tpu.render.renderer import ImageRenderer
from anerf_tpu.skeleton import SMPL_REST_POSE
from anerf_tpu.utils.config import Config


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
    cfg = Config(use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
                 use_viewdirs=True, multires=3, multires_views=2,
                 netdepth=2, netwidth=16, N_samples=8, N_importance=4,
                 opt_framecode=True, ext_scale=0.001)
    rc = build_raycast_config(cfg, n_framecodes=2)
    params = init_raycaster_params(jax.random.PRNGKey(0), rc, cfg)
    est = embed_state(cfg, rc, 5000)
    return dict(rest=rest, bones=bones, kps=kps, skts=skts, cyls=cyls,
                c2w=c2w, cfg=cfg, rc=rc, params=params, est=est)


def test_sharded_chunk_matches_single_device(scene):
    assert jax.device_count() >= 8, 'conftest must force the 8-dev mesh'
    mesh = make_mesh(8)
    C = 64
    rng = np.random.RandomState(1)
    rays_o = np.tile([[0., 0., 2.7]], (C, 1)).astype(np.float32)
    th = rng.uniform(-0.15, 0.15, size=(C, 2)).astype(np.float32)
    rays_d = np.stack([th[:, 0], th[:, 1], -np.ones(C, np.float32)], -1)
    pose = {
        'kps': jnp.asarray(np.tile(scene['kps'][:1], (C, 1, 1))),
        'skts': jnp.asarray(np.tile(scene['skts'][:1], (C, 1, 1, 1))),
        'bones': jnp.asarray(np.tile(scene['bones'][:1], (C, 1, 1))),
        'cyls': jnp.asarray(np.tile(scene['cyls'][:1], (C, 1))),
    }
    cam = jnp.zeros((C,), jnp.int32)
    args = (jnp.asarray(rays_o), jnp.asarray(rays_d), pose, cam)

    r1 = ImageRenderer(scene['rc'], scene['params'], scene['est'], chunk=C)
    rN = ImageRenderer(scene['rc'], scene['params'], scene['est'], chunk=C,
                       mesh=mesh)
    out1 = r1._chunk_fn(scene['params'], scene['est'], *args)
    outN = rN._chunk_fn(scene['params'], scene['est'], *args)
    for k in ('rgb_map', 'disp_map', 'acc_map'):
        np.testing.assert_allclose(np.asarray(outN[k]), np.asarray(out1[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    # the outputs really are sharded over the mesh
    assert not outN['rgb_map'].sharding.is_fully_replicated


def test_sharded_full_image_matches(scene):
    mesh = make_mesh(8)
    common = dict(chunk=64, near=0., far=1.)
    r1 = ImageRenderer(scene['rc'], scene['params'], scene['est'], **common)
    rN = ImageRenderer(scene['rc'], scene['params'], scene['est'],
                       mesh=mesh, **common)
    img_args = (24, 24, 20.0, scene['c2w'], scene['kps'][0],
                scene['skts'][0], scene['bones'][0])
    out1 = r1.render_image(*img_args, cyl=scene['cyls'][0], cam_idx=0)
    outN = rN.render_image(*img_args, cyl=scene['cyls'][0], cam_idx=0)
    np.testing.assert_allclose(outN['rgb'], out1['rgb'], atol=1e-5)
    np.testing.assert_allclose(outN['disp'], out1['disp'], atol=1e-4)


def test_sharded_chunk_not_divisible_raises(scene):
    mesh = make_mesh(8)
    with pytest.raises(AssertionError):
        ImageRenderer(scene['rc'], scene['params'], scene['est'],
                      chunk=60, mesh=mesh)
