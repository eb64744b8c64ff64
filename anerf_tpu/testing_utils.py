"""Synthetic flagship-model builders shared by bench, graft entry, tests.

Builds the SURREAL-recipe articulated NeRF (reference
configs/surreal/surreal.txt: 8x256 MLP, 64+16 samples, cutoff PE with
multires 7/4, framecodes, background compositing) on synthetic pose /
ray data so perf and compile checks run without the dataset.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .models.factory import build_raycast_config
from .ops.cylinder import get_kp_bounding_cylinder
from .ops.fk import fk
from .skeleton import SMPL_REST_POSE, SMPLSkeleton
from .training import pose_opt as P
from .training.trainer import TrainSetup, init_train_state, make_train_step
from .utils.config import Config


def surreal_config(**overrides) -> Config:
    base = dict(
        dataset_type=('surreal',), subject=('female',),
        use_background=True, fg_ratio=1.0, ext_scale=0.001,
        bone_type='reldir', kp_dist_type='reldist', view_type='relray',
        use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
        use_viewdirs=True, image_batching=True, N_sample_images=128,
        netwidth=256, multires=7, multires_views=4,
        N_rand=2048, N_samples=64, N_importance=16,
        n_iters=150000, lrate_decay=500, raw_noise_std=1.0,
        opt_framecode=True,
    )
    base.update(overrides)
    return Config(**base)


def synthetic_pose(n_frames: int = 9, seed: int = 0, ext_scale: float = 0.001):
    from .ops.fk import get_smpl_l2ws_np
    rng = np.random.RandomState(seed)
    rest = (SMPL_REST_POSE * ext_scale * 2.2).astype(np.float32)
    bones = rng.normal(scale=0.15, size=(n_frames, 24, 3)).astype(np.float32)
    pelvis = rng.normal(scale=0.05, size=(n_frames, 3)).astype(np.float32)
    # host-side FK: keeps scene building off the device (fast startup
    # when device dispatch is expensive, e.g. remote TPU tunnels)
    l2ws = np.stack([get_smpl_l2ws_np(b, rest) for b in bones])
    l2ws[..., :3, 3] += pelvis[:, None]
    kps = l2ws[..., :3, 3].astype(np.float32)
    skts = np.linalg.inv(l2ws).astype(np.float32)
    cyls = get_kp_bounding_cylinder(kps, ext_scale=ext_scale,
                                    head='-y').astype(np.float32)
    return rest, bones, pelvis, kps, skts, cyls


def synthetic_batch(n_rays: int, n_frames: int, kps, skts, bones, cyls,
                    seed: int = 0) -> Dict[str, jnp.ndarray]:
    rng = np.random.RandomState(seed)
    kp_idx = rng.randint(0, n_frames, size=(n_rays,))
    th = rng.uniform(-0.15, 0.15, size=(n_rays, 2)).astype(np.float32)
    rays_d = np.stack([th[:, 0], th[:, 1], -np.ones(n_rays, np.float32)], -1)
    return {
        'rays_o': jnp.asarray(np.tile([[0., 0., 2.7]], (n_rays, 1))
                              .astype(np.float32)),
        'rays_d': jnp.asarray(rays_d),
        'target_s': jnp.asarray(rng.uniform(0, 1, (n_rays, 3))
                                .astype(np.float32)),
        'fgs': jnp.ones((n_rays, 1), jnp.float32),
        'bgs': jnp.full((n_rays, 3), 0.5, jnp.float32),
        'cyls': jnp.asarray(cyls[kp_idx]),
        'kp_idx': jnp.asarray(kp_idx, jnp.int32),
        'cam_idxs': jnp.asarray(kp_idx, jnp.int32),
        'temp_val': jnp.ones((n_rays,), jnp.float32),
        'kps': jnp.asarray(kps[kp_idx]),
        'skts': jnp.asarray(skts[kp_idx]),
        'bones': jnp.asarray(bones[kp_idx]),
    }


def build_flagship(n_rays: int = 2048, n_frames: int = 9,
                   opt_pose: bool = True,
                   rc_overrides: Optional[Dict] = None, **cfg_overrides):
    """Full SURREAL-recipe training setup on synthetic data.

    ``rc_overrides`` patches RayCastConfig-only knobs (e.g. the
    wrong-math bench ablations ablate_merge/ablate_xv) that have no
    Config counterpart.  Returns (setup, state, batch, train_step_fn).
    """
    cfg = surreal_config(opt_pose=opt_pose, N_rand=n_rays,
                         opt_pose_step=20 if opt_pose else 1,
                         opt_pose_coef=0.1 if opt_pose else 0.0,
                         **cfg_overrides)
    rest, bones, pelvis, kps, skts, cyls = synthetic_pose(
        n_frames, ext_scale=cfg.ext_scale)
    rc = build_raycast_config(cfg, n_framecodes=n_frames)
    if rc_overrides:
        import dataclasses
        rc = dataclasses.replace(rc, **rc_overrides)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=SMPLSkeleton,
                       rest_pose=jnp.asarray(rest),
                       anchors=P.make_anchors(kps, bones),
                       near=0.0, far=1.0)
    state = init_train_state(setup, jax.random.PRNGKey(cfg.seed),
                             init_kp3d=kps, init_bones=bones)
    batch = synthetic_batch(n_rays, n_frames, kps, skts, bones, cyls)
    return setup, state, batch, make_train_step(setup)
