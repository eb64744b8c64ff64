"""Pose-refinement quality vs the REFERENCE'S OWN trainer.

VERDICT r3 weak #5: our quality run shows pose error improving, but
nothing showed the reference's optimizer wouldn't do better on the
identical scene.  This script runs BOTH trainers — the reference's
``Trainer.train_batch`` (its factory raycaster, torch Adam, its
PoseOptLayer; loaded via tests/ref_oracle.py) and our jitted train
step — from the SAME perturbed poses on the SAME synthetic scene with
the SAME batch stream and recipe (CPU f32, reduced scale), recording
the pose-error trajectory of each.

Emits ONE JSON line:
  {"ours_traj_mm": [...], "ref_traj_mm": [...], "ours_end_mm": ...,
   "ref_end_mm": ..., "start_mm": ..., "ours_not_worse": ...}

Reference anchors: convergence loop run_nerf.py:491-618, pose losses
core/trainer.py:382-441.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python \
      scripts/pose_refine_compare.py [--steps 800]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, default='/tmp/pose_refine_cmp')
    ap.add_argument('--steps', type=int, default=800)
    ap.add_argument('--n_frames', type=int, default=4)
    ap.add_argument('--size', type=int, default=64)
    ap.add_argument('--n_rand', type=int, default=128)
    ap.add_argument('--eval_every', type=int, default=40)
    ap.add_argument('--bone_noise', type=float, default=0.04)
    ap.add_argument('--pelvis_noise', type=float, default=0.01)
    ap.add_argument('--seed', type=int, default=0,
                    help='sweep seed: offsets the perturbation draw, the '
                         'batch stream, the init weights, and both '
                         'trainers\' RNG (seed 0 == the round-4 run)')
    # raw_noise_std=1.0 matches the reference's flagship recipes
    # (configs/surreal/surreal.txt) and is REQUIRED for a meaningful
    # multi-seed protocol: with relu density and no noise, init weight
    # draws where raw sigma < 0 at every sample are dead forever
    # (relu' = 0 -> zero density AND pose gradients; measured: seeds
    # 3/4 froze at their start error for 800 steps in BOTH trainers
    # under the round-4 --raw_noise_std 0 protocol).  Pass 0 to
    # reproduce the round-4 tighter-paired (but degenerate-prone) runs.
    ap.add_argument('--raw_noise_std', type=float, default=1.0)
    args = ap.parse_args()

    import h5py
    import torch
    import jax
    import jax.numpy as jnp

    from anerf_tpu.data.h5_writer import make_synthetic_h5
    from anerf_tpu.data.loaders import load_data
    from anerf_tpu.data.mask_extract import _binary_morph
    from anerf_tpu.models.factory import build_raycast_config
    from anerf_tpu.ops.fk import fk
    from anerf_tpu.training import pose_opt as P
    from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                            make_train_step)
    from anerf_tpu.utils.config import Config
    import ref_oracle

    os.makedirs(args.out, exist_ok=True)
    h5_path = os.path.join(args.out, 'synthetic.h5')
    make_synthetic_h5(h5_path, n_frames=args.n_frames, H=args.size,
                      W=args.size, body_scale=450.0, blob_radius=2)
    with h5py.File(h5_path, 'r+') as f:
        masks = f['masks'][:]
        H = args.size
        sm = np.stack([_binary_morph(m.reshape(H, H, 1)[..., 0], 3,
                                     'dilate') for m in masks])
        f['sampling_masks'][...] = sm.reshape(masks.shape).astype(np.uint8)

    # one shared recipe (f32, XLA backend on both sides for fairness)
    FLAGS = dict(
        bone_type='reldir', kp_dist_type='reldist', view_type='relray',
        use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
        use_viewdirs=True, opt_framecode=True, ext_scale=0.001,
        netwidth=64, netdepth=8, multires=7, multires_views=4,
        N_samples=32, N_importance=8,
        loss_fn='MSE', use_background=True, coarse_weight=1.0,
        lrate=5e-4, lrate_decay=500, lrate_decay_rate=0.1,
        decay_unit=1000, perturb=1.0,
        raw_noise_std=float(args.raw_noise_std),
        cutoff_step=1, cutoff_rate=10.0,
        opt_pose=True, opt_pose_step=2, opt_pose_lrate=1e-3,
        opt_pose_coef=0.05,
        opt_pose_tol=float(2 * args.bone_noise ** 2),
        use_temp_loss=False,
    )

    cfg = Config(dataset_type=('synthetic',), subject=('test',),
                 datadir=h5_path, N_sample_images=4, N_rand=args.n_rand,
                 n_iters=args.steps, num_workers=1, compute_dtype='float32',
                 mlp_backend='xla', seed=args.seed, **FLAGS)

    prefetcher, _, data_attrs = load_data(cfg)
    rest_pose = np.asarray(data_attrs['rest_pose'], np.float32)
    gt_kp3d = np.asarray(data_attrs['kp3d'], np.float32)
    gt_bones = np.asarray(data_attrs['bones'], np.float32)
    n_frames = len(gt_kp3d)

    rng = np.random.RandomState(42 + args.seed)
    bones_p = gt_bones + rng.normal(
        scale=args.bone_noise, size=gt_bones.shape).astype(np.float32)
    pelvis_p = gt_kp3d[:, 0] + rng.normal(
        scale=args.pelvis_noise, size=(n_frames, 3)).astype(np.float32)
    kps_p, _, _, _ = fk(jnp.asarray(bones_p), jnp.asarray(pelvis_p),
                        jnp.asarray(rest_pose))
    kps_p = np.asarray(kps_p)

    # capture a shared deterministic batch stream
    batches = []
    for i, b in enumerate(prefetcher):
        if i >= args.steps:
            break
        batches.append({k: np.asarray(v) for k, v in b.items()
                        if v is not None})
    prefetcher.stop()

    def err_mm(bones, pelvis):
        kps, _, _, _ = fk(jnp.asarray(bones), jnp.asarray(pelvis),
                          jnp.asarray(rest_pose))
        d = np.linalg.norm(np.asarray(kps) - gt_kp3d, axis=-1)
        return float(d.mean() / cfg.ext_scale)

    start_mm = err_mm(bones_p, pelvis_p)
    print(f'start pose error: {start_mm:.2f} mm', flush=True)

    # ---- our side -------------------------------------------------------
    rc = build_raycast_config(cfg, skel=data_attrs['skel_type'],
                              n_framecodes=int(data_attrs['n_views']))
    setup = TrainSetup(cfg=cfg, rc=rc, skel=data_attrs['skel_type'],
                       rest_pose=jnp.asarray(rest_pose),
                       anchors=P.make_anchors(kps_p, bones_p),
                       near=0.0, far=1.0)
    state = init_train_state(setup, jax.random.PRNGKey(cfg.seed),
                             init_kp3d=kps_p, init_bones=bones_p)
    params0 = jax.tree_util.tree_map(np.asarray, state['params'])
    step_raw = make_train_step(setup)

    def stepper(state, batch, rng):
        return step_raw(state, batch,
                        jax.random.fold_in(rng, state['step']))
    step = jax.jit(stepper, donate_argnums=(0,))
    rng_j = jax.random.PRNGKey(cfg.seed + 1)

    ours_traj = [start_mm]
    for i, b in enumerate(batches, 1):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, stats = step(state, jb, rng_j)
        if i % args.eval_every == 0:
            pp = jax.tree_util.tree_map(np.asarray, state['pose_params'])
            ours_traj.append(err_mm(pp['bones'], pp['pelvis']))
            print(f'[ours {i}] {ours_traj[-1]:.2f} mm '
                  f'psnr={float(stats["psnr"]):.2f}', flush=True)

    # ---- reference side -------------------------------------------------
    T = torch.from_numpy
    rargs = ref_oracle.ref_args(args.out, chunk=1024 * 32,
                                n_framecodes=n_frames, **FLAGS)
    trainer, caster, popt_layer = ref_oracle.build_ref_trainer(
        rargs, rest_pose, kps_p, bones_p, near=0.0, far=1.0)
    # identical initial NeRF weights
    ref_oracle.copy_params_to_ref_nerf(params0['coarse'], caster.network)
    ref_oracle.copy_params_to_ref_nerf(params0['fine'], caster.network_fine)

    torch.manual_seed(cfg.seed + 1)
    ref_traj = [start_mm]
    gstep = 0
    for i, b in enumerate(batches, 1):
        tb = {
            'rays': torch.stack([T(b['rays_o']), T(b['rays_d'])]),
            'target_s': T(b['target_s']), 'bgs': T(b['bgs']),
            'fgs': T(b['fgs']),
            'kp_idx': T(b['kp_idx'].astype(np.int64)),
            'cam_idxs': T(b['cam_idxs'].astype(np.float32)),
            'cyls': T(b['cyls']),
        }
        loss_dict, stats = trainer.train_batch(tb, i=i, global_step=gstep)
        gstep += 1
        if i % args.eval_every == 0:
            ref_traj.append(err_mm(popt_layer.bones.detach().numpy(),
                                   popt_layer.pelvis.detach().numpy()
                                   .reshape(n_frames, 3)))
            print(f'[ref  {i}] {ref_traj[-1]:.2f} mm', flush=True)

    ours_end, ref_end = ours_traj[-1], ref_traj[-1]
    # ours is at least as good as the reference at (nearly) every
    # checkpoint: fraction of eval points where ours <= ref * 1.05
    frac = float(np.mean([o <= r * 1.05
                          for o, r in zip(ours_traj, ref_traj)]))
    result = {
        'seed': args.seed,
        'start_mm': round(start_mm, 2),
        'ours_end_mm': round(ours_end, 2),
        'ref_end_mm': round(ref_end, 2),
        'ours_traj_mm': [round(v, 2) for v in ours_traj],
        'ref_traj_mm': [round(v, 2) for v in ref_traj],
        'eval_every': args.eval_every,
        'steps': args.steps,
        'ours_not_worse_frac': frac,
        'ours_not_worse': bool(ours_end <= ref_end * 1.05),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
