"""Quality-on-chip run: prove the flagship bf16+Pallas+pose-opt recipe
actually LEARNS, not just that it is fast.

Trains the synthetic pose-anchored scene from PERTURBED initial poses
(SPIN-noise stand-in) for --steps steps in the exact bench recipe
(bf16 compute, fused Pallas kernels on TPU, dual-optimizer pose
refinement), then emits ONE JSON line:

  {"final_psnr": ..., "psnr_gain": ..., "mpjpc_start_mm": ...,
   "mpjpc_end_mm": ..., "pose_improved": ..., "psnr_ok": ...}

and (unless --no_check) asserts PSNR rose past --min_psnr_gain and the
pose error vs the TRUE generating poses dropped by --min_pose_gain.
This is the convergence evidence for the throughput bench (reference
behavior: run_nerf.py:491-618 training loop improving Val PSNR and
MPJPC).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/quality_run.py \
      --out /tmp/quality [--steps 2000]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, default='/tmp/quality_run')
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--n_frames', type=int, default=6)
    ap.add_argument('--size', type=int, default=128)
    ap.add_argument('--n_rand', type=int, default=1024)
    # Perturbations sized to the photometric attraction basin: the
    # synthetic scene's blobs are ~3 px; at 128 px / f=102 / z=2.7 a
    # 0.04 rad bone error moves joints ~45 mm ~ 1.5 px, keeping the
    # rendered and target blobs overlapping so the photometric loss has
    # a nonzero pull (larger offsets have exactly-zero gradient and sit
    # still, as any NeRF pose refinement would).
    ap.add_argument('--bone_noise', type=float, default=0.04)
    ap.add_argument('--pelvis_noise', type=float, default=0.01)
    # Scale blob_radius WITH --size (e.g. 4 at 256) to keep the scene a
    # literal upsampling of the 128-px protocol: focal is 0.8*W, so
    # doubling both keeps the perturbation the same fraction of blob
    # size — the round-4 256px divergence was a fixed 2-px blob
    # shrinking relative to the (pixel-space) perturbation.
    ap.add_argument('--blob_radius', type=int, default=2)
    ap.add_argument('--mlp_backend', type=str, default='auto')
    ap.add_argument('--min_psnr_gain', type=float, default=3.0)
    # measured on v5e: 2000 steps give a ~23% drop (46.7 -> 35.7 mm),
    # plateauing near the scene's information floor (the 5x5 pixel-
    # quantized blobs localize joints to ~1 px ~ 28 mm); 0.15 asserts a
    # real descent with headroom for seed noise
    ap.add_argument('--min_pose_gain', type=float, default=0.15,
                    help='required fractional drop in pose error')
    ap.add_argument('--no_check', action='store_true')
    ap.add_argument('--seed', type=int, default=None,
                    help='override cfg.seed (trajectory-chaos spread)')
    ap.add_argument('--pose_lr', type=float, default=1e-3)
    ap.add_argument('--pose_step', type=int, default=2)
    ap.add_argument('--pose_decay', type=int, default=None,
                    help='pose-lr 10x-decay interval (default steps//4; '
                         'steps//4 freezes the bank after ~half the run '
                         '- use ~steps for long refinements)')
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        pass

    from anerf_tpu.data.h5_writer import make_synthetic_h5
    from anerf_tpu.data.loaders import load_data
    from anerf_tpu.data.mask_extract import _binary_morph
    from anerf_tpu.models.factory import build_raycast_config
    from anerf_tpu.ops.fk import fk
    from anerf_tpu.skeleton import SMPLSkeleton
    from anerf_tpu.training import pose_opt as P
    from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                            make_train_step)
    from anerf_tpu.utils.config import Config

    os.makedirs(args.out, exist_ok=True)
    h5_path = os.path.join(args.out, 'synthetic.h5')
    # body_scale=450: a SURREAL-like ~1.7-unit body whose joints project
    # tens of pixels apart — the photometric loss can actually carry
    # pose information (the smoke-test default body is sub-pixel)
    make_synthetic_h5(h5_path, n_frames=args.n_frames, H=args.size,
                      W=args.size, body_scale=450.0,
                      blob_radius=args.blob_radius)
    # concentrate pixel sampling near the person (the real recipes train
    # inside sampling_masks; the CI-oriented writer leaves them all-ones)
    with h5py.File(h5_path, 'r+') as f:
        masks = f['masks'][:]
        H = args.size
        # 1-px border only: most sampled rays land ON the body so the
        # photometric gradient favors density where it belongs (a wide
        # border lets the background term collapse the density to empty)
        sm = np.stack([_binary_morph(m.reshape(H, H, 1)[..., 0], 3,
                                     'dilate') for m in masks])
        f['sampling_masks'][...] = sm.reshape(masks.shape).astype(np.uint8)

    cfg = Config(
        dataset_type=('synthetic',), subject=('test',),
        datadir=h5_path, use_background=True, ext_scale=0.001,
        bone_type='reldir', kp_dist_type='reldist', view_type='relray',
        use_cutoff=True, cutoff_viewdir=True, cutoff_inputs=True,
        use_viewdirs=True, opt_framecode=True, N_sample_images=4,
        netwidth=256, netdepth=8, multires=7, multires_views=4,
        N_rand=args.n_rand, N_samples=64, N_importance=16,
        n_iters=args.steps, lrate=5e-4, lrate_decay=500,
        raw_noise_std=1.0, compute_dtype='bfloat16',
        mlp_backend=args.mlp_backend,
        opt_pose=True, opt_pose_step=args.pose_step,
        opt_pose_lrate=args.pose_lr,
        # decay the pose lr ~10x over the run so the bank settles
        # instead of bouncing around the optimum
        opt_pose_lrate_decay=(args.pose_decay if args.pose_decay
                              else max(args.steps // 4, 1)),
        opt_pose_decay_rate=0.1, opt_pose_decay_unit=1,
        opt_pose_coef=0.05, opt_pose_tol=float(2 * args.bone_noise ** 2),
        num_workers=2)
    if args.seed is not None:
        cfg.seed = args.seed

    prefetcher, _, data_attrs = load_data(cfg)
    rest_pose = np.asarray(data_attrs['rest_pose'], np.float32)
    gt_kp3d = np.asarray(data_attrs['kp3d'], np.float32)
    gt_bones = np.asarray(data_attrs['bones'], np.float32)
    n_frames = len(gt_kp3d)

    # perturbed initial estimates (the "imperfect SPIN poses")
    rng = np.random.RandomState(42)
    bones_p = gt_bones + rng.normal(
        scale=args.bone_noise, size=gt_bones.shape).astype(np.float32)
    pelvis_p = gt_kp3d[:, 0] + rng.normal(
        scale=args.pelvis_noise, size=(n_frames, 3)).astype(np.float32)
    kps_p, _, _, _ = fk(jnp.asarray(bones_p), jnp.asarray(pelvis_p),
                        jnp.asarray(rest_pose))
    kps_p = np.asarray(kps_p)

    rc = build_raycast_config(cfg, skel=data_attrs['skel_type'],
                              n_framecodes=int(data_attrs['n_views']))
    setup = TrainSetup(cfg=cfg, rc=rc, skel=data_attrs['skel_type'],
                       rest_pose=jnp.asarray(rest_pose),
                       anchors=P.make_anchors(kps_p, bones_p),
                       near=0.0, far=1.0)
    state = init_train_state(setup, jax.random.PRNGKey(cfg.seed),
                             init_kp3d=kps_p, init_bones=bones_p)
    step_raw = make_train_step(setup)

    def stepper(state, batch, rng):
        return step_raw(state, batch,
                        jax.random.fold_in(rng, state['step']))
    step = jax.jit(stepper, donate_argnums=(0,))

    all_idx = jnp.arange(n_frames)

    def pose_err_mm(pose_params) -> float:
        kps, _, _, _, _ = P.pose_fk(pose_params, all_idx,
                                    setup.frame_rest_pose(all_idx),
                                    setup.skel, None)
        d = np.linalg.norm(np.asarray(kps) - gt_kp3d, axis=-1)
        return float(d.mean() / cfg.ext_scale)

    mpjpc_start = pose_err_mm(state['pose_params'])
    rng_j = jax.random.PRNGKey(cfg.seed + 1)
    # psnr_gain compares the FIRST 20 steps (pre-convergence baseline)
    # against the final 10% of steps
    psnrs, window = [], max(args.steps // 10, 10)
    first_window, i = [], 0
    for batch in prefetcher:
        if i >= args.steps:
            break
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, stats = step(state, jb, rng_j)
        i += 1
        if i <= 20 or i > args.steps - window:
            p = float(stats['psnr'])
            (first_window if i <= 20 else psnrs).append(p)
        if i % 100 == 0:
            print(f"[{i}] loss={float(stats["total_loss"]):.5f} "
                  f"alpha={float(stats["alpha"]):.3f} "
                  f'psnr={float(stats["psnr"]):.2f} '
                  f'pose_err={pose_err_mm(state["pose_params"]):.2f}mm',
                  flush=True)
    prefetcher.stop()

    mpjpc_end = pose_err_mm(state['pose_params'])
    psnr_start = float(np.mean(first_window))
    final_psnr = float(np.mean(psnrs))
    gain = final_psnr - psnr_start
    pose_drop = (mpjpc_start - mpjpc_end) / max(mpjpc_start, 1e-9)
    result = {
        'final_psnr': round(final_psnr, 2),
        'psnr_gain': round(gain, 2),
        'mpjpc_start_mm': round(mpjpc_start, 2),
        'mpjpc_end_mm': round(mpjpc_end, 2),
        'pose_improved': bool(pose_drop >= args.min_pose_gain),
        'psnr_ok': bool(gain >= args.min_psnr_gain),
        'steps': args.steps,
        'backend': rc.mlp_backend,
        'device': jax.devices()[0].device_kind,
    }
    print(json.dumps(result))
    if not args.no_check:
        assert result['psnr_ok'], \
            f'PSNR gain {gain:.2f} < {args.min_psnr_gain}'
        assert result['pose_improved'], \
            f'pose error {mpjpc_start:.2f} -> {mpjpc_end:.2f} mm ' \
            f'(needed a {args.min_pose_gain:.0%} drop)'


if __name__ == '__main__':
    main()
