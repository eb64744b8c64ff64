"""Training entry point (the reference's run_nerf.py equivalent).

Usage:
    python run_train.py --config configs/surreal/surreal.txt [--flag value]

Mirrors reference run_nerf.py:491-618 ``train()``: config -> data ->
raycaster -> pose-opt -> loop with periodic checkpointing, pose-only
checkpoints, validation renders (PSNR/SSIM + skeleton overlays) and
scalar logging — all on the jitted TPU train step with rays sharded
over the device mesh.
"""
import os
import sys
import time

import numpy as np


def train(cfg):
    import jax
    import jax.numpy as jnp

    from anerf_tpu.data.loaders import load_data
    from anerf_tpu.models.factory import (build_raycast_config, embed_state)
    from anerf_tpu.parallel.sharding import (init_distributed, make_mesh,
                                             replicate_state,
                                             shard_train_step)
    from anerf_tpu.render.renderer import ImageRenderer
    from anerf_tpu.training import pose_opt as P
    from anerf_tpu.training.checkpoint import (latest_checkpoint,
                                               load_checkpoint,
                                               load_pose_payload,
                                               load_torch_checkpoint,
                                               restore_train_state,
                                               save_checkpoint,
                                               save_pose_checkpoint)
    from anerf_tpu.training.trainer import (TrainSetup, init_train_state,
                                            make_multi_train_step,
                                            make_train_step, stack_batches)
    from anerf_tpu.eval.metrics import evaluate_images
    from anerf_tpu.utils.config import save_args_txt
    from anerf_tpu.utils.logging import (MetricLogger, draw_skeleton_2d)

    # multi-host: join the jax.distributed job when one is configured
    # (single-process runs are a no-op).  Only host 0 writes checkpoints,
    # logs, and validation renders.
    proc_idx, proc_cnt = init_distributed()
    is_host0 = proc_idx == 0

    logdir = os.path.join(cfg.basedir, cfg.expname)
    if is_host0:
        os.makedirs(logdir, exist_ok=True)
        save_args_txt(cfg, logdir)
    logger = MetricLogger(logdir) if is_host0 else None

    # --- data (this host's ray slice of the global batch) ---
    prefetcher, render_data, data_attrs = load_data(
        cfg, process_index=proc_idx, process_count=proc_cnt)
    n_framecodes = int(data_attrs['n_views'])
    rest_pose = np.asarray(data_attrs['rest_pose'], np.float32)

    # --- model + trainer ---
    n_subjects = int(data_attrs.get('n_subjects', 1) or 1)
    rc = build_raycast_config(cfg, skel=data_attrs['skel_type'],
                              n_framecodes=n_framecodes,
                              n_subjects=n_subjects)
    anchors = P.make_anchors(data_attrs['kp3d'], data_attrs['bones']) \
        if cfg.opt_pose else None
    kp_map = (jnp.asarray(data_attrs['kp_map'])
              if data_attrs.get('kp_map') is not None else None)
    rest_pose_idxs = (jnp.asarray(data_attrs['rest_pose_idxs'], jnp.int32)
                      if data_attrs.get('rest_pose_idxs') is not None
                      else None)
    setup = TrainSetup(cfg=cfg, rc=rc, skel=data_attrs['skel_type'],
                       rest_pose=jnp.asarray(rest_pose),
                       anchors=anchors, kp_map=kp_map,
                       rest_pose_idxs=rest_pose_idxs,
                       near=0.0, far=1.0)
    state = init_train_state(setup, jax.random.PRNGKey(cfg.seed),
                             init_kp3d=data_attrs['kp3d'],
                             init_bones=data_attrs['bones'])

    # --- resume ---
    start = 0
    ckpt_path = None
    if cfg.ft_path not in (None, 'None'):
        ckpt_path = cfg.ft_path
    elif not cfg.no_reload:
        ckpt_path = latest_checkpoint(logdir)
    if ckpt_path is not None:
        print(f'Reloading from {ckpt_path}')
        if ckpt_path.endswith('.tar'):
            loaded = load_torch_checkpoint(ckpt_path)
            state['params'] = jax.tree_util.tree_map(
                lambda t, l: jnp.asarray(l).astype(t.dtype),
                state['params'], loaded['params'])
            if not cfg.finetune:
                start = loaded['global_step']
                state['step'] = jnp.asarray(start, jnp.int32)
        else:
            state, start = restore_train_state(
                state, load_checkpoint(ckpt_path), finetune=cfg.finetune,
                no_poseopt_reload=cfg.no_poseopt_reload)

    # --- pose-bank init from an explicit pose checkpoint + anchors ---
    if cfg.opt_pose and cfg.init_poseopt not in (None, 'None') \
            and not cfg.no_poseopt_reload:
        # reference pose_opt.py:51-60: --init_poseopt seeds the bank
        # (and anchors, when stored) from a separate checkpoint
        payload = load_pose_payload(cfg.init_poseopt)
        state['pose_params'] = jax.tree_util.tree_map(
            jnp.asarray, payload['pose_params'])
        if payload.get('anchors') is not None and not cfg.use_ckpt_anchor:
            anchors = {k: jnp.asarray(v)
                       for k, v in payload['anchors'].items()}
    if cfg.opt_pose and cfg.use_ckpt_anchor:
        # anchors = FK of the (loaded) bank, so the regularizer pulls
        # toward the checkpoint's refined poses instead of the SPIN
        # estimates (reference pose_opt.py:62-68)
        all_idx = jnp.arange(state['pose_params']['pelvis'].shape[0])
        a_kps, a_bones, _, _, a_rots = P.pose_fk(
            state['pose_params'], all_idx, setup.frame_rest_pose(all_idx),
            setup.skel, setup.kp_map)
        anchors = {'kps': a_kps, 'bones': a_bones, 'rots': a_rots}
    if anchors is not setup.anchors:
        import dataclasses as _dc
        setup = _dc.replace(setup, anchors=anchors)

    # --- sharding over the (possibly multi-host) device mesh ---
    n_dev = cfg.n_devices or jax.device_count()
    mesh = make_mesh(n_dev)
    state = replicate_state(mesh, state)
    spd = max(1, int(cfg.steps_per_dispatch))
    if spd > 1:
        assert proc_cnt == 1, 'steps_per_dispatch>1 is single-host'
        step_fn = shard_train_step(make_multi_train_step(setup, spd),
                                   mesh, stacked=True)
    else:
        step_fn = shard_train_step(make_train_step(setup), mesh,
                                   global_batch=proc_cnt > 1)

    renderer = ImageRenderer(rc, state['params'],
                             embed_state(cfg, rc, start),
                             chunk=cfg.chunk, near=0., far=1.,
                             white_bkgd=cfg.white_bkgd)

    rng = jax.random.PRNGKey(cfg.seed + 1)
    print(f'Training {cfg.expname}: steps {start}..{cfg.n_iters} on '
          f'{n_dev} device(s)')
    t_last = time.time()
    i = start
    bundle = []
    pending_log = None

    def _flush_log(pend):
        j, pstats, rays = pend
        scalars = {k: v for k, v in pstats.items()}
        scalars['rays_per_sec'] = rays
        logger.log_scalars(j, scalars, prefix='Loss/')
        print(f"[{j}] loss={float(pstats['total_loss']):.5f} "
              f"psnr={float(pstats.get('psnr', np.nan)):.2f} "
              f'rays/s={rays:.0f}')
    for batch in prefetcher:
        if i >= cfg.n_iters:
            break
        if spd > 1:
            # bundle spd batches into one lax.scan dispatch; the scan
            # body folds the rng with the (device-side) step counter
            bundle.append(batch)
            if len(bundle) < spd:
                continue
            state, stats = step_fn(state, stack_batches(bundle), rng)
            bundle = []
            i += spd
        else:
            # hand the numpy batch straight to the sharded step:
            # shard_train_step device_puts it with the ray sharding in
            # one async transfer.  (A jnp.asarray pre-pass here costs
            # ~7 ms/step: it lands the arrays on the default device and
            # the sharded device_put then does a synchronous
            # device-to-device relayout — measured 83k -> 116k rays/s
            # sustained at the 512^2 SURREAL recipe when removed.)
            state, stats = step_fn(state, batch, jax.random.fold_in(rng, i))
            i += 1

        if i % cfg.i_print == 0 and is_host0:
            dt = time.time() - t_last
            t_last = time.time()
            # Log the PREVIOUS interval's stats and flush this one next
            # interval: reading a just-dispatched step's scalars drains
            # the async dispatch pipeline on every print (measured
            # ~1.6 ms/step at i_print=50 over the device tunnel); the
            # one-interval-old values are already on host.
            if pending_log is not None:
                _flush_log(pending_log)
            pending_log = (i, stats, cfg.N_rand * cfg.i_print / dt)

        if i % cfg.i_weights == 0 and is_host0:
            path = save_checkpoint(logdir, state, i, anchors=anchors)
            print('Saved checkpoint at', path)

        if cfg.opt_pose and i % cfg.i_pose_weights == 0 and is_host0:
            save_pose_checkpoint(logdir, state, i, anchors=anchors)

        if i % cfg.i_testset == 0 and render_data is not None and is_host0:
            renderer.params = state['params']
            renderer.state = embed_state(cfg, rc, i)
            out = renderer.render_path(render_data, ext_scale=cfg.ext_scale,
                                       render_factor=cfg.render_factor)
            logger.log_video(i, 'Val/RGB', out['rgbs'])
            # disparity video alongside RGB, normalized by the global
            # max like the reference (run_nerf.py:178,591 Val/ValDIPS)
            disps = out['disps']
            dmax = float(np.max(disps))
            logger.log_video(i, 'Val/Disp',
                             (disps / (dmax if dmax > 0 else 1.0))[..., None]
                             .repeat(3, axis=-1))
            if render_data.get('imgs') is not None:
                m = evaluate_images(out['rgbs'], render_data['imgs'],
                                    fgs=render_data.get('fgs'),
                                    bboxes=out['bboxes'])
                logger.log_scalars(i, {'psnr': float(np.nanmean(m['psnr'])),
                                       'ssim': float(np.nanmean(m['ssim']))},
                                   prefix='Val/')
                # per-eval txt appenders next to the val artifacts, the
                # reference's artifact format (evaluation_helpers.py:
                # 356-383: one mean value per line, appended per eval)
                for name in ('psnr', 'ssim'):
                    with open(os.path.join(logdir, f'{name}.txt'),
                              'a') as f:
                        f.write(f"{float(np.nanmean(m[name]))}\n")
                print(f"[val {i}] psnr={np.nanmean(m['psnr']):.2f} "
                      f"ssim={np.nanmean(m['ssim']):.3f}")
            # skeleton overlays
            try:
                H, W, focals = render_data['hwf']
                skels = []
                for j in range(len(out['rgbs'])):
                    f = focals if np.isscalar(focals) else focals[j]
                    skels.append(draw_skeleton_2d(
                        out['rgbs'][j], render_data['kp3d'][j],
                        render_data['c2ws'][j], f))
                logger.log_video(i, 'Val/Skeleton', np.stack(skels))
            except Exception as e:
                print('skeleton overlay failed:', e)

    if is_host0:
        if pending_log is not None:
            _flush_log(pending_log)
        save_checkpoint(logdir, state, i, anchors=anchors)
        logger.close()
    prefetcher.stop()
    print('Training done at step', i)
    return state


if __name__ == '__main__':
    from anerf_tpu.utils.config import config_from_cli
    cfg = config_from_cli(sys.argv[1:])
    train(cfg)
