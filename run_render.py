"""Rendering / evaluation / mesh-extraction entry point
(the reference's run_render.py equivalent).

Usage:
    python run_render.py --nerf_args logs/exp/args.txt \
        --ckptpath logs/exp/ckpt_00150000.msgpack \
        --render_type bullet --selected_idxs 0 \
        --outputdir render_output --runname demo [--eval] [--white_bkgd]

Render types (reference run_render.py:301-471 catalog):
  val | bullet | interpolate | retarget | animate | poserot | bubble |
  correction | selected | mesh
"""
import argparse
import os
import sys

import numpy as np


RENDER_TYPES = ('val', 'bullet', 'interpolate', 'retarget', 'animate',
                'poserot', 'bubble', 'correction', 'selected', 'mesh')


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument('--nerf_args', type=str, required=True,
                   help='path to the training args.txt')
    p.add_argument('--ckptpath', type=str, required=True,
                   help='checkpoint (.msgpack, or reference .tar)')
    p.add_argument('--render_type', type=str, default='bullet',
                   choices=RENDER_TYPES + ('val2',))
    p.add_argument('--entry', type=str, default=None,
                   help="catalog entry 'dataset/subject' (e.g. surreal/"
                        'hard): fills dataset path, selected idxs and '
                        'generator params for --render_type from the '
                        'curated catalog (reference run_render.py:301-471)')
    p.add_argument('--data_root', type=str, default='data',
                   help='root the catalog data_h5 paths resolve against')
    p.add_argument('--ckpt_root', type=str,
                   default='neurips21_ckpt/trained/ours',
                   help='root the catalog refined-ckpt paths resolve '
                        'against')
    p.add_argument('--render_res', type=int, nargs=2, default=None,
                   help='override H W')
    p.add_argument('--selected_idxs', type=int, nargs='+', default=None)
    p.add_argument('--n_bullet', type=int, default=None)
    p.add_argument('--n_step', type=int, default=None)
    p.add_argument('--joints', type=int, nargs='+',
                   default=None, help='joints for animate')
    p.add_argument('--mix_framecodes', action='store_true',
                   help='interpolate renders: blend the two endpoint '
                        'frames\' appearance codes with the pose lerp '
                        'weight (reference Optcodes 2-idx path, '
                        'embedding.py:24-28)')
    p.add_argument('--render_refined', action='store_true',
                   help='use refined poses from the checkpoint pose bank')
    p.add_argument('--white_bkgd', action='store_true')
    p.add_argument('--eval', action='store_true',
                   help='compute PSNR/SSIM vs dataset images (val only)')
    p.add_argument('--outputdir', type=str, default='render_output')
    p.add_argument('--runname', type=str, default='run')
    p.add_argument('--fps', type=int, default=14)
    p.add_argument('--mesh_res', type=int, default=128)
    p.add_argument('--mesh_thres', type=float, default=10.)
    p.add_argument('--dataset_path', type=str, default=None,
                   help='override the h5 path (e.g. synthetic data)')
    p.add_argument('--chunk', type=int, default=None)
    p.add_argument('--mesh_devices', type=int, default=0,
                   help='>1: shard each render chunk over this many '
                        'devices (jax.sharding data mesh); chunk must '
                        'divide evenly')
    p.add_argument('--render_factor', type=int, default=0,
                   help='downsample factor for fast renders '
                        '(reference run_nerf.py:37-48)')
    return p.parse_args(argv)


def apply_entry(args):
    """Fill CLI defaults from the curated catalog entry (reference
    run_render.py:116-155).  Returns extra generator kwargs the entry
    carries (undo_rot / center_cam / center_kps / length / skip)."""
    gen_kwargs = {}
    args.refined_path = None
    args.entry_h5 = None
    args.idx_map = None
    if args.entry:
        from anerf_tpu.render.catalog import resolve_entry
        ent = resolve_entry(args.entry, args.render_type,
                            data_root=args.data_root,
                            ckpt_root=args.ckpt_root)
        args.entry_h5 = ent['data_h5']
        args.refined_path = ent.get('refined')
        idx_map = ent.get('idx_map')
        if idx_map is not None and len(idx_map):
            args.idx_map = np.asarray(idx_map)
        if args.selected_idxs is None:
            args.selected_idxs = [int(i) for i in ent['selected_idxs']]
        for k in ('n_bullet', 'n_step', 'joints'):
            if getattr(args, k) is None and k in ent:
                setattr(args, k, ent[k])
        gen_kwargs = {k: ent[k] for k in
                      ('undo_rot', 'center_cam', 'center_kps', 'length',
                       'skip') if k in ent}
    args.explicit_idxs = args.selected_idxs is not None
    if args.selected_idxs is None:
        args.selected_idxs = [0]
    if args.n_bullet is None:
        args.n_bullet = 30
    if args.n_step is None:
        args.n_step = 10
    if args.joints is None:
        args.joints = [16, 18, 20]
    return gen_kwargs


def _accepts(fn, kwargs):
    """Keep only the kwargs ``fn`` actually takes."""
    import inspect
    names = set(inspect.signature(fn).parameters)
    return {k: v for k, v in kwargs.items() if k in names}


def load_everything(args):
    import jax
    import jax.numpy as jnp
    from anerf_tpu.data.loaders import get_dataset
    from anerf_tpu.models.factory import build_raycast_config, embed_state
    from anerf_tpu.training.checkpoint import (load_checkpoint,
                                               load_torch_checkpoint)
    from anerf_tpu.utils.config import load_config

    cfg = load_config(args.nerf_args)
    if args.dataset_path is not None:
        cfg.dataset_type = ('synthetic',)
        cfg.datadir = args.dataset_path
    if args.chunk:
        cfg.chunk = args.chunk

    # catalog entry overrides the h5 location but keeps the dataset
    # class from the training args
    dataset = get_dataset(cfg, h5_override=getattr(args, 'entry_h5', None))
    data_attrs = dataset.get_meta()
    n_framecodes = int(data_attrs['n_views'])
    rc = build_raycast_config(cfg, skel=data_attrs['skel_type'],
                              n_framecodes=n_framecodes)

    if args.ckptpath.endswith('.tar'):
        loaded = load_torch_checkpoint(args.ckptpath)
        params = loaded['params']
        step = loaded['global_step']
        pose_params = loaded.get('pose_params')
    else:
        ckpt = load_checkpoint(args.ckptpath)
        params = ckpt['params']
        # restore list-structure for pts_linears (msgpack stores dicts)
        params = _fix_params(params)
        step = int(ckpt['step'])
        pose_params = ckpt.get('pose_params')
    if 'cutoff_dist' not in params or params.get('cutoff_dist') is None:
        from anerf_tpu.skeleton import SMPLSkeleton
        params['cutoff_dist'] = np.asarray(
            SMPLSkeleton.cutoff_dists(1.0, cfg.cutoff_mm) * cfg.ext_scale)
    state = embed_state(cfg, rc, step)
    return cfg, rc, params, state, step, pose_params, dataset, data_attrs


def _fix_params(params):
    """msgpack restores lists as {'0': ..., '1': ...} dicts; undo."""
    def fix(p):
        if isinstance(p, dict) and all(k.isdigit() for k in p.keys()) and p:
            return [fix(p[str(i)]) for i in range(len(p))]
        if isinstance(p, dict):
            return {k: fix(v) for k, v in p.items()}
        return p
    return fix(params)


def get_poses(args, cfg, data_attrs, pose_params):
    """(kps, bones) source: dataset meta, the checkpoint pose bank, or
    the catalog entry's refined-pose checkpoint (reference
    --render_refined + catalog 'refined' paths)."""
    if args.render_refined:
        refined = getattr(args, 'refined_path', None)
        if refined and os.path.exists(refined):
            from anerf_tpu.training.checkpoint import load_refined_pose_data
            kp3d, bones = load_refined_pose_data(
                refined, ext_scale=cfg.ext_scale)[:2]
            return np.asarray(kp3d), np.asarray(bones)
        if pose_params is not None:
            from anerf_tpu.training.pose_opt import pose_params_to_pose_data
            kp3d, bones = pose_params_to_pose_data(
                {k: np.asarray(v) for k, v in pose_params.items()},
                data_attrs['rest_pose'], ext_scale=cfg.ext_scale)[:2]
            return kp3d, bones
    return data_attrs['kp3d'], data_attrs['bones']


def main(argv):
    args = parse_args(argv)
    gen_kwargs = apply_entry(args)
    if args.mix_framecodes:
        gen_kwargs['mix_framecodes'] = True  # consumed by load_interpolate
    import jax.numpy as jnp
    from anerf_tpu.render import poses as pose_gen
    from anerf_tpu.render.renderer import ImageRenderer
    from anerf_tpu.eval.metrics import evaluate_images
    from anerf_tpu.utils.logging import save_images, save_video

    cfg, rc, params, state, step, pose_params, dataset, data_attrs = \
        load_everything(args)
    outdir = os.path.join(args.outputdir, args.runname)
    os.makedirs(outdir, exist_ok=True)

    rest_pose = np.asarray(data_attrs['rest_pose'], np.float32)
    kps, bones = get_poses(args, cfg, data_attrs, pose_params)
    c2ws = data_attrs['c2ws']
    H, W, focals = data_attrs['hwf']
    Hs = int(np.atleast_1d(H)[0])
    Ws = int(np.atleast_1d(W)[0])
    if args.render_res is not None:
        scale = args.render_res[0] / Hs
        Hs, Ws = args.render_res
        focals = np.asarray(focals) * scale
    f0 = float(np.atleast_1d(focals)[0])
    sel = np.asarray(args.selected_idxs)
    if args.idx_map is not None:
        from anerf_tpu.render.catalog import find_idxs_with_map
        sel = find_idxs_with_map(sel, args.idx_map)

    mesh = None
    if args.mesh_devices > 1:
        from anerf_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(args.mesh_devices)
    renderer = ImageRenderer(rc, params, state,
                             chunk=args.chunk or cfg.chunk,
                             near=0., far=1., white_bkgd=args.white_bkgd,
                             mesh=mesh)

    if args.render_type == 'mesh':
        from anerf_tpu.render.mesh import (extract_mesh, render_turntable,
                                           save_ply)
        from anerf_tpu.ops.fk import get_smpl_l2ws_np
        for idx in sel:
            l2ws = get_smpl_l2ws_np(bones[idx], rest_pose)
            l2ws[..., :3, 3] += kps[idx, :1]
            pose = {'kps': jnp.asarray(l2ws[None, :, :3, 3]),
                    'skts': jnp.asarray(np.linalg.inv(l2ws)[None]),
                    'bones': jnp.asarray(bones[idx][None])}
            verts, faces = extract_mesh(rc, params, pose, radius=1.0,
                                        res=args.mesh_res,
                                        threshold=args.mesh_thres,
                                        state=state)
            ply = os.path.join(outdir, f'mesh_{idx:05d}.ply')
            save_ply(ply, verts, faces)
            print(f'saved {ply}: {len(verts)} verts, {len(faces)} faces')
            if len(verts) > 0:
                frames = render_turntable(verts, faces, n_views=20,
                                          H=256, W=256)
                save_video(os.path.join(outdir, f'mesh_{idx:05d}.mp4'),
                           frames, fps=args.fps)
        return

    if args.render_type in ('val', 'val2'):
        render_data = dataset.get_render_data(
            sel if args.explicit_idxs else None)
    elif args.render_type == 'bullet':
        render_data = pose_gen.load_bullettime(
            kps, bones, c2ws, focals, rest_pose, sel, n_bullet=args.n_bullet,
            **_accepts(pose_gen.load_bullettime, gen_kwargs))
    elif args.render_type == 'interpolate':
        render_data = pose_gen.load_interpolate(
            kps, bones, c2ws, focals, rest_pose, sel, n_step=args.n_step,
            **_accepts(pose_gen.load_interpolate, gen_kwargs))
    elif args.render_type == 'retarget':
        render_data = pose_gen.load_retarget(
            kps, bones, c2ws, focals, rest_pose, sel,
            **_accepts(pose_gen.load_retarget, gen_kwargs))
    elif args.render_type == 'animate':
        render_data = pose_gen.load_animate(
            kps, bones, c2ws, focals, rest_pose, sel, joints=args.joints,
            n_step=args.n_step,
            **_accepts(pose_gen.load_animate, gen_kwargs))
    elif args.render_type == 'poserot':
        render_data = pose_gen.load_pose_rotate(
            kps, bones, c2ws, focals, rest_pose, sel, n_bullet=args.n_bullet,
            **_accepts(pose_gen.load_pose_rotate, gen_kwargs))
    elif args.render_type == 'bubble':
        render_data = pose_gen.load_bubble(
            kps, bones, c2ws, focals, rest_pose, sel, n_step=args.n_step,
            **_accepts(pose_gen.load_bubble, gen_kwargs))
    elif args.render_type == 'correction':
        init_kps, init_bones = data_attrs['kp3d'], data_attrs['bones']
        render_data = pose_gen.load_correction(
            init_kps, init_bones, kps, bones, c2ws, focals, rest_pose, sel,
            n_step=args.n_step)
    elif args.render_type == 'selected':
        render_data = pose_gen.load_selected(
            kps, bones, c2ws, focals, rest_pose, sel)
    else:
        raise NotImplementedError(args.render_type)

    n = len(render_data['c2ws'])
    if 'hwf' not in render_data:
        render_data['hwf'] = (np.full(n, Hs), np.full(n, Ws),
                              np.asarray(render_data.get('focals', f0)))
    out = renderer.render_path(render_data, ext_scale=cfg.ext_scale,
                               render_factor=args.render_factor,
                               verbose=True)
    save_images(outdir, out['rgbs'])
    save_video(os.path.join(outdir, f'{args.render_type}.mp4'),
               out['rgbs'], fps=args.fps)
    print(f'rendered {len(out["rgbs"])} frames to {outdir}')

    if args.eval and render_data.get('imgs') is not None:
        m = evaluate_images(out['rgbs'], render_data['imgs'],
                            fgs=render_data.get('fgs'),
                            bboxes=out['bboxes'])
        np.save(os.path.join(outdir, 'scores.npy'), m)
        with open(os.path.join(outdir, 'score_final.txt'), 'w') as f:
            for k, v in m.items():
                f.write(f'{k}: {np.nanmean(v):.4f}\n')
        print({k: float(np.nanmean(v)) for k, v in m.items()})


if __name__ == '__main__':
    main(sys.argv[1:])
