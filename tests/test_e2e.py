"""End-to-end smoke tests: CLI train -> checkpoint -> CLI render."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from anerf_tpu.data.h5_writer import make_synthetic_h5


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp('e2e')
    make_synthetic_h5(str(d / 'synthetic.h5'), n_frames=6, H=24, W=24)
    return d


def test_train_and_render_cli(workdir):
    """Run the actual CLI entry points in-process (CPU, tiny config)."""
    import jax
    from anerf_tpu.utils.config import load_config
    from run_train import train

    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'synthetic_tiny.txt'))
    cfg.basedir = str(workdir / 'logs')
    cfg.datadir = str(workdir / 'synthetic.h5')
    cfg.n_iters = 6
    cfg.i_weights = 3
    cfg.i_print = 2
    cfg.i_testset = 4      # exercise the val-render logging block
    cfg.num_workers = 1
    train(cfg)

    logdir = os.path.join(cfg.basedir, cfg.expname)
    assert os.path.exists(os.path.join(logdir, 'args.txt'))
    ckpts = [f for f in os.listdir(logdir) if f.startswith('ckpt_')]
    assert ckpts, 'no checkpoint written'
    assert any(f.startswith('pose_ckpt_') for f in os.listdir(logdir)) or \
        cfg.i_pose_weights > cfg.n_iters
    metrics = os.path.join(logdir, 'metrics.jsonl')
    assert os.path.exists(metrics)
    with open(metrics) as f:
        recs = [json.loads(l) for l in f]
    assert any('total_loss' in r for r in recs)

    # the i_testset val block logs RGB + disparity videos like the
    # reference (run_nerf.py:590-591 Val/ValRGB + Val/ValDIPS)
    from anerf_tpu.utils.logging import read_tb_tags
    tags = read_tb_tags(logdir)
    assert 'Val/RGB' in tags and 'Val/Disp' in tags, tags
    # per-eval txt appenders, the reference's artifact format
    # (evaluation_helpers.py:356-383: one mean value per line)
    for name in ('psnr', 'ssim'):
        path = os.path.join(logdir, f'{name}.txt')
        assert os.path.exists(path), path
        assert len(open(path).read().strip().splitlines()) >= 1

    # resume: train a few more steps from the checkpoint
    cfg2 = load_config(os.path.join(os.path.dirname(__file__), '..',
                                    'configs', 'synthetic_tiny.txt'))
    cfg2.basedir = cfg.basedir
    cfg2.datadir = cfg.datadir
    cfg2.n_iters = 8
    cfg2.num_workers = 1
    state = train(cfg2)
    assert int(state['step']) == 8

    # render from the checkpoint via the render CLI
    import run_render
    ckpt = sorted(os.path.join(logdir, f) for f in os.listdir(logdir)
                  if f.startswith('ckpt_'))[-1]
    outdir = str(workdir / 'render')
    run_render.main(['--nerf_args', os.path.join(logdir, 'args.txt'),
                     '--ckptpath', ckpt,
                     '--dataset_path', cfg.datadir,
                     '--render_type', 'bullet',
                     '--selected_idxs', '0',
                     '--n_bullet', '2',
                     '--outputdir', outdir, '--runname', 'bullet',
                     '--chunk', '512'])
    files = os.listdir(os.path.join(outdir, 'bullet'))
    assert any(f.endswith('.png') for f in files)

    # val render with eval metrics
    run_render.main(['--nerf_args', os.path.join(logdir, 'args.txt'),
                     '--ckptpath', ckpt,
                     '--dataset_path', cfg.datadir,
                     '--render_type', 'val',
                     '--eval',
                     '--outputdir', outdir, '--runname', 'val',
                     '--chunk', '512'])
    assert os.path.exists(os.path.join(outdir, 'val', 'score_final.txt'))

    # refined-pose render path
    run_render.main(['--nerf_args', os.path.join(logdir, 'args.txt'),
                     '--ckptpath', ckpt,
                     '--dataset_path', cfg.datadir,
                     '--render_type', 'selected', '--render_refined',
                     '--selected_idxs', '1',
                     '--outputdir', outdir, '--runname', 'refined',
                     '--chunk', '512'])
    assert os.path.exists(os.path.join(outdir, 'refined', '0000.png'))

    # interpolate render with blended appearance codes (Optcodes 2-idx
    # lerp path, reference embedding.py:24-28)
    run_render.main(['--nerf_args', os.path.join(logdir, 'args.txt'),
                     '--ckptpath', ckpt,
                     '--dataset_path', cfg.datadir,
                     '--render_type', 'interpolate', '--mix_framecodes',
                     '--selected_idxs', '0', '2', '--n_step', '2',
                     '--outputdir', outdir, '--runname', 'interp_mix',
                     '--chunk', '512'])
    assert os.path.exists(os.path.join(outdir, 'interp_mix', '0000.png'))

    # mesh-sharded render CLI: chunks sharded over 4 of the virtual
    # devices must reproduce the single-device selected render
    base = ['--nerf_args', os.path.join(logdir, 'args.txt'),
            '--ckptpath', ckpt, '--dataset_path', cfg.datadir,
            '--render_type', 'selected', '--selected_idxs', '1',
            '--outputdir', outdir, '--chunk', '512']
    run_render.main(base + ['--runname', 'sel1'])
    run_render.main(base + ['--runname', 'sel4', '--mesh_devices', '4'])
    import imageio.v2 as iio
    a = iio.imread(os.path.join(outdir, 'sel1', '0000.png'))
    b = iio.imread(os.path.join(outdir, 'sel4', '0000.png'))
    assert a.shape == b.shape
    # f32 math, png-quantized: allow 1 LSB for partition fusion rounding
    assert int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max()) <= 1


def test_entry_catalog_render(workdir):
    """--entry resolves a catalog entry: the h5 path, generator params
    and selection come from the catalog (reference run_render.py
    init_catalog + load_render_data)."""
    import shutil
    import run_render

    logdir = os.path.join(str(workdir / 'logs'), 'synthetic_tiny')
    ckpts = sorted(os.path.join(logdir, f) for f in os.listdir(logdir)
                   if f.startswith('ckpt_'))
    assert ckpts, 'train test must run first (module-scoped workdir)'

    # lay the synthetic h5 where the surreal/easy entry expects it
    data_root = workdir / 'data'
    (data_root / 'surreal').mkdir(parents=True, exist_ok=True)
    shutil.copy(str(workdir / 'synthetic.h5'),
                str(data_root / 'surreal' / 'surreal_train_h5py.h5'))

    outdir = str(workdir / 'render_entry')
    # selected_idxs overridden (catalog's point at frames the tiny
    # synthetic h5 doesn't have); n_bullet=10 must come from the entry
    run_render.main(['--nerf_args', os.path.join(logdir, 'args.txt'),
                     '--ckptpath', ckpts[-1],
                     '--entry', 'surreal/easy',
                     '--data_root', str(data_root),
                     '--render_type', 'bullet',
                     '--selected_idxs', '0',
                     '--outputdir', outdir, '--runname', 'entry',
                     '--chunk', '512'])
    files = os.listdir(os.path.join(outdir, 'entry'))
    # n_bullet=10 from the catalog entry -> 10 frames (save_video may
    # add prefixed fallback pngs; count only the save_images frames)
    import re
    assert sum(bool(re.fullmatch(r'\d{4}\.png', f)) for f in files) == 10


def test_train_cli_steps_per_dispatch(workdir):
    """--steps_per_dispatch bundles k steps per compiled dispatch
    (lax.scan) and must reach the same step count with finite losses."""
    import json as _json
    from anerf_tpu.utils.config import load_config
    from run_train import train

    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'synthetic_tiny.txt'))
    cfg.expname = 'synthetic_tiny_spd'
    cfg.basedir = str(workdir / 'logs')
    cfg.datadir = str(workdir / 'synthetic.h5')
    cfg.n_iters = 6
    cfg.i_print = 2
    cfg.i_weights = 6
    cfg.num_workers = 1
    cfg.steps_per_dispatch = 2
    state = train(cfg)
    assert int(state['step']) == 6
    logdir = os.path.join(cfg.basedir, cfg.expname)
    with open(os.path.join(logdir, 'metrics.jsonl')) as f:
        recs = [_json.loads(l) for l in f]
    assert any(np.isfinite(r.get('total_loss', np.nan)) for r in recs)
