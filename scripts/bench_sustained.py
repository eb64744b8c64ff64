"""Sustained END-TO-END training throughput: run_train.py on a
512x512 synthetic scene at the SURREAL recipe.

The kernel bench (bench.py) repeats one device-resident batch, so it
measures the device step alone; this script measures what a user
actually gets — host loader + prefetcher + transfer + device step —
by parsing run_train's periodic rays/s lines (wall-clock, post-warmup
median).  The gap between the two is the host pipeline's overhead
(reference analog: torch DataLoader feeding, core/load_data.py:78-80).

Usage: python scripts/bench_sustained.py [--steps 600] [--size 512]
Prints one JSON line.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=600)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--frames', type=int, default=30)
    ap.add_argument('--i_print', type=int, default=50)
    ap.add_argument('--spd', type=int, default=1)
    ap.add_argument('--out', type=str, default=None)
    args = ap.parse_args()

    sys.path.insert(0, _REPO)
    from anerf_tpu.data.h5_writer import make_synthetic_h5

    work = args.out or tempfile.mkdtemp(prefix='bench_sustained_')
    os.makedirs(work, exist_ok=True)
    h5 = make_synthetic_h5(os.path.join(work, 'scene.h5'),
                           n_frames=args.frames, H=args.size, W=args.size)

    cmd = [
        sys.executable, os.path.join(_REPO, 'run_train.py'),
        '--config', os.path.join(_REPO, 'configs', 'synthetic_tiny.txt'),
        '--expname', 'bench_sustained', '--basedir', work,
        '--datadir', h5,
        # SURREAL flagship recipe (configs/surreal.txt) on the bench
        # dtype/backend (BASELINE.md)
        '--N_sample_images', '128', '--N_rand', '2048',
        '--N_samples', '64', '--N_importance', '16',
        '--netdepth', '8', '--netwidth', '256',
        '--multires', '7', '--multires_views', '4',
        '--raw_noise_std', '1.0', '--compute_dtype', 'bfloat16',
        '--opt_pose', 'True', '--opt_pose_step', '2',
        '--n_iters', str(args.steps),
        '--i_print', str(args.i_print),
        '--i_weights', '1000000', '--i_pose_weights', '1000000',
        '--i_testset', '1000000', '--num_workers', '2',
        '--steps_per_dispatch', str(args.spd),
    ]
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(_REPO, '.jax_cache'),
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES='-1',
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS='0')
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                          cwd=_REPO, env=env)
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    rates = [float(m.group(1)) for m in
             re.finditer(r'rays/s=(\d+)', proc.stdout)]
    if proc.returncode != 0 or len(rates) < 3:
        print(json.dumps({'error': 'run failed', 'rc': proc.returncode}))
        sys.exit(1)
    post = sorted(rates[1:])          # drop compile/warmup window
    med = post[len(post) // 2]
    print(json.dumps({
        'metric': 'sustained_train_rays_per_sec', 'value': med,
        'unit': 'rays/s', 'all_windows': rates,
        'steps': args.steps, 'size': args.size, 'spd': args.spd}))


if __name__ == '__main__':
    main()
