"""Measured CPU anchor: the ACTUAL reference implementation vs ours on
the same host CPU, same recipe — replaces the invented single-GPU
estimate with a number anyone can reproduce here.

Both sides run the SURREAL training recipe (N_rand=2048, 64+16 samples,
8x256 MLP, coarse+fine, framecodes) doing fwd + MSE loss (fine+coarse) +
backward + Adam step, no pose optimizer on either side (the pose layer
is a negligible fraction of the step; excluding it keeps the two sides
exactly comparable).

Reference side: /root/reference's own RayCaster.render_rays via the
parity harness (tests/ref_oracle.py) — its real code, not a restatement.

Usage: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
           python scripts/bench_cpu_anchor.py [--iters 5] [--rays 2048]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

N_FRAMES = 9
NEAR, FAR = 0.1, 8.0


def bench_reference(n_rays: int, n_iters: int) -> float:
    import torch
    import ref_oracle

    args = ref_oracle.ref_args(
        tempfile.mkdtemp(), netwidth=256, netdepth=8,
        N_samples=64, N_importance=16, perturb=1.0, raw_noise_std=1.0)
    from anerf_tpu.skeleton import SMPL_REST_POSE
    rest_pose = (SMPL_REST_POSE * 0.001 * 2.2).astype(np.float32)
    caster, rkt = ref_oracle.build_ref_raycaster(
        args, N_FRAMES, rest_pose, near=NEAR, far=FAR)
    optimizer = torch.optim.Adam(
        [p for p in caster.parameters() if p.requires_grad], lr=5e-4)

    from anerf_tpu.testing_utils import synthetic_pose, synthetic_batch
    rest, bones, pelvis, kps, skts, cyls = synthetic_pose(N_FRAMES)
    rng = np.random.RandomState(0)
    kp_idx = rng.randint(0, N_FRAMES, size=(n_rays,))
    t = np.linspace(-0.12, 0.12, n_rays, dtype=np.float32)
    rays_o = np.tile(np.array([[0., 0., 2.7]], np.float32), (n_rays, 1))
    rays_d = np.stack([t, t * 0.5, -np.ones_like(t)], -1)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    ray_batch = torch.from_numpy(np.concatenate(
        [rays_o, rays_d, np.full((n_rays, 1), NEAR, np.float32),
         np.full((n_rays, 1), FAR, np.float32), viewdirs], -1))
    target = torch.from_numpy(
        rng.uniform(0, 1, (n_rays, 3)).astype(np.float32))
    kps_t = torch.from_numpy(kps[kp_idx])
    skts_t = torch.from_numpy(skts[kp_idx])
    bones_t = torch.from_numpy(bones[kp_idx])
    cyls_t = torch.from_numpy(cyls[kp_idx])
    cams_t = torch.from_numpy(kp_idx.astype(np.float32))

    def step():
        optimizer.zero_grad()
        ret = caster.render_rays(
            ray_batch, 64, kps_t, skts=skts_t, cyls=cyls_t, bones=bones_t,
            cams=cams_t, lindisp=False, perturb=1.0, N_importance=16,
            raw_noise_std=1.0, ray_noise_std=0., pytest=False,
            preproc_kwargs=rkt['preproc_kwargs'])
        loss = ((ret['rgb_map'] - target) ** 2).mean() \
            + ((ret['rgb0'] - target) ** 2).mean()
        loss.backward()
        optimizer.step()
        return float(loss)

    step()   # warmup
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    dt = time.perf_counter() - t0
    return n_rays * n_iters / dt


def bench_ours_cpu(n_rays: int, n_iters: int) -> float:
    import jax
    from anerf_tpu import testing_utils as T

    setup, state, batch, step_fn = T.build_flagship(
        n_rays=n_rays, n_frames=N_FRAMES, opt_pose=False,
        compute_dtype='float32')
    step = jax.jit(step_fn, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state, stats = step(state, batch, rng)
    _ = float(stats['total_loss'])
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, stats = step(state, batch, jax.random.fold_in(rng, i))
    _ = float(stats['total_loss'])
    dt = time.perf_counter() - t0
    return n_rays * n_iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--rays', type=int, default=2048)
    ap.add_argument('--skip-ours', action='store_true')
    a = ap.parse_args()

    ref = bench_reference(a.rays, a.iters)
    out = {'metric': 'cpu_anchor_rays_per_sec',
           'reference_torch_cpu': round(ref, 1),
           'n_rays': a.rays, 'iters': a.iters}
    if not a.skip_ours:
        ours = bench_ours_cpu(a.rays, a.iters)
        out['ours_jax_cpu'] = round(ours, 1)
        out['ratio_cpu'] = round(ours / ref, 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
