"""Eval-path (fwd-only) backend/tile sweep on the real chip.

The train path won with the fused Pallas kernel; the eval path was left
on XLA (raycaster.eval_variant).  This sweep times the fwd-only
renderer-chunk computation for each backend/tile so the eval default is
measured, not assumed.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_eval_variants.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from anerf_tpu import testing_utils as T
    from anerf_tpu.models.raycaster import render_rays
    from anerf_tpu.models.factory import embed_state
    from anerf_tpu.ops import pallas_encmlp as PE

    n_rays = int(os.environ.get('N_RAYS', 2048))
    setup, state, batch, _ = T.build_flagship(
        n_rays=n_rays, opt_pose=False, compute_dtype='bfloat16')
    params = state['params']
    est = embed_state(setup.cfg, setup.rc, 0)
    pose = {k: batch[k] for k in ('kps', 'skts', 'bones', 'cyls')}

    variants = [('xla', None, False)]
    for tile in (512, 1024, 2048, 4096):
        variants.append((f'pallas_t{tile}', tile, False))
    # viewfac at the smaller tile: the per-kernel cost gate excludes
    # tile 1024 (0.97x) but tile 512 factorizes at 0.67x views MACs —
    # whether that beats the bigger tile's DMA efficiency is measured
    # here, not assumed
    # viewfac only at tile 512: the per-kernel cost gate in
    # PE._build_call disables the factorization at tile 1024
    # (J*(nblkJ+1024) >= 0.9*S*nblkJ at the flagship shape), so a
    # 't1024_viewfac' row would measure a configuration identical to
    # plain t1024 and read as a viewfac effect that is pure noise
    # (round-5 code-review finding; confirmed: 387.5 vs 386.4, +-1%)
    variants += [('pallas_t512_viewfac', 512, True)]
    # in-kernel rigid transform (fuse_tform): full-step benches measured
    # eval 386-388k vs 383-385k default across three runs — inside the
    # window band; this focused sweep settles whether the fwd-only win
    # is real (repeat each variant via N_REPS for a band, default 3)
    variants += [('pallas_t1024_fusetf', 1024, 'fuse'),
                 ('pallas_t2048_fusetf', 2048, 'fuse')]

    n_reps = int(os.environ.get('N_REPS', 1))
    results = {}
    for name, tile, mode in variants:
        rc = setup.rc.eval_variant()
        if tile is None:
            # force the XLA path: build_flagship's 'auto' resolves to
            # pallas on TPU, which silently made this variant a
            # pallas-default-tile run
            rc = dataclasses.replace(rc, mlp_backend='xla')
        else:
            # eval_variant pins pallas_tile (which overrides
            # PE.DEFAULT_TILE — the old module-global override was
            # silently dead), so replace the field itself
            rc = dataclasses.replace(rc, mlp_backend='pallas',
                                     pallas_tile=tile,
                                     viewfac=(mode is True),
                                     fuse_tform=(mode == 'fuse'))

        def chunk_fn(params, rays_o, rays_d, pose, cam_idxs, rc=rc):
            out = render_rays(rc, params, rays_o, rays_d, 0.0, 1.0,
                              pose, est, cam_idxs=cam_idxs)
            return out['rgb_map'], out['disp_map'], out['acc_map']

        fn = jax.jit(chunk_fn)
        try:
            rgb, _, _ = fn(params, batch['rays_o'], batch['rays_d'], pose,
                           batch['cam_idxs'])
            _ = float(jnp.sum(rgb))
        except Exception as e:
            results[name] = f'FAIL {type(e).__name__}'
            continue
        n_it = 50
        windows = []
        for _rep in range(n_reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(n_it):
                rgb, _, _ = fn(params, batch['rays_o'], batch['rays_d'],
                               pose, batch['cam_idxs'])
                acc = rgb if acc is None else acc + rgb
            _ = float(jnp.sum(acc))
            dt = time.perf_counter() - t0
            windows.append(round(n_rays * n_it / dt, 1))
        results[name] = max(windows) if n_reps > 1 else windows[0]
        print(f'{name}: {results[name]} rays/s'
              + (f' windows={windows}' if n_reps > 1 else ''), flush=True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
