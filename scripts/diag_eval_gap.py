"""Diagnose the bench.py-vs-bench_eval_variants eval throughput gap.

Times the SAME fwd-only chunk computation through several call shapes to
find which factor costs 2x (VERDICT r3 weak #1):
  A. direct-jit chunk fn, fresh process state     (bench_eval_variants)
  B. ImageRenderer._chunk_fn                      (bench.py)
  C. B but after running train steps first        (bench.py ordering)
  D. B with opt_pose=True flagship                (bench.py build)

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python scripts/diag_eval_gap.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, args, n_it=50):
    import jax.numpy as jnp
    out = fn(*args)
    first = out['rgb_map'] if isinstance(out, dict) else out[0]
    _ = float(jnp.sum(first))
    t0 = time.perf_counter()
    acc = None
    for _ in range(n_it):
        out = fn(*args)
        rgb = out['rgb_map'] if isinstance(out, dict) else out[0]
        acc = rgb if acc is None else acc + rgb
    _ = float(jnp.sum(acc))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from anerf_tpu import testing_utils as T
    from anerf_tpu.models.raycaster import render_rays
    from anerf_tpu.models.factory import embed_state
    from anerf_tpu.render.renderer import ImageRenderer

    n_rays = 2048
    results = {}

    # --- variant A: exactly bench_eval_variants (opt_pose=False, direct jit)
    setup, state, batch, _ = T.build_flagship(
        n_rays=n_rays, opt_pose=False, compute_dtype='bfloat16')
    params = state['params']
    est = embed_state(setup.cfg, setup.rc, 0)
    pose = {k: batch[k] for k in ('kps', 'skts', 'bones', 'cyls')}
    rc_ev = setup.rc.eval_variant()

    def chunk_fn(params, rays_o, rays_d, pose, cam_idxs):
        out = render_rays(rc_ev, params, rays_o, rays_d, 0.0, 1.0,
                          pose, est, cam_idxs=cam_idxs)
        return out['rgb_map'], out['disp_map'], out['acc_map']

    fn = jax.jit(chunk_fn)
    dt = timeit(fn, (params, batch['rays_o'], batch['rays_d'], pose,
                     batch['cam_idxs']))
    results['A_direct_jit'] = round(n_rays * 50 / dt, 1)
    print('A', results['A_direct_jit'], flush=True)

    # --- variant B: ImageRenderer, same fresh-ish process
    renderer = ImageRenderer(setup.rc, params, est, chunk=n_rays,
                             near=0.0, far=1.0)
    dt = timeit(renderer._chunk_fn,
                (params, batch['rays_o'], batch['rays_d'], pose,
                 batch['cam_idxs']))
    results['B_renderer'] = round(n_rays * 50 / dt, 1)
    print('B', results['B_renderer'], flush=True)

    # --- variant D: bench.py's build (opt_pose=True) + renderer
    setup2, state2, batch2, step_fn = T.build_flagship(
        n_rays=n_rays, opt_pose=True, compute_dtype='bfloat16')
    est2 = embed_state(setup2.cfg, setup2.rc, 0)
    pose2 = {k: batch2[k] for k in ('kps', 'skts', 'bones', 'cyls')}
    renderer2 = ImageRenderer(setup2.rc, state2['params'], est2,
                              chunk=n_rays, near=0.0, far=1.0)
    dt = timeit(renderer2._chunk_fn,
                (state2['params'], batch2['rays_o'], batch2['rays_d'],
                 pose2, batch2['cam_idxs']))
    results['D_optpose_renderer'] = round(n_rays * 50 / dt, 1)
    print('D', results['D_optpose_renderer'], flush=True)

    # --- variant C: run the train bench first (donated multi-step), then eval
    from anerf_tpu.training.trainer import make_multi_train_step
    spd = 10
    multi = jax.jit(make_multi_train_step(setup2, spd), donate_argnums=(0,))
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (spd,) + x.shape), batch2)
    rng = jax.random.PRNGKey(0)
    st = state2
    st, stats = multi(st, batches, rng)
    _ = float(stats['total_loss'])
    for _ in range(5):
        st, stats = multi(st, batches, rng)
    _ = float(stats['total_loss'])
    dt = timeit(renderer2._chunk_fn,
                (st['params'], batch2['rays_o'], batch2['rays_d'],
                 pose2, batch2['cam_idxs']))
    results['C_after_train'] = round(n_rays * 50 / dt, 1)
    print('C', results['C_after_train'], flush=True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
