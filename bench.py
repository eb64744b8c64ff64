"""Benchmark: training rays/s (fwd+bwd+update) on the SURREAL recipe.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against a fixed anchor: the reference
PyTorch implementation's per-iteration work at the SURREAL recipe
(N_rand=2048, 64+16 samples) on its unspecified single GPU, which we
conservatively peg at 30k rays/s (a 2080Ti-class estimate for
nerf-pytorch-style code).  vs_baseline = ours / anchor.
"""
import json
import time

REFERENCE_ANCHOR_RAYS_PER_SEC = 30_000.0


def main():
    import jax
    # persistent compile cache: repeated bench runs (and the driver's)
    # skip the expensive remote compile entirely
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        pass
    from anerf_tpu import testing_utils as T

    n_rays = 2048
    setup, state, batch, step_fn = T.build_flagship(
        n_rays=n_rays, opt_pose=True, compute_dtype='bfloat16')

    # fold the per-step RNG inside the compiled step (keyed off the step
    # counter) — a host-side fold_in would dispatch a second tiny device
    # program per iteration, which costs ~3ms/step over the tunnel
    def stepper(state, batch, rng):
        return step_fn(state, batch, jax.random.fold_in(rng, state['step']))
    step = jax.jit(stepper, donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    # warmup / compile; float() forces a host fetch — on this tunnel
    # transport block_until_ready can ack before execution finishes, so
    # every timing boundary must be a host readback of a value that
    # depends on the full chain of steps.
    state, stats = step(state, batch, rng)
    _ = float(stats['total_loss'])

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, stats = step(state, batch, rng)
    _ = float(stats['total_loss'])   # depends on all prior steps via state
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * n_iters / dt
    print(json.dumps({
        'metric': 'train_rays_per_sec',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s/chip',
        'vs_baseline': round(rays_per_sec / REFERENCE_ANCHOR_RAYS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
