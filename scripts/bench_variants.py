"""Attribute full-train-step time by toggling one knob at a time.

Each variant is the flagship SURREAL-recipe step with a single change;
timings are end-to-end (fwd+bwd+update) with a host readback fence.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from anerf_tpu import testing_utils as T


def time_step(tag, n_rays=2048, n_iters=30, fold_in_inside=True, **overrides):
    setup, state, batch, step_fn = T.build_flagship(
        n_rays=n_rays, opt_pose=overrides.pop('opt_pose', True),
        compute_dtype=overrides.pop('compute_dtype', 'bfloat16'),
        **overrides)

    if fold_in_inside:
        def stepper(state, batch, rng):
            k = jax.random.fold_in(rng, state['step'])
            return step_fn(state, batch, k)
    else:
        stepper = step_fn
    step = jax.jit(stepper, donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    state, stats = step(state, batch, rng)
    _ = float(stats['total_loss'])
    t0 = time.perf_counter()
    for i in range(n_iters):
        if fold_in_inside:
            state, stats = step(state, batch, rng)
        else:
            state, stats = step(state, batch, jax.random.fold_in(rng, i))
    _ = float(stats['total_loss'])
    dt = (time.perf_counter() - t0) / n_iters
    print(f'{tag:42s} {dt*1e3:8.2f} ms/step   '
          f'{n_rays/dt:10.0f} rays/s')
    return dt


def main():
    time_step('full (pallas, bf16, pose, remat)')
    time_step('host fold_in dispatch (bench.py today)', fold_in_inside=False)
    time_step('mlp_backend=xla', mlp_backend='xla')
    time_step('no pose opt', opt_pose=False)
    time_step('no remat', remat=False)
    time_step('float32 compute', compute_dtype='float32')
    time_step('coarse only (N_importance=0)', N_importance=0)
    time_step('4096 rays', n_rays=4096)
    time_step('8192 rays', n_rays=8192)


if __name__ == '__main__':
    main()
