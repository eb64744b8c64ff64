"""Sweep the fused-kernel point-tile size on the real chip."""
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from anerf_tpu import testing_utils as T
from anerf_tpu.ops import pallas_encmlp as PE


def main():
    for tile, bwd in ((512, 512), (512, 1024), (1024, 1024), (512, 2048), (1024, 512), (2048, 512)):
        PE.DEFAULT_TILE = tile
        PE.DEFAULT_BWD_TILE = bwd
        try:
            setup, state, batch, step_fn = T.build_flagship(
                n_rays=2048, opt_pose=True, compute_dtype='bfloat16')

            def stepper(state, batch, rng):
                k = jax.random.fold_in(rng, state['step'])
                return step_fn(state, batch, k)
            step = jax.jit(stepper, donate_argnums=(0,))
            rng = jax.random.PRNGKey(0)
            state, stats = step(state, batch, rng)
            _ = float(stats['total_loss'])
            t0 = time.perf_counter()
            for _ in range(30):
                state, stats = step(state, batch, rng)
            _ = float(stats['total_loss'])
            dt = (time.perf_counter() - t0) / 30
            print(f'tile={tile:5d} bwd={bwd:5d}  {dt*1e3:7.2f} ms/step  '
                  f'{2048/dt:9.0f} rays/s')
        except Exception as e:
            print(f'tile={tile:5d} bwd={bwd:5d}  FAILED: {str(e)[:200]}')


if __name__ == '__main__':
    main()
