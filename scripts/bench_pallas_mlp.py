"""Fused Pallas MLP vs XLA MLP: fwd and fwd+bwd at flagship size."""
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from anerf_tpu.models.nerf_mlp import (NeRFConfig, init_nerf_params,
                                       nerf_forward)
from anerf_tpu.ops import pallas_mlp


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f'{name:34s} {dt*1e3:8.2f} ms')


def main():
    cfg = NeRFConfig(input_ch=360, input_ch_bones=72, input_ch_views=648,
                     use_framecode=True, n_framecodes=9,
                     compute_dtype=jnp.bfloat16)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    n = 2048 * 80
    kx, kv, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (n, cfg.dnet_input), jnp.bfloat16)
    xv = jax.random.normal(kv, (n, cfg.input_ch_views), jnp.bfloat16)
    fc_idx = jnp.zeros((n,), jnp.int32)
    tgt = jax.random.normal(kg, (n, 4), jnp.float32)

    import os
    if not os.environ.get('SKIP_XLA'):
        xla_fwd = jax.jit(lambda p, x, xv: nerf_forward(p, cfg, x, xv, fc_idx))
        timeit('XLA fwd', xla_fwd, params, x, xv)

    import functools
    T = int(os.environ.get('T', 1024)); BT = int(os.environ.get('BT', 512))
    def pl_call(p, x, xv):
        codes = p['framecodes'][fc_idx].astype(jnp.bfloat16)
        return pallas_mlp.nerf_mlp_pallas(
            p, cfg, x, jnp.concatenate([xv, codes], -1), tile=T, bwd_tile=BT)
    pl_fwd = jax.jit(pl_call)
    timeit(f'Pallas fwd (T={T})', pl_fwd, params, x, xv)

    if not os.environ.get('SKIP_XLA'):
        xla_g = jax.jit(jax.grad(
            lambda p, x, xv: jnp.mean((nerf_forward(p, cfg, x, xv, fc_idx)
                                       - tgt) ** 2)))
        timeit('XLA fwd+bwd', xla_g, params, x, xv)

    pl_g = jax.jit(jax.grad(
        lambda p, x, xv: jnp.mean((pl_call(p, x, xv) - tgt) ** 2)))
    timeit(f'Pallas fwd+bwd (BT={BT})', pl_g, params, x, xv)


if __name__ == '__main__':
    main()
