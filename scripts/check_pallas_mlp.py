"""Parity check: fused Pallas MLP vs pure-JAX nerf_forward (fwd + bwd)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from anerf_tpu.models.nerf_mlp import (NeRFConfig, init_nerf_params,
                                       nerf_forward)
from anerf_tpu.ops import pallas_mlp


def main():
    cfg = NeRFConfig(input_ch=360, input_ch_bones=72, input_ch_views=648,
                     use_framecode=True, n_framecodes=9,
                     compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = init_nerf_params(key, cfg)
    n = 1200  # deliberately not a tile multiple
    kx, kv, kf, kg = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(kx, (n, cfg.dnet_input), jnp.float32)
    xv_raw = jax.random.normal(kv, (n, cfg.input_ch_views), jnp.float32)
    fc_idx = jax.random.randint(kf, (n,), 0, 9)

    codes = params['framecodes'][fc_idx]
    xv_full = jnp.concatenate([xv_raw, codes], -1)

    # pure path
    ref = nerf_forward(params, cfg, x.astype(jnp.bfloat16),
                       xv_raw.astype(jnp.bfloat16), fc_idx)
    # pallas path (interpret on CPU), split-part operands as used by the
    # raycaster: x = [kp-enc | bone-enc], xv = [view-enc | framecode]
    got = pallas_mlp.nerf_mlp_pallas(
        params, cfg,
        [x[:, :cfg.input_ch], x[:, cfg.input_ch:]],
        [xv_full[:, :cfg.input_ch_views], xv_full[:, cfg.input_ch_views:]])
    err = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f'fwd max abs err: {err:.3e}  (scale {scale:.3e})')
    assert err < 2e-2 * max(scale, 1.), 'fwd mismatch'

    # bwd parity: grads wrt params, x, xv through a scalar loss
    tgt = jax.random.normal(kg, (n, 4), jnp.float32)

    def loss_pure(params, x, xv_raw):
        out = nerf_forward(params, cfg, x.astype(jnp.bfloat16),
                           xv_raw.astype(jnp.bfloat16), fc_idx)
        return jnp.mean((out - tgt) ** 2)

    def loss_pallas(params, x, xv_raw):
        codes = params['framecodes'][fc_idx]
        out = pallas_mlp.nerf_mlp_pallas(
            params, cfg,
            [x[:, :cfg.input_ch].astype(jnp.bfloat16),
             x[:, cfg.input_ch:].astype(jnp.bfloat16)],
            [xv_raw.astype(jnp.bfloat16), codes.astype(jnp.bfloat16)])
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.grad(loss_pure, argnums=(0, 1, 2))(params, x, xv_raw)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, x, xv_raw)

    flat_ref, tree = jax.tree_util.tree_flatten(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten(g_got)
    worst = 0.
    for a, b in zip(flat_ref, flat_got):
        s = float(jnp.max(jnp.abs(a))) + 1e-8
        e = float(jnp.max(jnp.abs(a - b))) / s
        worst = max(worst, e)
    print(f'bwd worst rel err: {worst:.3e}')
    assert worst < 5e-2, 'bwd mismatch'
    print('PASS')


if __name__ == '__main__':
    main()
