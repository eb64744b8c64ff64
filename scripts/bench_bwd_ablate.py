"""Ablate the dual fused kernel's backward to locate its time.

Variants (monkeypatched, flagship shapes):
  full        — as shipped
  no-pullback — _encode_pullback returns zeros (bounds any pullback)
  no-encbwd   — encode recompute feeds the MLP, but neither pullback
                nor dp/denc math (bounds encode-bwd incl. cotangent prep)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from anerf_tpu.ops import pallas_encmlp as PE
from anerf_tpu.ops.pallas_mlp import MLPStatic


def timeit(f, *args, n=30):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def build(tile=512, bwd_tile=512):
    J, F, Fv = 24, 7, 4
    S = 64
    n_rays = 2048
    n = n_rays * S
    W, D = 256, 8
    view_nb = 1 + 2 * Fv
    dparts = (J * (2 * F + 1), 3 * J)
    vparts = (view_nb * 3 * J, 16)
    st = MLPStatic(depth=D, width=W, dparts=dparts, vparts=vparts,
                   half=W // 2, skips=(4,), tile=tile, bwd_tile=bwd_tile,
                   interpret=False)
    est = PE.EncStatic(J=J, kp_freqs=tuple(float(2 ** k) for k in range(F)),
                       view_nb=view_nb, S=S, rpt=tile // S, has_codes=True)
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (n, 3 * J), jnp.float32)
    enc_ray = jax.random.normal(key, (n_rays, view_nb * 3 * J), jnp.float32)
    codes_c = jax.random.normal(key, (n_rays, 16), jnp.float32)
    codes_f = jax.random.normal(key, (n_rays, 16), jnp.float32)
    cutoff = jnp.ones((1, J), jnp.float32)
    tau = jnp.ones((1, 1), jnp.float32) * 5.
    shapes = PE._weight_shapes(st)
    flat = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32)
            .astype(d) * 0.05 for i, (s, d) in enumerate(shapes)]
    return st, est, (p, enc_ray, codes_c, codes_f, cutoff, tau, flat, flat)


def main():
    st, est, args = build()
    p, enc_ray, codes_c, codes_f, cutoff, tau, flat_c, flat_f = args

    def loss(p, enc_ray, codes_c, codes_f, flat_c, flat_f):
        o_c, o_f = PE._fused_dual(st, est, p, enc_ray, codes_c, codes_f,
                                  cutoff, tau, flat_c, flat_f)
        return jnp.sum(o_c * o_c) + jnp.sum(o_f * o_f)

    def run(tag):
        jbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        t = timeit(jbwd, p, enc_ray, codes_c, codes_f, flat_c, flat_f)
        print(f'{tag:12s} grad(fwd+bwd) {t:7.3f} ms', flush=True)
        return t

    run('full')

    orig_pull = PE._encode_pullback

    def zero_pull(est_, p_, enc_, res, tau_, gv, gr, gxv):
        J = est_.J
        nbJ3 = est_.view_nb * 3 * J
        return (jnp.zeros_like(p_),
                jnp.zeros((est_.rpt, nbJ3), jnp.float32))

    PE._encode_pullback = zero_pull
    try:
        run('no-pullback')
    finally:
        PE._encode_pullback = orig_pull


if __name__ == '__main__':
    main()
