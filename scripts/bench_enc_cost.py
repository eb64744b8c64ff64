"""Micro-bench: how much of the fused dual kernel's fwd/bwd time is the
in-VMEM encode (transcendentals + window multiplies) vs the MLP matmuls?

Times _fused_dual fwd and fwd+bwd at flagship shapes, then re-times with
_encode_tile's transcendentals replaced by cheap polynomials (same
shapes/layout, no sin/sigmoid/sqrt).  The delta bounds what ANY
stash-the-encode or hand-written-pullback scheme could save.
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

    def fwd(p, enc_ray, codes_c, codes_f, flat_c, flat_f):
        o_c, o_f = PE._fused_dual(st, est, p, enc_ray, codes_c, codes_f,
                                  cutoff, tau, flat_c, flat_f)
        return o_c, o_f

    def loss(p, enc_ray, codes_c, codes_f, flat_c, flat_f):
        o_c, o_f = fwd(p, enc_ray, codes_c, codes_f, flat_c, flat_f)
        return jnp.sum(o_c * o_c) + jnp.sum(o_f * o_f)

    jfwd = jax.jit(fwd)
    jbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))

    t_f = timeit(jfwd, p, enc_ray, codes_c, codes_f, flat_c, flat_f)
    t_b = timeit(jbwd, p, enc_ray, codes_c, codes_f, flat_c, flat_f)
    print(f'baseline      fwd {t_f:7.3f} ms   grad(fwd+bwd) {t_b:7.3f} ms')

    # ---- variant: no transcendentals in the encode ----
    orig = PE._encode_tile

    def cheap_encode(est_, pp, enc_blk, cutoff_, tau_):
        J = est_.J
        x, y, z = pp[:, :J], pp[:, J:2 * J], pp[:, 2 * J:]
        d2 = x * x + y * y + z * z
        dists = d2  # no sqrt
        w = 1. - 0.25 * (tau_ * (dists - cutoff_))  # no sigmoid

        def rep(a, k):
            return jnp.concatenate([a] * k, axis=-1)

        F = len(est_.kp_freqs)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * F * J), 1)
        k2 = col // J
        freq_row = jnp.exp2((k2 // 2).astype(jnp.float32))
        phase_row = (k2 % 2).astype(jnp.float32) * (np.pi / 2)
        u = rep(dists, 2 * F) * freq_row + phase_row
        bands = u - 0.5 * u * u  # no sin
        v = jnp.concatenate([dists, bands], axis=-1) * rep(w, 2 * F + 1)
        d3 = rep(dists, 3)
        w3 = rep(w, 3)
        r = pp * (d3 + est_.eps)  # no divide
        if est_.bone_windowed:
            r = r * w3
        nbJ3 = est_.view_nb * 3 * J
        enc_b = jnp.broadcast_to(enc_blk[:, None],
                                 (est_.rpt, est_.S, nbJ3))
        xv = enc_b.reshape(pp.shape[0], nbJ3) * rep(w3, est_.view_nb)
        return v, r, xv

    PE._encode_tile = cheap_encode
    try:
        jfwd2 = jax.jit(fwd)
        jbwd2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        t_f2 = timeit(jfwd2, p, enc_ray, codes_c, codes_f, flat_c, flat_f)
        t_b2 = timeit(jbwd2, p, enc_ray, codes_c, codes_f, flat_c, flat_f)
    finally:
        PE._encode_tile = orig
    print(f'cheap encode  fwd {t_f2:7.3f} ms   grad(fwd+bwd) {t_b2:7.3f} ms')
    print(f'encode transcendental cost: fwd {t_f - t_f2:.3f} ms, '
          f'fwd+bwd {t_b - t_b2:.3f} ms')


if __name__ == '__main__':
    main()
