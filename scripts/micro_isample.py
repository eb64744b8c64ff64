"""Microbenchmark pieces of isample_from_lineseg + raw2outputs to find
the slow TPU lowering."""
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


def main():
    R, S, I = 2048, 64, 16
    rng = jax.random.PRNGKey(0)
    z = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S), (R, S))
    zs = jax.random.uniform(rng, (R, I)) * 1.9 + 0.1
    w = jnp.abs(jax.random.normal(rng, (R, S)))
    ranks = jax.random.permutation(rng, jnp.broadcast_to(
        jnp.arange(S + I), (R, S + I)), axis=1, independent=True)
    z_cat = jnp.concatenate([z, zs], -1)

    timeit('noop (dispatch floor)', jax.jit(lambda a: a + 1.), z)
    timeit('argsort (R,16)', jax.jit(lambda a: jnp.argsort(a, -1)), zs)
    timeit('argsort x2 (rank via argsort)', jax.jit(
        lambda a: jnp.argsort(jnp.argsort(a, -1), -1)), zs)
    timeit('cmp-count rank (R,16,16)', jax.jit(
        lambda a: jnp.sum(a[..., None, :] < a[..., :, None], -1)), zs)
    timeit('searchsorted cmp (R,16,65)', jax.jit(
        lambda c, u: jnp.sum(c[..., None, :] <= u[..., :, None], -1)),
        jnp.pad(jnp.cumsum(w, -1), ((0, 0), (1, 0))), zs)
    timeit('take_along_axis x4 (R,16)', jax.jit(
        lambda c, i: sum(jnp.take_along_axis(c, i, -1) for _ in range(4))),
        z, jnp.clip(jnp.argsort(zs, -1), 0, S - 1))
    timeit('put_along_axis (R,80)', jax.jit(
        lambda zc, r: jnp.put_along_axis(jnp.zeros_like(zc), r, zc, axis=-1,
                                         inplace=False)), z_cat, ranks)
    timeit('one-hot merge matmul (R,80,80)', jax.jit(
        lambda zc, r: jnp.einsum(
            'rk,rkp->rp', zc,
            (r[..., None] == jnp.arange(S + I)).astype(zc.dtype))),
        z_cat, ranks)
    timeit('sort (R,80)', jax.jit(lambda a: jnp.sort(a, -1)), z_cat)
    timeit('random.uniform (R,16)', jax.jit(
        lambda k: jax.random.uniform(k, (R, I))), rng)

    from anerf_tpu.ops import rays as ray_ops
    timeit('isample full (current)', jax.jit(
        lambda w, k: ray_ops.isample_from_lineseg(z, w, I, det=False,
                                                  rng=k)), w, rng)
    timeit('sample_pdf only', jax.jit(
        lambda w, k: ray_ops.sample_pdf(
            .5 * (z[..., 1:] + z[..., :-1]), w[..., 1:-1], I, rng=k)),
        w, rng)

    # compositing
    from anerf_tpu.ops import compositing
    raw = jax.random.normal(rng, (R, S + I, 4))
    rays_d = jax.random.normal(rng, (R, 3))
    zm = jnp.sort(jax.random.uniform(rng, (R, S + I)), -1)
    timeit('raw2outputs (R,80)', jax.jit(
        lambda raw: compositing.raw2outputs(raw, zm, rays_d)), raw)
    timeit('cumprod (R,80)', jax.jit(
        lambda a: jnp.cumprod(a, -1)), zm)
    timeit('cumsum-exp cumprod (R,80)', jax.jit(
        lambda a: jnp.exp(jnp.cumsum(jnp.log(a + 1e-10), -1))), zm)


if __name__ == '__main__':
    main()
