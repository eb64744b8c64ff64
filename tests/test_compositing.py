"""Golden tests for alpha compositing (numpy oracle)."""
import numpy as np
import jax
import jax.numpy as jnp

from anerf_tpu.ops import compositing


def oracle_raw2outputs(raw, z_vals, rays_d, noise=0., B=1.0, act=np.maximum,
                       rgb_eps=0.001):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1. / (1. + np.exp(-raw[..., :3])) * (1 + 2 * rgb_eps) - rgb_eps
    sigma = np.maximum(raw[..., 3] / B + noise, 0.)
    alpha = 1. - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alpha[..., :1]), 1. - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth = (weights * z_vals).sum(-1)
    acc_raw = weights.sum(-1)
    disp = 1. / np.maximum(1e-10, depth / (acc_raw + 1e-10))
    disp = np.where(np.isclose(acc_raw, 0.), 0., disp)
    return rgb_map, disp, np.minimum(acc_raw, 1.), weights, alpha


def test_raw2outputs_matches_oracle():
    rng = np.random.RandomState(0)
    R, S = 8, 16
    raw = rng.normal(size=(R, S, 4)).astype(np.float32) * 2
    z_vals = np.sort(rng.uniform(1., 3., size=(R, S)).astype(np.float32), -1)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    out = compositing.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                                  jnp.asarray(rays_d))
    rgb, disp, acc, w, a = oracle_raw2outputs(raw, z_vals, rays_d)
    np.testing.assert_allclose(np.asarray(out['rgb_map']), rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['disp_map']), disp, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['acc_map']), acc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['weights']), w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['alpha']), a, atol=1e-5)


def test_raw2outputs_with_noise_and_scale():
    rng = np.random.RandomState(1)
    R, S = 4, 8
    raw = rng.normal(size=(R, S, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(1., 3., size=(R, S)).astype(np.float32), -1)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    noise = rng.normal(size=(R, S)).astype(np.float32)
    B = 0.5
    out = compositing.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                                  jnp.asarray(rays_d),
                                  noise=jnp.asarray(noise), density_scale=B)
    rgb, disp, acc, w, a = oracle_raw2outputs(raw, z_vals, rays_d,
                                              noise=noise, B=B)
    np.testing.assert_allclose(np.asarray(out['rgb_map']), rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['alpha']), a, atol=1e-5)


def test_empty_ray_gives_zero_disp_and_acc():
    R, S = 2, 8
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., 3] = -100.  # no density
    z_vals = np.linspace(1., 2., S, dtype=np.float32)[None].repeat(R, 0)
    rays_d = np.ones((R, 3), np.float32)
    out = compositing.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                                  jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out['acc_map']), 0., atol=1e-6)
    np.testing.assert_allclose(np.asarray(out['disp_map']), 0., atol=1e-6)


def test_opaque_wall_hits_expected_depth():
    """A very dense slab at one sample should put all weight there."""
    R, S = 1, 32
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., 3] = -100.
    raw[0, 10, 3] = 1e4
    z_vals = np.linspace(1., 2., S, dtype=np.float32)[None]
    rays_d = np.array([[0., 0., 1.]], np.float32)
    out = compositing.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                                  jnp.asarray(rays_d))
    w = np.asarray(out['weights'])
    assert w[0, 10] > 0.99
    np.testing.assert_allclose(float(out['acc_map'][0]), 1., atol=1e-4)


def test_softplus_density():
    act = compositing.get_density_fn('softplus', softplus_shift=1.0)
    x = jnp.asarray([-1., 0., 1., 5.])
    ref = np.log1p(np.exp(np.asarray([-2., -1., 0., 4.])))
    np.testing.assert_allclose(np.asarray(act(x)), ref, rtol=1e-5)


def test_grad_flows_through_compositing():
    rng = np.random.RandomState(2)
    raw = jnp.asarray(rng.normal(size=(4, 8, 4)).astype(np.float32))
    z_vals = jnp.asarray(np.sort(rng.uniform(1., 2., (4, 8)), -1).astype(
        np.float32))
    rays_d = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))

    def f(raw):
        return compositing.raw2outputs(raw, z_vals, rays_d)['rgb_map'].sum()

    g = np.asarray(jax.grad(f)(raw))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_raw2outputs_merged_matches_permuted():
    """raw2outputs_merged(raw_cat, z_cat, P) == raw2outputs(P-sorted
    raw, sorted z) — the scalar-permute merge is exactly the reference's
    sort-then-composite (raycasters.py:796-812 + nerf.py:150-205)."""
    rng = np.random.RandomState(3)
    R, K = 6, 12
    raw_cat = jnp.asarray(rng.normal(size=(R, K, 4)).astype(np.float32))
    z_cat = jnp.asarray(rng.uniform(1., 2., (R, K)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    ranks = jnp.argsort(jnp.argsort(z_cat, axis=-1), axis=-1)
    P = jax.nn.one_hot(ranks, K, dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32)) * 0.1

    got = compositing.raw2outputs_merged(raw_cat, z_cat, P, rays_d,
                                         noise=noise)

    perm = jnp.argsort(z_cat, axis=-1)
    raw_sorted = jnp.take_along_axis(raw_cat, perm[..., None], axis=1)
    z_sorted = jnp.take_along_axis(z_cat, perm, axis=1)
    ref = compositing.raw2outputs(raw_sorted, z_sorted, rays_d,
                                  noise=noise)

    for k in ('rgb_map', 'disp_map', 'acc_map', 'depth_map', 'weights',
              'alpha'):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-6, atol=2e-6, err_msg=k)

    # gradients must flow to the unsorted raw and depths identically
    def loss_merged(raw_cat, z_cat):
        o = compositing.raw2outputs_merged(raw_cat, z_cat, P, rays_d,
                                           noise=noise)
        return o['rgb_map'].sum() + o['disp_map'].sum()

    def loss_ref(raw_cat, z_cat):
        raw_s = jnp.take_along_axis(raw_cat, perm[..., None], axis=1)
        z_s = jnp.take_along_axis(z_cat, perm, axis=1)
        o = compositing.raw2outputs(raw_s, z_s, rays_d, noise=noise)
        return o['rgb_map'].sum() + o['disp_map'].sum()

    ga = jax.grad(loss_merged, argnums=(0, 1))(raw_cat, z_cat)
    gb = jax.grad(loss_ref, argnums=(0, 1))(raw_cat, z_cat)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
