"""Golden tests for ray generation and sampling against numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from anerf_tpu.ops import rays as ray_ops


def test_get_rays_matches_np():
    H, W, focal = 12, 16, 20.0
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]])
    c2w[:3, 3] = [0.5, -1.0, 2.0]
    ro_np, rd_np = ray_ops.get_rays_np(H, W, focal, c2w)
    ro, rd = ray_ops.get_rays(H, W, focal, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro), ro_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_np, atol=1e-5)


def test_get_rays_pixel_convention():
    # ray through the principal point looks along -z (camera identity)
    H = W = 8
    ro, rd = ray_ops.get_rays(H, W, 10.0, jnp.eye(4))
    center_dir = np.asarray(rd)[H // 2, W // 2]
    np.testing.assert_allclose(center_dir, [0., 0., -1.], atol=1e-6)


def test_sample_from_lineseg_deterministic():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = ray_ops.sample_from_lineseg(near, far, 8, perturb=0.)
    assert z.shape == (5, 8)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2., 6., 8),
                               atol=1e-6)


def test_sample_from_lineseg_perturb_with_fixed_uniforms():
    """Replicates the reference's pytest=True deterministic jitter
    (ray_utils.py:240-244)."""
    near = np.full((4, 1), 1.0, np.float32)
    far = np.full((4, 1), 3.0, np.float32)
    N = 6
    np.random.seed(0)
    u = np.random.rand(4, N).astype(np.float32)

    # numpy oracle
    t = np.linspace(0., 1., N)
    z = near * (1. - t) + far * t
    mids = .5 * (z[..., 1:] + z[..., :-1])
    upper = np.concatenate([mids, z[..., -1:]], -1)
    lower = np.concatenate([z[..., :1], mids], -1)
    ref = lower + (upper - lower) * u

    ours = ray_ops.sample_from_lineseg(jnp.asarray(near), jnp.asarray(far),
                                       N, perturb=1., u=jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def np_sample_pdf(bins, weights, u):
    """Numpy oracle of inverse-CDF sampling (reference semantics)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(c, uu, side='right')
                     for c, uu in zip(cdf, u)])
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = np.take_along_axis(cdf, below, -1)
    cdf_a = np.take_along_axis(cdf, above, -1)
    bins_b = np.take_along_axis(bins, np.minimum(below, bins.shape[-1] - 1), -1)
    bins_a = np.take_along_axis(bins, np.minimum(above, bins.shape[-1] - 1), -1)
    denom = cdf_a - cdf_b
    denom = np.where(denom < 1e-5, 1., denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def test_sample_pdf_matches_oracle():
    rng = np.random.RandomState(0)
    R, M, N = 16, 9, 5
    bins = np.sort(rng.uniform(0, 4, size=(R, M)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(R, M - 1)).astype(np.float32)
    np.random.seed(0)
    u = np.random.rand(R, N).astype(np.float32)
    ref = np_sample_pdf(bins, weights, u)
    ours = ray_ops.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), N,
                              u=jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_sample_pdf_det_mode():
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32)[None].repeat(3, 0))
    w = jnp.ones((3, 8))
    s = ray_ops.sample_pdf(bins, w, 4, det=True)
    assert s.shape == (3, 4)
    assert float(s.min()) >= 0. and float(s.max()) <= 1.


def test_sample_pdf_stops_gradient():
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32)[None])
    def f(w):
        return ray_ops.sample_pdf(bins, w, 4, det=True).sum()
    g = jax.grad(f)(jnp.ones((1, 8)))
    np.testing.assert_allclose(np.asarray(g), 0.)


def test_isample_merge_sorted():
    rng = np.random.RandomState(1)
    z_vals = np.sort(rng.uniform(0, 2, size=(4, 8)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(4, 8)).astype(np.float32)
    np.random.seed(0)
    u = np.random.rand(4, 3).astype(np.float32)
    z_m, z_s, idxs = ray_ops.isample_from_lineseg(
        jnp.asarray(z_vals), jnp.asarray(weights), 3, u=jnp.asarray(u))
    z_m = np.asarray(z_m)
    assert z_m.shape == (4, 11)
    assert (np.diff(z_m, axis=-1) >= 0).all()
    # sorted_idxs reorders the concatenation correctly
    z_cat = np.concatenate([z_vals, np.asarray(z_s)], -1)
    np.testing.assert_allclose(
        np.take_along_axis(z_cat, np.asarray(idxs), -1), z_m, atol=0)


def test_cylinder_near_far():
    # ray through the center of a cylinder of radius 1 at origin
    rays_o = np.array([[-5., 0., 0.]], np.float32)
    rays_d = np.array([[1., 0., 0.]], np.float32)
    cyl = np.array([[0., 0., 1., 2., -2.]], np.float32)
    near, far = ray_ops.get_near_far_in_cylinder(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(cyl),
        near=0.35, far=10.)
    # intersections at x=-1 (t=4) and x=+1 (t=6)
    np.testing.assert_allclose(float(near[0, 0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0, 0]), 6.0, atol=1e-5)


def test_cylinder_near_far_miss_falls_back():
    rays_o = np.array([[-5., 0., 3.]], np.float32)   # passes z=3 > r=1
    rays_d = np.array([[1., 0., 0.]], np.float32)
    cyl = np.array([[0., 0., 1., 2., -2.]], np.float32)
    near, far = ray_ops.get_near_far_in_cylinder(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(cyl),
        near=0.35, far=10.)
    assert np.isfinite(np.asarray(near)).all()
    np.testing.assert_allclose(float(near[0, 0]), 0.35, atol=1e-6)
    np.testing.assert_allclose(float(far[0, 0]), 10.0, atol=1e-6)


def test_cylinder_near_far_matches_np_twin():
    rng = np.random.RandomState(2)
    rays_o = rng.normal(size=(32, 3)).astype(np.float32) * 2
    rays_o[:, 1] = 0.
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cyl = np.tile(np.array([[0., 0., 3., 2., -2.]], np.float32), (32, 1))
    ours_n, ours_f = ray_ops.get_near_far_in_cylinder(
        jnp.asarray(rays_o), jnp.asarray(dirs), jnp.asarray(cyl),
        near=0.35, far=20.)
    ref_n, ref_f = ray_ops.get_near_far_in_cylinder_np(
        rays_o, dirs, cyl, near=0.35, far=20.)
    # compare on intersecting rays only: the jnp version fills misses
    # with the batch mean (like the reference's NaN patch-up), the np
    # twin with the input bounds.
    hit = (ref_f < 20.)[:, 0]
    np.testing.assert_allclose(np.asarray(ours_n)[hit], ref_n[hit], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_f)[hit], ref_f[hit], atol=1e-3)
