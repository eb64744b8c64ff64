"""Volume rendering (alpha compositing) in pure JAX.

Matches reference ``NeRF.raw2outputs`` (core/networks/nerf.py:150-205):
alpha = 1 - exp(-act(raw_sigma / B + noise) * delta * ||d||), transmittance
via exclusive cumulative product, sigmoid RGB stretched by +-rgb_eps,
disparity/accumulation/depth maps with the same clamping semantics.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def softplus_shifted(shift: float = 1.0) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Density activation ``softplus(x - shift)``
    (reference core/raycasters.py:230-238)."""
    def act(x):
        return jax.nn.softplus(x - shift)
    return act


def get_density_fn(density_type: str, softplus_shift: float = 1.0):
    if density_type == 'relu':
        return jax.nn.relu
    if density_type == 'softplus':
        return softplus_shifted(softplus_shift)
    raise NotImplementedError(f'density activation {density_type} undefined')


def raw2outputs(raw: jnp.ndarray,
                z_vals: jnp.ndarray,
                rays_d: jnp.ndarray,
                noise: Optional[jnp.ndarray] = None,
                density_scale: float = 1.0,
                act_fn: Callable = jax.nn.relu,
                rgb_eps: float = 0.001) -> Dict[str, jnp.ndarray]:
    """Composite raw MLP outputs along rays.

    Args:
      raw: (N_rays, N_samples, 4) — rgb logits + raw density.
      z_vals: (N_rays, N_samples) sample depths.
      rays_d: (N_rays, 3) (not necessarily unit) ray directions.
      noise: optional (N_rays, N_samples) density regularization noise
        (the caller draws it; reference nerf.py:174-182).
      density_scale: the reference's ``B`` divisor (nerf.py:164).
    Returns:
      dict with rgb_map, disp_map, acc_map, depth_map, weights, alpha.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3]) * (1 + 2 * rgb_eps) - rgb_eps

    sigma = raw[..., 3] / density_scale
    if noise is not None:
        sigma = sigma + noise
    alpha = 1. - jnp.exp(-act_fn(sigma) * dists)

    # Exclusive cumprod of (1 - alpha): T_i = prod_{j<i} (1 - alpha_j).
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1. - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_raw = jnp.sum(weights, -1)
    disp_map = 1. / jnp.maximum(1e-10, depth_map / (acc_raw + 1e-10))
    disp_map = jnp.where(jnp.isclose(acc_raw, 0.), 0., disp_map)
    acc_map = jnp.minimum(acc_raw, 1.)

    return {'rgb_map': rgb_map, 'disp_map': disp_map, 'acc_map': acc_map,
            'depth_map': depth_map, 'weights': weights, 'alpha': alpha}


def raw2outputs_merged(raw_cat: jnp.ndarray,
                       z_cat: jnp.ndarray,
                       P: jnp.ndarray,
                       rays_d: jnp.ndarray,
                       noise: Optional[jnp.ndarray] = None,
                       density_scale: float = 1.0,
                       act_fn: Callable = jax.nn.relu,
                       rgb_eps: float = 0.001) -> Dict[str, jnp.ndarray]:
    """``raw2outputs`` on a sorted union WITHOUT permuting the raw rows.

    The depth-ordered union of coarse+fine samples enters as the
    unsorted concatenation ``raw_cat``/``z_cat`` plus the one-hot rank
    permutation ``P[r, k, p] = 1`` iff concat element k sorts to
    position p.  Only scalar lanes ride through P: depths and densities
    are permuted into depth order for the transmittance scan, and the
    resulting weights are pulled BACK to concat order
    (``w_cat[k] = sum_p P[k,p] w[p]``); every output map is then a
    permutation-invariant reduction in concat order.  Identical math to
    ``raw2outputs`` on P-permuted raw — the reference's
    sort-then-composite (core/raycasters.py:796-812 + nerf.py:150-205)
    — while the fat (R, K, 4) permutation einsum and the layout copies
    XLA wraps around it disappear from the step.

    Args:
      raw_cat: (N_rays, K, 4) raw outputs in concat (unsorted) order.
      z_cat: (N_rays, K) matching depths.
      P: (N_rays, K, K) one-hot rank permutation (stop-gradient).
      noise: optional (N_rays, K) density noise in SORTED layout (the
        reference draws it on the sorted raw, nerf.py:174-182).
    Returns:
      dict as ``raw2outputs``; ``weights``/``alpha`` are in sorted
      (depth) order, matching the reference's fine-pass outputs.
    """
    hi = jax.lax.Precision.HIGHEST
    z_sorted = jnp.einsum('rk,rkp->rp', z_cat, P, precision=hi)

    dists = z_sorted[..., 1:] - z_sorted[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    sigma = raw_cat[..., 3] / density_scale
    sigma = jnp.einsum('rk,rkp->rp', sigma, P, precision=hi)
    if noise is not None:
        sigma = sigma + noise
    alpha = 1. - jnp.exp(-act_fn(sigma) * dists)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1. - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    w_cat = jnp.einsum('rp,rkp->rk', weights, P, precision=hi)

    rgb = jax.nn.sigmoid(raw_cat[..., :3]) * (1 + 2 * rgb_eps) - rgb_eps
    rgb_map = jnp.sum(w_cat[..., None] * rgb, -2)
    depth_map = jnp.sum(w_cat * z_cat, -1)
    acc_raw = jnp.sum(weights, -1)
    disp_map = 1. / jnp.maximum(1e-10, depth_map / (acc_raw + 1e-10))
    disp_map = jnp.where(jnp.isclose(acc_raw, 0.), 0., disp_map)
    acc_map = jnp.minimum(acc_raw, 1.)

    return {'rgb_map': rgb_map, 'disp_map': disp_map, 'acc_map': acc_map,
            'depth_map': depth_map, 'weights': weights, 'alpha': alpha}


def raw2outputs_rows(sig: jnp.ndarray, r: jnp.ndarray, g: jnp.ndarray,
                     b: jnp.ndarray,
                     z_vals: jnp.ndarray,
                     rays_d: jnp.ndarray,
                     noise: Optional[jnp.ndarray] = None,
                     density_scale: float = 1.0,
                     act_fn: Callable = jax.nn.relu,
                     rgb_eps: float = 0.001) -> Dict[str, jnp.ndarray]:
    """``raw2outputs`` on channel ROWS: sig/r/g/b are (N_rays, S).

    The fused Pallas kernels emit raw transposed (4, n) so these
    per-ray channel views are free bitcasts; the dense (R, S, 4)
    variant forces XLA to materialize {2,1,0}<->{0,1,2} relayout
    copies (~0.36 ms/step at the flagship recipe).  Identical math to
    ``raw2outputs`` (reference nerf.py:150-205).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    sigma = sig / density_scale
    if noise is not None:
        sigma = sigma + noise
    alpha = 1. - jnp.exp(-act_fn(sigma) * dists)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1. - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans

    stretch = lambda c: jax.nn.sigmoid(c) * (1 + 2 * rgb_eps) - rgb_eps
    rgb_map = jnp.stack([jnp.sum(weights * stretch(c), -1)
                         for c in (r, g, b)], -1)
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_raw = jnp.sum(weights, -1)
    disp_map = 1. / jnp.maximum(1e-10, depth_map / (acc_raw + 1e-10))
    disp_map = jnp.where(jnp.isclose(acc_raw, 0.), 0., disp_map)
    acc_map = jnp.minimum(acc_raw, 1.)

    return {'rgb_map': rgb_map, 'disp_map': disp_map, 'acc_map': acc_map,
            'depth_map': depth_map, 'weights': weights, 'alpha': alpha}


def raw2outputs_merged_rows(sig_cat: jnp.ndarray, r_cat: jnp.ndarray,
                            g_cat: jnp.ndarray, b_cat: jnp.ndarray,
                            z_cat: jnp.ndarray,
                            P: jnp.ndarray,
                            rays_d: jnp.ndarray,
                            noise: Optional[jnp.ndarray] = None,
                            density_scale: float = 1.0,
                            act_fn: Callable = jax.nn.relu,
                            rgb_eps: float = 0.001
                            ) -> Dict[str, jnp.ndarray]:
    """``raw2outputs_merged`` on channel rows (each (N_rays, K)).

    Same scalar-permute semantics: depths/densities ride the one-hot
    rank permutation ``P`` into depth order, weights ride back, every
    map is a concat-order reduction.
    """
    hi = jax.lax.Precision.HIGHEST
    if P is None:
        # ABLATION ONLY (perf upper bound of in-kernel merge fusion):
        # treat concat order as depth order — WRONG math, never ship
        z_sorted, sig_s = z_cat, sig_cat / density_scale
    else:
        z_sorted = jnp.einsum('rk,rkp->rp', z_cat, P, precision=hi)
        sig_s = jnp.einsum('rk,rkp->rp', sig_cat / density_scale, P,
                           precision=hi)

    dists = z_sorted[..., 1:] - z_sorted[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    sigma = sig_s
    if noise is not None:
        sigma = sigma + noise
    alpha = 1. - jnp.exp(-act_fn(sigma) * dists)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1. - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    w_cat = weights if P is None else \
        jnp.einsum('rp,rkp->rk', weights, P, precision=hi)

    stretch = lambda c: jax.nn.sigmoid(c) * (1 + 2 * rgb_eps) - rgb_eps
    rgb_map = jnp.stack([jnp.sum(w_cat * stretch(c), -1)
                         for c in (r_cat, g_cat, b_cat)], -1)
    depth_map = jnp.sum(w_cat * z_cat, -1)
    acc_raw = jnp.sum(weights, -1)
    disp_map = 1. / jnp.maximum(1e-10, depth_map / (acc_raw + 1e-10))
    disp_map = jnp.where(jnp.isclose(acc_raw, 0.), 0., disp_map)
    acc_map = jnp.minimum(acc_raw, 1.)

    return {'rgb_map': rgb_map, 'disp_map': disp_map, 'acc_map': acc_map,
            'depth_map': depth_map, 'weights': weights, 'alpha': alpha}
