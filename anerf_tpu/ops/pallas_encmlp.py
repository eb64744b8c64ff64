"""Fully fused encode+MLP Pallas kernel: pts_t in, raw radiance out.

The flagship A-NeRF encoding family (kp 'reldist' + bone 'reldir' +
view 'relray' with cutoff windows on all three — every shipped config)
is a pure elementwise function of the skeleton-relative points
``pts_t`` plus a tiny per-ray view PE.  Materializing the encoded
features (360+72+648 channels per sample) in HBM costs far more than
computing them: at the SURREAL recipe the encode pipeline moves ~1.5 GB
per step.  This kernel computes distances, cutoff windows, positional
encodings, AND the radiance MLP per point-tile entirely in VMEM; HBM
traffic collapses to ``pts_t`` (72 ch) in and raw (4 ch) out.

Feature-order trick: in-kernel math wants contiguous lanes, so the
per-joint xyz components are laid out COMPONENT-major ([all x | all y |
all z]) instead of the reference's joint-major (j0x j0y j0z ...).  The
consuming weight rows are permuted once at flatten time (a traced
gather, so weight gradients scatter back to the right rows), keeping
the math identical to models/nerf_mlp.py + ops/embedding.py.

The backward kernel reloads the PE rows stashed by the forward kernel
(skipping the wide in-kernel sin), recomputes the cheap rest of the
encode + the forward activations per tile (flash-style), runs the
hand-written MLP backward from pallas_mlp, and pulls the input
cotangents back through the encode with a hand-written
transcendental-free pullback (``_encode_pullback``).

Reference math covered (cited per the survey):
  * reldist / reldir / relray encoders  (core/encoders.py:101-193)
  * cutoff-windowed PE with cutoff_inputs (core/cutoff_embedder.py:111-174)
  * NeRF MLP (core/networks/nerf.py:12-148)
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import (MLPStatic, _const_spec, _dot_nt, _dot_tn,
                         _forward_tile, _is_tpu_backend, _mlp_flops,
                         _num_weight_operands, _sum_blocks, _tile_spec,
                         _viewfac_bwd, _weight_shapes, viewfac_operand)
from .pallas_mlp import flatten_params as _flatten_plain


@dataclasses.dataclass(frozen=True)
class EncStatic:
    """Trace-time description of the fused encode."""
    J: int                          # joints (24)
    kp_freqs: Tuple[float, ...]     # kp PE bands (2^0..2^6)
    view_nb: int                    # view PE rows incl. input (1 + 2F_v)
    S: int                          # samples per ray in this pass
    rpt: int                        # rays per tile (tile // S)
    has_codes: bool
    bone_windowed: bool = False     # --cutoff_bones (off in all configs)
    eps: float = 1e-12
    # per-ray view factorization (rc.viewfac; see module tail note)
    viewfac: bool = False
    # in-kernel rigid transform (rc.fuse_tform): the kernel takes WORLD
    # points (n, 3) + per-ray transform rows (R, 4*3J) and applies the
    # skeleton-relative transform in VMEM instead of reading the
    # materialized (n, 3J) pts_t from HBM (see ``_apply_tform``)
    fuse_tform: bool = False
    # WRONG-MATH perf-bound ablation (rc.ablate_xv): zero the xv build
    ablate_xv: bool = False


def _comp_major_perm(J: int) -> np.ndarray:
    """perm[i] = joint-major row for component-major index i."""
    comp, j = np.divmod(np.arange(3 * J), J)
    return (j * 3 + comp).astype(np.int32)


def tform_rows(skts: jnp.ndarray, rays_o: jnp.ndarray,
               rays_d: jnp.ndarray) -> jnp.ndarray:
    """Per-ray rigid transform REDUCED along the ray (the key identity
    of ``EncStatic.fuse_tform``): sample points are ``o + z*d``, so the
    component-major local coords collapse to a per-ray affine in the
    scalar z —

        p[t, c] = W[r] @ (o[r] + z[t] d[r]) + t[r]
                = A[r, c] + z[t] * B[r, c]

    with ``A = W @ o + t`` and ``B = W @ d`` (R-sized host math).
    Returns (R, 2, 3J) f32 ``[A; B]`` rows.  The kernel then applies
    the transform as one broadcast FMA per tile (``_apply_tform``) and
    neither the world points NOR the (n, 3J) pts_t tensor (37 MB/step
    at the flagship recipe) ever exists in HBM.

    Same math as encoders.transform_batch_pts_cm (reference
    core/encoders.py:8-23) composed with the ray equation
    (reference ray_utils.py sample points).
    """
    from .encoders import cm_transform_rows
    rcat, tcat = cm_transform_rows(skts)
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    A = jnp.einsum('rcd,rd->rc', rcat, o) + tcat
    B = jnp.einsum('rcd,rd->rc', rcat, d)
    return jnp.stack([A, B], axis=1).astype(jnp.float32)


def _apply_tform(est: EncStatic, a_blk, b_blk, z_blk):
    """In-VMEM rigid transform: per-ray z values (rpt, S) ->
    component-major local coords (T, 3J) via the per-ray affine
    ``A + z * B`` — two leading-dim row broadcasts (the enc_blk
    pattern) and one lane-broadcast FMA.  A and B arrive as SEPARATE
    2D (rpt, 3J) operands (the enc_ray layout class): a stacked
    (rpt, 2, 3J) operand gets the narrow T(2,128) tiling and its
    fine-grained DMA."""
    C = 3 * est.J
    shape = (est.rpt, est.S, C)
    A = jnp.broadcast_to(a_blk[:, None], shape)
    B = jnp.broadcast_to(b_blk[:, None], shape)
    z = jnp.broadcast_to(z_blk[:, :, None], shape)
    return (A + B * z).reshape(-1, C)


def _tform_pullback(tf, z, dp):
    """HOST-side VJP of the in-kernel affine ``p = A + z*B``: the
    backward kernel writes the full dp (n, 3J) cotangent to HBM (as in
    the non-fused path) and XLA contracts it here — MXU batched dots,
    measured ~0.8 ms/step cheaper than the same reductions inside the
    VMEM-pressured backward kernel.  Returns (g_z (R, S),
    g_ab (R, 2, 3J))."""
    R, S = z.shape
    dp3 = dp.reshape(R, S, dp.shape[-1])
    g_A = dp3.sum(axis=1)
    g_B = jnp.einsum('rsc,rs->rc', dp3, z)
    g_z = jnp.einsum('rsc,rc->rs', dp3, tf[:, 1])
    return g_z, jnp.stack([g_A, g_B], axis=1)


def _doubling_freqs(freqs) -> bool:
    """True iff the grid is exactly 2^0..2^(F-1) — base 1 AND every band
    doubling the previous — the precondition of the sin recurrence.
    The base check matters: ``_encode_pullback`` hardcodes exp2(k//2)
    band frequencies, so a doubling-but-offset grid (e.g. 0.5, 1, 2)
    must fall back to the generic iota-built path or the forward
    recurrence and the pullback would silently disagree."""
    return bool(freqs) and abs(freqs[0] - 1.0) < 1e-6 and all(
        abs(freqs[k + 1] - 2. * freqs[k]) < 1e-6 * freqs[k + 1]
        for k in range(len(freqs) - 1))


def _rep(a, k):
    """(T, C) -> (T, k*C), column blocks repeated.  Concat rather
    than broadcast+reshape: Mosaic does not lower minor-dim merges
    ("unsupported shape cast")."""
    return jnp.concatenate([a] * k, axis=-1)


# _sum_blocks (the inverse of ``_rep``) lives in pallas_mlp (shared
# with the factorized views backward)


def _encode_fwd_res(est: EncStatic, p, enc_blk, cutoff, tau, bands=None,
                    skip_xv=False):
    """In-VMEM encode returning (v, r, xv) f32 plus pullback residuals.

    Mirrors ops/embedding.embed for the flagship flags
    (include_input=True, cutoff_inputs=True, no shift/cut_to/schedule).
    Residuals (dists, w, bands, invd) let ``_encode_pullback`` run with
    ZERO additional transcendentals: each sin band's derivative is its
    paired cos band, sigmoid' reuses the stored window, sqrt' reuses
    the stored distances.

    ``bands``: optionally the PE rows stashed by the forward kernel
    (f32, so the pullback's freq-scaled reuse stays exact) — the
    backward kernel passes them in to skip the wide sin, the dominant
    VPU cost of the in-kernel re-encode.
    """
    J = est.J
    T = p.shape[0]
    x, y, z = p[:, :J], p[:, J:2 * J], p[:, 2 * J:]
    dists = jnp.sqrt(x * x + y * y + z * z)              # (T, J)
    w = 1. - jax.nn.sigmoid(tau * (dists - cutoff))      # (T, J)

    # kp 'reldist' + cutoff PE: rows [x, sin f0 x, cos f0 x, ...] * w.
    # One wide sin over all 2F bands (cos via sin(x + pi/2)) keeps the
    # VPU at full lane width instead of 2F narrow 24-lane calls.
    F = len(est.kp_freqs)
    if bands is None:
        if SIN_RECURRENCE and _doubling_freqs(est.kp_freqs):
            # one narrow sin for (sin f0 d, cos f0 d), then double-angle
            # recursion per octave: sin 2a = 2 sin a cos a,
            # cos 2a = 1 - 2 sin^2 a.  Exact in infinite precision;
            # f32 drift grows ~2x per octave from machine eps
            # (~4e-6 rel at 2^6, far below the bf16 consumption).
            # Replaces the (T, 2FJ)-wide transcendental with (F-1)
            # rounds of 3 narrow multiplies.
            ang = dists * est.kp_freqs[0]
            sc = jnp.sin(jnp.concatenate([ang, ang + np.pi / 2], -1))
            s_k, c_k = sc[:, :J], sc[:, J:]
            blocks = [sc]
            for _ in range(F - 1):
                s_k, c_k = 2. * s_k * c_k, 1. - 2. * s_k * s_k
                blocks.append(jnp.concatenate([s_k, c_k], -1))
            bands = jnp.concatenate(blocks, -1)
        else:
            # freq/phase rows built from iota (pallas kernels cannot
            # capture array constants): band k uses freq 2^(k//2)
            # (log-sampled bands), phase pi/2 turns the odd rows into
            # cosines
            col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * F * J), 1)
            k2 = col // J
            freq_row = jnp.exp2((k2 // 2).astype(jnp.float32))
            phase_row = (k2 % 2).astype(jnp.float32) * (np.pi / 2)
            bands = jnp.sin(_rep(dists, 2 * F) * freq_row + phase_row)
        if STASH_DTYPE != jnp.float32:
            # round to the stash dtype HERE so the backward's reload is
            # bit-identical to what this forward consumed — otherwise
            # the recomputed activations differ in the last bf16 bit
            # and ReLU masks flip at boundaries (measured: trunk weight
            # grad cosine drops to ~0.994 vs the self-consistent path)
            bands = bands.astype(STASH_DTYPE).astype(jnp.float32)
    else:
        bands = bands.astype(jnp.float32)
    v = jnp.concatenate([dists, bands], axis=-1) * _rep(w, 2 * F + 1)

    # bone 'reldir' (identity PE): normalize, windowed only under
    # --cutoff_bones (plain identity embed otherwise; embedding.py:155)
    invd = 1. / jnp.maximum(dists, est.eps)              # (T, J)
    w3 = _rep(w, 3)
    r = p * _rep(invd, 3)                                # (T, 3J)
    if est.bone_windowed:
        r = r * w3

    # view 'relray': per-ray PE rows (rpt, nb*3J) * per-sample window
    # (leading-dim broadcast over samples IS a supported reshape)
    nbJ3 = est.view_nb * 3 * J
    if skip_xv:
        xv = None          # caller consumes the factorized form instead
    elif est.ablate_xv:
        # perf upper bound of the per-ray view factorization: skip the
        # xv build AND starve its matmul (wrong math, never ship)
        xv = jnp.zeros((T, nbJ3), jnp.float32)
    else:
        enc_b = jnp.broadcast_to(enc_blk[:, None], (est.rpt, est.S, nbJ3))
        xv = enc_b.reshape(T, nbJ3) * _rep(w3, est.view_nb)
    return (v, r, xv), (dists, w, bands, invd)


def _encode_tile(est: EncStatic, p, enc_blk, cutoff, tau):
    """In-VMEM encode: (T,3J) comp-major pts_t -> (v, r, xv) f32."""
    return _encode_fwd_res(est, p, enc_blk, cutoff, tau)[0]


def _encode_pullback(est: EncStatic, p, enc_blk, res, tau,
                     gv, gr, gxv, fac=None):
    """Hand-written VJP of ``_encode_fwd_res`` (f32 cotangents in).

    ``fac``: optional (d_window (T, J), d_enc (rpt, nb*3J)) from the
    factorized views backward (``_viewfac_bwd``) — replaces the xv
    section below (``gxv`` is then ignored): the window cotangent adds
    into g_w and d_enc IS denc (the factorization contracts the sample
    axis inside the Gram matrix).

    Transcendental-free: ``jax.vjp`` re-emits a cos per sin band plus
    sigmoid/rsqrt derivatives (measured 1.4 ms/step at the flagship
    recipe, scripts/bench_enc_cost.py); here every derivative reuses a
    forward residual —
      d sin(f d)        =  f * cos-band (the adjacent PE row)
      d cos(f d)        = -f * sin-band
      d sigmoid         = tau * sig * w        (sig = 1 - w)
      d sqrt / d invd   = from stored dists/invd.
    Returns (dp, denc_blk).
    """
    J = est.J
    dists, w, bands, invd = res
    F = len(est.kp_freqs)

    # ---- v = [dists|bands] * rep(w) ----
    w_blocks = _rep(w, 2 * F + 1)
    g_vraw = gv * w_blocks
    vraw = jnp.concatenate([dists, bands], axis=-1)
    g_w = _sum_blocks(gv * vraw, J, 2 * F + 1)
    g_dists = g_vraw[:, :J]
    g_bands = g_vraw[:, J:]

    # bands pullback via the paired rows: swap each (sin, cos) block
    # pair and scale by +-freq (built from iota like the forward)
    pair_parts = []
    for m in range(F):
        s_blk = bands[:, (2 * m) * J:(2 * m + 1) * J]
        c_blk = bands[:, (2 * m + 1) * J:(2 * m + 2) * J]
        pair_parts += [c_blk, s_blk]
    paired = jnp.concatenate(pair_parts, axis=-1)        # (T, 2FJ)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * F * J), 1)
    k2 = col // J
    sfreq = jnp.exp2((k2 // 2).astype(jnp.float32)) \
        * (1. - 2. * (k2 % 2).astype(jnp.float32))       # +f, -f, ...
    g_dists = g_dists + _sum_blocks(g_bands * sfreq * paired, J, 2 * F)

    # ---- r = p * rep(invd) [* rep(w,3) if windowed] ----
    invd3 = _rep(invd, 3)
    if est.bone_windowed:
        w3 = _rep(w, 3)
        dp = gr * invd3 * w3
        g_w = g_w + _sum_blocks(gr * p * invd3, J, 3)
        g_invd = _sum_blocks(gr * p * w3, J, 3)
    else:
        dp = gr * invd3
        g_invd = _sum_blocks(gr * p, J, 3)
    # invd = 1/max(dists, eps): zero slope on the clamped branch
    g_dists = g_dists - g_invd * (invd * invd) \
        * (dists > est.eps).astype(jnp.float32)

    # ---- xv = broadcast(enc_blk) * rep(rep(w,3), nb) ----
    if fac is not None:
        g_w = g_w + fac[0]
        denc = fac[1]
    else:
        nbJ3 = est.view_nb * 3 * J
        enc_flat = jnp.broadcast_to(enc_blk[:, None],
                                    (est.rpt, est.S, nbJ3)).reshape(-1, nbJ3)
        w3 = _rep(w, 3)
        g_enc_flat = gxv * _rep(w3, est.view_nb)
        denc = g_enc_flat.reshape(est.rpt, est.S, nbJ3).sum(axis=1)
        g_w = g_w + _sum_blocks(
            _sum_blocks(gxv * enc_flat, 3 * J, est.view_nb), J, 3)

    # ---- w = 1 - sigmoid(tau (d - cutoff)) ----
    sig = 1. - w
    g_dists = g_dists - g_w * (tau * sig * w)

    # ---- dists = sqrt(x^2 + y^2 + z^2), comp-major p ----
    # d dists / d p_c = p_c / dists; reuse invd (== 1/dists away from 0,
    # where the true sqrt-grad is non-finite anyway)
    dp = dp + p * _rep(g_dists * invd, 3)
    return dp, denc


def _codes_tile(est: EncStatic, codes_blk, T):
    c = jnp.broadcast_to(codes_blk[:, None],
                         (est.rpt, est.S, codes_blk.shape[-1]))
    return c.reshape(T, codes_blk.shape[-1])


def _fwd_kernel(st: MLPStatic, est: EncStatic, stash: bool, *refs):
    i = 2 + (2 if est.fuse_tform else 0) + (1 if est.has_codes else 0)
    p, enc_blk = refs[0][:], refs[1][:]
    j = 2
    if est.fuse_tform:
        p = _apply_tform(est, refs[j][:], refs[j + 1][:], p)
        j += 2
    codes_blk = refs[j][:] if est.has_codes else None
    cutoff, tau = refs[i][:], refs[i + 1][0, 0]
    n_out = 2 if stash else 1
    wrefs, out_ref = refs[i + 2:len(refs) - n_out], refs[-n_out]

    viewfac = est.viewfac
    (v, r, xv), (_, w, bands, _) = _encode_fwd_res(est, p, enc_blk,
                                                   cutoff, tau,
                                                   skip_xv=viewfac)
    b16 = lambda a: a.astype(jnp.bfloat16)
    if stash:
        # PE rows for the backward kernel (STASH_DTYPE): skipping their
        # in-bwd recompute removes the wide sin from the backward
        refs[-1][:] = bands.astype(refs[-1].dtype)
    xs = [b16(v), b16(r)]
    xvs = [viewfac_operand(w, enc_blk, est.rpt, est.S)
           if viewfac else b16(xv)]
    if est.has_codes:
        xvs.append(b16(_codes_tile(est, codes_blk, p.shape[0])))
    _, _, _, rgb, alpha = _forward_tile(st, xs, xvs, wrefs)
    # raw is written TRANSPOSED (4, tile): the caller's per-ray (R, S)
    # channel views are then free bitcasts instead of the
    # f32[R,S,4] {2,1,0}<->{0,1,2} relayout copies XLA otherwise
    # inserts around compositing (~0.36 ms/step measured)
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1).T


def _mlp_bwd_tile(st: MLPStatic, xs, xvs, wrefs, grefs, g):
    """Backward of ``_forward_tile`` for ONE network on one tile.

    Recomputes the forward activations (flash-style), accumulates every
    weight gradient into ``grefs`` (flatten order), and returns the
    f32 input cotangents ``(g_x_parts, g_xv_parts)`` so the caller can
    pull them through the encode (and sum across networks when several
    MLPs consume the same encoded tile).
    """
    b16 = lambda a: a.astype(jnp.bfloat16)
    f32 = lambda a: a.astype(jnp.float32)
    T = xs[0].shape[0]

    acts, feat, hv, _, _ = _forward_tile(st, xs, xvs, wrefs)
    g_rgb, g_alpha = g[:, :3], g[:, 3:4]

    it = iter(wrefs)
    trunk = []
    for i in range(st.depth):
        if i == 0:
            trunk.append((None, [next(it) for _ in st.dparts]))
        elif st.has_x_part(i):
            wh = next(it)
            trunk.append((wh, [next(it) for _ in st.dparts]))
        else:
            trunk.append((next(it), None))
        _ = next(it)
    wa, _, wf, _, wvf = next(it), next(it), next(it), next(it), next(it)
    wvs = [next(it) for _ in st.vparts]
    _bv, wr, _br = next(it), next(it), next(it)
    git = iter(grefs)

    def add(ref, val):
        ref[:] = ref[:] + val

    g_rgb_b = b16(g_rgb)
    g_hv = _dot_nt(g_rgb_b, wr[:]) * (f32(hv) > 0)
    g_hv_b = b16(g_hv)
    g_feat = _dot_nt(g_hv_b, wvf[:])
    # views-branch input cotangents; a ('fac', ...) operand backs
    # through the per-ray factorization (d_window, d_enc) and yields
    # its weight grad dWv here (consumed in the flatten-order loop)
    g_xvs = []
    fac_dWv = {}
    for vi, (xvk, wvk) in enumerate(zip(xvs, wvs)):
        if isinstance(xvk, tuple) and xvk[0] == 'fac':
            d_window, d_enc, dWv = _viewfac_bwd(xvk, wvk[:], g_hv)
            g_xvs.append(('facg', d_window, d_enc))
            fac_dWv[vi] = dWv
        else:
            g_xvs.append(_dot_nt(g_hv_b, wvk[:]))
    g_feat_b = b16(g_feat)
    g_alpha_b = b16(g_alpha)
    g_a = _dot_nt(g_feat_b, wf[:]) + _dot_nt(g_alpha_b, wa[:])

    g_x_acc = [jnp.zeros((T, d), jnp.float32) for d in st.dparts]
    g_pres = []
    for i in reversed(range(st.depth)):
        g_pre = g_a * (f32(acts[i]) > 0)
        g_pre_b = b16(g_pre)
        g_pres.append((i, g_pre, g_pre_b))
        wh, wxs = trunk[i]
        if i == 0:
            for k, w0k in enumerate(wxs):
                g_x_acc[k] = g_x_acc[k] + _dot_nt(g_pre_b, w0k[:])
            break
        g_a = _dot_nt(g_pre_b, wh[:])
        if wxs is not None:
            for k, wxk in enumerate(wxs):
                g_x_acc[k] = g_x_acc[k] + _dot_nt(g_pre_b, wxk[:])

    # weight grads, flatten order
    g_pre_by_layer = {i: (gp, gpb) for i, gp, gpb in g_pres}
    for i in range(st.depth):
        g_pre, g_pre_b = g_pre_by_layer[i]
        if i == 0:
            for xk in xs:
                add(next(git), _dot_tn(xk, g_pre_b))
        else:
            add(next(git), _dot_tn(acts[i - 1], g_pre_b))
            if st.has_x_part(i):
                for xk in xs:
                    add(next(git), _dot_tn(xk, g_pre_b))
        add(next(git), jnp.sum(g_pre, axis=0, keepdims=True))
    a_last = acts[-1]
    add(next(git), _dot_tn(a_last, g_alpha_b))
    add(next(git), jnp.sum(g_alpha, axis=0, keepdims=True))
    add(next(git), _dot_tn(a_last, g_feat_b))
    add(next(git), jnp.sum(g_feat, axis=0, keepdims=True))
    add(next(git), _dot_tn(feat, g_hv_b))
    for vi, xvk in enumerate(xvs):
        if vi in fac_dWv:
            add(next(git), fac_dWv[vi])
        else:
            add(next(git), _dot_tn(xvk, g_hv_b))
    add(next(git), jnp.sum(g_hv, axis=0, keepdims=True))
    add(next(git), _dot_tn(hv, g_rgb_b))
    add(next(git), jnp.sum(g_rgb, axis=0, keepdims=True))
    return g_x_acc, g_xvs


def _bwd_kernel(st: MLPStatic, est: EncStatic, *refs):
    n_in = 2 + (2 if est.fuse_tform else 0) + (1 if est.has_codes else 0)
    n_w = _num_weight_operands(st)
    pts_blk, enc_blk = refs[0][:], refs[1][:]
    j = 2
    a_blk = b_blk = None
    if est.fuse_tform:
        a_blk, b_blk = refs[j][:], refs[j + 1][:]
        j += 2
    codes_blk = refs[j][:] if est.has_codes else None
    cutoff, tau = refs[n_in][:], refs[n_in + 1][0, 0]
    g_ref = refs[n_in + 2]
    bands_ref = refs[n_in + 3]
    wrefs = refs[n_in + 4:n_in + 4 + n_w]
    orefs = refs[n_in + 4 + n_w:]
    dp_ref, denc_ref = orefs[0], orefs[1]
    dcodes_ref = orefs[2] if est.has_codes else None
    grefs = orefs[2 + (1 if est.has_codes else 0):]
    # recompute the component-major local coords from (z, A, B); the
    # transform PULLBACK stays outside the kernel (dp goes to HBM and
    # XLA contracts it — in-kernel reductions measured ~0.8 ms slower)
    p = (_apply_tform(est, a_blk, b_blk, pts_blk) if est.fuse_tform
         else pts_blk)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gr in grefs:
            gr[:] = jnp.zeros_like(gr)

    T = p.shape[0]
    b16 = lambda a: a.astype(jnp.bfloat16)
    f32 = lambda a: a.astype(jnp.float32)

    (v, r, xv), enc_res = _encode_fwd_res(est, p, enc_blk, cutoff, tau,
                                          bands=bands_ref[:],
                                          skip_xv=est.viewfac)
    xs = [b16(v), b16(r)]
    if est.viewfac:
        xvs = [viewfac_operand(enc_res[1], enc_blk, est.rpt, est.S)]
    else:
        xvs = [b16(xv)]
    if est.has_codes:
        xvs.append(b16(_codes_tile(est, codes_blk, T)))

    g_x_acc, g_xvs = _mlp_bwd_tile(st, xs, xvs, wrefs, grefs,
                                   g_ref[:].T)

    # --- encode backward: pull (dv, dr, dxv) to (dp, denc) ---
    # cotangents round-trip bf16 (same quantization as the MLP path);
    # the factorized views cotangents stay f32 (they are already the
    # product of bf16-operand matmuls)
    fac_g = None
    gxv_in = jnp.zeros((T, 0), jnp.float32)
    if est.viewfac:
        fac_g = (g_xvs[0][1], g_xvs[0][2])
    else:
        gxv_in = f32(b16(g_xvs[0]))
    dp, denc = _encode_pullback(est, p, enc_blk, enc_res, tau,
                                f32(b16(g_x_acc[0])), f32(b16(g_x_acc[1])),
                                gxv_in, fac=fac_g)
    dp_ref[:] = dp.astype(dp_ref.dtype)
    denc_ref[:] = denc.astype(denc_ref.dtype)
    if est.has_codes:
        dc = g_xvs[1].reshape(est.rpt, est.S, -1).sum(axis=1)
        dcodes_ref[:] = dc.astype(dcodes_ref.dtype)


def _block_spec(rpt, width):
    return pl.BlockSpec((rpt, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _rawT_spec(tile):
    """(4, n) transposed-raw blocks: (4, tile) at column i*tile."""
    return pl.BlockSpec((4, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _pts_spec(st: MLPStatic, est: EncStatic, J: int):
    """First operand: per-ray z values (rpt, S) under fuse_tform, else
    the materialized component-major pts_t (tile, 3J)."""
    if est.fuse_tform:
        return _block_spec(est.rpt, est.S)
    return _tile_spec(st.tile, 3 * J)


def _in_specs(st: MLPStatic, est: EncStatic, J: int):
    specs = [_pts_spec(st, est, J),                       # pts / pts_t
             _block_spec(est.rpt, est.view_nb * 3 * J)]   # enc_ray
    if est.fuse_tform:
        specs += [_block_spec(est.rpt, 3 * J)] * 2        # A, B rows
    if est.has_codes:
        specs.append(_block_spec(est.rpt, st.vparts[1]))
    specs += [_const_spec((1, J)), _const_spec((1, 1))]   # cutoff, tau
    return specs


def _fused_call(st, est, p, enc_ray, tf, codes, cutoff, tau, flat,
                stash: bool):
    # under fuse_tform ``p`` is the per-ray z values (R, S)
    n = p.shape[0] * (est.S if est.fuse_tform else 1)
    grid = (n // st.tile,)
    J = est.J
    args = [p, enc_ray] + ([tf[:, 0], tf[:, 1]] if est.fuse_tform else []) \
        + ([codes] if est.has_codes else []) \
        + [cutoff, tau] + list(flat)
    nb = 2 * len(est.kp_freqs) * J
    out_specs = [_rawT_spec(st.tile)]
    out_shape = [jax.ShapeDtypeStruct((4, n), jnp.float32)]
    if stash:
        out_specs.append(_tile_spec(st.tile, nb))
        out_shape.append(jax.ShapeDtypeStruct((n, nb), STASH_DTYPE))
    in_bytes = (enc_ray.shape[0] * (est.S + 2 * 3 * J) * 4
                if est.fuse_tform else n * 3 * J * 4)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, st, est, stash),
        grid=grid,
        in_specs=_in_specs(st, est, J)
        + [_const_spec(s) for s, _ in _weight_shapes(st)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=_mlp_flops(st, n),
            bytes_accessed=in_bytes + n * 16,
            transcendentals=n * (2 * len(est.kp_freqs) + 2) * J),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=st.interpret,
    )(*args)
    return outs if stash else (outs[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(st: MLPStatic, est: EncStatic, p, enc_ray, tf, codes, cutoff,
           tau, flat):
    # primal-only calls (eval/render) skip the bands stash entirely
    return _fused_call(st, est, p, enc_ray, tf, codes, cutoff, tau, flat,
                       stash=False)[0]


def _fused_fwd(st, est, p, enc_ray, tf, codes, cutoff, tau, flat):
    out, bands = _fused_call(st, est, p, enc_ray, tf, codes, cutoff, tau,
                             flat, stash=True)
    return out, (p, enc_ray, tf, codes, cutoff, tau, flat, bands)


def _bwd_statics(st, est):
    """(st, est) with the BACKWARD tile substituted (bwd_tile may be
    tuned independently of the forward tile)."""
    if st.bwd_tile == st.tile:
        return st, est
    return (dataclasses.replace(st, tile=st.bwd_tile),
            dataclasses.replace(est, rpt=st.bwd_tile // est.S))


def _fused_bwd(st, est, res, g):
    p, enc_ray, tf, codes, cutoff, tau, flat, bands = res
    st, est = _bwd_statics(st, est)
    n = p.shape[0] * (est.S if est.fuse_tform else 1)
    grid = (n // st.tile,)
    J = est.J
    nb = 2 * len(est.kp_freqs) * J
    gshapes = _weight_shapes(st)
    out_shape = [jax.ShapeDtypeStruct((n, 3 * J), jnp.float32),
                 jax.ShapeDtypeStruct(enc_ray.shape, enc_ray.dtype)]
    out_specs = [_tile_spec(st.tile, 3 * J),
                 _block_spec(est.rpt, est.view_nb * 3 * J)]
    if est.has_codes:
        out_shape.append(jax.ShapeDtypeStruct(codes.shape, codes.dtype))
        out_specs.append(_block_spec(est.rpt, st.vparts[1]))
    out_shape += [jax.ShapeDtypeStruct(s, jnp.float32) for s, _ in gshapes]
    out_specs += [_const_spec(s) for s, _ in gshapes]
    args = [p, enc_ray] + ([tf[:, 0], tf[:, 1]] if est.fuse_tform else []) \
        + ([codes] if est.has_codes else []) \
        + [cutoff, tau, g.astype(jnp.float32), bands] + list(flat)
    in_bytes = (2 * enc_ray.shape[0] * (est.S + 2 * 3 * J) * 4
                if est.fuse_tform else 2 * n * 3 * J * 4)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, st, est),
        grid=grid,
        in_specs=_in_specs(st, est, J)
        + [_rawT_spec(st.tile), _tile_spec(st.tile, nb)]
        + [_const_spec(s) for s, _ in gshapes],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(st, n),
            bytes_accessed=in_bytes + n * 16,
            transcendentals=2 * n * (2 * len(est.kp_freqs) + 2) * J),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=st.interpret,
    )(*args)
    k = 2 + (1 if est.has_codes else 0)
    dp, denc = outs[0], outs[1]
    if est.fuse_tform:
        dp, dtf = _tform_pullback(tf, p, dp)
        dp = dp.astype(p.dtype)
    else:
        dtf = jnp.zeros_like(tf)
    dcodes = outs[2] if est.has_codes else jnp.zeros_like(codes)
    dflat = [gr.astype(d) for gr, (_, d) in zip(outs[k:], gshapes)]
    return (dp, denc, dtf, dcodes, jnp.zeros_like(cutoff),
            jnp.zeros_like(tau), dflat)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Dual-network variant: encode ONCE, run BOTH the coarse and the fine MLP
# on the same point tile.  The reference evaluates the coarse net and the
# fine net on the same stratified samples (raycasters.py:438,456-461); as
# two separate fused calls the in-VMEM encode (and, in the backward, the
# encode pullback) runs twice per point.  This kernel shares it: ~30% of
# the per-step kernel time at the flagship recipe.
# ---------------------------------------------------------------------------

def _dual_in_specs(st: MLPStatic, est: EncStatic, J: int):
    specs = [_pts_spec(st, est, J),                       # pts / pts_t
             _block_spec(est.rpt, est.view_nb * 3 * J)]   # enc_ray
    if est.fuse_tform:
        specs += [_block_spec(est.rpt, 3 * J)] * 2        # A, B rows
    if est.has_codes:
        specs += [_block_spec(est.rpt, st.vparts[1])] * 2  # codes c/f
    specs += [_const_spec((1, J)), _const_spec((1, 1))]   # cutoff, tau
    return specs


def _fwd_kernel_dual(st: MLPStatic, est: EncStatic, stash: bool, *refs):
    k = 2 + (2 if est.fuse_tform else 0) + (2 if est.has_codes else 0)
    p, enc_blk = refs[0][:], refs[1][:]
    j = 2
    if est.fuse_tform:
        p = _apply_tform(est, refs[j][:], refs[j + 1][:], p)
        j += 2
    codes = ((refs[j][:], refs[j + 1][:]) if est.has_codes
             else (None, None))
    cutoff, tau = refs[k][:], refs[k + 1][0, 0]
    n_w = _num_weight_operands(st)
    wrefs_all = (refs[k + 2:k + 2 + n_w],
                 refs[k + 2 + n_w:k + 2 + 2 * n_w])
    n_out = 3 if stash else 2
    out_refs = (refs[-n_out], refs[-n_out + 1])

    viewfac = est.viewfac
    (v, r, xv), (_, w, bands, _) = _encode_fwd_res(est, p, enc_blk,
                                                   cutoff, tau,
                                                   skip_xv=viewfac)
    b16 = lambda a: a.astype(jnp.bfloat16)
    if stash:
        refs[-1][:] = bands.astype(refs[-1].dtype)
    xs = [b16(v), b16(r)]
    xv_b = (viewfac_operand(w, enc_blk, est.rpt, est.S)
            if viewfac else b16(xv))
    T = p.shape[0]
    for net in range(2):
        xvs = [xv_b]
        if est.has_codes:
            xvs.append(b16(_codes_tile(est, codes[net], T)))
        _, _, _, rgb, alpha = _forward_tile(st, xs, xvs, wrefs_all[net])
        out_refs[net][:] = jnp.concatenate([rgb, alpha], axis=-1).T


def _bwd_kernel_dual(st: MLPStatic, est: EncStatic, *refs):
    k = 2 + (2 if est.fuse_tform else 0) + (2 if est.has_codes else 0)
    n_w = _num_weight_operands(st)
    n_g = len(_weight_shapes(st))
    pts_blk, enc_blk = refs[0][:], refs[1][:]
    j = 2
    a_blk = b_blk = None
    if est.fuse_tform:
        a_blk, b_blk = refs[j][:], refs[j + 1][:]
        j += 2
    codes = ((refs[j][:], refs[j + 1][:]) if est.has_codes
             else (None, None))
    cutoff, tau = refs[k][:], refs[k + 1][0, 0]
    g_refs = (refs[k + 2], refs[k + 3])
    bands_ref = refs[k + 4]
    wrefs_all = (refs[k + 5:k + 5 + n_w],
                 refs[k + 5 + n_w:k + 5 + 2 * n_w])
    orefs = refs[k + 5 + 2 * n_w:]
    dp_ref, denc_ref = orefs[0], orefs[1]
    dcodes_refs = ((orefs[2], orefs[3]) if est.has_codes
                   else (None, None))
    grefs_all = orefs[2 + (2 if est.has_codes else 0):]
    grefs = (grefs_all[:n_g], grefs_all[n_g:])
    # recompute p from (z, A, B); the transform pullback stays in XLA
    p = (_apply_tform(est, a_blk, b_blk, pts_blk) if est.fuse_tform
         else pts_blk)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gr in grefs_all:
            gr[:] = jnp.zeros_like(gr)

    T = p.shape[0]
    b16 = lambda a: a.astype(jnp.bfloat16)
    f32 = lambda a: a.astype(jnp.float32)

    (v_f, r_f, xv_f), enc_res = _encode_fwd_res(est, p, enc_blk,
                                                cutoff, tau,
                                                bands=bands_ref[:],
                                                skip_xv=est.viewfac)
    xs = [b16(v_f), b16(r_f)]
    if est.viewfac:
        xv_op = viewfac_operand(enc_res[1], enc_blk, est.rpt, est.S)
        gw_tot = jnp.zeros((T, est.J), jnp.float32)
        genc_tot = jnp.zeros_like(enc_blk)
    else:
        xv_op = b16(xv_f)
        gxv_tot = jnp.zeros((T, st.vparts[0]), jnp.float32)
    gx_tot = [jnp.zeros((T, d), jnp.float32) for d in st.dparts]
    for net in range(2):
        xvs = [xv_op]
        if est.has_codes:
            xvs.append(b16(_codes_tile(est, codes[net], T)))
        g_x_acc, g_xvs = _mlp_bwd_tile(st, xs, xvs, wrefs_all[net],
                                       grefs[net], g_refs[net][:].T)
        gx_tot = [a + b for a, b in zip(gx_tot, g_x_acc)]
        if est.viewfac:
            gw_tot = gw_tot + g_xvs[0][1]
            genc_tot = genc_tot + g_xvs[0][2]
        else:
            gxv_tot = gxv_tot + g_xvs[0]
        if est.has_codes:
            dc = g_xvs[1].reshape(est.rpt, est.S, -1).sum(axis=1)
            dcodes_refs[net][:] = dc.astype(dcodes_refs[net].dtype)

    # both networks consume the same encoded tile -> cotangents add
    # (bf16 round-trip matches the former vjp-through-bf16-cast path;
    # factorized views cotangents stay f32, see _bwd_kernel)
    if est.viewfac:
        fac_g = (gw_tot, genc_tot)
        gxv_in = jnp.zeros((T, 0), jnp.float32)
    else:
        fac_g = None
        gxv_in = f32(b16(gxv_tot))
    dp, denc = _encode_pullback(est, p, enc_blk, enc_res, tau,
                                f32(b16(gx_tot[0])), f32(b16(gx_tot[1])),
                                gxv_in, fac=fac_g)
    dp_ref[:] = dp.astype(dp_ref.dtype)
    denc_ref[:] = denc.astype(denc_ref.dtype)


def _fused_dual_call(st, est, p, enc_ray, tf, codes_c, codes_f, cutoff,
                     tau, flat_c, flat_f, stash: bool):
    # under fuse_tform ``p`` is the per-ray z values (R, S)
    n = p.shape[0] * (est.S if est.fuse_tform else 1)
    grid = (n // st.tile,)
    J = est.J
    nb = 2 * len(est.kp_freqs) * J
    args = [p, enc_ray] + ([tf[:, 0], tf[:, 1]] if est.fuse_tform else []) \
        + ([codes_c, codes_f] if est.has_codes else []) \
        + [cutoff, tau] + list(flat_c) + list(flat_f)
    wspecs = [_const_spec(s) for s, _ in _weight_shapes(st)]
    out_specs = [_rawT_spec(st.tile)] * 2
    out_shape = [jax.ShapeDtypeStruct((4, n), jnp.float32)] * 2
    if stash:
        out_specs.append(_tile_spec(st.tile, nb))
        out_shape.append(jax.ShapeDtypeStruct((n, nb), STASH_DTYPE))
    in_bytes = (enc_ray.shape[0] * (est.S + 2 * 3 * J) * 4
                if est.fuse_tform else n * 3 * J * 4)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_dual, st, est, stash),
        grid=grid,
        in_specs=_dual_in_specs(st, est, J) + wspecs + wspecs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * _mlp_flops(st, n),
            bytes_accessed=in_bytes + 2 * n * 16,
            transcendentals=n * (2 * len(est.kp_freqs) + 2) * J),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=st.interpret,
    )(*args)
    return outs if stash else (outs[0], outs[1], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_dual(st: MLPStatic, est: EncStatic, p, enc_ray, tf,
                codes_c, codes_f, cutoff, tau, flat_c, flat_f):
    # primal-only (eval) path: no bands stash
    o_c, o_f, _ = _fused_dual_call(st, est, p, enc_ray, tf, codes_c,
                                   codes_f, cutoff, tau, flat_c, flat_f,
                                   stash=False)
    return o_c, o_f


def _fused_dual_fwd(st, est, p, enc_ray, tf, codes_c, codes_f, cutoff,
                    tau, flat_c, flat_f):
    o_c, o_f, bands = _fused_dual_call(st, est, p, enc_ray, tf, codes_c,
                                       codes_f, cutoff, tau, flat_c,
                                       flat_f, stash=True)
    return (o_c, o_f), (p, enc_ray, tf, codes_c, codes_f, cutoff, tau,
                        flat_c, flat_f, bands)


def _fused_dual_bwd(st, est, res, g):
    (p, enc_ray, tf, codes_c, codes_f, cutoff, tau, flat_c, flat_f,
     bands) = res
    g_c, g_f = g
    st, est = _bwd_statics(st, est)
    n = p.shape[0] * (est.S if est.fuse_tform else 1)
    grid = (n // st.tile,)
    J = est.J
    nb = 2 * len(est.kp_freqs) * J
    gshapes = _weight_shapes(st)
    out_shape = [jax.ShapeDtypeStruct((n, 3 * J), jnp.float32),
                 jax.ShapeDtypeStruct(enc_ray.shape, enc_ray.dtype)]
    out_specs = [_tile_spec(st.tile, 3 * J),
                 _block_spec(est.rpt, est.view_nb * 3 * J)]
    if est.has_codes:
        for c in (codes_c, codes_f):
            out_shape.append(jax.ShapeDtypeStruct(c.shape, c.dtype))
            out_specs.append(_block_spec(est.rpt, st.vparts[1]))
    out_shape += [jax.ShapeDtypeStruct(s, jnp.float32)
                  for s, _ in gshapes] * 2
    out_specs += [_const_spec(s) for s, _ in gshapes] * 2
    wspecs = [_const_spec(s) for s, _ in gshapes]
    args = [p, enc_ray] + ([tf[:, 0], tf[:, 1]] if est.fuse_tform else []) \
        + ([codes_c, codes_f] if est.has_codes else []) \
        + [cutoff, tau, g_c.astype(jnp.float32), g_f.astype(jnp.float32),
           bands] \
        + list(flat_c) + list(flat_f)
    in_bytes = (2 * enc_ray.shape[0] * (est.S + 2 * 3 * J) * 4
                if est.fuse_tform else 2 * n * 3 * J * 4)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_dual, st, est),
        grid=grid,
        in_specs=_dual_in_specs(st, est, J)
        + [_rawT_spec(st.tile)] * 2 + [_tile_spec(st.tile, nb)]
        + wspecs + wspecs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * _mlp_flops(st, n),
            bytes_accessed=in_bytes + 2 * n * 16,
            transcendentals=2 * n * (2 * len(est.kp_freqs) + 2) * J),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=st.interpret,
    )(*args)
    k = 2 + (2 if est.has_codes else 0)
    dp, denc = outs[0], outs[1]
    if est.fuse_tform:
        dp, dtf = _tform_pullback(tf, p, dp)
        dp = dp.astype(p.dtype)
    else:
        dtf = jnp.zeros_like(tf)
    if est.has_codes:
        dcodes_c, dcodes_f = outs[2], outs[3]
    else:
        dcodes_c = jnp.zeros_like(codes_c)
        dcodes_f = jnp.zeros_like(codes_f)
    n_g = len(gshapes)
    dflat_c = [gr.astype(d)
               for gr, (_, d) in zip(outs[k:k + n_g], gshapes)]
    dflat_f = [gr.astype(d)
               for gr, (_, d) in zip(outs[k + n_g:], gshapes)]
    return (dp, denc, dtf, dcodes_c, dcodes_f, jnp.zeros_like(cutoff),
            jnp.zeros_like(tau), dflat_c, dflat_f)


_fused_dual.defvjp(_fused_dual_fwd, _fused_dual_bwd)


def flatten_params_cm(net_params: Dict[str, Any], st: MLPStatic,
                      J: int, view_nb: int) -> List[jnp.ndarray]:
    """flatten_params with the bone/view weight rows permuted to the
    kernel's component-major feature order (traced gather: weight grads
    scatter back to the joint-major rows)."""
    perm_r = jnp.asarray(_comp_major_perm(J))
    dv = st.dparts[0]

    def perm_x(w):
        """Permute the r-part rows of an x-consuming trunk weight."""
        return jnp.concatenate([w[:dv], w[dv:][perm_r]], axis=0)

    perm_view = jnp.asarray(np.concatenate(
        [b * 3 * J + _comp_major_perm(J) for b in range(view_nb)]))

    p = dict(net_params)
    pts = []
    for i, lin in enumerate(net_params['pts_linears']):
        w = lin['w']
        if i == 0:
            w = perm_x(w)
        elif st.has_x_part(i):
            w = jnp.concatenate([perm_x(w[:st.dnet]), w[st.dnet:]], axis=0)
        pts.append({'w': w, 'b': lin['b']})
    p['pts_linears'] = pts
    wv = net_params['views_linear']['w']
    W = st.width
    wv_x = wv[W:W + view_nb * 3 * J][perm_view]
    p['views_linear'] = {
        'w': jnp.concatenate([wv[:W], wv_x, wv[W + view_nb * 3 * J:]],
                             axis=0),
        'b': net_params['views_linear']['b']}
    return _flatten_plain(p, st)


def supported_config(rc) -> bool:
    """Whether the fused encode kernel covers this raycast config."""
    ke, be, ve = rc.kp_embed, rc.bone_embed, rc.view_embed
    return (rc.kp_dist_type == 'reldist' and rc.bone_type == 'reldir'
            and rc.view_type == 'relray' and rc.use_viewdirs
            and not rc.opt_cutoff
            and not (ke.normalize or be.normalize or ve.normalize)
            and ke.cutoff and ke.cutoff_inputs and ke.include_input
            and not ke.cut_to_cutoff and not ke.shift_inputs
            and not ke.freq_schedule and ke.num_freqs > 0
            and ke.log_sampling  # in-kernel bands assume 2^k freqs
            and be.include_input and be.num_freqs == 0
            and not be.freq_schedule
            and (not be.cutoff or be.cutoff_inputs)
            and ve.cutoff and ve.cutoff_inputs and ve.include_input
            and not ve.freq_schedule
            and rc.nerf.width % 256 == 0)


def view_pe_rows(rays_t_norm: jnp.ndarray, freq_bands: Sequence[float],
                 J: int) -> jnp.ndarray:
    """Per-ray view PE rows [x, sin f0 x, cos f0 x, ...] in the kernel's
    component-major order: (R, (1+2F) * 3J)."""
    perm = np.concatenate([b * 3 * J + _comp_major_perm(J)
                           for b in range(1 + 2 * len(freq_bands))])
    x = rays_t_norm
    rows = [x]
    for f in freq_bands:
        rows.append(jnp.sin(x * f))
        rows.append(jnp.cos(x * f))
    enc = jnp.concatenate(rows, axis=-1)
    return enc[..., jnp.asarray(perm)]


# default point-tile (rows per kernel grid step); module-level so perf
# sweeps (scripts/sweep_tile.py) can override it without threading a
# parameter everywhere.  512 measured best on v5e (256 under-fills the
# sublane tiling at rpt=4; 1024 doubles bwd VMEM pressure).
DEFAULT_TILE = 512
DEFAULT_BWD_TILE = 512
# dtype of the PE-rows stash the forward kernel writes for the backward
# (the n x 2FJ 'bands').  MEASURED REJECTION (round 4, on-chip A/B):
# bf16 halves the ~0.5 ms/step stash HBM round trip but the step is NOT
# faster (bf16 113.1k vs f32 113.6k rays/s — the stash DMA fully
# overlaps kernel compute), while the extra quantization costs real
# gradient fidelity (trunk weight-grad cosine vs the split-kernel path
# drops 0.9999 -> ~0.994; the self-consistency experiment — rounding
# the forward's bands to the stash dtype so the backward reloads
# bit-identical values — leaves the cosines unchanged, i.e. the loss is
# the forward perturbation itself, not recompute mismatch).  f32 stays
# the default; ANERF_STASH_BF16=1 re-enables the experiment on
# hardware where the stash DMA is bandwidth-bound.
import os as _os
STASH_DTYPE = (jnp.bfloat16 if _os.environ.get('ANERF_STASH_BF16')
               else jnp.float32)
# double-angle sin recurrence for the forward's PE bands (see
# _encode_fwd_res).  ON by default: measured on v5e at the flagship
# recipe it lifts train 117.0 -> 121.4k rays/s and fwd-only eval
# 344 -> 384k (the wide (T, 2FJ) transcendental was the largest VPU
# block in the forward kernel).  ANERF_NO_SINREC=1 reverts.
SIN_RECURRENCE = not _os.environ.get('ANERF_NO_SINREC')
# Per-ray view factorization (EncStatic.viewfac <- RayCastConfig.viewfac
# <- Config.viewfac / bench.py --viewfac; an env var before round 5):
# the 'relray' view encoding is constant along each ray, so
# xv @ Wx == window @ M_ray with M_ray[j] = sum_blocks enc[.]*Wx[.]
# (BASELINE.md design note).  Replaces the (T, 648)x(648, half) views
# matmul (~10% of eval MACs) with a 27-block M build + per-ray
# (S, J)x(J, half) batched matmuls.  Numerics: the factorized form
# never materializes the bf16-rounded xv, so it deviates from the
# default chain at bf16 noise level (it is the MORE exact of the two).


def _build_call(rc, pts_t, rays_t_norm, cutoff_dist, tau, cam_idxs,
                interpret, tile, cm=False, enc_ray=None, tf_rows=None,
                z_vals=None):
    """Shared prep for the fused entries: statics + kernel inputs.

    ``cm=True``: ``pts_t`` is already flattened component-major
    (R, S, 3J) (encoders.transform_batch_pts_cm), so the (n, 3J)
    reshape below is free instead of a materialized transpose.
    ``enc_ray``: optionally the precomputed ``view_pe_rows`` (the
    caller can share one build across the coarse and fine-pass kernel
    calls of a step — XLA does not CSE the two otherwise).
    ``tf_rows`` + ``z_vals``: per-ray affine rows (``tform_rows``)
    and the (R, S) sample depths — when given, ``pts_t`` is ignored
    and the rigid transform runs inside the kernel as the per-ray
    affine ``A + z*B`` (EncStatic.fuse_tform).

    Returns None if the (R, S) shape does not tile, else
    (st, est, p, enc_ray, cutoff2d, tau2d).
    """
    if tile is None:
        tile = DEFAULT_TILE
    bwd_tile = DEFAULT_BWD_TILE
    if tf_rows is not None:
        R, S = z_vals.shape
        J = tf_rows.shape[-1] // 3
    elif cm:
        R, S, K = pts_t.shape
        J = K // 3
    else:
        R, S, J, _ = pts_t.shape
    n = R * S
    while tile > 128 and (n < tile or tile % S != 0 or
                          R % (tile // S) != 0):
        tile //= 2
    if tile % S != 0 or R % (tile // S) != 0 or n % tile != 0:
        return None
    rpt = tile // S

    nerf = rc.nerf
    st = MLPStatic(
        depth=nerf.depth, width=nerf.width,
        dparts=((1 + 2 * rc.kp_embed.num_freqs) * J, 3 * J),
        vparts=(((1 + 2 * rc.view_embed.num_freqs) * 3 * J,)
                + ((nerf.framecode_ch,) if (nerf.use_framecode and
                                            cam_idxs is not None) else ())),
        half=nerf.width // 2, skips=tuple(nerf.skips),
        tile=tile,
        bwd_tile=(bwd_tile if bwd_tile % S == 0 and
                  R % (bwd_tile // S) == 0 and n % bwd_tile == 0
                  else tile),
        interpret=(not _is_tpu_backend()) if interpret is None
        else interpret)
    est = EncStatic(J=J, kp_freqs=tuple(float(f) for f in
                                        rc.kp_embed.freq_bands()),
                    view_nb=1 + 2 * rc.view_embed.num_freqs,
                    S=S, rpt=rpt,
                    has_codes=(nerf.use_framecode and cam_idxs is not None),
                    bone_windowed=rc.bone_embed.cutoff,
                    viewfac=getattr(rc, 'viewfac', False),
                    fuse_tform=tf_rows is not None,
                    ablate_xv=getattr(rc, 'ablate_xv', False))
    if est.viewfac:
        # Per-kernel cost gate: the factorized forward costs
        # rptJ*nblkJ (M build) + T*rptJ (xw@M) MACs per half-column
        # vs T*nblkJ for the dense xv matmul, i.e. it wins only when
        # the ray constant amortizes over enough samples:
        # J*(nblkJ + tile) < S*nblkJ.  At the flagship recipe that is
        # the coarse S=64/tile-512 kernels (0.67x); the fine-16 pass
        # (rpt=32 -> rptJ=768 > 648) and the eval tile-1024 path
        # (0.97x) LOSE and fall back to the dense form (measured:
        # ungated viewfac cost eval 379k -> 371k rays/s).  0.9 margin
        # covers the iota-mask build overhead.  The backward shares
        # the gate (its tile equals the forward's by default, and the
        # recompute must match the forward's operand form anyway).
        nblkJ = est.view_nb * 3 * J
        if J * (nblkJ + tile) >= 0.9 * S * nblkJ or est.ablate_xv:
            # ablate_xv measures the dense xv build's cost — it must
            # run the dense path or the ablation silently no-ops
            est = dataclasses.replace(est, viewfac=False)

    if tf_rows is not None:
        # the kernel's point operand is just the per-ray z values
        p = z_vals.astype(jnp.float32)
    else:
        # component-major flatten of pts_t: (R, S, J, 3) -> (n, 3J)
        if not cm:
            pts_t = pts_t.transpose(0, 1, 3, 2)
        p = pts_t.reshape(n, 3 * J).astype(jnp.float32)
    if enc_ray is None:
        enc_ray = view_pe_rows(
            rays_t_norm,
            [float(f) for f in rc.view_embed.freq_bands()], J)
    enc_ray = enc_ray.astype(jnp.float32)
    cutoff2d = jnp.asarray(cutoff_dist, jnp.float32).reshape(1, J)
    tau2d = jnp.asarray(tau, jnp.float32).reshape(1, 1)
    return st, est, p, enc_ray, cutoff2d, tau2d


def nerf_encmlp_pallas(net_params: Dict[str, Any], rc,
                       pts_t: jnp.ndarray,
                       rays_t_norm: jnp.ndarray,
                       cutoff_dist: jnp.ndarray,
                       tau,
                       cam_idxs: Optional[jnp.ndarray] = None,
                       interpret: Optional[bool] = None,
                       tile: Optional[int] = None,
                       cm: bool = False,
                       enc_ray: Optional[jnp.ndarray] = None,
                       tf_rows: Optional[jnp.ndarray] = None,
                       z_vals: Optional[jnp.ndarray] = None
                       ) -> Optional[jnp.ndarray]:
    """Fused encode+MLP for one network pass.

    Args:
      pts_t: (R, S, J, 3) skeleton-relative points (f32), or
        flattened component-major (R, S, 3J) when ``cm=True``; ignored
        (may be None) when ``tf_rows``+``z_vals`` are given — the
        rigid transform then runs inside the kernel from the per-ray
        affine rows and sample depths.
      rays_t_norm: (R, 3J) normalized per-joint local ray dirs.
      cutoff_dist: (J,) window radii; tau: window sharpness scalar.
      cam_idxs: (R,) framecode indices or None.
    Returns (R, S, 4) raw, or None if the shape doesn't tile.
    """
    R, S = (z_vals.shape if tf_rows is not None else pts_t.shape[:2])
    built = _build_call(rc, pts_t, rays_t_norm, cutoff_dist, tau,
                        cam_idxs, interpret, tile, cm=cm,
                        enc_ray=enc_ray, tf_rows=tf_rows, z_vals=z_vals)
    if built is None:
        return None
    st, est, p, enc_ray, cutoff2d, tau2d = built
    J = est.J
    codes = None
    if est.has_codes:
        from ..models.nerf_mlp import framecode_select
        codes = framecode_select(net_params['framecodes'],
                                 cam_idxs).astype(jnp.float32)
    flat = flatten_params_cm(net_params, st, J, est.view_nb)
    tf = (tf_rows.astype(jnp.float32) if est.fuse_tform
          else jnp.zeros((1, 1), jnp.float32))
    raw = _fused(st, est, p, enc_ray, tf,
                 codes if codes is not None else jnp.zeros((R, 0)),
                 cutoff2d, tau2d, flat)
    # channel-major (4, R, S): [r, g, b, sigma] rows; the (R, S)
    # per-channel views downstream are free bitcasts
    return raw.reshape(4, R, S)


def nerf_encmlp_dual_pallas(coarse_params: Dict[str, Any],
                            fine_params: Dict[str, Any], rc,
                            pts_t: jnp.ndarray,
                            rays_t_norm: jnp.ndarray,
                            cutoff_dist: jnp.ndarray,
                            tau,
                            cam_idxs: Optional[jnp.ndarray] = None,
                            interpret: Optional[bool] = None,
                            tile: Optional[int] = None,
                            cm: bool = False,
                            enc_ray: Optional[jnp.ndarray] = None,
                            tf_rows: Optional[jnp.ndarray] = None,
                            z_vals: Optional[jnp.ndarray] = None
                            ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fused encode + BOTH MLPs on the same points (one kernel call).

    The reference runs the coarse and fine networks on the identical
    stratified samples (core/raycasters.py:438,456-461); sharing the
    in-VMEM encode (fwd) and its pullback (bwd) across the two networks
    removes the duplicated VPU work of two single-net calls.

    Returns (raw_coarse, raw_fine), each (R, S, 4), or None if the
    shape doesn't tile.
    """
    R, S = (z_vals.shape if tf_rows is not None else pts_t.shape[:2])
    built = _build_call(rc, pts_t, rays_t_norm, cutoff_dist, tau,
                        cam_idxs, interpret, tile, cm=cm,
                        enc_ray=enc_ray, tf_rows=tf_rows, z_vals=z_vals)
    if built is None:
        return None
    st, est, p, enc_ray, cutoff2d, tau2d = built
    J = est.J
    if est.has_codes:
        from ..models.nerf_mlp import framecode_select
        codes_c = framecode_select(coarse_params['framecodes'],
                                   cam_idxs).astype(jnp.float32)
        codes_f = framecode_select(fine_params['framecodes'],
                                   cam_idxs).astype(jnp.float32)
    else:
        codes_c = codes_f = jnp.zeros((R, 0))
    flat_c = flatten_params_cm(coarse_params, st, J, est.view_nb)
    flat_f = flatten_params_cm(fine_params, st, J, est.view_nb)
    tf = (tf_rows.astype(jnp.float32) if est.fuse_tform
          else jnp.zeros((1, 1), jnp.float32))
    raw_c, raw_f = _fused_dual(st, est, p, enc_ray, tf, codes_c, codes_f,
                               cutoff2d, tau2d, flat_c, flat_f)
    return raw_c.reshape(4, R, S), raw_f.reshape(4, R, S)
