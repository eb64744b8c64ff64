"""Fused Pallas-TPU kernel for the A-NeRF radiance MLP (fwd + bwd).

Why: on TPU the 8x256 MLP (reference core/networks/nerf.py:12-148) is
HBM-bound under XLA — every layer round-trips an (N, 256) activation
through HBM, and at N ~ 164k points that is ~170 MB per layer per
direction, far above the chip's ridge point.  This kernel keeps the
entire weight set (~1.9 MB bf16) resident in VMEM and streams point
tiles through all layers on-chip, so HBM traffic collapses to the
encoded inputs in and the 4-channel raw output out.

The encoded inputs arrive as SEPARATE part arrays (kp-encoding,
bone-encoding for the trunk; view-encoding, framecodes for the view
branch) and are never concatenated in HBM: each trunk matmul that
consumes "x" is split row-wise into one matmul per part (same math,
summed in the f32 accumulator).  Profiling showed the XLA-level
``concatenate``/``pad``/``slice`` traffic around a fat [v|r]/[d|codes]
operand cost several ms/step at the flagship batch.

The backward pass is a second Pallas kernel that recomputes the forward
activations per tile in VMEM (flash-style) and accumulates all weight
gradients in VMEM across the sequential TPU grid, emitting them once.

Numerics match the pure-JAX path (models/nerf_mlp.py): bf16 operands,
f32 accumulation, f32 bias + ReLU, bf16 re-cast between layers.

Architecture handled (reference nerf.py:12-148):
  density trunk: ``depth`` layers x ``width``, ReLU, skip-concat of the
  input after each layer in ``skips`` (input goes FIRST in the concat);
  heads: alpha (W->1), feature (W->W, no act), views
  ([W + xv] -> W//2, ReLU), rgb (W//2 -> 3).  Output is [rgb, alpha].
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class MLPStatic:
    """Hashable trace-time description of the MLP."""
    depth: int
    width: int
    dparts: Tuple[int, ...]   # x_pts part widths (kp-enc, bone-enc, ...)
    vparts: Tuple[int, ...]   # x_views part widths (view-enc, framecode)
    half: int                 # views-branch width (W // 2)
    skips: Tuple[int, ...]
    tile: int = 512
    bwd_tile: int = 512
    interpret: bool = False

    @property
    def dnet(self) -> int:
        return sum(self.dparts)

    @property
    def xv(self) -> int:
        return sum(self.vparts)

    def has_x_part(self, i: int) -> bool:
        """Layer i consumes [x, h] when layer i-1 is a skip layer."""
        return i > 0 and (i - 1) in self.skips


def _is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def _split_rows(w, widths: Sequence[int]):
    out, off = [], 0
    for d in widths:
        out.append(w[off:off + d])
        off += d
    return out


def flatten_params(net_params: Dict[str, Any], st: MLPStatic) -> List[jnp.ndarray]:
    """Order the param dict into the kernel's fixed operand list.

    Weights are cast to bf16 (matmul operand dtype), biases stay f32 as
    (1, dim) rows.  Every weight that contracts against the (virtual)
    concatenated input is split row-wise into per-part blocks; skip
    layers additionally split into x-parts + h-part (the input goes
    FIRST in the reference's concat, nerf.py:101).
    """
    flat: List[jnp.ndarray] = []
    b16 = lambda a: a.astype(jnp.bfloat16)
    row = lambda b: b.astype(jnp.float32).reshape(1, -1)
    for i, p in enumerate(net_params['pts_linears']):
        w = p['w']
        if i == 0:
            flat += [b16(x) for x in _split_rows(w, st.dparts)]
        elif st.has_x_part(i):
            flat.append(b16(w[st.dnet:]))   # h-part
            flat += [b16(x) for x in _split_rows(w[:st.dnet], st.dparts)]
        else:
            flat.append(b16(w))
        flat.append(row(p['b']))
    flat.append(b16(net_params['alpha_linear']['w']))
    flat.append(row(net_params['alpha_linear']['b']))
    flat.append(b16(net_params['feature_linear']['w']))
    flat.append(row(net_params['feature_linear']['b']))
    wv = net_params['views_linear']['w']
    # Guard against silently dropping rows (e.g. the framecode rows when
    # use_framecode=True but no codes part was registered in vparts).
    assert st.width + sum(st.vparts) == wv.shape[0], (
        f'views_linear rows {wv.shape[0]} != width {st.width} + '
        f'vparts {st.vparts}; a view-input part is missing')
    flat.append(b16(wv[:st.width]))         # feature-part (feature first)
    flat += [b16(x) for x in _split_rows(wv[st.width:], st.vparts)]
    flat.append(row(net_params['views_linear']['b']))
    flat.append(b16(net_params['rgb_linear']['w']))
    flat.append(row(net_params['rgb_linear']['b']))
    return flat


def _sum_blocks(a, width: int, k: int):
    """Fold (T, k*width) to (T, width) by summing the k column blocks
    (the pullback of a column-block repeat)."""
    acc = a[:, :width]
    for i in range(1, k):
        acc = acc + a[:, i * width:(i + 1) * width]
    return acc


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T @ b contracting the tile (row) dim: (T,m),(T,n) -> (m,n)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(g, w):
    """g @ w^T contracting feature dims: (T,n),(m,n) -> (T,m)."""
    return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def viewfac_operand(w_tile, enc_blk, rpt: int, S: int):
    """Build the factorized views operand (block-diagonal 2D form).

    The 'relray' view encoding is constant along each ray, so
    xv @ Wv == xw @ (E @ Wv) where (with T = rpt*S tile points,
    J joints, b indexing the nblk*J encoding columns):
      xw[t, r*J+j] = window[t, j] * [t//S == r]   (T, rpt*J)
      E[(r,j), b]  = enc[r, b]    * [b%J  == j]   (rpt*J, nblk*J)
    Everything is plain 2D iota masks, leading-dim broadcasts, and MXU
    dots — Mosaic-friendly (the earlier per-ray 3D batched-dot form
    did not lower: slice+newaxis gathers).  The factorization replaces
    the (T, nblk*J) xv materialization + its 648-contraction matmuls
    with 192-contraction block-diagonal ones (~1/3 the views MACs
    fwd+bwd at the flagship shape).

    Returns the ('fac', ...) tuple consumed by ``_viewfac_dot`` /
    ``_viewfac_bwd`` in place of a dense xv tile.
    """
    T, J = w_tile.shape
    nblkJ = enc_blk.shape[-1]
    b16 = lambda a: a.astype(jnp.bfloat16)
    # xw: window repeated per ray block, masked to own block
    xw_rep = jnp.concatenate([w_tile] * rpt, axis=-1)          # (T, rptJ)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, rpt * J), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, rpt * J), 0)
    bmask = ((col // J) == (row // S)).astype(jnp.float32)
    xw = b16(xw_rep * bmask)
    # E: each ray's encoding row repeated J times, joint-matched cols
    E_rep = jnp.broadcast_to(enc_blk[:, None],
                             (rpt, J, nblkJ)).reshape(rpt * J, nblkJ)
    ecol = jax.lax.broadcasted_iota(jnp.int32, (rpt * J, nblkJ), 1)
    erow = jax.lax.broadcasted_iota(jnp.int32, (rpt * J, nblkJ), 0)
    emask = ((ecol % J) == (erow % J)).astype(jnp.float32)
    E = b16(E_rep * emask)
    return ('fac', xw, E, bmask, emask, rpt, S, J)


def _viewfac_dot(fac, wv):
    """Factorized views contribution xw @ (E @ wv) — algebraically
    equal to (enc ⊙ rep(window)) @ wv without materializing the
    (T, nblk*J) encoding.  bf16 operands / f32 accumulation like the
    default chain; the never-materialized xv makes this the more
    exact of the two forms."""
    _, xw, E, _, _, _, _, _ = fac
    M = _dot(E, wv)                       # (rptJ, half) f32
    return _dot(xw, M.astype(jnp.bfloat16))    # (T, half) f32


def _viewfac_bwd(fac, wv, g_hv):
    """Backward of the factorized views contribution.

    Cotangents factor through the per-ray Gram matrix
    Gw[(r,j), :] = sum_{t in ray r} window[t, j] * g_hv[t, :] = xw^T @ g_hv:
      d_window[t, j] = g_hv[t, :] . M[(r(t), j), :]  (fold of g_hv @ M^T)
      dWv[b, :]      = sum_r enc[r, b] * Gw[(r, j(b)), :] = E^T @ Gw
      d_enc[r, b]    = wv[b, :] . Gw[(r, j(b)), :]   (fold of Gw @ wv^T)
    Returns (d_window (T, J) f32, d_enc (rpt, nblk*J) f32,
    dWv (nblk*J, half) f32).
    """
    _, xw, E, bmask, emask, rpt, S, J = fac
    nblkJ = E.shape[-1]
    b16 = lambda a: a.astype(jnp.bfloat16)
    g_hv_b = b16(g_hv)
    M = _dot(E, wv)                               # (rptJ, half)
    Gw = _dot_tn(xw, g_hv_b)                           # (rptJ, half)
    Gw_b = b16(Gw)
    d_window = _sum_blocks(
        _dot_nt(g_hv_b, b16(M)) * bmask, J, rpt)       # (T, J)
    dWv = _dot_tn(E, Gw_b)                             # (nblkJ, half)
    P0 = _dot_nt(Gw_b, wv) * emask                # (rptJ, nblkJ)
    d_enc = P0.reshape(rpt, J, nblkJ).sum(axis=1)      # (rpt, nblkJ)
    return d_window, d_enc, dWv


def _forward_tile(st: MLPStatic, xs, xvs, wrefs):
    """Shared fwd math on one tile; returns (acts, feat, hv, rgb, alpha).

    ``acts[i]`` is the bf16 post-ReLU activation of trunk layer i.
    ``xs``/``xvs`` are the input part tiles (never concatenated);
    an xvs entry may be a ``('fac', ...)`` tuple consumed by
    ``_viewfac_dot`` (per-ray view factorization).
    """
    it = iter(wrefs)
    nxt = lambda: next(it)[:]
    h = None
    acts = []
    for i in range(st.depth):
        if i == 0:
            pre = _dot(xs[0], nxt())
            for xk in xs[1:]:
                pre = pre + _dot(xk, nxt())
        else:
            pre = _dot(h, nxt())
            if st.has_x_part(i):
                for xk in xs:
                    pre = pre + _dot(xk, nxt())
        pre = pre + nxt()
        h = jnp.maximum(pre, 0.).astype(jnp.bfloat16)
        acts.append(h)
    wa, ba = nxt(), nxt()
    alpha = _dot(h, wa) + ba
    wf, bf = nxt(), nxt()
    feat = (_dot(h, wf) + bf).astype(jnp.bfloat16)
    hv_pre = _dot(feat, nxt())
    for xvk in xvs:
        if isinstance(xvk, tuple) and xvk[0] == 'fac':
            hv_pre = hv_pre + _viewfac_dot(xvk, nxt())
        else:
            hv_pre = hv_pre + _dot(xvk, nxt())
    hv_pre = hv_pre + nxt()
    hv = jnp.maximum(hv_pre, 0.).astype(jnp.bfloat16)
    wr, br = nxt(), nxt()
    rgb = _dot(hv, wr) + br
    return acts, feat, hv, rgb, alpha


def _fwd_kernel(st: MLPStatic, *refs):
    nx, nv = len(st.dparts), len(st.vparts)
    xs = [r[:] for r in refs[:nx]]
    xvs = [r[:] for r in refs[nx:nx + nv]]
    wrefs, out_ref = refs[nx + nv:-1], refs[-1]
    _, _, _, rgb, alpha = _forward_tile(st, xs, xvs, wrefs)
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)


def _bwd_kernel(st: MLPStatic, *refs):
    nx, nv = len(st.dparts), len(st.vparts)
    n_w = _num_weight_operands(st)
    xs = [r[:] for r in refs[:nx]]
    xvs = [r[:] for r in refs[nx:nx + nv]]
    g_ref = refs[nx + nv]
    wrefs = refs[nx + nv + 1:nx + nv + 1 + n_w]
    orefs = refs[nx + nv + 1 + n_w:]
    dx_refs = orefs[:nx]
    dxv_refs = orefs[nx:nx + nv]
    grefs = orefs[nx + nv:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    acts, feat, hv, _, _ = _forward_tile(st, xs, xvs, wrefs)

    g = g_ref[:]
    g_rgb = g[:, :3]
    g_alpha = g[:, 3:4]
    b16 = lambda a: a.astype(jnp.bfloat16)

    # walk the weight refs again to get handles (same order as fwd)
    it = iter(wrefs)
    trunk = []
    for i in range(st.depth):
        if i == 0:
            whs = [next(it) for _ in st.dparts]
            trunk.append((None, whs))
        elif st.has_x_part(i):
            wh = next(it)
            wxs = [next(it) for _ in st.dparts]
            trunk.append((wh, wxs))
        else:
            trunk.append((next(it), None))
        _b = next(it)
    wa, _, wf, _, wvf = next(it), next(it), next(it), next(it), next(it)
    wvs = [next(it) for _ in st.vparts]
    _bv, wr, _br = next(it), next(it), next(it)
    git = iter(grefs)

    def add(ref, val):
        ref[:] = ref[:] + val

    # ReLU masks: bf16 compare is unsupported on the VPU, so compare f32
    f32 = lambda a: a.astype(jnp.float32)

    # rgb head
    g_rgb_b = b16(g_rgb)
    g_hv = _dot_nt(g_rgb_b, wr[:]) * (f32(hv) > 0)
    g_hv_b = b16(g_hv)

    # views branch
    g_feat = _dot_nt(g_hv_b, wvf[:])
    for dxv_ref, wvk in zip(dxv_refs, wvs):
        dxv_ref[:] = _dot_nt(g_hv_b, wvk[:]).astype(dxv_ref.dtype)
    g_feat_b = b16(g_feat)
    g_alpha_b = b16(g_alpha)

    # heads into the trunk
    g_a = _dot_nt(g_feat_b, wf[:]) + _dot_nt(g_alpha_b, wa[:])

    # trunk, reversed; per-part input-grad accumulators
    g_x_acc = [jnp.zeros((xs[0].shape[0], d), jnp.float32)
               for d in st.dparts]
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
    for dx_ref, gx in zip(dx_refs, g_x_acc):
        dx_ref[:] = gx.astype(dx_ref.dtype)

    # weight-gradient accumulation, in the flatten order
    g_pre_by_layer = {i: (gp, gpb) for i, gp, gpb in g_pres}
    for i in range(st.depth):
        g_pre, g_pre_b = g_pre_by_layer[i]
        if i == 0:
            for xk in xs:
                add(next(git), _dot_tn(xk, g_pre_b))     # dW0_k
        else:
            add(next(git), _dot_tn(acts[i - 1], g_pre_b))  # dW_h
            if st.has_x_part(i):
                for xk in xs:
                    add(next(git), _dot_tn(xk, g_pre_b))   # dW_x_k
        add(next(git), jnp.sum(g_pre, axis=0, keepdims=True))  # db
    a_last = acts[-1]
    add(next(git), _dot_tn(a_last, g_alpha_b))           # dWa
    add(next(git), jnp.sum(g_alpha, axis=0, keepdims=True))
    add(next(git), _dot_tn(a_last, g_feat_b))            # dWf
    add(next(git), jnp.sum(g_feat, axis=0, keepdims=True))
    add(next(git), _dot_tn(feat, g_hv_b))                # dWvf
    for xvk in xvs:
        add(next(git), _dot_tn(xvk, g_hv_b))             # dWv_k
    add(next(git), jnp.sum(g_hv, axis=0, keepdims=True))
    add(next(git), _dot_tn(hv, g_rgb_b))                 # dWr
    add(next(git), jnp.sum(g_rgb, axis=0, keepdims=True))


def _num_weight_operands(st: MLPStatic) -> int:
    P = len(st.dparts)
    n = 0
    for i in range(st.depth):
        if i == 0:
            n += P + 1
        else:
            n += 2 + (P if st.has_x_part(i) else 0)
    return n + 9 + len(st.vparts) - 1  # wa ba wf bf wvf wv_k... bv wr br


def _weight_shapes(st: MLPStatic) -> List[Tuple[Tuple[int, int], Any]]:
    shapes: List[Tuple[Tuple[int, int], Any]] = []
    W, H = st.width, st.half
    for i in range(st.depth):
        if i == 0:
            shapes += [((d, W), jnp.bfloat16) for d in st.dparts]
        else:
            shapes.append(((W, W), jnp.bfloat16))
            if st.has_x_part(i):
                shapes += [((d, W), jnp.bfloat16) for d in st.dparts]
        shapes.append(((1, W), jnp.float32))
    shapes += [((W, 1), jnp.bfloat16), ((1, 1), jnp.float32),
               ((W, W), jnp.bfloat16), ((1, W), jnp.float32),
               ((W, H), jnp.bfloat16)]
    shapes += [((d, H), jnp.bfloat16) for d in st.vparts]
    shapes += [((1, H), jnp.float32),
               ((H, 3), jnp.bfloat16), ((1, 3), jnp.float32)]
    return shapes


def _const_spec(shape):
    """Whole-array block re-used by every grid step (stays in VMEM)."""
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _tile_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _mlp_flops(st: MLPStatic, n: int) -> int:
    macs = st.dnet * st.width
    for i in range(1, st.depth):
        macs += (st.width + (st.dnet if st.has_x_part(i) else 0)) * st.width
    macs += st.width * (1 + st.width)
    macs += (st.width + st.xv) * st.half + st.half * 3
    return 2 * macs * n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp(st: MLPStatic, xs, xvs, flat):
    return _fused_mlp_fwd(st, xs, xvs, flat)[0]


def _fused_mlp_fwd(st, xs, xvs, flat):
    n = xs[0].shape[0]
    grid = (n // st.tile,)
    wspecs = [_const_spec(s) for s, _ in _weight_shapes(st)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, st),
        grid=grid,
        in_specs=[_tile_spec(st.tile, d) for d in st.dparts]
        + [_tile_spec(st.tile, d) for d in st.vparts]
        + wspecs,
        out_specs=_tile_spec(st.tile, 4),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_mlp_flops(st, n),
            bytes_accessed=n * (st.dnet + st.xv) * 2 + n * 16,
            transcendentals=0),
        interpret=st.interpret,
    )(*xs, *xvs, *flat)
    return out, (xs, xvs, flat)


def _fused_mlp_bwd(st, res, g):
    xs, xvs, flat = res
    n = xs[0].shape[0]
    t = st.bwd_tile
    grid = (n // t,)
    gshapes = _weight_shapes(st)
    wspecs = [_const_spec(s) for s, _ in gshapes]
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs]
        + [jax.ShapeDtypeStruct(xv.shape, xv.dtype) for xv in xvs]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s, _ in gshapes])
    out_specs = (
        [_tile_spec(t, x.shape[-1]) for x in xs]
        + [_tile_spec(t, xv.shape[-1]) for xv in xvs]
        + [_const_spec(s) for s, _ in gshapes])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, st),
        grid=grid,
        in_specs=[_tile_spec(t, x.shape[-1]) for x in xs]
        + [_tile_spec(t, xv.shape[-1]) for xv in xvs]
        + [_tile_spec(t, 4)]
        + wspecs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(st, n),
            bytes_accessed=2 * n * (st.dnet + st.xv) * 2 + n * 16,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # weights + f32 grad accumulators + per-tile activation
            # stack exceed the 16MB default scope at tile 512; the chip
            # has more physical VMEM, so raise the cap instead of
            # shrinking the tile (which doubles grid steps)
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=st.interpret,
    )(*xs, *xvs, g.astype(jnp.float32), *flat)
    nx, nv = len(xs), len(xvs)
    dxs = tuple(outs[:nx])
    dxvs = tuple(outs[nx:nx + nv])
    # cotangent dtypes must match the primals (the f32 master params sit
    # outside this op; the bf16 round-trip matches the XLA path's dot VJP)
    dflat = [gr.astype(d) for gr, (_, d) in zip(outs[nx + nv:], gshapes)]
    return dxs, dxvs, dflat


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def supported(nerf_cfg) -> bool:
    """The kernel covers the standard use_viewdirs architecture."""
    return bool(nerf_cfg.use_viewdirs)


def auto_worthwhile(nerf_cfg) -> bool:
    """Whether 'auto' backend selection should pick this kernel.

    Unaligned widths lower fine (Mosaic pads to the MXU tile) but
    compile pathologically slowly through the remote compile service
    and have no perf upside, so auto only opts in for MXU-aligned
    flagship-class nets (the reference's 8x256: width/half both lane
    multiples).  Explicit mlp_backend='pallas' bypasses this check.
    """
    return (supported(nerf_cfg) and nerf_cfg.width % 256 == 0)


def nerf_mlp_pallas(net_params: Dict[str, Any], nerf_cfg,
                    x_parts: Sequence[jnp.ndarray],
                    xv_parts: Sequence[jnp.ndarray],
                    interpret: bool = None,
                    tile: int = 512, bwd_tile: int = 512) -> jnp.ndarray:
    """Fused-MLP forward on part lists -> (..., 4) raw.

    ``x_parts`` are the trunk input parts (kp-encoding, bone-encoding)
    and ``xv_parts`` the view-branch parts (view-encoding, framecodes);
    parts are NEVER concatenated in HBM — the kernel splits each
    consuming matmul row-wise instead.  Single arrays are accepted for
    convenience.  The framecode lookup happens outside the kernel so its
    gradient flows through regular autodiff.  Pads the flattened point
    axis to a tile multiple; padded rows never contribute to weight
    grads because their output cotangents are zero.
    """
    if not isinstance(x_parts, (list, tuple)):
        x_parts = [x_parts]
    if not isinstance(xv_parts, (list, tuple)):
        xv_parts = [xv_parts]
    batch_shape = x_parts[0].shape[:-1]
    n = int(np.prod(batch_shape))
    # shrink tiles for small inputs (tests, mesh slices)
    while tile > 128 and n < tile:
        tile //= 2
    bwd_tile = min(bwd_tile, tile)
    st = MLPStatic(
        depth=nerf_cfg.depth, width=nerf_cfg.width,
        dparts=tuple(int(p.shape[-1]) for p in x_parts),
        vparts=tuple(int(p.shape[-1]) for p in xv_parts),
        half=nerf_cfg.width // 2, skips=tuple(nerf_cfg.skips),
        tile=tile, bwd_tile=bwd_tile,
        interpret=(not _is_tpu_backend()) if interpret is None else interpret)
    pad = (-n) % st.tile

    def prep(p):
        p = p.reshape(n, p.shape[-1]).astype(jnp.bfloat16)
        return jnp.pad(p, ((0, pad), (0, 0))) if pad else p

    xs = tuple(prep(p) for p in x_parts)
    xvs = tuple(prep(p) for p in xv_parts)
    flat = flatten_params(net_params, st)
    raw = _fused_mlp(st, xs, xvs, flat)
    if pad:
        raw = raw[:n]
    return raw.reshape(*batch_shape, 4)
