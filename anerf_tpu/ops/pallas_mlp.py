"""Fused Pallas-TPU kernel for the A-NeRF radiance MLP (fwd + bwd).

Why: on TPU v5e the 8x256 MLP (reference core/networks/nerf.py:12-148)
is HBM-bound under XLA — every layer round-trips an (N, 256) activation
through HBM, and at N ~ 164k points that is ~170 MB per layer per
direction, far above the chip's ridge point.  This kernel keeps the
entire weight set (~1.9 MB bf16) resident in VMEM and streams point
tiles through all layers on-chip, so HBM traffic collapses to the
encoded inputs in and the 4-channel raw output out.

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
    dnet: int            # x_pts feature width
    xv: int              # x_views feature width (incl framecode channels)
    half: int            # views-branch width (W // 2)
    skips: Tuple[int, ...]
    tile: int = 512
    bwd_tile: int = 512
    interpret: bool = False

    def has_x_part(self, i: int) -> bool:
        """Layer i consumes [x, h] when layer i-1 is a skip layer."""
        return i > 0 and (i - 1) in self.skips


def _is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def flatten_params(net_params: Dict[str, Any], st: MLPStatic) -> List[jnp.ndarray]:
    """Order the param dict into the kernel's fixed operand list.

    Weights are cast to bf16 (matmul operand dtype), biases stay f32 as
    (1, dim) rows.  Skip-layer weights are split into the x-part (first
    ``dnet`` rows — the input goes first in the reference's concat,
    nerf.py:101) and the h-part.
    """
    flat: List[jnp.ndarray] = []
    b16 = lambda a: a.astype(jnp.bfloat16)
    row = lambda b: b.astype(jnp.float32).reshape(1, -1)
    for i, p in enumerate(net_params['pts_linears']):
        w = p['w']
        if st.has_x_part(i):
            flat.append(b16(w[st.dnet:]))   # h-part
            flat.append(b16(w[:st.dnet]))   # x-part
        else:
            flat.append(b16(w))
        flat.append(row(p['b']))
    flat.append(b16(net_params['alpha_linear']['w']))
    flat.append(row(net_params['alpha_linear']['b']))
    flat.append(b16(net_params['feature_linear']['w']))
    flat.append(row(net_params['feature_linear']['b']))
    wv = net_params['views_linear']['w']
    flat.append(b16(wv[:st.width]))         # feature-part (feature first)
    flat.append(b16(wv[st.width:]))         # x_views-part
    flat.append(row(net_params['views_linear']['b']))
    flat.append(b16(net_params['rgb_linear']['w']))
    flat.append(row(net_params['rgb_linear']['b']))
    return flat


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


def _forward_tile(st: MLPStatic, x, xv, wrefs):
    """Shared fwd math on one tile; returns (acts, feat, hv, rgb, alpha).

    ``acts[i]`` is the bf16 post-ReLU activation of trunk layer i.
    """
    it = iter(wrefs)
    nxt = lambda: next(it)[:]
    h = x
    acts = []
    for i in range(st.depth):
        wh = nxt()
        pre = _dot(h, wh)
        if st.has_x_part(i):
            pre = pre + _dot(x, nxt())
        pre = pre + nxt()
        h = jnp.maximum(pre, 0.).astype(jnp.bfloat16)
        acts.append(h)
    wa, ba = nxt(), nxt()
    alpha = _dot(h, wa) + ba
    wf, bf = nxt(), nxt()
    feat = (_dot(h, wf) + bf).astype(jnp.bfloat16)
    wvf, wvv, bv = nxt(), nxt(), nxt()
    hv_pre = _dot(feat, wvf) + _dot(xv, wvv) + bv
    hv = jnp.maximum(hv_pre, 0.).astype(jnp.bfloat16)
    wr, br = nxt(), nxt()
    rgb = _dot(hv, wr) + br
    return acts, feat, hv, rgb, alpha


def _fwd_kernel(st: MLPStatic, x_ref, xv_ref, *rest):
    wrefs, out_ref = rest[:-1], rest[-1]
    _, _, _, rgb, alpha = _forward_tile(st, x_ref[:], xv_ref[:], wrefs)
    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1)


def _bwd_kernel(st: MLPStatic, x_ref, xv_ref, g_ref, *rest):
    n_w = _num_weight_operands(st)
    wrefs = rest[:n_w]
    dx_ref, dxv_ref = rest[n_w], rest[n_w + 1]
    grefs = rest[n_w + 2:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    x = x_ref[:]
    xv = xv_ref[:]
    acts, feat, hv, _, _ = _forward_tile(st, x, xv, wrefs)

    g = g_ref[:]
    g_rgb = g[:, :3]
    g_alpha = g[:, 3:4]
    b16 = lambda a: a.astype(jnp.bfloat16)

    # walk the weight refs again to get handles (same order as fwd)
    it = iter(wrefs)
    trunk = []
    for i in range(st.depth):
        wh = next(it)
        wx = next(it) if st.has_x_part(i) else None
        _b = next(it)
        trunk.append((wh, wx))
    wa, _, wf, _, wvf, wvv, _, wr, _ = (next(it), next(it), next(it),
                                        next(it), next(it), next(it),
                                        next(it), next(it), next(it))
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
    g_xv = _dot_nt(g_hv_b, wvv[:])
    dxv_ref[:] = g_xv.astype(dxv_ref.dtype)
    g_feat_b = b16(g_feat)
    g_alpha_b = b16(g_alpha)

    # heads into the trunk
    g_a = _dot_nt(g_feat_b, wf[:]) + _dot_nt(g_alpha_b, wa[:])

    # trunk, reversed
    g_x_acc = jnp.zeros((x.shape[0], st.dnet), jnp.float32)
    g_pres = []
    for i in reversed(range(st.depth)):
        g_pre = g_a * (f32(acts[i]) > 0)
        g_pre_b = b16(g_pre)
        g_pres.append((i, g_pre, g_pre_b))
        wh, wx = trunk[i]
        g_a = _dot_nt(g_pre_b, wh[:])
        if wx is not None:
            g_x_acc = g_x_acc + _dot_nt(g_pre_b, wx[:])
    g_x_acc = g_x_acc + g_a
    dx_ref[:] = g_x_acc.astype(dx_ref.dtype)

    # weight-gradient accumulation, in the flatten order
    g_pre_by_layer = {i: (gp, gpb) for i, gp, gpb in g_pres}
    for i in range(st.depth):
        g_pre, g_pre_b = g_pre_by_layer[i]
        prev = acts[i - 1] if i > 0 else x
        add(next(git), _dot_tn(prev, g_pre_b))           # dW_h
        if st.has_x_part(i):
            add(next(git), _dot_tn(x, g_pre_b))          # dW_x
        add(next(git), jnp.sum(g_pre, axis=0, keepdims=True))  # db
    a_last = acts[-1]
    add(next(git), _dot_tn(a_last, g_alpha_b))           # dWa
    add(next(git), jnp.sum(g_alpha, axis=0, keepdims=True))
    add(next(git), _dot_tn(a_last, g_feat_b))            # dWf
    add(next(git), jnp.sum(g_feat, axis=0, keepdims=True))
    add(next(git), _dot_tn(feat, g_hv_b))                # dWvf
    add(next(git), _dot_tn(xv, g_hv_b))                  # dWvv
    add(next(git), jnp.sum(g_hv, axis=0, keepdims=True))
    add(next(git), _dot_tn(hv, g_rgb_b))                 # dWr
    add(next(git), jnp.sum(g_rgb, axis=0, keepdims=True))


def _num_weight_operands(st: MLPStatic) -> int:
    n = 0
    for i in range(st.depth):
        n += 2 + (1 if st.has_x_part(i) else 0)
    return n + 9  # wa ba wf bf wvf wvv bv wr br


def _weight_shapes(st: MLPStatic) -> List[Tuple[Tuple[int, int], Any]]:
    shapes: List[Tuple[Tuple[int, int], Any]] = []
    W, D, H = st.width, st.dnet, st.half
    in_dim = D
    for i in range(st.depth):
        shapes.append(((in_dim, W), jnp.bfloat16))
        if st.has_x_part(i):
            shapes.append(((D, W), jnp.bfloat16))
        shapes.append(((1, W), jnp.float32))
        in_dim = W
    shapes += [((W, 1), jnp.bfloat16), ((1, 1), jnp.float32),
               ((W, W), jnp.bfloat16), ((1, W), jnp.float32),
               ((W, H), jnp.bfloat16), ((st.xv, H), jnp.bfloat16),
               ((1, H), jnp.float32),
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
def _fused_mlp(st: MLPStatic, x, xv, flat):
    return _fused_mlp_fwd(st, x, xv, flat)[0]


def _fused_mlp_fwd(st, x, xv, flat):
    n = x.shape[0]
    grid = (n // st.tile,)
    wspecs = [_const_spec(s) for s, _ in _weight_shapes(st)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, st),
        grid=grid,
        in_specs=[_tile_spec(st.tile, st.dnet), _tile_spec(st.tile, st.xv)]
        + wspecs,
        out_specs=_tile_spec(st.tile, 4),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_mlp_flops(st, n),
            bytes_accessed=n * (st.dnet + st.xv) * 2 + n * 16,
            transcendentals=0),
        interpret=st.interpret,
    )(x, xv, *flat)
    return out, (x, xv, flat)


def _fused_mlp_bwd(st, res, g):
    x, xv, flat = res
    n = x.shape[0]
    t = st.bwd_tile
    grid = (n // t,)
    gshapes = _weight_shapes(st)
    wspecs = [_const_spec(s) for s, _ in gshapes]
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype),
         jax.ShapeDtypeStruct(xv.shape, xv.dtype)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s, _ in gshapes])
    out_specs = (
        [_tile_spec(t, st.dnet), _tile_spec(t, st.xv)]
        + [_const_spec(s) for s, _ in gshapes])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, st),
        grid=grid,
        in_specs=[_tile_spec(t, st.dnet), _tile_spec(t, st.xv),
                  _tile_spec(t, 4)]
        + wspecs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=3 * _mlp_flops(st, n),
            bytes_accessed=2 * n * (st.dnet + st.xv) * 2 + n * 16,
            transcendentals=0),
        interpret=st.interpret,
    )(x, xv, g.astype(jnp.float32), *flat)
    dx, dxv = outs[0], outs[1]
    # cotangent dtypes must match the primals (the f32 master params sit
    # outside this op; the bf16 round-trip matches the XLA path's dot VJP)
    dflat = [gr.astype(d) for gr, (_, d) in zip(outs[2:], gshapes)]
    return dx, dxv, dflat


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
                    x_pts: jnp.ndarray, x_views_full: jnp.ndarray,
                    interpret: bool = None,
                    tile: int = 512, bwd_tile: int = 512) -> jnp.ndarray:
    """Fused-MLP forward: (..., dnet), (..., xv) -> (..., 4) raw.

    ``x_views_full`` must already include the framecode channels (the
    per-frame code lookup happens outside the kernel so its gradient
    flows through regular autodiff).  Pads the flattened point axis to
    a tile multiple; padded rows never contribute to weight grads
    because their output cotangents are zero.
    """
    batch_shape = x_pts.shape[:-1]
    n = int(np.prod(batch_shape))
    # shrink tiles for small inputs (tests, mesh slices)
    while tile > 128 and n < tile:
        tile //= 2
    bwd_tile = min(bwd_tile, tile)
    st = MLPStatic(
        depth=nerf_cfg.depth, width=nerf_cfg.width,
        dnet=x_pts.shape[-1], xv=x_views_full.shape[-1],
        half=nerf_cfg.width // 2, skips=tuple(nerf_cfg.skips),
        tile=tile, bwd_tile=bwd_tile,
        interpret=(not _is_tpu_backend()) if interpret is None else interpret)
    x = x_pts.reshape(n, st.dnet).astype(jnp.bfloat16)
    xv = x_views_full.reshape(n, st.xv).astype(jnp.bfloat16)
    pad = (-n) % st.tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        xv = jnp.pad(xv, ((0, pad), (0, 0)))
    flat = flatten_params(net_params, st)
    raw = _fused_mlp(st, x, xv, flat)
    if pad:
        raw = raw[:n]
    return raw.reshape(*batch_shape, 4)
