"""The A-NeRF radiance MLP as a pure-function + param-pytree pair.

TPU redesign of reference core/networks/nerf.py:12-148 and the
per-frame appearance codes of core/networks/embedding.py:4-44
(``Optcodes``).  No module system: parameters live in a nested dict so
the whole model is a single jittable function, shardable with pjit.

Architecture (matching the reference):
  density trunk: D=8 layers x W=256, ReLU, skip-concat of the input
    after layer index 4 (``skips=[4]``); input = kp-encoding (+ bone
    encoding) of width ``input_ch + input_ch_bones``.
  heads: ``alpha_linear`` W->1; ``feature_linear`` W->W, concat with
    view encoding (+ framecode) -> ``views_linear`` -> W/2 -> ReLU ->
    ``rgb_linear`` -> 3.

Weight init mirrors torch ``nn.Linear`` defaults (U(+-1/sqrt(fan_in))
for both W and b) so training dynamics match the reference; framecodes
are N(0, 1) like ``nn.Embedding``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    depth: int = 8                 # args.netdepth
    width: int = 256               # args.netwidth
    input_ch: int = 360            # kp encoding width (after PE)
    input_ch_bones: int = 72       # bone encoding width (after PE)
    input_ch_views: int = 648      # view encoding width (after PE)
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    use_framecode: bool = False    # args.opt_framecode
    framecode_ch: int = 16
    n_framecodes: int = 0
    n_subjects: int = 1            # >1: subject-idx channel on the view net
    output_ch: int = 4             # only used when not use_viewdirs
    compute_dtype: Any = jnp.float32

    @property
    def dnet_input(self) -> int:
        return self.input_ch + self.input_ch_bones

    @property
    def vnet_input(self) -> int:
        off = self.framecode_ch if self.use_framecode else 0
        # multi-subject: the raw subject index rides as one extra view
        # channel (reference raycasters.py:545-548 appends it to `d`;
        # its NeRF.forward split however never accounts for the extra
        # channel and crashes — we size the views_linear correctly)
        subj = 1 if self.n_subjects > 1 else 0
        return self.input_ch_views + subj + off + self.width


def _linear_init(key, fan_in: int, fan_out: int):
    """torch nn.Linear default init: U(+-1/sqrt(fan_in)) for W and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {'w': w, 'b': b}


def init_nerf_params(key: jax.Array, cfg: NeRFConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.depth + 6)
    params: Dict[str, Any] = {}

    pts_linears = []
    in_dim = cfg.dnet_input
    for i in range(cfg.depth):
        pts_linears.append(_linear_init(keys[i], in_dim, cfg.width))
        # layer i+1 sees the skip concat if i is in skips
        in_dim = cfg.width + cfg.dnet_input if i in cfg.skips else cfg.width
    params['pts_linears'] = pts_linears

    k = cfg.depth
    if cfg.use_viewdirs:
        params['alpha_linear'] = _linear_init(keys[k], cfg.width, 1)
        params['feature_linear'] = _linear_init(keys[k + 1], cfg.width,
                                                cfg.width)
        params['views_linear'] = _linear_init(keys[k + 2], cfg.vnet_input,
                                              cfg.width // 2)
        params['rgb_linear'] = _linear_init(keys[k + 3], cfg.width // 2, 3)
    else:
        params['output_linear'] = _linear_init(keys[k], cfg.width,
                                               cfg.output_ch)
    if cfg.use_framecode:
        params['framecodes'] = jax.random.normal(
            keys[k + 4], (cfg.n_framecodes, cfg.framecode_ch), jnp.float32)
    return params


def _dense(p, x, dtype):
    return jnp.dot(x.astype(dtype), p['w'].astype(dtype),
                   preferred_element_type=jnp.float32) + p['b']


def forward_density(params, cfg: NeRFConfig, x_pts: jnp.ndarray) -> jnp.ndarray:
    """Density trunk with skip concat (reference nerf.py:94-102)."""
    dt = cfg.compute_dtype
    h = x_pts
    for i, p in enumerate(params['pts_linears']):
        h = jax.nn.relu(_dense(p, h, dt))
        if i in cfg.skips:
            h = jnp.concatenate([x_pts, h], -1)
    return h


def framecode_lookup(codes: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-frame code with eval fallback: idx < 0 -> mean code
    (reference embedding.py:17-28)."""
    mean_code = jnp.mean(codes, axis=0)
    gathered = codes[jnp.clip(idx, 0, codes.shape[0] - 1)]
    return jnp.where((idx < 0)[..., None], mean_code, gathered)


def framecode_lerp(codes: jnp.ndarray, idx_a, idx_b, t) -> jnp.ndarray:
    """Two-code interpolation path (reference embedding.py:24-28)."""
    ca = framecode_lookup(codes, idx_a)
    cb = framecode_lookup(codes, idx_b)
    return ca + (cb - ca) * t[..., None]


def framecode_select(codes: jnp.ndarray, cam_idxs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Code selection with the reference's idx-shape dispatch
    (embedding.py:17-28): ``(R,)`` integer indices -> per-frame lookup
    (idx < 0 -> mean code); ``(R, 3)`` float rows ``[idx_a, idx_b, w]``
    -> two-code lerp (the interpolate-render mixing path)."""
    cam_idxs = jnp.asarray(cam_idxs)
    if cam_idxs.ndim == 2 and cam_idxs.shape[-1] == 3:
        return framecode_lerp(codes,
                              cam_idxs[..., 0].astype(jnp.int32),
                              cam_idxs[..., 1].astype(jnp.int32),
                              cam_idxs[..., 2])
    return framecode_lookup(codes, cam_idxs)


def nerf_forward(params, cfg: NeRFConfig,
                 x_pts: jnp.ndarray,
                 x_views: Optional[jnp.ndarray] = None,
                 framecode_idx: Optional[jnp.ndarray] = None,
                 codes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full forward: (..., dnet_input), (..., input_ch_views) -> (..., 4).

    Matches reference ``NeRF.forward`` (nerf.py:133-148) with the
    framecode index passed as a separate integer array instead of a
    float channel riding on the view encoding.  Callers that already
    hold the looked-up per-point codes can pass ``codes`` directly —
    e.g. a per-ray lookup broadcast over samples, whose backward is a
    cheap reduce + tiny scatter instead of a per-point scatter-add.
    """
    dt = cfg.compute_dtype
    h = forward_density(params, cfg, x_pts)
    if not cfg.use_viewdirs:
        return _dense(params['output_linear'], h, dt)

    alpha = _dense(params['alpha_linear'], h, dt)
    feature = _dense(params['feature_linear'], h, dt)
    if cfg.use_framecode:
        if codes is None:
            codes = framecode_lookup(params['framecodes'], framecode_idx)
        x_views = jnp.concatenate([x_views, codes.astype(x_views.dtype)], -1)
    hv = jnp.concatenate([feature, x_views], -1)
    hv = jax.nn.relu(_dense(params['views_linear'], hv, dt))
    rgb = _dense(params['rgb_linear'], hv, dt)
    return jnp.concatenate([rgb, alpha], -1)


def density_only(params, cfg: NeRFConfig, x_pts: jnp.ndarray) -> jnp.ndarray:
    """Raw density head only, for mesh extraction
    (reference raycasters.py:626-646)."""
    h = forward_density(params, cfg, x_pts)
    return _dense(params['alpha_linear'], h, cfg.compute_dtype)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
