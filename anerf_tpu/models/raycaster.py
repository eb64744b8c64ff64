"""The volumetric renderer: sample -> transform -> encode -> MLP -> composite.

TPU-first redesign of reference core/raycasters.py (RayCaster.render_rays
:361-474, encode_inputs :476-555, run_network :557-577, sample_pts
:650-677, _merge_encodings :679-709, render_pts_density :597-648).

Key departures from the reference, all preserving the math:
  * fully functional: params + explicit RNG, one jittable call — no
    module state, no DataParallel, no chunking (static shapes; callers
    batch via vmap/lax.map/sharding instead of python loops);
  * the framecode index is an int array, not a float feature channel;
  * coarse/fine merge is a one-hot rank permutation consumed by
    ``compositing.raw2outputs_merged``: only scalar densities/depths
    ride into depth order (weights ride back), with the same autograd
    semantics as the reference's gather-based ``merge_samples``
    (raycasters.py:796-812);
  * randomness (stratified jitter, importance uniforms, density noise,
    ray noise) comes from a threaded PRNG key, or can be pinned through
    ``fixed`` for golden parity against the reference's pytest mode.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import compositing, encoders, rays as ray_ops
from ..ops.embedding import EmbedConfig, embed
from .nerf_mlp import NeRFConfig, density_only, nerf_forward


@dataclasses.dataclass(frozen=True)
class RayCastConfig:
    """Static rendering configuration (trace-time constants)."""
    nerf: NeRFConfig
    kp_embed: EmbedConfig
    bone_embed: EmbedConfig
    view_embed: EmbedConfig
    n_joints: int = 24
    N_samples: int = 64
    N_importance: int = 16
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    ray_noise_std: float = 0.0
    lindisp: bool = False
    single_net: bool = False
    use_viewdirs: bool = True
    density_scale: float = 1.0
    density_type: str = 'relu'
    softplus_shift: float = 1.0
    kp_dist_type: str = 'reldist'
    view_type: str = 'relray'
    bone_type: str = 'reldir'
    n_subjects: int = 1
    # cutoff radii are a frozen buffer in the reference
    # (cutoff_embedder.py:91, requires_grad=False) unless --opt_cutoff
    opt_cutoff: bool = False
    remat: bool = True   # recompute encode+MLP in backward (HBM saver)
    # 'pallas': VMEM-resident kernels — the fully fused encode+MLP
    # (ops/pallas_encmlp.py) when the encoding family allows, else the
    # split-operand MLP kernel (ops/pallas_mlp.py).  Wins both paths on
    # v5e (train fwd+bwd with on-chip weight-grad accumulation, AND
    # fwd-only eval: 302k vs 239k rays/s for XLA at the flagship
    # recipe — scripts/bench_eval_variants.py).
    mlp_backend: str = 'xla'
    # fused-kernel point-tile override; None = ops.pallas_encmlp
    # defaults (512, the measured train-path optimum on v5e)
    pallas_tile: Optional[int] = None
    # per-ray view factorization in the fused kernels (BASELINE.md
    # design note): xv @ Wv == window @ M_ray with M_ray built once per
    # ray.  Same math as the default chain, slightly MORE exact (the
    # bf16-rounded xv is never materialized).
    viewfac: bool = False
    # in-kernel rigid transform (ops/pallas_encmlp.tform_rows): the
    # fused kernels take per-ray affine rows A + z*B and apply the
    # skeleton-relative transform in VMEM — the (n, 3J) pts_t tensor
    # never exists in HBM.  Opt-in MEASURED REJECTION on v5e (train
    # -5%, eval tied; see Config.fuse_tform / BASELINE.md round 5).
    fuse_tform: bool = False
    # --- WRONG-MATH bench ablations (perf upper bounds; never ship a
    # config with these on — bench.py flags are the only intended
    # producers; were env vars (ANERF_ABLATE_*) before round 5) ---
    ablate_merge: bool = False   # skip the coarse/fine rank permutation
    ablate_xv: bool = False      # zero the view-encoding build

    def density_fn(self):
        return compositing.get_density_fn(self.density_type,
                                          self.softplus_shift)

    def eval_variant(self) -> 'RayCastConfig':
        """Test-time settings (reference raycasters.py:170-178):
        no perturbation, no noise; the MLP backend is inherited (the
        fused Pallas forward beats XLA fwd-only as well:
        302k vs 239k rays/s, scripts/bench_eval_variants.py) with a
        bigger fwd-only tile (no bwd VMEM pressure)."""
        return dataclasses.replace(self, perturb=0., raw_noise_std=0.,
                                   ray_noise_std=0., pallas_tile=1024)


def encode_inputs(rc: RayCastConfig,
                  params: Dict[str, Any],
                  pts: jnp.ndarray,
                  rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray,
                  pose: Dict[str, jnp.ndarray],
                  state: Dict[str, jnp.ndarray],
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray],
                             Optional[jnp.ndarray]]:
    """Skeleton-relative encodings (v, r, d) for query points.

    Matches reference ``RayCaster.encode_inputs`` (raycasters.py:476-555).

    Args:
      pts: (N_rays, S, 3) world-space query points.
      rays_o/rays_d: (N_rays, 3).
      pose: dict with kps (N_rays, J, 3), skts (N_rays, J, 4, 4),
        bones (N_rays, J, 3|6).
      state: dict with per-embedder tau/alpha scalars.
    """
    kps, skts, bones = pose['kps'], pose['skts'], pose.get('bones')
    kp_fn, _, _ = encoders.get_kp_input_fn(rc.kp_dist_type, rc.n_joints)
    bone_fn, bone_dims = encoders.get_bone_input_fn(rc.bone_type, rc.n_joints)
    view_fn, _ = encoders.get_view_input_fn(rc.view_type, rc.n_joints)

    pts_t = encoders.transform_batch_pts(pts, skts)
    rays_t = encoders.transform_batch_rays(rays_d[:, None], skts)

    v = kp_fn(pts, pts_t, kps)
    r = bone_fn(pts_t, bones) if bone_dims > 0 else None
    d = view_fn(rays_t, pts_t) if rc.use_viewdirs else None

    if 'dist' in rc.kp_dist_type.lower():
        j_dists = v
    else:
        j_dists = jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)

    cutoff_dist = params['cutoff_dist']
    if not rc.opt_cutoff:
        cutoff_dist = jax.lax.stop_gradient(cutoff_dist)
    v, _ = embed(v, rc.kp_embed, dists=j_dists, cutoff_dist=cutoff_dist,
                 tau=state.get('tau'), alpha=state.get('alpha'))
    if r is not None:
        r, _ = embed(r, rc.bone_embed, dists=j_dists, cutoff_dist=cutoff_dist,
                     tau=state.get('tau'), alpha=state.get('alpha'))
    if d is not None:
        d, _ = embed(d, rc.view_embed, dists=j_dists, cutoff_dist=cutoff_dist,
                     tau=state.get('tau'), alpha=state.get('alpha'))
    # Hand the (fat) encodings to the MLP in its compute dtype: halves
    # the HBM traffic of the concat/merge/backward on these tensors.
    cast = lambda x: None if x is None else x.astype(rc.nerf.compute_dtype)
    v, r, d = cast(v), cast(r), cast(d)
    if d is not None and d.shape[1] != pts.shape[1]:
        # per-ray view encoding (no per-sample cutoff): expand to the
        # sample axis only now, after PE ran at per-ray size
        d = jnp.broadcast_to(d, d.shape[:1] + (pts.shape[1],) + d.shape[2:])
    return v, r, d


def _run_network(rc: RayCastConfig, net_params, v, r, d, cam_idxs,
                 subject_idxs=None):
    """Run the MLP on the encodings (reference raycasters.py:557-577 +
    nerf.py:133-148), keeping (R, S) structure.

    On the Pallas backend the encodings are handed to the kernel as
    separate part arrays — the [v|r] and [d|framecode] concatenations
    the reference materializes are folded into split matmuls in VMEM,
    removing ~700 MB/step of HBM concat/slice traffic at flagship size.
    """
    if rc.n_subjects > 1 and d is not None:
        # multi-subject: the raw per-ray subject index rides as one
        # extra view channel (reference raycasters.py:545-548; its
        # views_linear sizing never accounted for it — fixed here)
        if subject_idxs is None:
            subj = jnp.zeros(d.shape[:2] + (1,), d.dtype)
        else:
            subj = jnp.broadcast_to(
                subject_idxs.astype(d.dtype)[:, None, None],
                d.shape[:2] + (1,))
        d = jnp.concatenate([d, subj], axis=-1)

    codes = None
    if rc.nerf.use_framecode and cam_idxs is not None:
        # per-RAY lookup broadcast over samples: the backward collapses
        # to a sum over the sample axis + an N_rays-row scatter, vs the
        # per-point scatter-add a (R*S)-indexed lookup would cost
        from .nerf_mlp import framecode_select
        codes_ray = framecode_select(net_params['framecodes'], cam_idxs)
        codes = jnp.broadcast_to(codes_ray[:, None],
                                 v.shape[:2] + codes_ray.shape[-1:])

    if rc.mlp_backend == 'pallas' and rc.use_viewdirs and d is not None:
        from ..ops import pallas_mlp
        xv_parts = [d]
        if codes is not None:
            xv_parts.append(codes.astype(d.dtype))
        x_parts = [v] if r is None else [v, r]
        return pallas_mlp.nerf_mlp_pallas(net_params, rc.nerf,
                                          x_parts, xv_parts)
    x_pts = v if r is None else jnp.concatenate([v, r], axis=-1)
    return nerf_forward(net_params, rc.nerf, x_pts, d, codes=codes)


def _rank_perm(ranks):
    """One-hot permutation P[k, p] = 1 iff concat element k lands at
    sorted position p.  Built from the RANKS (forward permutation) so no
    inverse-permutation scatter is ever materialized — scatters lower
    serially on TPU, one-hot + matmul stays on VPU/MXU.  Shared by the
    z-merge and the raw-output merge (and reused by their backwards)."""
    K = ranks.shape[-1]
    return jax.lax.stop_gradient(
        jax.nn.one_hot(ranks, K, dtype=jnp.float32))


def render_rays(rc: RayCastConfig,
                params: Dict[str, Any],
                rays_o: jnp.ndarray,
                rays_d: jnp.ndarray,
                near,
                far,
                pose: Dict[str, jnp.ndarray],
                state: Optional[Dict[str, jnp.ndarray]] = None,
                cam_idxs: Optional[jnp.ndarray] = None,
                subject_idxs: Optional[jnp.ndarray] = None,
                rng: Optional[jax.Array] = None,
                fixed: Optional[Dict[str, jnp.ndarray]] = None,
                ) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays through the articulated NeRF.

    Matches reference ``RayCaster.render_rays`` (raycasters.py:361-474):
    cylinder-clipped near/far, stratified coarse samples, encode, coarse
    MLP + composite, importance sampling, sorted-union fine pass.

    Args:
      params: {'coarse': ..., 'fine': ..., 'cutoff_dist': (J,)}.
      rays_o/rays_d: (N_rays, 3); directions need not be unit norm.
      near/far: scalars or (N_rays, 1) initial bounds.
      pose: per-ray pose data: kps (N_rays, J, 3), skts, bones, and
        cyls (N_rays, 5) bounding-cylinder params.
      state: {'tau': scalar, 'alpha': scalar} cutoff-embedder schedule.
      rng: PRNG key (omit for fully deterministic rendering).
      fixed: optional dict pinning randomness for parity tests; keys
        'coarse_u', 'fine_u', 'coarse_noise', 'fine_noise'.
    Returns:
      dict with rgb_map/disp_map/acc_map/alpha (+ *0 coarse variants).
    """
    state = state or {'tau': jnp.asarray(1e6), 'alpha': None}
    fixed = fixed or {}
    N_rays = rays_o.shape[0]

    if rng is not None:
        k_strat, k_cnoise, k_fine, k_fnoise, k_ray1, k_ray2 = \
            jax.random.split(rng, 6)
    else:
        k_strat = k_cnoise = k_fine = k_fnoise = k_ray1 = k_ray2 = None

    near, far = ray_ops.get_near_far_in_cylinder(
        rays_o, rays_d, pose['cyls'], near=near, far=far)

    z_vals = ray_ops.sample_from_lineseg(
        near, far, rc.N_samples, perturb=rc.perturb, lindisp=rc.lindisp,
        rng=k_strat, u=fixed.get('coarse_u'))
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    if rc.ray_noise_std > 0. and k_ray1 is not None:
        pts = pts + jax.random.normal(k_ray1, pts.shape) * rc.ray_noise_std

    def encode_fn(params, pts):
        return encode_inputs(rc, params, pts, rays_o, rays_d, pose, state)

    if rc.remat:
        # Recompute the (huge) per-point encodings in the backward pass
        # instead of spilling them to HBM; the MLP matmuls are saved.
        encode_fn = jax.checkpoint(
            encode_fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    # Fully fused encode+MLP kernel (flagship encoding family): the fat
    # per-sample encodings never touch HBM — distances, cutoff windows,
    # PE, and the MLP all run per tile in VMEM (ops/pallas_encmlp.py).
    fused_net = None
    fused_dual = None
    if rc.mlp_backend == 'pallas' and rc.n_subjects == 1:
        from ..ops import pallas_encmlp as PE
        if PE.supported_config(rc):
            skts = pose['skts']
            rays_t = encoders.transform_batch_rays(rays_d[:, None], skts)
            rays_t_norm = encoders.vec_norm(rays_t)[:, 0]
            cutoff_sg = jax.lax.stop_gradient(params['cutoff_dist'])
            tau_in = state.get('tau')
            if tau_in is None:
                tau_in = jnp.asarray(1e6)
            # per-ray view PE rows built ONCE and shared by the
            # coarse-pass and fine-pass kernel calls (XLA does not CSE
            # the two builds across the custom-call boundary)
            enc_ray = PE.view_pe_rows(
                rays_t_norm,
                [float(f) for f in rc.view_embed.freq_bands()],
                rc.n_joints).astype(jnp.float32)
            # in-kernel rigid transform: the per-ray affine rows
            # A + z*B (ops/pallas_encmlp.tform_rows) are built ONCE
            # (shared by the coarse-pass and fine-pass kernel calls,
            # like enc_ray) and the kernels take only the z values —
            # requires points exactly on the ray, so ray_noise (a
            # per-POINT 3D jitter) disables it
            use_ft = rc.fuse_tform and rc.ray_noise_std == 0.
            tf_rows = (PE.tform_rows(skts, rays_o, rays_d)
                       if use_ft else None)

            def _prep(q_pts):  # noqa: E306
                if use_ft:
                    return None   # the kernel works from z directly
                # component-major transform: the kernel's (n, 3J)
                # flatten is then a free bitcast (no transpose copy)
                return encoders.transform_batch_pts_cm(
                    q_pts, skts).astype(jnp.float32)

            def fused_net(net_params, q_pts, q_z):  # noqa: E306
                return PE.nerf_encmlp_pallas(
                    net_params, rc, _prep(q_pts), rays_t_norm,
                    cutoff_sg, tau_in,
                    cam_idxs if rc.nerf.use_framecode else None,
                    tile=rc.pallas_tile, cm=not use_ft,
                    enc_ray=enc_ray, tf_rows=tf_rows,
                    z_vals=q_z if use_ft else None)

            def fused_dual(q_pts, q_z):  # noqa: E306
                # coarse + fine nets on the same points, one kernel:
                # the encode (fwd) and its pullback (bwd) are shared
                return PE.nerf_encmlp_dual_pallas(
                    params['coarse'], params['fine'], rc, _prep(q_pts),
                    rays_t_norm, cutoff_sg, tau_in,
                    cam_idxs if rc.nerf.use_framecode else None,
                    tile=rc.pallas_tile, cm=not use_ft,
                    enc_ray=enc_ray, tf_rows=tf_rows,
                    z_vals=q_z if use_ft else None)

    enc_cache: Dict[str, Any] = {}

    def run_pass(net_params, q_pts, key, q_z=None):
        """Returns (raw, rows): ``rows=True`` means channel-major
        (4, R, S) straight from the fused kernel's transposed output
        (free per-channel (R, S) views; the dense (R, S, 4) layout
        forces XLA relayout copies around compositing)."""
        if fused_net is not None:
            raw_out = fused_net(net_params, q_pts, q_z)
            if raw_out is not None:
                return raw_out, True
        if key not in enc_cache:  # reuse encodings across coarse/fine nets
            enc_cache[key] = encode_fn(params, q_pts)
        vv, rr, dd = enc_cache[key]
        return _run_network(rc, net_params, vv, rr, dd, cam_idxs,
                            subject_idxs=subject_idxs), False

    def composite(raw, rows, z, noise):
        if rows:
            return compositing.raw2outputs_rows(
                raw[3], raw[0], raw[1], raw[2], z, rays_d, noise=noise,
                density_scale=rc.density_scale, act_fn=rc.density_fn())
        return compositing.raw2outputs(raw, z, rays_d, noise=noise,
                                       density_scale=rc.density_scale,
                                       act_fn=rc.density_fn())

    to_dense = lambda a: jnp.transpose(a, (1, 2, 0))

    # dual-net fused path: both networks on the coarse samples in one
    # kernel call (the fine pass on these points is consumed below)
    raw_c_pre = None
    rows_c_pre = False
    if (fused_dual is not None and rc.N_importance > 0
            and not rc.single_net and params.get('fine') is not None):
        duo = fused_dual(pts, z_vals)
        if duo is not None:
            raw, raw_c_pre = duo
            rows = rows_c_pre = True
        else:
            raw, rows = run_pass(params['coarse'], pts, 'coarse', z_vals)
    else:
        raw, rows = run_pass(params['coarse'], pts, 'coarse', z_vals)

    noise = fixed.get('coarse_noise')
    if noise is None and rc.raw_noise_std > 0. and k_cnoise is not None:
        noise = jax.random.normal(k_cnoise, z_vals.shape) \
            * rc.raw_noise_std * rc.density_scale
    ret = composite(raw, rows, z_vals, noise)

    ret0 = None
    if rc.N_importance > 0:
        ret0 = ret
        z_samples, ranks = ray_ops.isample_ranks(
            z_vals, ret0['weights'], rc.N_importance,
            det=(rc.perturb == 0.), is_only=rc.single_net,
            rng=k_fine, u=fixed.get('fine_u'))
        P = None if rc.ablate_merge else _rank_perm(ranks)
        z_cat = jnp.concatenate([z_vals, z_samples], axis=-1)
        pts_is = rays_o[:, None] + rays_d[:, None] * z_samples[..., None]
        if rc.ray_noise_std > 0. and k_ray2 is not None:
            pts_is = pts_is + jax.random.normal(k_ray2, pts_is.shape) \
                * rc.ray_noise_std

        fine_params = params['coarse'] if rc.single_net else params['fine']
        if not rc.single_net:
            # The MLP is pointwise across samples, so evaluate the fine
            # net on the coarse points (reusing their encodings — or the
            # fused kernel — uncopied) and the new points as TWO passes,
            # then composite straight off the unsorted concat: only the
            # scalar densities ride the rank permutation into depth
            # order and the weights ride back — identical math to the
            # reference's sort-encodings-then-run (raycasters.py:456-461)
            # without concatenating fat encodings OR permuting raw rows.
            if raw_c_pre is not None:
                raw_c, rows_f = raw_c_pre, rows_c_pre
            else:
                raw_c, rows_f = run_pass(fine_params, pts, 'coarse',
                                         z_vals)
            raw_n, rows_n = run_pass(fine_params, pts_is, 'fine',
                                     z_samples)
        else:
            raw_c, rows_f = raw, rows
            raw_n, rows_n = run_pass(fine_params, pts_is, 'fine',
                                     z_samples)

        noise = fixed.get('fine_noise')
        if noise is None and rc.raw_noise_std > 0. and k_fnoise is not None:
            noise = jax.random.normal(k_fnoise, z_cat.shape) \
                * rc.raw_noise_std * rc.density_scale
        if rows_f and rows_n:
            cat = lambda c: jnp.concatenate([raw_c[c], raw_n[c]], axis=-1)
            ret = compositing.raw2outputs_merged_rows(
                cat(3), cat(0), cat(1), cat(2), z_cat, P, rays_d,
                noise=noise, density_scale=rc.density_scale,
                act_fn=rc.density_fn())
        else:
            raw_cat = jnp.concatenate(
                [to_dense(raw_c) if rows_f else raw_c,
                 to_dense(raw_n) if rows_n else raw_n], axis=1)
            ret = compositing.raw2outputs_merged(
                raw_cat, z_cat, P, rays_d, noise=noise,
                density_scale=rc.density_scale, act_fn=rc.density_fn())

    out = {'rgb_map': ret['rgb_map'], 'disp_map': ret['disp_map'],
           'acc_map': ret['acc_map'], 'alpha': ret['alpha'],
           'weights': ret['weights']}
    if ret0 is not None:
        out.update({'rgb0': ret0['rgb_map'], 'disp0': ret0['disp_map'],
                    'acc0': ret0['acc_map'], 'alpha0': ret0['alpha']})
    return out


def render_pts_density(rc: RayCastConfig,
                       params: Dict[str, Any],
                       pts: jnp.ndarray,
                       pose: Dict[str, jnp.ndarray],
                       state: Optional[Dict[str, jnp.ndarray]] = None,
                       ) -> jnp.ndarray:
    """Raw density at arbitrary points (mesh extraction path).

    Matches reference ``render_pts_density``/``_get_density_fwd_fn``
    (raycasters.py:597-648): kp + bone encodings only, density trunk,
    alpha head; uses the fine network when present.

    Args:
      pts: (P, S, 3) query points (S typically 1).
      pose: single pose broadcast over P: kps (1, J, 3), skts (1, J, 4, 4),
        bones (1, J, 3|6).
    Returns:
      (P, S, 1) raw density (pre-activation).
    """
    state = state or {'tau': jnp.asarray(1e6), 'alpha': None}
    kps, skts, bones = pose['kps'], pose['skts'], pose.get('bones')
    kp_fn, _, _ = encoders.get_kp_input_fn(rc.kp_dist_type, rc.n_joints)
    bone_fn, bone_dims = encoders.get_bone_input_fn(rc.bone_type, rc.n_joints)

    skts_b = jnp.broadcast_to(skts, (pts.shape[0],) + skts.shape[1:])
    pts_t = encoders.transform_batch_pts(pts, skts_b)
    v = kp_fn(pts, pts_t, kps)
    r = bone_fn(pts_t, bones) if bone_dims > 0 else None

    if 'dist' in rc.kp_dist_type.lower():
        j_dists = v
    else:
        j_dists = jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)

    cutoff_dist = params['cutoff_dist']
    if not rc.opt_cutoff:
        cutoff_dist = jax.lax.stop_gradient(cutoff_dist)
    v, _ = embed(v, rc.kp_embed, dists=j_dists, cutoff_dist=cutoff_dist,
                 tau=state.get('tau'), alpha=state.get('alpha'))
    parts = [v]
    if r is not None:
        r, _ = embed(r, rc.bone_embed, dists=j_dists, cutoff_dist=cutoff_dist,
                     tau=state.get('tau'), alpha=state.get('alpha'))
        parts.append(r)
    x = jnp.concatenate(parts, axis=-1)
    net = params['fine'] if params.get('fine') is not None else params['coarse']
    return density_only(net, rc.nerf, x)
