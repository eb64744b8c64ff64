"""Load the ACTUAL reference code (/root/reference) as a parity oracle.

The reference imports three packages that are absent or viz-only in this
environment; we stub exactly those:
  * ``plotly`` / ``smplx`` — only used for visualization / the SMPL body
    model, never on the code paths under test;
  * ``pytorch3d.transforms.rotation_conversions`` — the reference uses
    three public rotation-conversion functions
    (skeleton_utils.py:405-415); we provide differentiable torch
    implementations of the standard formulas so gradient parity through
    ``axisang_to_rot`` is exercised for real.

Everything else (NeRF MLP, CutoffEmbedder, encoders, RayCaster,
PoseOptLayer, ray_utils) is the reference's own code.
"""
from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np

REF_PATH = '/root/reference'


# ---------------------------------------------------------------------------
# pytorch3d rotation conversions (standard formulas, torch, differentiable)
# ---------------------------------------------------------------------------

def _make_rotation_conversions() -> types.ModuleType:
    import torch

    mod = types.ModuleType('pytorch3d.transforms.rotation_conversions')

    def axis_angle_to_matrix(axis_angle):
        """Rodrigues formula with series fallback near theta=0."""
        theta_sq = (axis_angle * axis_angle).sum(-1)
        small = theta_sq < 1e-8
        theta_sq_safe = torch.where(small, torch.ones_like(theta_sq),
                                    theta_sq)
        theta = torch.sqrt(theta_sq_safe)
        sin_over = torch.where(small, 1.0 - theta_sq / 6.0,
                               torch.sin(theta) / theta)
        cos_over = torch.where(small, 0.5 - theta_sq / 24.0,
                               (1.0 - torch.cos(theta)) / theta_sq_safe)
        x, y, z = axis_angle.unbind(-1)
        zero = torch.zeros_like(x)
        K = torch.stack([
            torch.stack([zero, -z, y], -1),
            torch.stack([z, zero, -x], -1),
            torch.stack([-y, x, zero], -1),
        ], -2)
        eye = torch.eye(3, dtype=axis_angle.dtype,
                        device=axis_angle.device).expand(K.shape)
        return (eye + sin_over[..., None, None] * K
                + cos_over[..., None, None] * (K @ K))

    def axis_angle_to_quaternion(axis_angle):
        angle = torch.linalg.norm(axis_angle, dim=-1, keepdim=True)
        half = angle * 0.5
        small = angle < 1e-6
        sin_half_over = torch.where(
            small, 0.5 - angle * angle / 48.0,
            torch.sin(half) / angle.clamp_min(1e-12))
        return torch.cat([torch.cos(half), axis_angle * sin_half_over], -1)

    def matrix_to_quaternion(m):
        m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
        trace = m00 + m11 + m22
        q_w = torch.stack([1.0 + trace, m[..., 2, 1] - m[..., 1, 2],
                           m[..., 0, 2] - m[..., 2, 0],
                           m[..., 1, 0] - m[..., 0, 1]], -1)
        q_x = torch.stack([m[..., 2, 1] - m[..., 1, 2],
                           1.0 + m00 - m11 - m22,
                           m[..., 0, 1] + m[..., 1, 0],
                           m[..., 0, 2] + m[..., 2, 0]], -1)
        q_y = torch.stack([m[..., 0, 2] - m[..., 2, 0],
                           m[..., 0, 1] + m[..., 1, 0],
                           1.0 - m00 + m11 - m22,
                           m[..., 1, 2] + m[..., 2, 1]], -1)
        q_z = torch.stack([m[..., 1, 0] - m[..., 0, 1],
                           m[..., 0, 2] + m[..., 2, 0],
                           m[..., 1, 2] + m[..., 2, 1],
                           1.0 - m00 - m11 + m22], -1)
        cases = torch.stack([q_w, q_x, q_y, q_z], -2)
        diag = torch.stack([trace, m00, m11, m22], -1)
        best = diag.argmax(-1)
        q = torch.gather(
            cases, -2,
            best[..., None, None].expand(best.shape + (1, 4)))[..., 0, :]
        q = q / torch.linalg.norm(q, dim=-1, keepdim=True).clamp_min(1e-12)
        return q * torch.where(q[..., :1] < 0, -torch.ones_like(q[..., :1]),
                               torch.ones_like(q[..., :1]))

    def quaternion_to_axis_angle(quat):
        w = quat[..., 0].clamp(-1.0, 1.0)
        xyz = quat[..., 1:]
        norm = torch.linalg.norm(xyz, dim=-1, keepdim=True)
        half = torch.atan2(norm[..., 0], w)[..., None]
        small = norm < 1e-6
        scale = torch.where(small, 2.0 + (2.0 / 3.0) * half * half,
                            2.0 * half / norm.clamp_min(1e-12))
        return xyz * scale

    def matrix_to_axis_angle(rot):
        return quaternion_to_axis_angle(matrix_to_quaternion(rot))

    mod.axis_angle_to_matrix = axis_angle_to_matrix
    mod.axis_angle_to_quaternion = axis_angle_to_quaternion
    mod.matrix_to_axis_angle = matrix_to_axis_angle
    mod.matrix_to_quaternion = matrix_to_quaternion
    mod.quaternion_to_axis_angle = quaternion_to_axis_angle
    return mod


def install_stubs() -> None:
    if 'pytorch3d.transforms.rotation_conversions' not in sys.modules:
        rc = _make_rotation_conversions()
        p3 = types.ModuleType('pytorch3d')
        tr = types.ModuleType('pytorch3d.transforms')
        p3.transforms = tr
        tr.rotation_conversions = rc
        sys.modules['pytorch3d'] = p3
        sys.modules['pytorch3d.transforms'] = tr
        sys.modules['pytorch3d.transforms.rotation_conversions'] = rc
    for name in ('plotly', 'plotly.graph_objects', 'smplx', 'smplx.lbs',
                 'pytorch_msssim'):
        sys.modules.setdefault(name, types.ModuleType(name))
    # evaluation_helpers imports SSIM at module scope but only the pose
    # metrics (which never touch it) are under test
    if not hasattr(sys.modules['pytorch_msssim'], 'SSIM'):
        sys.modules['pytorch_msssim'].SSIM = type('SSIM', (), {})
    sys.modules['plotly'].graph_objects = sys.modules['plotly.graph_objects']
    # names the reference imports `from smplx ...` but only calls when a
    # real body model is requested (never on the paths under test)
    smplx = sys.modules['smplx']
    if not hasattr(smplx, 'SMPL'):
        smplx.SMPL = type('SMPL', (), {})
        smplx.lbs = sys.modules['smplx.lbs']
        smplx.lbs.vertices2joints = None


def load_reference():
    """Import and return the reference core package modules."""
    install_stubs()
    if REF_PATH not in sys.path:
        # APPEND, not insert(0): the reference tree has a top-level
        # run_render.py that would otherwise shadow the repo's
        # run_render for tests that import it later in the session
        # (test_e2e after test_render_path_oracle).  The reference's
        # own modules (core.*, run_nerf) have unique names and resolve
        # fine from the end of the path.
        sys.path.append(REF_PATH)
    import core.raycasters as raycasters
    import core.pose_opt as pose_opt
    import core.cutoff_embedder as cutoff_embedder
    import core.encoders as encoders
    import core.networks.nerf as nerf
    import core.utils.ray_utils as ray_utils
    import core.utils.skeleton_utils as skeleton_utils
    return types.SimpleNamespace(
        raycasters=raycasters, pose_opt=pose_opt,
        cutoff_embedder=cutoff_embedder, encoders=encoders, nerf=nerf,
        ray_utils=ray_utils, skeleton_utils=skeleton_utils)


# ---------------------------------------------------------------------------
# Reference factory driving
# ---------------------------------------------------------------------------

def ref_args(tmpdir: str, **overrides) -> types.SimpleNamespace:
    """An args namespace covering every field create_raycaster /
    get_grad_vars / get_density_fn read (reference run_nerf.py defaults)."""
    d = dict(
        pts_tr_type='local', kp_dist_type='reldist', view_type='relray',
        bone_type='reldir',
        use_cutoff=True, normalize_cutoff=False, cutoff_mm=500.,
        ext_scale=0.001, cutoff_inputs=True, opt_cutoff=False,
        freq_schedule=False, init_freq=0., cut_to_dist=False,
        cutoff_shift=False, multires=7, i_embed=0, multires_bones=0,
        cutoff_bones=False, use_viewdirs=True, cutoff_viewdir=True,
        multires_views=4,
        N_samples=14, N_importance=6, netdepth=8, netwidth=64,
        opt_framecode=True, framecode_size=16, n_framecodes=None,
        single_net=False, density_scale=1.0, density_type='relu',
        softplus_shift=1.0,
        lrate=5e-4, basedir=str(tmpdir), expname='parity', ft_path=None,
        no_reload=True, finetune=False, fix_layer=0, weight_decay=None,
        perturb=1.0, raw_noise_std=0., ray_noise_std=0., lindisp=False,
        nerf_type='nerf', debug=False,
        # Trainer fields (core/trainer.py:230-483)
        chunk=1024 * 32, loss_fn='MSE', loss_beta=0.1, use_yuv=False,
        reg_fn=None, reg_coef=0.1, use_background=False, coarse_weight=1.0,
        lrate_decay=250, lrate_decay_rate=0.1, decay_unit=1000,
        opt_pose=False, opt_pose_step=1, opt_pose_lrate=5e-4,
        opt_pose_tol=0., opt_pose_coef=2.0, opt_rot6d=False,
        opt_pose_stop=None, opt_pose_cache=False, opt_pose_joint=False,
        use_temp_loss=False, temp_coef=0.05,
        cutoff_step=250, cutoff_rate=10.0,
        freq_schedule_step=250, testopt=False,
    )
    d.update(overrides)
    return types.SimpleNamespace(**d)


def build_ref_raycaster(args, n_frames: int, rest_pose: np.ndarray,
                        near: float = 0.1, far: float = 8.0):
    """Run the reference's own factory (create_raycaster,
    raycasters.py:17-184) and return (ray_caster, render_kwargs_train)."""
    import os
    ref = load_reference()
    os.makedirs(os.path.join(args.basedir, args.expname), exist_ok=True)
    data_attrs = {
        'skel_type': ref.skeleton_utils.SMPLSkeleton,
        'near': near, 'far': far,
        'n_views': n_frames,
        'joint_coords': ref.skeleton_utils.get_per_joint_coords(rest_pose),
    }
    rkt, rkv, start, grad_vars, optimizer, ckpt = \
        ref.raycasters.create_raycaster(args, data_attrs)
    # use the unwrapped (non-DataParallel) caster; keep it in train mode so
    # Optcodes does real lookups
    caster = rkv['ray_caster']
    caster.train()
    return caster, rkt


def build_ref_trainer(args, rest_pose: np.ndarray, kps: np.ndarray,
                      bones: np.ndarray, near: float = 0.1,
                      far: float = 8.0):
    """Build the reference's OWN Trainer (core/trainer.py:205-273) with
    its factory-made raycaster + optimizer and a PoseOptLayer + pose
    Adam, exactly as run_nerf.py:491-538 wires them.

    Returns (trainer, caster, popt_layer) — caster is the unwrapped
    RayCaster for weight injection.
    """
    import os
    import torch
    ref = load_reference()
    import core.trainer as ref_trainer_mod
    os.makedirs(os.path.join(args.basedir, args.expname), exist_ok=True)
    n_frames = kps.shape[0]
    data_attrs = {
        'skel_type': ref.skeleton_utils.SMPLSkeleton,
        'near': near, 'far': far,
        'n_views': n_frames,
        'joint_coords': ref.skeleton_utils.get_per_joint_coords(rest_pose),
        'hwf': (8, 8, 10.0),
    }
    rkt, rkv, start, grad_vars, optimizer, ckpt = \
        ref.raycasters.create_raycaster(args, data_attrs)
    caster = rkv['ray_caster']
    caster.train()

    pose_optimizer, popt_kwargs = None, None
    popt_layer = None
    if args.opt_pose:
        # create_popt's live path (pose_opt.py:14-83) minus ckpt loading
        popt_layer = ref.pose_opt.PoseOptLayer(
            torch.from_numpy(kps.copy()), torch.from_numpy(bones.copy()),
            torch.from_numpy(rest_pose[None].copy()),
            use_cache=args.opt_pose_cache, use_rot6d=args.opt_rot6d)
        pose_optimizer = torch.optim.Adam(
            params=list(popt_layer.parameters()), lr=args.opt_pose_lrate,
            betas=(0.9, 0.999))
        anchor_kps = torch.from_numpy(kps.copy())
        anchor_bones = torch.from_numpy(bones.copy())
        anchor_rots = ref.skeleton_utils.axisang_to_rot(
            anchor_bones.view(-1, 3)).view(n_frames, -1, 3, 3)
        popt_kwargs = {
            'popt_anchors': {'kps': anchor_kps, 'bones': anchor_bones,
                             'rots': anchor_rots, 'beta': None},
            'popt_layer': popt_layer,
            'skel_type': ref.skeleton_utils.SMPLSkeleton,
        }
        pose_optimizer.zero_grad()

    # the reference was written against torch 1.x where zero_grad()
    # left zero tensors; torch 2.x defaults to set_to_none=True which
    # crashes its get_gradnorm (trainer.py:201, cnt == 0).  Pin the
    # legacy semantics (numerically identical otherwise).
    import functools
    optimizer.zero_grad = functools.partial(
        torch.optim.Optimizer.zero_grad, optimizer, set_to_none=False)
    if pose_optimizer is not None:
        pose_optimizer.zero_grad = functools.partial(
            torch.optim.Optimizer.zero_grad, pose_optimizer,
            set_to_none=False)

    trainer = ref_trainer_mod.Trainer(
        args, data_attrs, optimizer, pose_optimizer, rkt, rkv,
        popt_kwargs, device=None)
    return trainer, caster, popt_layer


def copy_params_to_ref_nerf(net_params: Dict[str, Any], torch_nerf) -> None:
    """Inject our jax param pytree into a reference NeRF module."""
    import torch
    with torch.no_grad():
        for i, l in enumerate(torch_nerf.pts_linears):
            l.weight.copy_(torch.from_numpy(
                np.asarray(net_params['pts_linears'][i]['w']).T.copy()))
            l.bias.copy_(torch.from_numpy(
                np.asarray(net_params['pts_linears'][i]['b']).copy()))
        pairs = [(torch_nerf.views_linears[0], 'views_linear')]
        if torch_nerf.use_viewdirs:
            pairs += [(torch_nerf.alpha_linear, 'alpha_linear'),
                      (torch_nerf.feature_linear, 'feature_linear'),
                      (torch_nerf.rgb_linear, 'rgb_linear')]
        else:
            pairs += [(torch_nerf.output_linear, 'output_linear')]
        for tl, key in pairs:
            tl.weight.copy_(torch.from_numpy(
                np.asarray(net_params[key]['w']).T.copy()))
            tl.bias.copy_(torch.from_numpy(
                np.asarray(net_params[key]['b']).copy()))
        if torch_nerf.use_framecode:
            torch_nerf.framecodes.codes.weight.copy_(torch.from_numpy(
                np.asarray(net_params['framecodes']).copy()))


def ref_grads_to_pytree(torch_nerf) -> Dict[str, Any]:
    """Collect .grad of a reference NeRF module back into our layout."""
    def wb(l):
        return {'w': l.weight.grad.detach().numpy().T.copy(),
                'b': l.bias.grad.detach().numpy().copy()}
    out: Dict[str, Any] = {
        'pts_linears': [wb(l) for l in torch_nerf.pts_linears],
        'views_linear': wb(torch_nerf.views_linears[0]),
    }
    if torch_nerf.use_viewdirs:
        out['alpha_linear'] = wb(torch_nerf.alpha_linear)
        out['feature_linear'] = wb(torch_nerf.feature_linear)
        out['rgb_linear'] = wb(torch_nerf.rgb_linear)
    if torch_nerf.use_framecode:
        g = torch_nerf.framecodes.codes.weight.grad
        out['framecodes'] = g.detach().numpy().copy() if g is not None \
            else np.zeros_like(torch_nerf.framecodes.codes.weight.detach()
                               .numpy())
    return out


def pytest_uniforms(shape, seed: int = 0) -> np.ndarray:
    """The reference's pytest-mode deterministic uniforms
    (ray_utils.py:171-180,240-244; nerf.py:178-182)."""
    np.random.seed(seed)
    return np.random.rand(*shape).astype(np.float32)
