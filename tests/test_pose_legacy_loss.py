"""Legacy pose-regularization family (opt_pose_type grammar) vs an
independent torch oracle of reference core/pose_opt.py:124-201."""
import numpy as np
import jax.numpy as jnp
import torch

from anerf_tpu.training.pose_opt import kp_reg_loss_legacy
from anerf_tpu.ops.rotations import axisang_to_rot, rot_to_rot6d


def torch_oracle(preds, regs, opt_type, tol, coef, rot6d, temp_coef=0.,
                 use_temp_vel=False, ext_scale=0.001, root_id=0):
    """Re-enactment of get_kp_reg_loss (pose_opt.py:124-201)."""
    kps = torch.tensor(preds['kps'])
    bones = torch.tensor(preds['bones'])
    rots = torch.tensor(preds['rots'])
    reg_kps = torch.tensor(regs['kps'])
    reg_bones = torch.tensor(regs['bones'])
    reg_rots = torch.tensor(regs['rots'])

    loss_fn = ((lambda a, b: (a - b).abs()) if 'L1' in opt_type
               else (lambda a, b: (a - b).pow(2)))
    coef_on_global = 'E' not in opt_type
    if rot6d:
        reg_bones = reg_rots[..., :3, :2].flatten(start_dim=-2)
    if opt_type.startswith('RD'):
        bone_loss = loss_fn(rots, reg_rots)
    elif opt_type.startswith('B'):
        bone_loss = loss_fn(reg_bones, bones)
    pelv_loss = loss_fn(reg_kps[:, root_id], kps[:, root_id]).sum(-1)
    mask = (bone_loss > tol).float()
    bone_loss = torch.lerp(torch.zeros_like(bone_loss), bone_loss - tol,
                           mask).sum(-1)
    if coef_on_global:
        kp_loss = (bone_loss.mean() + pelv_loss.mean()) * coef
    else:
        kp_loss = bone_loss[:, root_id + 1:].mean() * coef

    if temp_coef > 0.:
        temp_valid = torch.tensor(regs['temp_valid'])
        if rot6d:
            temp_bones = torch.tensor(regs['temp_rots'])[
                ..., :3, :2].flatten(start_dim=-2)
        else:
            temp_bones = torch.tensor(regs['temp_bones'])
        temp_kps = torch.tensor(regs['temp_kps'])
        prev_bones, next_bones = torch.chunk(temp_bones, 2, dim=0)
        prev_kps, next_kps = torch.chunk(temp_kps, 2, dim=0)
        if not use_temp_vel:
            t = loss_fn(prev_bones, bones).sum(-1)
            temp_loss = (t * temp_valid[..., None]).mean() * temp_coef
        else:
            valid_next = torch.tensor(regs['temp_valid_next'])
            valid = (temp_valid + valid_next) // 2
            ang = ((bones - prev_bones) - (next_bones - bones)).pow(2).sum(-1)
            jv = ((kps - prev_kps) - (next_kps - kps)).pow(2).sum(-1)
            temp_loss = ((ang + jv) * valid[..., None]).mean() * temp_coef
        kp_loss = kp_loss + temp_loss

    mpjpc = (reg_kps - kps).pow(2).sum(-1).pow(0.5).mean() / ext_scale
    return float(kp_loss), float(mpjpc)


def make_case(rng, N=4, J=24, rot6d=False):
    aa = rng.normal(size=(N, J, 3)).astype(np.float32) * 0.4
    reg_aa = aa + rng.normal(size=aa.shape).astype(np.float32) * 0.05
    rots = np.asarray(axisang_to_rot(jnp.asarray(aa)))
    reg_rots = np.asarray(axisang_to_rot(jnp.asarray(reg_aa)))
    bones = (np.asarray(rot_to_rot6d(jnp.asarray(rots))) if rot6d else aa)
    kps = rng.normal(size=(N, J, 3)).astype(np.float32)
    reg_kps = kps + rng.normal(size=kps.shape).astype(np.float32) * 0.02
    preds = {'kps': kps, 'bones': bones, 'rots': rots}
    regs = {'kps': reg_kps, 'bones': reg_aa, 'rots': reg_rots}
    return preds, regs


def _check(opt_type, rot6d, tol=0.01, coef=2.0):
    rng = np.random.default_rng(hash(opt_type) % 2**31 + rot6d)
    preds, regs = make_case(rng, rot6d=rot6d)
    want_loss, want_mpjpc = torch_oracle(preds, regs, opt_type, tol, coef,
                                         rot6d)
    got = kp_reg_loss_legacy(
        {k: jnp.asarray(v) for k, v in preds.items()},
        {k: jnp.asarray(v) for k, v in regs.items()},
        opt_pose_type=opt_type, opt_pose_tol=tol, opt_pose_coef=coef,
        use_rot6d=rot6d)
    np.testing.assert_allclose(float(got['kp_loss']), want_loss, rtol=2e-5)
    np.testing.assert_allclose(float(got['mpjpc']), want_mpjpc, rtol=2e-5)


def test_type_B():
    _check('B', rot6d=False)


def test_type_BE_rot6d():
    _check('BE', rot6d=True)


def test_type_BL1():
    _check('BL1', rot6d=False)


def test_type_RD():
    _check('RD', rot6d=False)


def test_type_RDE():
    _check('RDE', rot6d=True)


def test_temporal_plain_and_velocity():
    rng = np.random.default_rng(7)
    preds, regs = make_case(rng)
    N, J = preds['kps'].shape[:2]
    regs['temp_bones'] = rng.normal(size=(2 * N, J, 3)).astype(np.float32)
    regs['temp_rots'] = np.asarray(axisang_to_rot(
        jnp.asarray(regs['temp_bones'])))
    regs['temp_kps'] = rng.normal(size=(2 * N, J, 3)).astype(np.float32)
    regs['temp_valid'] = (rng.random(N) > 0.3).astype(np.float32)
    regs['temp_valid_next'] = (rng.random(N) > 0.3).astype(np.float32)
    for vel in (False, True):
        want_loss, _ = torch_oracle(preds, regs, 'B', 0.01, 2.0, False,
                                    temp_coef=0.05, use_temp_vel=vel)
        got = kp_reg_loss_legacy(
            {k: jnp.asarray(v) for k, v in preds.items()},
            {k: jnp.asarray(v) for k, v in regs.items()},
            opt_pose_type='B', opt_pose_tol=0.01, opt_pose_coef=2.0,
            temp_coef=0.05, use_temp_vel=vel)
        np.testing.assert_allclose(float(got['kp_loss']), want_loss,
                                   rtol=2e-5)
