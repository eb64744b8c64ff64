"""Golden tests for rotation conversions against scipy / torch oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from anerf_tpu.ops import rotations as R


def rand_axisang(n, rng, max_angle=np.pi):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_axisang_to_rot_matches_scipy():
    rng = np.random.RandomState(0)
    aa = rand_axisang(256, rng)
    ours = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axisang_to_rot_small_angles():
    rng = np.random.RandomState(1)
    aa = rand_axisang(64, rng, max_angle=1e-5)
    ours = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # zero exactly
    zero = np.asarray(R.axisang_to_rot(jnp.zeros((3,))))
    np.testing.assert_allclose(zero, np.eye(3), atol=1e-7)


def test_axisang_to_rot_gradients_finite_at_zero():
    g = jax.grad(lambda x: R.axisang_to_rot(x).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda x: R.axisang_to_rot(x).sum())(
        jnp.asarray([0.3, -0.2, 0.9]))
    # finite-difference check
    eps = 1e-3
    for i in range(3):
        x0 = np.array([0.3, -0.2, 0.9])
        xp, xm = x0.copy(), x0.copy()
        xp[i] += eps
        xm[i] -= eps
        fd = (Rotation.from_rotvec(xp).as_matrix().sum()
              - Rotation.from_rotvec(xm).as_matrix().sum()) / (2 * eps)
        np.testing.assert_allclose(g2[i], fd, atol=1e-3)


def test_rot_roundtrip_axisang():
    rng = np.random.RandomState(2)
    aa = rand_axisang(128, rng, max_angle=np.pi - 0.1)
    rot = R.axisang_to_rot(jnp.asarray(aa))
    back = np.asarray(R.rot_to_axisang(rot))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_rot6d_roundtrip():
    rng = np.random.RandomState(3)
    aa = rand_axisang(128, rng)
    rot = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    r6 = R.rot_to_rot6d(jnp.asarray(rot))
    rot2 = np.asarray(R.rot6d_to_rotmat(r6))
    np.testing.assert_allclose(rot2, rot, atol=1e-5)


def test_rot6d_matches_torch_gram_schmidt():
    """Oracle: the Zhou et al. Gram-Schmidt construction in torch."""
    import torch
    import torch.nn.functional as F

    def torch_rot6d(x):
        x = x.reshape(-1, 3, 2)
        a1, a2 = x[:, :, 0], x[:, :, 1]
        b1 = F.normalize(a1, dim=-1)
        b2 = F.normalize(
            a2 - torch.einsum('bi,bi->b', b1, a2).unsqueeze(-1) * b1, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-1)

    rng = np.random.RandomState(4)
    x = rng.normal(size=(64, 6)).astype(np.float32)
    ours = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
    ref = torch_rot6d(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bones_to_rot_dispatch():
    rng = np.random.RandomState(5)
    aa = rand_axisang(8, rng)
    assert R.bones_to_rot(jnp.asarray(aa)).shape == (8, 3, 3)
    r6 = rng.normal(size=(8, 6)).astype(np.float32)
    assert R.bones_to_rot(jnp.asarray(r6)).shape == (8, 3, 3)
    with pytest.raises(NotImplementedError):
        R.bones_to_rot(jnp.zeros((8, 5)))
