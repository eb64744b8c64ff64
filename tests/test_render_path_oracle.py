"""Full-image renderer + SSIM parity against the reference.

Covers the two round-2 gaps: (a) ``ImageRenderer.render_image`` was
tested only against itself — here the reference's own ``render_path``
(run_nerf.py:27-145: kp_to_valid_rays bbox restriction, chunked
forward_eval, background compositing, NaN-disp scrubbing) renders the
same scene with the same injected weights and the full images must
match; (b) the hand-rolled Gaussian SSIM is checked against an
independent torch implementation of the pytorch-msssim algorithm and
analytic fixed points.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import ref_oracle
from anerf_tpu.models.factory import embed_state
from anerf_tpu.render.renderer import ImageRenderer
from test_reference_parity import Setup, N_FRAMES

T = torch.from_numpy
H = W = 40
FOCAL = 34.0


@pytest.fixture(scope='module')
def scene(tmp_path_factory):
    s = Setup(tmp_path_factory.mktemp('rp'), n_rays=16)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    return s, c2w


def _ref_render_path(s, c2w, bg=None):
    import run_nerf as ref_run_nerf
    rkt = dict(s.rkt)
    caster = s.caster
    caster.eval()   # forward_eval: no_grad, same math
    rkt['ray_caster'] = caster
    rkt['perturb'] = 0.
    rkt['raw_noise_std'] = 0.
    rkt['ray_noise_std'] = 0.
    kp = T(s.kps[:1].copy())
    skts = T(s.skts[:1].copy())
    bones = T(s.bones[:1].copy())
    cams = T(np.zeros((1,), np.float32))
    rgbs, disps, accs, valid_idxs, bboxes = ref_run_nerf.render_path(
        [T(c2w)], (H, W, FOCAL), chunk=2048, render_kwargs=rkt,
        kp=kp, skts=skts, bones=bones, cams=cams,
        bg_imgs=bg, bg_indices=None if bg is None else None,
        ret_acc=True, ext_scale=0.001)
    caster.train()
    return rgbs[0], disps[0, ..., 0], accs[0, ..., 0]


def _our_render_image(s, c2w, bg=None):
    rc = s.rc   # ImageRenderer applies eval_variant() itself
    renderer = ImageRenderer(rc, s.params,
                             embed_state(s.cfg, s.rc, 0), chunk=2048,
                             near=0.1, far=8.0)
    out = renderer.render_image(
        H, W, FOCAL, c2w, s.kps[0], s.skts[0], s.bones[0],
        cam_idx=0, bg=None if bg is None else bg[0],
        ext_scale=0.001)
    return out['rgb'], out['disp'], out['acc']


def test_render_path_full_image_parity(scene):
    """Black-background full image, disparity, and accumulation match
    the reference render_path pixel-for-pixel."""
    s, c2w = scene
    ref_rgb, ref_disp, ref_acc = _ref_render_path(s, c2w)
    rgb, disp, acc = _our_render_image(s, c2w)
    # the scene must be non-trivial (cylinder box hit, body visible)
    assert float(ref_acc.max()) > 0.5
    assert (ref_rgb > 0).any()
    np.testing.assert_allclose(rgb, ref_rgb, atol=2e-5)
    np.testing.assert_allclose(acc, ref_acc, atol=2e-5)
    np.testing.assert_allclose(disp, ref_disp, atol=2e-4)


def test_render_path_background_composite_parity(scene):
    """Background compositing path: rgb + (1-acc)*bg inside the valid
    box, raw bg outside (reference run_nerf.py:104-130)."""
    s, c2w = scene
    rng = np.random.RandomState(5)
    bg = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    ref_rgb, _, _ = _ref_render_path(s, c2w, bg=bg)
    rgb, _, _ = _our_render_image(s, c2w, bg=bg)
    np.testing.assert_allclose(rgb, ref_rgb, atol=2e-5)


# ---------------------------------------------------------------------------
# SSIM oracle: independent torch implementation of the pytorch-msssim
# algorithm (Gaussian window 11, sigma 1.5, K=(0.01, 0.03), valid conv)
# ---------------------------------------------------------------------------

def _torch_ssim(img, target, data_range=1.0, win_size=11, sigma=1.5):
    x = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    y = torch.from_numpy(target.astype(np.float32)).permute(2, 0, 1)[None]
    coords = torch.arange(win_size, dtype=torch.float32) - win_size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = (g / g.sum())
    kernel = (g[:, None] @ g[None, :])[None, None]
    C = x.shape[1]
    kernel = kernel.expand(C, 1, win_size, win_size)
    conv = lambda t: torch.nn.functional.conv2d(t, kernel, groups=C)
    mu_x, mu_y = conv(x), conv(y)
    xx = conv(x * x) - mu_x ** 2
    yy = conv(y * y) - mu_y ** 2
    xy = conv(x * y) - mu_x * mu_y
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    s = ((2 * mu_x * mu_y + C1) * (2 * xy + C2)) / \
        ((mu_x ** 2 + mu_y ** 2 + C1) * (xx + yy + C2))
    return float(s.mean())


def test_ssim_vs_torch_oracle():
    from anerf_tpu.eval.metrics import ssim
    rng = np.random.RandomState(0)
    for trial in range(3):
        a = rng.uniform(0, 1, (48, 40, 3)).astype(np.float32)
        noise = rng.normal(scale=0.05 * (trial + 1), size=a.shape)
        b = np.clip(a + noise, 0, 1).astype(np.float32)
        np.testing.assert_allclose(ssim(a, b), _torch_ssim(a, b),
                                   rtol=1e-5)
    # structured (smooth) images where SSIM is far from 0
    yy, xx = np.mgrid[0:48, 0:40] / 48.
    a = np.stack([yy, xx, yy * xx], -1).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.02, size=a.shape), 0, 1) \
        .astype(np.float32)
    np.testing.assert_allclose(ssim(a, b), _torch_ssim(a, b), rtol=1e-5)
    assert ssim(a, b) > 0.5


def test_ssim_fixed_points():
    from anerf_tpu.eval.metrics import ssim
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    # constant-offset images: luminance term only
    b = np.clip(a * 0 + 0.25, 0, 1)
    c = np.clip(a * 0 + 0.75, 0, 1)
    # mu_x=0.25, mu_y=0.75, zero variance -> (2*mu_x*mu_y+C1)/(mu_x^2+mu_y^2+C1)
    expect = (2 * .25 * .75 + 1e-4) / (.25 ** 2 + .75 ** 2 + 1e-4)
    assert ssim(b, c) == pytest.approx(expect, rel=1e-5)
