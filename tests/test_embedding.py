"""Golden tests for cutoff-windowed positional encoding (numpy oracles)."""
import numpy as np
import jax.numpy as jnp

from anerf_tpu.ops.embedding import (EmbedConfig, embed, tau_schedule,
                                     alpha_schedule)


def sigmoid(x):
    return 1. / (1. + np.exp(-x))


def oracle_cutoff_embed(x, dists, cutoff, tau, F, cutoff_inputs=True,
                        dist_expand=1, shift_inputs=False,
                        cut_to_cutoff=False, sched_w=None):
    """Straight-line numpy oracle of the windowed PE.

    Layout: rows [x, sin f0 x, cos f0 x, sin f1 x, ...] over channels,
    flattened band-major.
    """
    if dist_expand > 1:
        dists = np.repeat(dists, dist_expand, axis=-1)
        cutoff_e = np.repeat(cutoff, dist_expand, axis=-1)
    else:
        cutoff_e = cutoff
        if cut_to_cutoff:
            x = cutoff - x
    # shift applies to the frequency inputs only; the raw include-input
    # row stays unshifted (reference cutoff_embedder.py:129-134 builds a
    # separate `shifted` local and still cats `inputs`).
    x_f = x * (2. / cutoff) - 1. if shift_inputs else x
    freqs = 2.0 ** np.arange(F)
    w = 1. - sigmoid(tau * (dists - cutoff_e))      # (..., C)
    rows = [x]
    for i, f in enumerate(freqs):
        s, c = np.sin(f * x_f), np.cos(f * x_f)
        if sched_w is not None:
            s, c = s * sched_w[2 * i], c * sched_w[2 * i + 1]
        rows.extend([s, c])
    emb = np.stack(rows, axis=-2)                    # (..., 1+2F, C)
    if cutoff_inputs:
        emb = emb * w[..., None, :]
    else:
        emb = np.concatenate([emb[..., :1, :],
                              emb[..., 1:, :] * w[..., None, :]], axis=-2)
    return emb.reshape(emb.shape[:-2] + (-1,))


def test_cutoff_embed_reldist_mode():
    """kp embedder: inputs == distances (C == J == 4 here)."""
    rng = np.random.RandomState(0)
    J, F = 4, 3
    x = rng.uniform(0.01, 1.0, size=(5, 7, J)).astype(np.float32)
    cutoff = np.full(J, 0.3, np.float32)
    tau = 25.0
    cfg = EmbedConfig(input_dims=J, num_freqs=F, cutoff=True,
                      cutoff_inputs=True, cutoff_dim=J)
    ours, w = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                    cutoff_dist=jnp.asarray(cutoff), tau=tau)
    assert ours.shape == (5, 7, (1 + 2 * F) * J)
    ref = oracle_cutoff_embed(x, x, cutoff, tau, F, cutoff_inputs=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_cutoff_embed_no_cutoff_inputs():
    rng = np.random.RandomState(1)
    J, F = 3, 2
    x = rng.uniform(0.01, 1.0, size=(4, J)).astype(np.float32)
    cutoff = np.full(J, 0.5, np.float32)
    cfg = EmbedConfig(input_dims=J, num_freqs=F, cutoff=True,
                      cutoff_inputs=False, cutoff_dim=J)
    ours, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                    cutoff_dist=jnp.asarray(cutoff), tau=10.)
    ref = oracle_cutoff_embed(x, x, cutoff, 10., F, cutoff_inputs=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_cutoff_embed_dist_inputs_mode():
    """view/bone embedders: per-joint 3-vectors, dists expanded x3
    (reference cutoff_embedder.py:116-124)."""
    rng = np.random.RandomState(2)
    J, D, F = 4, 3, 2
    x = rng.normal(size=(6, 5, J * D)).astype(np.float32)
    dists = rng.uniform(0.01, 1.0, size=(6, 5, J)).astype(np.float32)
    cutoff = np.full(J, 0.25, np.float32)
    cfg = EmbedConfig(input_dims=J * D, num_freqs=F, cutoff=True,
                      dist_inputs=True, cutoff_inputs=True, cutoff_dim=J)
    ours, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(dists),
                    cutoff_dist=jnp.asarray(cutoff), tau=50.)
    ref = oracle_cutoff_embed(x, dists, cutoff, 50., F, cutoff_inputs=True,
                              dist_expand=D)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_cutoff_embed_shift_inputs():
    rng = np.random.RandomState(3)
    J, F = 4, 3
    x = rng.uniform(0.01, 0.6, size=(5, J)).astype(np.float32)
    cutoff = np.full(J, 0.35, np.float32)
    cfg = EmbedConfig(input_dims=J, num_freqs=F, cutoff=True,
                      cutoff_inputs=True, shift_inputs=True, cutoff_dim=J)
    ours, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                    cutoff_dist=jnp.asarray(cutoff), tau=20.)
    ref = oracle_cutoff_embed(x, x, cutoff, 20., F, shift_inputs=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_cutoff_window_kills_far_joints():
    """Features for joints far beyond cutoff must vanish."""
    J, F = 2, 2
    x = np.array([[0.05, 5.0]], np.float32)  # joint0 near, joint1 far
    cutoff = np.full(J, 0.2, np.float32)
    cfg = EmbedConfig(input_dims=J, num_freqs=F, cutoff=True,
                      cutoff_inputs=True, cutoff_dim=J)
    out, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=2000.)
    out = np.asarray(out).reshape(1, 1 + 2 * F, J)
    assert np.abs(out[..., 1]).max() < 1e-5   # far joint: all rows ~0
    assert np.abs(out[..., 0]).max() > 1e-3   # near joint alive


def test_plain_embed_zero_freqs_identity():
    cfg = EmbedConfig(input_dims=6, num_freqs=0, cutoff=False)
    x = np.random.RandomState(4).normal(size=(3, 6)).astype(np.float32)
    out, w = embed(jnp.asarray(x), cfg)
    assert w is None
    np.testing.assert_allclose(np.asarray(out), x)
    assert cfg.out_dim == 6


def test_plain_embed_matches_classic_pe():
    cfg = EmbedConfig(input_dims=2, num_freqs=3, cutoff=False)
    x = np.random.RandomState(5).normal(size=(4, 2)).astype(np.float32)
    out, _ = embed(jnp.asarray(x), cfg)
    assert out.shape == (4, 2 * (1 + 6))
    ref = [x]
    for f in [1., 2., 4.]:
        ref.extend([np.sin(f * x), np.cos(f * x)])
    np.testing.assert_allclose(np.asarray(out), np.concatenate(ref, -1),
                               atol=1e-6)


def test_tau_schedule():
    cfg = EmbedConfig(input_dims=4, num_freqs=2, cutoff=True, init_tau=20.)
    # reference: init_tau * rate^(step / (step_k * 1000)) clamped at 2000
    t0 = float(tau_schedule(cfg, 0, 250, 10.))
    np.testing.assert_allclose(t0, 20.)
    t = float(tau_schedule(cfg, 125000, 250, 10.))
    np.testing.assert_allclose(t, 20. * 10. ** 0.5, rtol=1e-5)
    t_inf = float(tau_schedule(cfg, 10_000_000, 250, 10.))
    np.testing.assert_allclose(t_inf, 2000.)


def test_freq_schedule_weights():
    cfg = EmbedConfig(input_dims=4, num_freqs=3, cutoff=True,
                      freq_schedule=True, init_alpha=0., cutoff_dim=4)
    x = np.random.RandomState(6).uniform(0.01, 1., size=(2, 4)).astype(
        np.float32)
    cutoff = np.full(4, 10.0, np.float32)  # window fully open
    # reference: init + (target - init) * step / (step_k * 1000)
    alpha = float(alpha_schedule(cfg, 500, 2, target=2.))  # 2 * 500/2000
    np.testing.assert_allclose(alpha, 0.5)
    out, _ = embed(jnp.asarray(x), cfg, dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=20., alpha=alpha)
    k = np.repeat(np.log2([1., 2., 4.]), 2)
    sched = 0.5 * (1. - np.cos(np.pi * np.clip(alpha - k, 0., 1.)))
    ref = oracle_cutoff_embed(x, x, cutoff, 20., 3, cutoff_inputs=False,
                              sched_w=sched)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
