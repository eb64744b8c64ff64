"""Component-level timing of the flagship train step.

Times each stage of the hot path independently (jitted, device-synced)
to find where the 66ms/step goes before optimizing.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from anerf_tpu import testing_utils as T
from anerf_tpu.models import raycaster as rcm
from anerf_tpu.models.factory import embed_state
from anerf_tpu.ops import compositing, encoders, rays as ray_ops
from anerf_tpu.ops.embedding import embed
from anerf_tpu.models.nerf_mlp import nerf_forward


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force full host fetch like bench.py
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return out


def main():
    n_rays = 2048
    setup, state, batch, step_fn = T.build_flagship(
        n_rays=n_rays, opt_pose=True, compute_dtype='bfloat16')
    rc = setup.cfg if hasattr(setup, 'cfg') else None
    rc = setup.rc
    cfg = setup.cfg
    params = state['params']
    est = embed_state(cfg, rc, 10000)
    rng = jax.random.PRNGKey(0)

    pose = {'kps': batch['kps'], 'skts': batch['skts'],
            'bones': batch['bones'], 'cyls': batch['cyls']}

    # full step (fwd+bwd+update)
    step = jax.jit(step_fn, donate_argnums=())
    timeit('full train step', step, state, batch, rng, n=20)

    # forward-only render
    fwd = jax.jit(lambda p, b, k: rcm.render_rays(
        rc, p, b['rays_o'], b['rays_d'], setup.near, setup.far,
        {'kps': b['kps'], 'skts': b['skts'], 'bones': b['bones'],
         'cyls': b['cyls']}, est, cam_idxs=b['cam_idxs'], rng=k))
    timeit('render_rays fwd', fwd, params, batch, rng)

    # fwd + bwd (grad wrt params of mean rgb)
    def loss(p, b, k):
        out = rcm.render_rays(
            rc, p, b['rays_o'], b['rays_d'], setup.near, setup.far,
            {'kps': b['kps'], 'skts': b['skts'], 'bones': b['bones'],
             'cyls': b['cyls']}, est, cam_idxs=b['cam_idxs'], rng=k)
        return jnp.mean((out['rgb_map'] - b['target_s']) ** 2) + \
            jnp.mean((out['rgb0'] - b['target_s']) ** 2)
    g = jax.jit(jax.grad(loss))
    timeit('render fwd+bwd (param grads)', g, params, batch, rng)

    # encode stage alone (fine-sized: 80 samples)
    S = rc.N_samples + rc.N_importance
    pts = batch['rays_o'][:, None] + batch['rays_d'][:, None] * \
        jnp.linspace(0.1, 2.0, S)[None, :, None]
    enc = jax.jit(lambda p, pts: rcm.encode_inputs(
        rc, p, pts, batch['rays_o'], batch['rays_d'], pose, est))
    v, r, d = timeit(f'encode_inputs ({S} samples)', enc, params, pts)

    # MLP alone on the encoded features
    x_pts = jnp.concatenate([v, r], -1)
    fc_idx = jnp.broadcast_to(batch['cam_idxs'][:, None], x_pts.shape[:2]) \
        if rc.nerf.use_framecode else None
    mlp = jax.jit(lambda p, xp, xv: nerf_forward(p, rc.nerf, xp, xv, fc_idx))
    raw = timeit('nerf MLP fwd', mlp, params['fine'], x_pts, d)

    # MLP fwd+bwd
    def mlp_loss(p, xp, xv):
        return jnp.mean(nerf_forward(p, rc.nerf, xp, xv, fc_idx) ** 2)
    mlp_g = jax.jit(jax.grad(mlp_loss))
    timeit('nerf MLP fwd+bwd', mlp_g, params['fine'], x_pts, d)

    # encode fwd+bwd (grads wrt pts — pose-opt path)
    def enc_loss(pts):
        v, r, d = rcm.encode_inputs(rc, params, pts, batch['rays_o'],
                                    batch['rays_d'], pose, est)
        return jnp.mean(v ** 2) + jnp.mean(r ** 2) + jnp.mean(d ** 2)
    enc_g = jax.jit(jax.grad(enc_loss))
    timeit('encode fwd+bwd', enc_g, pts)

    # compositing alone
    z_vals = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S), (n_rays, S))
    comp = jax.jit(lambda raw: compositing.raw2outputs(
        raw.astype(jnp.float32), z_vals, batch['rays_d'],
        act_fn=rc.density_fn()))
    timeit('raw2outputs', comp, raw)

    # importance sampling alone
    w = jnp.abs(jax.random.normal(rng, (n_rays, rc.N_samples)))
    zc = jnp.broadcast_to(jnp.linspace(0.1, 2.0, rc.N_samples),
                          (n_rays, rc.N_samples))
    isamp = jax.jit(lambda w: ray_ops.isample_from_lineseg(
        zc, w, rc.N_importance, det=False, rng=rng))
    timeit('isample_from_lineseg', isamp, w)


if __name__ == '__main__':
    main()
