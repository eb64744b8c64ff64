"""The jitted training step: dual-optimizer NeRF + pose refinement.

TPU redesign of reference core/trainer.py (Trainer.train_batch
:230-273, compute_loss :319-441, optimize :451-483).  The whole step —
FK, rendering, losses, both optimizer updates — is one pure function
``train_step(state, batch, rng)`` compiled once by XLA; data-dependent
decisions (pose stop/warmup, every-k pose updates) are expressed as
multiplicative gates on gradients/updates instead of Python branches.

Reference semantics preserved:
  * NeRF Adam steps every iteration with the piecewise-constant
    exponential decay (trainer.py:173-183);
  * pose gradients accumulate (sum) across iterations and the pose Adam
    fires every ``opt_pose_step`` iterations (trainer.py:476-482);
  * after ``opt_pose_stop`` / before ``opt_pose_warmup``, pose
    parameters receive no updates and the kp losses drop out
    (trainer.py:240-241,252).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.factory import build_raycast_config, embed_state, \
    init_raycaster_params
from ..models.raycaster import RayCastConfig, render_rays
from ..skeleton import Skeleton, SMPLSkeleton
from ..utils.config import Config
from . import losses as L
from . import pose_opt as P


def tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y) if x is not None else None, a, b)


def tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(x * x) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.asarray(0.)


def make_optimizer(sched: Callable) -> optax.GradientTransformation:
    """Adam(0.9, 0.999) with an injected lr schedule, matching torch
    semantics (reference raycasters.py:116)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(sched),
        optax.scale(-1.0),
    )


@dataclasses.dataclass
class TrainSetup:
    """Everything static needed to build/jit the train step."""
    cfg: Config
    rc: RayCastConfig
    skel: Skeleton
    rest_pose: jnp.ndarray            # (J, 3) or (S, J, 3) per subject
    anchors: Optional[Dict[str, jnp.ndarray]] = None
    kp_map: Optional[jnp.ndarray] = None
    # multi-subject: per-frame subject index into rest_pose's leading
    # axis (ConcatH5Dataset meta rest_pose_idxs, dataset.py:686-691)
    rest_pose_idxs: Optional[jnp.ndarray] = None
    near: float = 0.0
    far: float = 1.0

    def frame_rest_pose(self, kp_idx: jnp.ndarray) -> jnp.ndarray:
        """Rest pose rows for the indexed frames: (R, J, 3) when
        multi-subject, else the shared (J, 3)."""
        if self.rest_pose.ndim == 3 and self.rest_pose_idxs is not None:
            return self.rest_pose[self.rest_pose_idxs[kp_idx]]
        if self.rest_pose.ndim == 3:
            return self.rest_pose[0]
        return self.rest_pose


def init_train_state(setup: TrainSetup, key: jax.Array,
                     init_kp3d: Optional[np.ndarray] = None,
                     init_bones: Optional[np.ndarray] = None
                     ) -> Dict[str, Any]:
    cfg = setup.cfg
    params = init_raycaster_params(key, setup.rc, cfg, setup.skel)
    nerf_tx = make_optimizer(L.nerf_lr_schedule(
        cfg.lrate, cfg.lrate_decay, cfg.lrate_decay_rate, cfg.decay_unit))
    state: Dict[str, Any] = {
        'params': params,
        'opt_state': nerf_tx.init(params),
        'pose_params': None,
        'pose_opt_state': None,
        'pose_accum': None,
        'step': jnp.asarray(0, jnp.int32),
    }
    if cfg.opt_pose:
        assert init_kp3d is not None and init_bones is not None
        pose_params = P.init_pose_params(
            init_kp3d, init_bones, use_rot6d=cfg.opt_rot6d,
            kp_map=(np.asarray(setup.kp_map) if setup.kp_map is not None
                    else None),
            skel=setup.skel)
        pose_tx = make_optimizer(L.pose_lr_schedule(
            cfg.opt_pose_lrate, cfg.opt_pose_lrate_decay,
            cfg.opt_pose_decay_rate, cfg.opt_pose_decay_unit,
            cfg.opt_pose_step))
        state['pose_params'] = pose_params
        state['pose_opt_state'] = pose_tx.init(pose_params)
        state['pose_accum'] = tree_zeros_like(pose_params)
        if cfg.opt_pose_flipflop:
            from . import flipflop as FF
            n_frames = init_kp3d.shape[0]
            state['kp_tracker'] = FF.init_tracker_state(n_frames)
            if cfg.opt_pose_reset:
                # pose-bank snapshot refreshed at each pose-turn start
                # (reference set_poseopt_ckpt, pose_opt.py:700-703).
                # Real copies, not aliases: donated train-step buffers
                # must not be shared between state leaves.
                state['pose_snapshot'] = jax.tree_util.tree_map(
                    lambda x: x.copy(), pose_params)
    return state


def get_batch_pose(setup: TrainSetup, pose_params, batch
                   ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Per-ray pose data from the pose bank (or the batch itself).

    Matches reference ``Trainer.get_kp_args`` (trainer.py:285-312).
    """
    if pose_params is None:
        pose = {'kps': batch['kps'], 'skts': batch['skts'],
                'bones': batch['bones'], 'cyls': batch['cyls']}
        return pose, {}
    kp_idx = batch['kp_idx']
    # FK once over the BANK frames, then gather per-ray rows — the
    # reference's unique-idx dedup (pose_opt.py:380) taken to its
    # static-shape conclusion: FK cost is O(n_frames) instead of
    # O(N_rand), and the backward reduces the per-ray skt cotangents
    # through one gather-transpose scatter-add instead of N_rand
    # independent FK pullbacks (measured: -3.5 ms/step at the SURREAL
    # recipe).  Same math by per-frame independence of FK.
    n_frames = pose_params['pelvis'].shape[0]
    all_idxs = jnp.arange(n_frames)
    kps_b, bones_b, skts_b, _, rots_b = P.pose_fk(
        pose_params, all_idxs, setup.frame_rest_pose(all_idxs),
        setup.skel, setup.kp_map)
    pose = {'kps': kps_b[kp_idx], 'skts': skts_b[kp_idx],
            'bones': bones_b[kp_idx], 'cyls': batch['cyls']}
    extras = {'rots': rots_b[kp_idx],
              'bank': {'kps': kps_b, 'bones': bones_b, 'rots': rots_b}}
    return pose, extras


def compute_losses(setup: TrainSetup, out, batch, pose, extras,
                   pose_params, use_pose_loss) -> Tuple[jnp.ndarray, Dict]:
    """Full loss stack (reference trainer.py:319-441)."""
    cfg = setup.cfg
    loss_fn = L.get_loss_fn(cfg.loss_fn, cfg.loss_beta, cfg.use_yuv)
    reg_fn = L.get_reg_fn(cfg.reg_fn)

    bgs = batch.get('bgs', 1.0)
    stats: Dict[str, jnp.ndarray] = {}
    total = 0.

    def nerf_loss(rgb_pred, acc_pred, coarse):
        nonlocal total
        rgb = rgb_pred
        if cfg.use_background:
            rgb = rgb + (1. - acc_pred)[..., None] * bgs
        rl = loss_fn(rgb, batch['target_s'])
        if coarse:
            rl = rl * cfg.coarse_weight
        tag = 'rgb_loss0' if coarse else 'rgb_loss'
        stats['psnr0' if coarse else 'psnr'] = L.img2psnr(
            jax.lax.stop_gradient(rgb), batch['target_s'])
        stats[tag] = rl
        total = total + rl
        if reg_fn is not None:
            reg = reg_fn(acc_pred, batch['fgs'][..., 0],
                         reduction='off') * cfg.reg_coef
            stats['reg_loss0' if coarse else 'reg_loss'] = reg
            total = total + reg

    nerf_loss(out['rgb_map'], out['acc_map'], coarse=False)
    if 'rgb0' in out:
        nerf_loss(out['rgb0'], out['acc0'], coarse=True)

    if pose_params is not None and setup.anchors is not None:
        kp_idx = batch['kp_idx']
        kp_loss = P.kp_reg_loss(pose['bones'], extras['rots'],
                                setup.anchors, kp_idx,
                                cfg.opt_pose_tol, cfg.opt_pose_coef,
                                cfg.opt_rot6d)
        kp_loss = kp_loss * use_pose_loss
        stats['kp_loss'] = kp_loss
        total = total + kp_loss
        if cfg.opt_pose_flipflop:
            # per-frame signal for the FlipFlop CMA trackers
            stats['kp_loss_per_ray'] = jax.lax.stop_gradient(
                P.kp_reg_loss(pose['bones'], extras['rots'],
                              setup.anchors, kp_idx, cfg.opt_pose_tol,
                              cfg.opt_pose_coef, cfg.opt_rot6d,
                              per_ray=True))

        if cfg.use_temp_loss:
            n_frames = pose_params['pelvis'].shape[0]
            prev_idx = jnp.maximum(kp_idx - 1, 0)
            next_idx = (kp_idx + 1) % n_frames
            sg = jax.lax.stop_gradient
            # neighbors come from the same bank FK (get_batch_pose) —
            # they are stop-gradient anyway, so a gather is exact
            bank = extras['bank']
            pk, pb, pr = (bank['kps'][prev_idx], bank['bones'][prev_idx],
                          bank['rots'][prev_idx])
            nk, nb, nr = (bank['kps'][next_idx], bank['bones'][next_idx],
                          bank['rots'][next_idx])
            if cfg.opt_rot6d:
                from ..ops.rotations import rot_to_rot6d
                pb, nb = rot_to_rot6d(pr), rot_to_rot6d(nr)
                bones_cmp = rot_to_rot6d(extras['rots'])
            else:
                bones_cmp = pose['bones']
            t_loss = P.temporal_loss(bones_cmp, pose['kps'], sg(pb), sg(pk),
                                     sg(nb), sg(nk), batch['temp_val'],
                                     cfg.temp_coef)
            t_loss = t_loss * use_pose_loss
            stats['temp_loss'] = t_loss
            total = total + t_loss

        stats['mpjpc'] = P.mpjpc_stat(pose['kps'], setup.anchors, kp_idx,
                                      cfg.ext_scale)

    stats['total_loss'] = total
    return total, stats


def make_train_step(setup: TrainSetup) -> Callable:
    """Build the pure train step (jit it yourself, or let
    ``parallel.sharding.shard_train_step`` do it over a mesh)."""
    cfg = setup.cfg
    rc = setup.rc
    nerf_tx = make_optimizer(L.nerf_lr_schedule(
        cfg.lrate, cfg.lrate_decay, cfg.lrate_decay_rate, cfg.decay_unit))
    pose_tx = make_optimizer(L.pose_lr_schedule(
        cfg.opt_pose_lrate, cfg.opt_pose_lrate_decay,
        cfg.opt_pose_decay_rate, cfg.opt_pose_decay_unit, cfg.opt_pose_step))
    nerf_sched = L.nerf_lr_schedule(cfg.lrate, cfg.lrate_decay,
                                    cfg.lrate_decay_rate, cfg.decay_unit)

    def train_step(state, batch, rng):
        step = state['step']
        # The reference updates tau/alpha at the END of each iteration
        # with global_step = i-1 (run_nerf.py:618, trainer.py:264-265),
        # so iteration i renders with tau(i-2); our 0-based step s = i-1
        # therefore renders with tau(max(s-1, 0)).
        est = embed_state(cfg, rc, jnp.maximum(step - 1, 0)) \
            if not cfg.finetune else embed_state(cfg, rc, 0)

        # pose update gating (reference trainer.py:240-241 + warmup)
        if cfg.opt_pose:
            stopped = jnp.asarray(False)
            if cfg.opt_pose_stop is not None:
                stopped = step >= cfg.opt_pose_stop
            warming = step < cfg.opt_pose_warmup
            use_pose = jnp.logical_not(jnp.logical_or(stopped, warming))
        else:
            use_pose = jnp.asarray(False)
        use_pose_f = use_pose.astype(jnp.float32)

        def loss_fn(params, pose_params):
            pose, extras = get_batch_pose(setup, pose_params, batch)
            out = render_rays(
                rc, params, batch['rays_o'], batch['rays_d'],
                setup.near, setup.far, pose, est,
                cam_idxs=(batch.get('cam_idxs')
                          if cfg.opt_framecode else None),
                subject_idxs=batch.get('subject_idxs'),
                rng=rng)
            total, stats = compute_losses(setup, out, batch, pose, extras,
                                          pose_params, use_pose_f)
            stats['alpha'] = jax.lax.stop_gradient(out['acc_map']).mean()
            return total, stats

        if cfg.opt_pose:
            (total, stats), (g_nerf, g_pose) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state['params'], state['pose_params'])
        else:
            (total, stats), g_nerf = jax.value_and_grad(
                loss_fn, has_aux=True)(state['params'], None)
            g_pose = None

        if cfg.opt_pose and cfg.testopt:
            # test-time pose optimization: the NeRF is frozen and only
            # the pose bank refines (reference PoseOptFlipFlop.testopt,
            # pose_opt.py:599,620-624).  Zeroed grads keep Adam moments
            # at zero, so the network never moves.
            g_nerf = tree_zeros_like(g_nerf)

        if cfg.finetune and cfg.fix_layer > 0:
            # freeze the first fix_layer density-trunk layers during
            # finetuning (reference raycasters.py:215-217).  Zeroed
            # grads keep the Adam moments at zero, so the parameters
            # never move — equivalent to requires_grad=False.
            g_nerf = dict(g_nerf)
            for net in ('coarse', 'fine'):
                if g_nerf.get(net) is None:
                    continue
                sub = dict(g_nerf[net])
                sub['pts_linears'] = [
                    (tree_zeros_like(l) if i < cfg.fix_layer else l)
                    for i, l in enumerate(sub['pts_linears'])]
                g_nerf[net] = sub

        # --- update gates ---
        # our step s is reference iteration i = s+1 (run_nerf.py:530-538
        # loops from 1): the first pose step fires only after
        # opt_pose_step gradients have accumulated (trainer.py:475-477).
        nerf_fire = jnp.asarray(True)
        accum_gate = use_pose_f
        if cfg.opt_pose and cfg.opt_pose_flipflop and not cfg.opt_pose_joint:
            # alternating NeRF-turn / pose-turn scheduler (reference
            # PoseOptFlipFlop, pose_opt.py:584-727): the turn flips
            # every opt_pose_interval steps; NeRF updates through its
            # turn plus one boundary step, pose gradients accumulate
            # through pose turns and fire every opt_pose_step (incl.
            # the flush on the first NeRF-turn step back).  Unlike the
            # reference's driverless legacy class we recompute fresh
            # gradients every step (its missing zero_grad would re-apply
            # stale NeRF gradients at the turn boundary).
            from . import flipflop as FF
            ff = FF.FlipFlopConfig(
                opt_pose_interval=cfg.opt_pose_interval,
                opt_pose_step=cfg.opt_pose_step, opt_pose_joint=False,
                opt_pose_warmup=cfg.opt_pose_warmup,
                opt_pose_stop=cfg.opt_pose_stop,
                opt_pose_reset=cfg.opt_pose_reset, testopt=cfg.testopt)
            nerf_g, pose_g = FF.update_gates(ff, step + 1)
            nerf_fire = nerf_g > 0
            fire = jnp.logical_and(pose_g > 0, use_pose)
            accum_gate = FF.peek_pose_turn(ff, step + 1).astype(
                jnp.float32) * use_pose_f
        elif cfg.opt_pose and (cfg.opt_pose_joint or cfg.testopt):
            # joint mode (reference pose_opt.py:682-693, reachable via
            # --opt_pose_joint / --testopt): NeRF every iter, pose every
            # opt_pose_step inside the warmup/stop window
            from . import flipflop as FF
            ff = FF.FlipFlopConfig(
                opt_pose_step=cfg.opt_pose_step, opt_pose_joint=True,
                opt_pose_warmup=cfg.opt_pose_warmup,
                opt_pose_stop=cfg.opt_pose_stop, testopt=cfg.testopt)
            _, pose_g = FF.update_gates(ff, step + 1)
            fire = jnp.logical_and(pose_g > 0, use_pose)
        elif cfg.opt_pose:
            fire = jnp.logical_and(((step + 1) % cfg.opt_pose_step) == 0,
                                   use_pose)

        # --- NeRF update (every step; gated on flipflop NeRF turns) ---
        updates, opt_state = nerf_tx.update(g_nerf, state['opt_state'],
                                            state['params'])
        params = optax.apply_updates(state['params'], updates)
        new_state = dict(state)
        new_state.update(
            params=tree_where(nerf_fire, params, state['params']),
            opt_state=tree_where(nerf_fire, opt_state,
                                 state['opt_state']),
            step=step + 1)

        stats['total_norm'] = global_norm(g_nerf)
        stats['lrate'] = nerf_sched(step)
        stats['tau'] = est['tau']
        if cfg.opt_pose_flipflop:
            stats['nerf_gate'] = nerf_fire.astype(jnp.float32)
            stats['pose_gate'] = fire.astype(jnp.float32)

        # --- pose update (accumulate; fire every opt_pose_step) ---
        if cfg.opt_pose:
            g_pose = jax.tree_util.tree_map(
                lambda g: g * accum_gate, g_pose)
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g, state['pose_accum'], g_pose)
            p_updates, p_opt_state = pose_tx.update(
                accum, state['pose_opt_state'], state['pose_params'])
            p_new = optax.apply_updates(state['pose_params'], p_updates)
            new_state['pose_params'] = tree_where(
                fire, p_new, state['pose_params'])
            new_state['pose_opt_state'] = tree_where(
                fire, p_opt_state, state['pose_opt_state'])
            new_state['pose_accum'] = tree_where(
                fire, tree_zeros_like(accum), accum)

            if cfg.opt_pose_flipflop:
                from . import flipflop as FF
                kp_per_ray = stats.pop('kp_loss_per_ray', None)
                if kp_per_ray is not None:
                    new_state['kp_tracker'] = FF.accumulate_loss(
                        state['kp_tracker'], kp_per_ray, batch['kp_idx'])
                    stats['kp_tracker_mean'] = FF.get_trackers(
                        new_state['kp_tracker']).mean()
                if cfg.opt_pose_reset:
                    # refresh the reset snapshot at pose-turn starts
                    # from the PRE-update bank (set_poseopt_ckpt runs
                    # before the iteration's step, pose_opt.py:700-703)
                    new_state['pose_snapshot'] = FF.maybe_snapshot(
                        ff, step + 1, state['pose_params'],
                        state['pose_snapshot'])

        return new_state, stats

    return train_step


def make_multi_train_step(setup: TrainSetup, steps: int) -> Callable:
    """Bundle ``steps`` train steps into ONE compiled program via
    lax.scan — a TPU-native throughput feature with no reference
    counterpart: on tunneled/remote hosts each program launch costs
    ~0.5-1 ms of dispatch latency the device spends idle; scanning k
    steps per dispatch amortizes it to 1/k.

    The bundled function takes batches stacked on a leading ``steps``
    axis (``stack_batches``) and returns the final state plus the LAST
    step's stats (scalars; cadence-based logging reads one bundle).
    """
    train_step = make_train_step(setup)

    def multi_step(state, batches, rng):
        def body(carry, batch):
            st, r = carry
            new_st, stats = train_step(st, batch,
                                       jax.random.fold_in(r, st['step']))
            return (new_st, r), stats
        (state, _), stats_seq = jax.lax.scan(body, (state, rng), batches)
        stats = jax.tree_util.tree_map(lambda s: s[-1], stats_seq)
        return state, stats

    return multi_step


def stack_batches(batches):
    """Stack a list of per-step batch dicts on a new leading axis for
    :func:`make_multi_train_step` (host-side numpy: the stacked bundle
    is what gets transferred)."""
    keys = batches[0].keys()
    return {k: np.stack([np.asarray(b[k]) for b in batches], 0)
            for k in keys}
