"""FlipFlop scheduler semantics vs the reference's imperative control
flow (core/pose_opt.py:584-727)."""
import numpy as np
import jax.numpy as jnp

from anerf_tpu.training import flipflop as FF


def reference_gates(interval, k, steps, joint=False):
    """Re-enactment of PoseOptFlipFlop.step()'s branch structure
    (pose_opt.py:682-727) as plain python."""
    pose_turn = joint
    nerf_gates, pose_gates = [], []
    for i in steps:
        if joint:
            nerf_gates.append(1.)
            pose_gates.append(1. if i % k == 0 else 0.)
            continue
        just_turned = False
        if i % interval == 0:
            pose_turn = not pose_turn
            just_turned = True
        if (not pose_turn and not just_turned) or (pose_turn and just_turned):
            nerf_gates.append(1.)
            pose_gates.append(0.)
        elif i % k == 0:
            nerf_gates.append(0.)
            pose_gates.append(1.)
        else:
            nerf_gates.append(0.)
            pose_gates.append(0.)
    return np.array(nerf_gates), np.array(pose_gates)


def test_alternating_gates_match_reference():
    ff = FF.FlipFlopConfig(opt_pose_interval=5, opt_pose_step=2)
    steps = np.arange(0, 40)
    ref_n, ref_p = reference_gates(5, 2, steps)
    got_n, got_p = FF.update_gates(ff, jnp.asarray(steps))
    np.testing.assert_array_equal(np.asarray(got_n), ref_n)
    np.testing.assert_array_equal(np.asarray(got_p), ref_p)


def test_joint_gates():
    ff = FF.FlipFlopConfig(opt_pose_joint=True, opt_pose_step=4)
    steps = np.arange(0, 16)
    ref_n, ref_p = reference_gates(0, 4, steps, joint=True)
    got_n, got_p = FF.update_gates(ff, jnp.asarray(steps))
    np.testing.assert_array_equal(np.asarray(got_n), ref_n)
    np.testing.assert_array_equal(np.asarray(got_p), ref_p)


def test_warmup_and_stop_window():
    ff = FF.FlipFlopConfig(opt_pose_interval=2, opt_pose_step=1,
                           opt_pose_warmup=4, opt_pose_stop=10)
    steps = jnp.arange(0, 16)
    _, pose_g = FF.update_gates(ff, steps)
    pose_g = np.asarray(pose_g)
    assert pose_g[:4].sum() == 0          # warmup
    assert pose_g[11:].sum() == 0         # stopped
    assert pose_g[4:11].sum() > 0


def test_testopt_freezes_nerf():
    ff = FF.FlipFlopConfig(opt_pose_interval=3, testopt=True)
    nerf_g, _ = FF.update_gates(ff, jnp.arange(12))
    assert float(jnp.sum(nerf_g)) == 0.


def test_tracker_cma():
    tr = FF.init_tracker_state(4)
    # reference semantics: CMA_new = CMA + (scatter_sum - CMA)/cnt
    loss = jnp.asarray([1., 3., 5.])
    idx = jnp.asarray([0, 0, 2])
    tr = FF.accumulate_loss(tr, loss, idx)
    t = np.asarray(tr['kp_loss_tracker'])
    # reference quirk (pose_opt.py:648-662): untouched frames get
    # CMA + (0 - CMA)/clamp(cnt,1) = 0, i.e. they are zeroed, not kept.
    #  frame0: 10 + (4 - 10)/2 = 7 ; frame2: 10 + (5 - 10)/1 = 5
    np.testing.assert_allclose(t, [7., 0., 5., 0.], rtol=1e-6)
    vals = np.asarray(FF.get_trackers(tr))
    np.testing.assert_allclose(vals, [7. / 2, 0., 5., 0.], rtol=1e-6)


def test_snapshot_and_reset():
    ff = FF.FlipFlopConfig(opt_pose_interval=3, opt_pose_reset=True)
    pose0 = {'pelvis': jnp.zeros((2, 3)), 'bones': jnp.ones((2, 24, 3))}
    snap = FF.maybe_snapshot(ff, 0, pose0, None)
    # mutate pose, snapshot only refreshes at pose-turn start (step 3)
    pose1 = {'pelvis': pose0['pelvis'] + 1., 'bones': pose0['bones'] * 2.}
    snap = FF.maybe_snapshot(ff, 4, pose1, snap)   # nerf turn: keep old
    np.testing.assert_allclose(np.asarray(snap['pelvis']), 0.)
    snap = FF.maybe_snapshot(ff, 6, pose1, snap)   # pose turn start
    np.testing.assert_allclose(np.asarray(snap['pelvis']), 1.)
    restored = FF.reset_poseopt(pose0, snap)
    np.testing.assert_allclose(np.asarray(restored['pelvis']), 1.)


def test_anneal_pose_reg():
    c = FF.anneal_pose_reg(0.1, 2000, reg_step=1000, reg_rate=5.)
    np.testing.assert_allclose(float(c), 0.1 * 25., rtol=1e-6)
    c = FF.anneal_pose_reg(0.1, 999, reg_step=None)
    np.testing.assert_allclose(float(c), 0.1)
