"""REAL multi-process multi-host tests: 2 or 4 OS processes join one
``jax.distributed`` job over localhost (gloo CPU collectives, one
8-device global mesh), each feeds its own local ray slice through
``make_global_batch``, and the sharded train step must reproduce
single-process math to f32 tolerance.

This exercises the actual cross-process path (coordinator handshake,
global device enumeration, process-local array stitching, cross-host
psum) that the in-process 8-device tests cannot.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), '_multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(n_proc, dev_per_proc, timeout=540):
    """Run the worker in n_proc processes; returns their JSON reports."""
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(('JAX_', 'XLA_'))}
    procs = []
    for pid in range(n_proc):
        env = dict(
            env_base,
            JAX_PLATFORMS='cpu',
            XLA_FLAGS=('--xla_force_host_platform_device_count='
                       f'{dev_per_proc}'),
            JAX_COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
            JAX_NUM_PROCESSES=str(n_proc),
            JAX_PROCESS_ID=str(pid),
            # repo root only: the outer PYTHONPATH carries the axon TPU
            # plugin site, which would initialize a backend before
            # jax.distributed gets a chance
            PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{err[-4000:]}'
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def _oracle_loss():
    """Single-process reference value for the same batch/step."""
    from anerf_tpu.training.trainer import init_train_state, make_train_step
    sys.path.insert(0, os.path.dirname(__file__))
    from test_trainer import make_setup_and_batch, tiny_config
    import jax
    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1,
                      N_rand=16, raw_noise_std=0., perturb=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)
    _, stats = jax.jit(make_train_step(setup))(state, batch,
                                               jax.random.PRNGKey(5))
    return float(stats['total_loss'])


def test_two_process_train_step_matches_single():
    outs = _launch(2, 4)
    assert [o['process_count'] for o in outs] == [2, 2]
    assert outs[0]['n_local_devices'] == 4
    np.testing.assert_allclose(outs[0]['loss'], outs[1]['loss'], rtol=1e-6)
    np.testing.assert_allclose(outs[0]['loss'], _oracle_loss(), rtol=2e-5)


def test_four_process_train_step_matches_single():
    """4 gloo processes x 2 virtual devices = the same 8-device mesh;
    losses agree across all four and with the single-process oracle,
    and every worker reports a finite per-step wall time (the coarse
    scaling signal recorded in BASELINE.md)."""
    outs = _launch(4, 2)
    assert [o['process_count'] for o in outs] == [4] * 4
    assert all(o['n_local_devices'] == 2 for o in outs)
    for o in outs[1:]:
        np.testing.assert_allclose(outs[0]['loss'], o['loss'], rtol=1e-6)
    np.testing.assert_allclose(outs[0]['loss'], _oracle_loss(), rtol=2e-5)
    assert all(np.isfinite(o['step_ms']) and o['step_ms'] > 0 for o in outs)
