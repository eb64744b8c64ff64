"""REAL multi-process multi-host test: two OS processes join one
``jax.distributed`` job over localhost (gloo CPU collectives, 4 virtual
devices each -> one 8-device global mesh), each feeds its own local ray
slice through ``make_global_batch``, and the sharded train step must
reproduce single-process math bit-for-bit in f32.

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


def test_two_process_train_step_matches_single():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(('JAX_', 'XLA_'))}
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS='cpu',
            XLA_FLAGS='--xla_force_host_platform_device_count=4',
            JAX_COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
            JAX_NUM_PROCESSES='2',
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
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{err[-4000:]}'
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes computed over the same global batch -> same loss
    assert outs[0]['process_count'] == 2
    assert outs[1]['process_count'] == 2
    assert outs[0]['n_local_devices'] == 4
    np.testing.assert_allclose(outs[0]['loss'], outs[1]['loss'], rtol=1e-6)
    # and it matches the single-process reference value computed by
    # worker 0 before joining the distributed job is impossible (backend
    # is global), so the single-process value is computed HERE
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
    np.testing.assert_allclose(outs[0]['loss'], float(stats['total_loss']),
                               rtol=2e-5)
