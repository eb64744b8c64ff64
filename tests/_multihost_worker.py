"""Worker process for test_multihost_launch: joins the N-process
jax.distributed job (N from JAX_NUM_PROCESSES), feeds its 1/N slice of
the ray batch through make_global_batch, runs sharded train steps, and
prints a JSON line with the loss and a per-step wall time."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
sys.path.insert(0, os.path.dirname(__file__))

import jax
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

from anerf_tpu.parallel.sharding import (init_distributed, make_mesh,
                                         make_global_batch,
                                         replicate_state,
                                         shard_train_step)


def main():
    expected = int(os.environ.get('JAX_NUM_PROCESSES', '2'))
    pidx, pcount = init_distributed()
    assert pcount == expected, f'expected {expected} processes, got {pcount}'

    import numpy as np
    from anerf_tpu.training.trainer import init_train_state, make_train_step
    from test_trainer import make_setup_and_batch, tiny_config

    cfg = tiny_config(opt_pose=True, opt_pose_step=1, opt_pose_coef=0.1,
                      N_rand=16, raw_noise_std=0., perturb=0.)
    setup, batch, (kps, bones) = make_setup_and_batch(cfg)
    state = init_train_state(setup, jax.random.PRNGKey(0),
                             init_kp3d=kps, init_bones=bones)

    mesh = make_mesh()   # all 8 global devices, however many processes
    assert len(mesh.devices.ravel()) == 8

    # this host's ray slice: contiguous 1/N of the logical global batch
    n = batch['rays_o'].shape[0]
    lo, hi = pidx * n // pcount, (pidx + 1) * n // pcount
    local = {k: (np.asarray(v)[lo:hi] if v is not None else None)
             for k, v in batch.items()}
    gbatch = make_global_batch(mesh, local)

    state = replicate_state(mesh, state)
    step = shard_train_step(make_train_step(setup), mesh)
    state, stats = step(state, gbatch, jax.random.PRNGKey(5))
    loss = float(stats['total_loss'])   # first-step loss == oracle value

    # coarse per-step wall time (post-compile), for the 1p-vs-Np
    # scaling signal recorded in BASELINE.md
    n_timed = int(os.environ.get('ANERF_MH_TIMED_STEPS', '5'))
    t0 = time.perf_counter()
    for i in range(n_timed):
        state, stats = step(state, gbatch, jax.random.PRNGKey(6 + i))
    _ = float(stats['total_loss'])
    step_ms = (time.perf_counter() - t0) / max(n_timed, 1) * 1e3

    print(json.dumps({
        'process_index': pidx,
        'process_count': pcount,
        'n_local_devices': jax.local_device_count(),
        'loss': loss,
        'step_ms': round(step_ms, 2),
    }))


if __name__ == '__main__':
    main()
