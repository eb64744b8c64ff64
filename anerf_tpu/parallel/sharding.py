"""Multi-chip sharding of the train/render steps.

The reference's only parallelism is single-host ``nn.DataParallel``
scatter/gather over the ray batch (core/raycasters.py:157).  The
TPU-native equivalent: one global ``Mesh(('data',))``; every per-ray
batch array is sharded on its leading axis over ``data``; parameters,
the pose bank, and optimizer states are replicated.  ``jax.jit`` with
these shardings makes XLA insert the gradient ``psum`` over ICI and
overlap it with the backward pass; the per-frame pose bank's gradient
is produced by the gather-transpose scatter-add, so only frames touched
by the local shard contribute before the all-reduce (the reference's
embedding-row sparsity, pose_opt.py:282-295).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Bring up the multi-host JAX runtime when one is configured.

    TPU-native replacement for the reference's (absent) distributed
    backend — the reference scales only by in-process ``nn.DataParallel``
    (core/raycasters.py:157).  Here every host joins one
    ``jax.distributed`` job; afterwards ``jax.devices()`` spans the pod
    and a single ``Mesh(('data',))`` shards rays globally, with gradient
    psums riding ICI within a slice and DCN across slices.

    Safe to call unconditionally: single-process runs (no coordinator
    env/args) are a no-op.  Returns (process_index, process_count).
    """
    from jax._src import distributed, xla_bridge
    if distributed.global_state.client is not None:
        # already running distributed
        return jax.process_index(), jax.process_count()
    if xla_bridge.backends_are_initialized():
        # too late to initialize (a JAX call has already brought the
        # backend up single-process).  NB: don't probe via
        # jax.process_count() — that call itself initializes the backend.
        return jax.process_index(), jax.process_count()
    addr = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS') or os.environ.get('COORDINATOR_ADDRESS')
    nproc = num_processes if num_processes is not None else int(
        os.environ.get('JAX_NUM_PROCESSES', '0') or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get('JAX_PROCESS_ID', '-1') or -1)
    workers = [w for w in os.environ.get('TPU_WORKER_HOSTNAMES', ''
                                         ).split(',') if w]
    if addr and nproc > 1 and pid >= 0:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
    elif len(workers) > 1 or os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'):
        # multi-worker TPU pod slices self-describe; let jax auto-detect.
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (ray) axis over the mesh."""
    return NamedSharding(mesh, Pspec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, Pspec())


def shard_batch(mesh: Mesh, batch: Dict[str, Any],
                axis_name: str = 'data') -> Dict[str, Any]:
    """Device-put every batch array with its leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) if v is not None else None
            for k, v in batch.items()}


def make_global_batch(mesh: Mesh, local_batch: Dict[str, Any],
                      axis_name: str = 'data') -> Dict[str, Any]:
    """Assemble a globally-sharded batch from THIS host's ray slice.

    The multi-host analog of the reference's DataLoader feeding
    ``nn.DataParallel`` scatter (core/load_data.py:78-80 +
    core/raycasters.py:157): each host's input pipeline produces
    ``N_rand / process_count`` rays; this stitches them into global
    ``jax.Array``s sharded on the leading (ray) axis without any
    cross-host data movement — every device keeps the shard its own
    host loaded.
    """
    sh = batch_sharding(mesh, axis_name)
    out: Dict[str, Any] = {}
    for k, v in local_batch.items():
        if v is None:
            out[k] = None
        elif isinstance(v, jax.Array) and v.sharding == sh:
            out[k] = v
        else:
            out[k] = jax.make_array_from_process_local_data(
                sh, np.asarray(v))
    return out


def shard_train_step(train_step: Callable, mesh: Mesh,
                     axis_name: str = 'data',
                     global_batch: bool = False,
                     stacked: bool = False) -> Callable:
    """jit the train step with batch sharded over rays and state
    replicated.  Loss means/grad sums become ICI all-reduces placed by
    XLA's SPMD partitioner.

    With ``global_batch=True`` the incoming batch is treated as this
    process's local shard and stitched into global arrays via
    ``make_global_batch`` (the multi-host input path); otherwise the
    full batch is device_put-sharded from one host (single-process).

    ``stacked=True``: the batch dict carries a leading ``steps`` axis
    (training.trainer.make_multi_train_step bundles), so rays are the
    SECOND axis — sharded as P(None, 'data').
    """
    if stacked:
        assert not global_batch, \
            'steps_per_dispatch bundling is single-host for now'
        data = NamedSharding(mesh, Pspec(None, axis_name))
    else:
        data = batch_sharding(mesh, axis_name)

    jitted = jax.jit(train_step, donate_argnums=(0,))

    def put(v):
        if v is None:
            return None
        if isinstance(v, jax.Array) and v.sharding == data:
            return v
        return jax.device_put(v, data)

    def step(state, batch, rng):
        if global_batch:
            batch = make_global_batch(mesh, batch, axis_name)
        else:
            batch = {k: put(v) for k, v in batch.items()}
        return jitted(state, batch, rng)

    step.lower = lambda state, batch, rng: jitted.lower(state, batch, rng)
    return step


def replicate_state(mesh: Mesh, state) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), state)


def pad_rays_to_shards(n: int, n_shards: int, multiple: int = 1) -> int:
    """Padded ray count divisible by the mesh size (and tile multiple)."""
    q = n_shards * multiple
    return ((n + q - 1) // q) * q
