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

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec


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


def shard_train_step(train_step: Callable, mesh: Mesh,
                     axis_name: str = 'data') -> Callable:
    """jit the train step with batch sharded over rays and state
    replicated.  Loss means/grad sums become ICI all-reduces placed by
    XLA's SPMD partitioner."""
    rep = replicated(mesh)
    data = batch_sharding(mesh, axis_name)

    def batch_spec(batch):
        return {k: (data if v is not None else None)
                for k, v in batch.items()}

    jitted = jax.jit(train_step, donate_argnums=(0,))

    def step(state, batch, rng):
        batch = {k: (jax.device_put(v, data) if v is not None else None)
                 for k, v in batch.items()}
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
