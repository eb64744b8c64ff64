"""Device-mesh parallelism: ray sharding, replication, collectives."""

from . import sharding  # noqa: F401
from .sharding import (make_mesh, shard_batch, shard_train_step,  # noqa: F401
                       replicate_state)
