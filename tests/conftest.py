"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on emulated host devices
(the driver separately dry-runs the multichip path); unit math tests
also run on CPU for speed and determinism.

NOTE: this environment's sitecustomize imports jax at interpreter
startup with JAX_PLATFORMS pinned to the (single, tunnel-shared) TPU,
so plain env vars are too late here — we must override through
jax.config before the first backend is initialized.
"""
import os

# Must land before the first backend init; sitecustomize has already
# imported jax, but backends resolve lazily.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

assert jax.devices()[0].platform == 'cpu', 'tests must run on CPU'
assert jax.device_count() == 8, 'tests expect an 8-device virtual CPU mesh'
