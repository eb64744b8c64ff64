"""Capture a device trace of the flagship train step and print the
per-op device-time aggregation (top HLO ops by self time)."""
import glob
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from anerf_tpu import testing_utils as T

TRACE_DIR = '/tmp/anerf_trace'


def main():
    n_rays = 2048
    setup, state, batch, step_fn = T.build_flagship(
        n_rays=n_rays, opt_pose=True, compute_dtype='bfloat16')

    def stepper(state, batch, rng):
        return step_fn(state, batch, jax.random.fold_in(rng, state['step']))
    step = jax.jit(stepper, donate_argnums=(0,))

    rng = jax.random.PRNGKey(0)
    state, stats = step(state, batch, rng)
    _ = float(stats['total_loss'])

    os.system(f'rm -rf {TRACE_DIR}')
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(10):
            state, stats = step(state, batch, rng)
        _ = float(stats['total_loss'])

    # ---- parse the xplane proto ----
    paths = glob.glob(f'{TRACE_DIR}/**/*.xplane.pb', recursive=True)
    print('xplane files:', paths)
    if not paths:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[0], 'rb') as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name.lower():
            continue
        print(f'== plane: {plane.name}')
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, '?')
                agg[name] += ev.duration_ps / 1e9   # ms total
                cnt[name] += 1
        total = sum(agg.values())
        print(f'total device ms over 10 steps: {total:.2f} '
              f'-> {total/10:.2f} ms/step')
        skip = ('copy-start', 'copy-done', 'slice-start', 'slice-done',
                'all-reduce-start')
        sync = 0.
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:200]:
            if any(s in name for s in skip):
                continue
            if ms / 10 < 0.02:
                break
            sync += ms
            print(f'  {ms/10:8.3f} ms/step x{cnt[name]//10:<4d} {name[:140]}')
        print(f'sum of printed (sync) ops: {sync/10:.2f} ms/step')


if __name__ == '__main__':
    main()
