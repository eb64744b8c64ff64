"""Host data-loader benchmark: ms per 2048-ray batch at 512x512.

Compares the three read strategies on one host:
  * h5py point selection (the reference's access pattern,
    core/dataset.py:83-101 ``imgs[idx, pix_idxs]``);
  * full-row h5py read + numpy gather (our fallback for gzip files);
  * contiguous-layout memmap + native fused gather (our default).

The TPU train step is ~19 ms/batch (BASELINE.md), so anything above a
few ms/batch makes real-resolution training host-bound.

Usage: python scripts/bench_loader.py [--H 512] [--frames 30]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timeit(fn, iters=30):
    fn(0)
    t0 = time.perf_counter()
    for i in range(iters):
        fn(i)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--H', type=int, default=512)
    ap.add_argument('--frames', type=int, default=30)
    ap.add_argument('--n_rand', type=int, default=2048)
    args = ap.parse_args()

    import h5py
    from anerf_tpu.data.h5_writer import make_synthetic_h5
    from anerf_tpu.data.dataset import BaseH5Dataset
    from anerf_tpu.data import native

    tmp = tempfile.mkdtemp()
    H = W = args.H
    n = args.frames
    cont = make_synthetic_h5(os.path.join(tmp, 'c.h5'), n_frames=n, H=H, W=W)
    gzip = make_synthetic_h5(os.path.join(tmp, 'g.h5'), n_frames=n, H=H, W=W,
                             img_layout='chunked')

    rng = np.random.default_rng(0)
    uniq = np.sort(rng.choice(H * W, args.n_rand, replace=False))

    f = h5py.File(gzip, 'r')
    point_sel = timeit(
        lambda i: (f['imgs'][i % n, uniq], f['masks'][i % n, uniq],
                   f['sampling_masks'][i % n]), iters=10)

    res = {'h5py_point_selection_ms': round(point_sel, 2),
           'native_available': native.available()}
    for name, path in (('gzip_row_fallback', gzip),
                       ('contiguous_mmap_native', cont)):
        ds = BaseH5Dataset(path, N_samples=args.n_rand)
        r = np.random.default_rng(0)
        res[name + '_ms'] = round(
            timeit(lambda i: ds.get_item(i % n, rng=r)), 2)

    res['speedup_vs_point_selection'] = round(
        res['h5py_point_selection_ms'] / res['contiguous_mmap_native_ms'], 1)

    # image_batching recipe (the opt_pose config: 128 images x 16 rays
    # per batch): per-image assembly vs the vectorized dataset.get_batch
    from anerf_tpu.data.pipeline import ray_collate
    n_img = 128
    ds = BaseH5Dataset(cont, N_samples=max(1, args.n_rand // n_img))
    ds.pose_per_ray = False     # run_train's opt_pose batch schema
    r = np.random.default_rng(0)

    def batch_idxs(i):
        return np.sort(np.random.default_rng(i).choice(n, n_img))

    res['image_batching_per_item_ms'] = round(timeit(
        lambda i: ray_collate([ds.get_item(int(q), rng=r)
                               for q in batch_idxs(i)]), iters=10), 2)
    res['image_batching_get_batch_ms'] = round(timeit(
        lambda i: ds.get_batch(batch_idxs(i), rng=r), iters=10), 2)
    res['get_batch_speedup'] = round(res['image_batching_per_item_ms']
                                     / res['image_batching_get_batch_ms'], 1)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
