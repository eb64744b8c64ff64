"""Host input pipeline: image sampler + threaded prefetch + collate.

Replaces the reference's torch DataLoader stack (RayImageSampler /
RandIntGenerator / ray_collate_fn, core/dataset.py:730-802 and
core/load_data.py:71-84) with a torch-free threaded prefetcher.  h5py
releases the GIL during reads, so a small thread pool keeps the TPU fed
without the reference's worker processes.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


class RayImageSampler:
    """Yields sorted batches of N_images image indices; every image is
    visited once per epoch-permutation (reference dataset.py:730-793)."""

    def __init__(self, n_data: int, N_images: int, N_iter: Optional[int] = None,
                 seed: int = 0):
        self.n_data = n_data
        self.N_images = N_images
        self.N_iter = N_iter
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[np.ndarray]:
        perm = iter(self.rng.permutation(self.n_data))
        i = 0
        while self.N_iter is None or i < self.N_iter:
            batch = []
            while len(batch) < self.N_images:
                try:
                    batch.append(next(perm))
                except StopIteration:
                    perm = iter(self.rng.permutation(self.n_data))
            yield np.sort(np.array(batch))
            i += 1


def ray_collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-image dicts and flatten to (N_rand, ...) ray arrays
    (reference ray_collate_fn, dataset.py:795-802), renaming to the
    train-step schema."""
    keys = items[0].keys()
    out = {}
    for k in keys:
        stacked = np.stack([it[k] for it in items], axis=0)
        out[k] = stacked.reshape((-1,) + stacked.shape[2:])
    # train-step naming
    if 'kp3d' in out:
        out['kps'] = out.pop('kp3d')
    if 'kp_idx' in out:
        out['kp_idx'] = out['kp_idx'].astype(np.int32)
    if 'cam_idxs' in out:
        out['cam_idxs'] = out['cam_idxs'].astype(np.int32)
    return out


class Prefetcher:
    """Threaded batch producer: each worker samples a full image-batch
    and collates it; consumers pull ready batches from a queue."""

    def __init__(self, dataset, N_images: int, n_workers: int = 4,
                 buffer_size: int = 8, seed: int = 0,
                 N_iter: Optional[int] = None):
        self.dataset = dataset
        self.N_images = N_images
        self.n_workers = max(1, n_workers)
        self.q: 'queue.Queue' = queue.Queue(maxsize=buffer_size)
        self.idx_q: 'queue.Queue' = queue.Queue(maxsize=buffer_size * 2)
        self.seed = seed
        self.N_iter = N_iter
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._started = False

    def _feeder(self):
        sampler = RayImageSampler(len(self.dataset), self.N_images,
                                  self.N_iter, seed=self.seed)
        for i, idxs in enumerate(sampler):
            if self._stop.is_set():
                return
            self.idx_q.put((i, idxs))
        for _ in range(self.n_workers):
            self.idx_q.put(None)

    def _worker(self, wid: int):
        rng = np.random.default_rng(self.seed * 1000 + wid)
        while not self._stop.is_set():
            task = self.idx_q.get()
            if task is None:
                self.q.put(None)
                return
            i, idxs = task
            items = [self.dataset.get_item(int(idx), rng) for idx in idxs]
            self.q.put((i, ray_collate(items)))

    def start(self):
        if self._started:
            return
        self._started = True
        t = threading.Thread(target=self._feeder, daemon=True)
        t.start()
        self._threads.append(t)
        for w in range(self.n_workers):
            t = threading.Thread(target=self._worker, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)

    def __iter__(self):
        self.start()
        done = 0
        while True:
            item = self.q.get()
            if item is None:
                done += 1
                if done == self.n_workers:
                    return
                continue
            yield item[1]

    def stop(self):
        self._stop.set()
