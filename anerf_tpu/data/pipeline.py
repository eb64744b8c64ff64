"""Host input pipeline: image sampler + threaded prefetch + collate.

Replaces the reference's torch DataLoader stack (RayImageSampler /
RandIntGenerator / ray_collate_fn, core/dataset.py:730-802 and
core/load_data.py:71-84) with a torch-free threaded prefetcher.  h5py
releases the GIL during reads, so a small thread pool keeps the TPU fed
without the reference's worker processes.

Multi-host: every host runs the same image sampler (same seed -> same
image indices per step) AND the same host-independently seeded pixel
RNG; each image's pixels are drawn as ONE global
``N_rand * process_count`` sample without replacement of which host p
keeps block p (dataset.sample_pixels ``host_slice``), so the hosts'
batches are disjoint-by-construction slices of one logical global
batch — assembled into global arrays by
``parallel.sharding.make_global_batch``.  (Only when an image has
fewer distinct valid pixels than the global draw does a host fall back
to its own stream, where cross-host collisions are possible.)  This is
the per-host analog of the reference's single-host DataLoader feeding
DataParallel (core/load_data.py:78-80).

Determinism: batch ``i`` is sampled with an RNG keyed on
``(seed, i, process_index)`` regardless of which worker thread produced
it, and the consumer releases batches strictly in index order, so two
runs with the same seed see the identical batch stream at any worker
count (the reference makes the same promise via its seeded DataLoader
workers).
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
    if 'subject_idxs' in out:
        out['subject_idxs'] = out['subject_idxs'].astype(np.int32)
    return out


class Prefetcher:
    """Threaded batch producer: workers sample whole image-batches and
    collate them; the consumer receives batches strictly in sample-index
    order (seed-deterministic at any worker count)."""

    def __init__(self, dataset, N_images: int, n_workers: int = 4,
                 buffer_size: int = 8, seed: int = 0,
                 N_iter: Optional[int] = None,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.N_images = N_images
        self.n_workers = max(1, n_workers)
        self.q: 'queue.Queue' = queue.Queue(maxsize=buffer_size)
        self.idx_q: 'queue.Queue' = queue.Queue(maxsize=buffer_size * 2)
        self.seed = seed
        self.N_iter = N_iter
        self.process_index = process_index
        self.process_count = process_count
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._started = False

    def _put(self, q, item) -> bool:
        """Bounded put that aborts when the pipeline is stopping (avoids
        workers blocking forever on a full queue at shutdown)."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _feeder(self):
        # same seed on every host: all hosts agree on the image indices
        # of global batch i; they differ only in which pixels they sample.
        sampler = RayImageSampler(len(self.dataset), self.N_images,
                                  self.N_iter, seed=self.seed)
        for i, idxs in enumerate(sampler):
            if not self._put(self.idx_q, (i, idxs)):
                return
        for _ in range(self.n_workers):
            if not self._put(self.idx_q, None):
                return

    def _worker(self, wid: int):
        while not self._stop.is_set():
            try:
                task = self.idx_q.get(timeout=0.1)
            except queue.Empty:
                continue
            if task is None:
                self._put(self.q, None)
                return
            i, idxs = task
            # keyed on the batch index (not the worker id): the sampled
            # pixels don't depend on thread scheduling.  The seed is
            # host-INdependent: all hosts replay the same stream and
            # partition each image's one global pixel draw via
            # host_slice (disjoint-by-construction).
            rng = np.random.default_rng([self.seed, i])
            hs = (self.process_index, self.process_count)
            try:
                # vectorized whole-batch assembly when the dataset/mode
                # supports it (dataset.get_batch); per-image fallback
                # for patch/NMS sampling modes
                gb = getattr(self.dataset, 'get_batch', None)
                batch = gb(idxs, rng, host_slice=hs) \
                    if gb is not None else None
                if batch is None:
                    items = [self.dataset.get_item(int(idx), rng,
                                                   host_slice=hs)
                             for idx in idxs]
                    batch = ray_collate(items)
            except Exception:
                if self._stop.is_set():     # dataset torn down at shutdown
                    return
                raise
            self._put(self.q, (i, batch))

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
        pending: Dict[int, Any] = {}
        next_i = 0
        while True:
            while next_i in pending:        # release strictly in order
                yield pending.pop(next_i)
                next_i += 1
            item = self.q.get()
            if item is None:
                done += 1
                if done == self.n_workers:
                    for j in sorted(pending):
                        yield pending[j]
                    return
                continue
            pending[item[0]] = item[1]

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=1.0)
