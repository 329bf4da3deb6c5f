"""Batching + prefetch.

Replaces the reference's DataLoader/DistributedSampler machinery
(engine.py:73-115): one loader feeds the whole SPMD program with the
*global* batch (sharding happens at device_put), so there is no
per-rank batch division or sampler epoch plumbing.  A background thread
pipelines host-side decode/augment with device compute — the standard
TPU input-pipeline shape.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts; 'img_meta' stays a list
    (reference datasets/Base.py:264-270 base_convert)."""
    out: Dict[str, Any] = {}
    metas = [s.pop("img_meta", None) for s in samples]
    keys = samples[0].keys()
    for k in keys:
        v0 = samples[0][k]
        if isinstance(v0, dict):
            out[k] = {kk: np.stack([s[k][kk] for s in samples])
                      for kk in v0}
        else:
            out[k] = np.stack([s[k] for s in samples])
    if any(m is not None for m in metas):
        out["img_meta"] = metas
    return out


class TrainLoader:
    """Infinite shuffled batch iterator with epoch-hook + prefetch.

    Calls ``dataset.pre_processing(epoch)`` at each epoch boundary
    (reference train.py:237) so resample indexes regenerate.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._queue: Optional[queue.Queue] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _gen(self) -> Iterator[Dict[str, Any]]:
        epoch = 0
        while True:
            self.dataset.pre_processing(epoch)
            order = self.rng.permutation(len(self.dataset))
            n_full = len(order) // self.batch_size
            for b in range(n_full):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                yield collate([self.dataset[int(i)] for i in idxs])
            epoch += 1

    def _worker(self):
        try:
            for batch in self._gen():
                if self._stop.is_set():
                    return
                self._queue.put(batch)
        except Exception as e:  # surface worker errors to the consumer
            self._queue.put(e)

    def __iter__(self):
        if self.prefetch > 0:
            self._queue = queue.Queue(maxsize=self.prefetch)
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
            while True:
                item = self._queue.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        else:
            yield from self._gen()

    def stop(self):
        self._stop.set()


class EvalLoader:
    """Batch iterator over a val/test split (batch 1 by default —
    evaluation shapes vary per image), with a prefetch thread so host
    image decode overlaps device inference (a 1024x2048 PNG decodes in
    ~100 ms — comparable to the whole-image forward itself)."""

    def __init__(self, dataset, batch_size: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.prefetch = prefetch

    def _gen(self):
        n = len(self.dataset)
        for start in range(0, n, self.batch_size):
            idxs = range(start, min(start + self.batch_size, n))
            yield collate([self.dataset[int(i)] for i in idxs])

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._gen()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        done = object()

        def worker():
            try:
                for batch in self._gen():
                    q.put(batch)
                q.put(done)
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size
