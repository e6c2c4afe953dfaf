"""Background-thread data provider.

Rebuild of the reference's ``Provider`` (provider.py:43-169): a producer
thread reads+preprocesses one file ahead (bounded 2-slot cache), the consumer
iterates batches that may span file boundaries; train mode shuffles file
order and intra-file block order.  Here the output is additionally padded to
static shapes and stacked to [B, ...] arrays ready for device transfer.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .batching import pad_block, pad_context, stack_blocks

_STOP = object()


class Provider:
    """file_list + read_fn(model, filename) -> list of block dicts
    (keys xyz/feats/labels), served as stacked static-shape batches."""

    def __init__(self, file_list: Sequence[str], model: str, batch_size: int,
                 read_fn: Callable[[str, str], List[Dict]], num_points: int,
                 cache_batch_num: int = 2, seed: int = 0,
                 max_queue: int = 4, dense_num_points: int = 0,
                 ctx_num_points: int = 512):
        assert model in ("train", "test")
        self.file_list = list(file_list)
        self.model = model
        self.batch_size = batch_size
        self.read_fn = read_fn
        self.num_points = num_points
        # static capacity for the dense cloud of dense-pipeline blocks
        # (read_fns yielding dense_xyz/dense_feats); 0 = 4x num_points
        self.dense_num_points = dense_num_points or 4 * num_points
        # static capacity for context sub-clouds (read_fns yielding ctx_*);
        # 512 covers a 50 m window at 5 m voxels with z slack
        self.ctx_num_points = ctx_num_points
        self.rng = np.random.RandomState(seed)
        self.max_queue = max_queue
        self._q: queue.Queue = queue.Queue(maxsize=max_queue)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- producer ---------------------------------------------------------
    def _run(self):
        files = list(self.file_list)
        if self.model == "train":
            self.rng.shuffle(files)
        pending: List[Dict] = []
        try:
            for fn in files:
                if self._stop.is_set():
                    return
                blocks = self.read_fn(self.model, fn)
                if self.model == "train":
                    order = self.rng.permutation(len(blocks))
                    blocks = [blocks[i] for i in order]
                for b in blocks:
                    pb = pad_block(b["xyz"], b.get("feats"),
                                   b.get("labels"), self.num_points,
                                   self.rng,
                                   point_fields={"ctx_idx": b["ctx_idx"]}
                                   if "ctx_idx" in b else None)
                    if "ctx_xyz" in b:
                        pb.update(pad_context(
                            b["ctx_xyz"], b["ctx_feats"],
                            pb.pop("ctx_idx"), self.ctx_num_points,
                            pb["xyz"]))
                    if "dense_xyz" in b:
                        dp = pad_block(b["dense_xyz"], b["dense_feats"],
                                       None, self.dense_num_points,
                                       self.rng)
                        pb["dense_xyz"] = dp["xyz"]
                        pb["dense_feats"] = dp["feats"]
                        pb["dense_mask"] = dp["mask"]
                    pending.append(pb)
                    if len(pending) == self.batch_size:
                        self._q.put(stack_blocks(pending))
                        pending = []
            if pending:
                # final partial batch: train resamples to full size; test
                # pads with fully-masked blocks so IoU never double-counts
                self._q.put(stack_blocks(pending, self.batch_size, self.rng,
                                         pad_masked=self.model == "test"))
        finally:
            self._q.put(_STOP)

    # -- consumer ---------------------------------------------------------
    def __iter__(self) -> Iterator[Dict]:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        while True:
            item = self._q.get()
            if item is _STOP:
                break
            yield item
        self._thread.join()

    def close(self):
        self._stop.set()
        if self._thread is not None and self._thread.is_alive():
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=5)


def device_prefetch(batches: Iterator[Dict], depth: int = 2) -> Iterator[Dict]:
    """Overlap host->device transfer with compute: keep ``depth`` batches
    in flight on the device (async ``jax.device_put``) ahead of the
    consumer.  Feeding host numpy directly would bill a ~40 ms H2D copy to
    every step (measured on the flagship batch through the remote tunnel).

    The reference's Provider stops at host-side prefetch (provider.py:73-89,
    TF1 feed_dict re-uploads every step); on TPU the transfer is explicit,
    so the input pipeline owns it.
    """
    import collections

    import jax

    buf: collections.deque = collections.deque()
    for b in batches:
        buf.append(jax.device_put(b))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
