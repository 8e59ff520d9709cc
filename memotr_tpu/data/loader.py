"""Multi-threaded prefetching data loader + fixed-shape collation.

Replaces torch's ``DataLoader`` (+ ``DistributedSampler``): a worker thread
pool decodes/augments clips ahead of the training loop while collation pads
everything to static shapes for the TPU:

- images -> one bucketed (B, T, H, W, 3) canvas with padding masks
  (nested_tensor.py:41-59 rounds to /32; we round to configurable buckets so
  XLA compiles a bounded set of step functions),
- GT boxes/ids/labels -> (B, T, G, ...) arrays with validity masks
  (MAX_GTS capacity; overflow truncated largest-first by area).

Sharding across hosts follows the reference's DistributedSampler semantics
(every rank takes a strided slice of a seeded permutation, data/__init__.py:42-47).
"""
from __future__ import annotations

import queue
from queue import Full as queue_mod_full
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..structures.padded_frame import bucket_hw


def epoch_indices(n: int, *, shuffle: bool, seed: int, epoch: int,
                  rank: int = 0, world_size: int = 1,
                  drop_last: bool = True) -> np.ndarray:
    """Seeded permutation sharded across ranks (DistributedSampler equiv)."""
    order = (np.random.default_rng(seed + epoch).permutation(n)
             if shuffle else np.arange(n))
    if world_size > 1:
        if drop_last:
            order = order[: (n // world_size) * world_size]
        else:
            pad = (-len(order)) % world_size
            order = np.concatenate([order, order[:pad]])
        order = order[rank::world_size]
    return order


def collate_clips(batch: List[Dict], max_gts: int,
                  bucket_multiple: int = 128,
                  fixed_canvas=None) -> Dict[str, np.ndarray]:
    """List of {"imgs": [T x HWC float32], "infos": [T x dict]} ->
    fixed-shape numpy batch.

    ``fixed_canvas=(H, W)`` pads every batch to one static canvas — one
    compiled train step for the whole run, at the cost of extra padding
    compute.  With remote-TPU compiles at ~10 min each, this usually wins
    over per-bucket compilation."""
    b = len(batch)
    t = len(batch[0]["imgs"])
    hs = [im.shape[0] for item in batch for im in item["imgs"]]
    ws = [im.shape[1] for item in batch for im in item["imgs"]]
    if fixed_canvas is not None:
        H, W = fixed_canvas
        assert max(hs) <= H and max(ws) <= W, \
            f"FIXED_TRAIN_CANVAS {fixed_canvas} smaller than batch " \
            f"({max(hs)}x{max(ws)})"
    else:
        H, W = bucket_hw(max(hs), max(ws), bucket_multiple)

    images = np.zeros((b, t, H, W, 3), np.float32)
    mask = np.ones((b, t, H, W), bool)
    gt_boxes = np.zeros((b, t, max_gts, 4), np.float32)
    gt_ids = np.full((b, t, max_gts), -1, np.int32)
    gt_labels = np.zeros((b, t, max_gts), np.int32)
    gt_mask = np.zeros((b, t, max_gts), bool)

    gt_dropped = 0
    for i, item in enumerate(batch):
        for f, (img, info) in enumerate(zip(item["imgs"], item["infos"])):
            h, w = img.shape[:2]
            images[i, f, :h, :w] = img
            mask[i, f, :h, :w] = False
            n = len(info["boxes"])
            if n > max_gts:
                # keep the largest boxes; the trainer logs ``gt_dropped``
                gt_dropped += n - max_gts
                keep = np.argsort(-np.asarray(info["areas"]))[:max_gts]
                boxes = np.asarray(info["boxes"])[keep]
                ids = np.asarray(info["ids"])[keep]
                labels = np.asarray(info["labels"])[keep]
                n = max_gts
            else:
                boxes = np.asarray(info["boxes"])
                ids = np.asarray(info["ids"])
                labels = np.asarray(info["labels"])
            if n > 0:
                gt_boxes[i, f, :n] = boxes
                gt_ids[i, f, :n] = ids
                gt_labels[i, f, :n] = labels
                gt_mask[i, f, :n] = True
    return {"images": images, "mask": mask, "gt_boxes": gt_boxes,
            "gt_ids": gt_ids, "gt_labels": gt_labels, "gt_mask": gt_mask,
            "gt_dropped": gt_dropped}


class DataLoader:
    """Thread-pool prefetching loader with deterministic order."""

    def __init__(self, dataset, batch_size: int, max_gts: int,
                 num_workers: int = 4, shuffle: bool = True, seed: int = 42,
                 rank: int = 0, world_size: int = 1,
                 bucket_multiple: int = 128, prefetch: int = 4,
                 fixed_canvas=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gts = max_gts
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.bucket_multiple = bucket_multiple
        self.prefetch = prefetch
        self.fixed_canvas = fixed_canvas
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.world_size > 1:
            n = n // self.world_size
        return n // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = epoch_indices(len(self.dataset), shuffle=self.shuffle,
                             seed=self.seed, epoch=self.epoch,
                             rank=self.rank, world_size=self.world_size)
        n_batches = len(idxs) // self.batch_size
        batches = [idxs[k * self.batch_size:(k + 1) * self.batch_size]
                   for k in range(n_batches)]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        lock = threading.Lock()
        results: Dict[int, Dict] = {}
        next_submit = [0]

        def worker():
            while not stop.is_set():
                with lock:
                    k = next_submit[0]
                    if k >= len(batches):
                        return
                    next_submit[0] += 1
                items = [self.dataset[int(j)] for j in batches[k]]
                batch = collate_clips(items, self.max_gts,
                                      self.bucket_multiple,
                                      self.fixed_canvas)
                # stop-aware put so early generator exit can't strand us
                while not stop.is_set():
                    try:
                        out_q.put((k, batch), timeout=0.2)
                        break
                    except queue_mod_full:
                        continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for th in threads:
            th.start()
        try:
            emitted = 0
            pending: Dict[int, Dict] = {}
            want = 0
            while emitted < len(batches):
                k, batch = out_q.get()
                pending[k] = batch
                while want in pending:
                    yield pending.pop(want)
                    want += 1
                    emitted += 1
        finally:
            stop.set()
            for th in threads:
                th.join(timeout=1.0)
