"""Base clip dataset with the sampling-curriculum machinery.

The reference spreads this logic across its dataset classes
(``/root/reference/data/dancetrack.py:30-111`` and friends); all of them share
the same pattern: per-epoch clip-length curriculum (``SAMPLE_STEPS`` /
``SAMPLE_LENGTHS``), ``random_interval`` frame sampling with a per-stage
interval cap, and per-video id offsets so identities are globally unique.
"""
from __future__ import annotations

import random
from math import floor
from typing import Dict, List, Tuple

import numpy as np
import PIL.Image

ID_OFFSET_PER_VIDEO = 100000


class ClipDataset:
    """Samples fixed-length clips of consecutive(-ish) frames with GT.

    Subclasses populate ``self.gts[vid][t] -> list[(obj_id, label, x, y, w, h)]``
    (pixel xywh) and implement ``frame_path(vid, t)``.
    """

    def __init__(self, config: dict, transform):
        self.config = config
        self.transform = transform
        self.gts: Dict[str, Dict[int, list]] = {}
        self.vid_idx: Dict[str, int] = {}
        # curriculum state
        self.sample_steps: List[int] = list(config["SAMPLE_STEPS"])
        self.sample_lengths: List[int] = list(config["SAMPLE_LENGTHS"])
        self.sample_modes: List[str] = list(config["SAMPLE_MODES"])
        self.sample_intervals: List[int] = list(config["SAMPLE_INTERVALS"])
        self.sample_length = self.sample_lengths[0]
        self.sample_mode = self.sample_modes[0]
        self.sample_interval = self.sample_intervals[0]
        self.sample_begin_frames: List[Tuple[str, int]] = []
        self.sample_vid_tmax: Dict[str, int] = {}

    # -- subclass API ---------------------------------------------------------
    def frame_path(self, vid: str, t: int) -> str:
        raise NotImplementedError

    def register_video(self, vid: str):
        if vid not in self.vid_idx:
            self.vid_idx[vid] = len(self.vid_idx)
            self.gts.setdefault(vid, {})

    # -- curriculum (dancetrack.py:93-111) ------------------------------------
    def set_epoch(self, epoch: int):
        stage = sum(1 for step in self.sample_steps if epoch >= step)
        pick = lambda lst: lst[min(len(lst) - 1, stage)]  # noqa: E731
        self.sample_length = pick(self.sample_lengths)
        self.sample_mode = pick(self.sample_modes)
        self.sample_interval = pick(self.sample_intervals)
        self.sample_begin_frames = []
        self.sample_vid_tmax = {}
        for vid in self.vid_idx:
            ts = self.gts[vid].keys()
            if not ts:
                continue
            t_min, t_max = min(ts), max(ts)
            self.sample_vid_tmax[vid] = t_max
            for t in range(t_min, t_max - (self.sample_length - 1) + 1):
                self.sample_begin_frames.append((vid, t))

    def sample_frame_idxs(self, vid: str, begin: int) -> List[int]:
        """random_interval sampling (dancetrack.py:82-91)."""
        if self.sample_mode != "random_interval":
            raise ValueError(f"Unsupported sample mode {self.sample_mode}")
        if self.sample_length == 1:
            return [begin]
        remain = self.sample_vid_tmax[vid] - begin
        max_interval = floor(remain / (self.sample_length - 1))
        interval = min(random.randint(1, self.sample_interval),
                       max(max_interval, 1))
        return [begin + interval * i for i in range(self.sample_length)]

    # -- frame loading ---------------------------------------------------------
    def load_frame(self, vid: str, t: int):
        img = PIL.Image.open(self.frame_path(vid, t)).convert("RGB")
        offset = self.vid_idx[vid] * ID_OFFSET_PER_VIDEO
        rows = self.gts[vid].get(t, [])
        if rows:
            arr = np.asarray([r[2:] for r in rows], np.float32)   # xywh
            boxes = np.concatenate([arr[:, :2], arr[:, :2] + arr[:, 2:]], -1)
            ids = np.asarray([r[0] + offset for r in rows], np.int64)
            labels = np.asarray([r[1] for r in rows], np.int64)
            areas = arr[:, 2] * arr[:, 3]
        else:
            boxes = np.zeros((0, 4), np.float32)
            ids = np.zeros((0,), np.int64)
            labels = np.zeros((0,), np.int64)
            areas = np.zeros((0,), np.float32)
        info = {"boxes": boxes, "ids": ids, "labels": labels, "areas": areas,
                "frame_idx": t}
        return img, info

    # -- torch-DataLoader-style API ---------------------------------------------
    def __len__(self):
        return len(self.sample_begin_frames)

    def __getitem__(self, item):
        vid, begin = self.sample_begin_frames[item]
        idxs = self.sample_frame_idxs(vid, begin)
        imgs, infos = zip(*[self.load_frame(vid, t) for t in idxs])
        imgs, infos = list(imgs), list(infos)
        if self.transform is not None:
            imgs, infos = self.transform(imgs, infos)
        return {"imgs": list(imgs), "infos": list(infos)}
