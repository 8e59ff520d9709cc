"""BDD100K multi-class (8) tracking dataset.

Spec: ``/root/reference/data/bdd100k.py:49-232``.  Per-frame GT txt files
under ``filter_labels/track/train/<vid>/<vid>-<t:07d>.txt`` with lines
``class id x y w h`` (classes 1-based -> labels 0-based).  Quirks preserved:
- clips whose sampled frames lack GT fall back to consecutive frames and are
  filtered from the begin-frame pool (bdd100k.py:115-156),
- frames with zero objects get one fake GT (bdd100k.py:177-182),
- COCO-scale resize list with max size 1333 and overflow-tolerant crops.
"""
from __future__ import annotations

import os
from math import floor
from random import randint

import numpy as np
import PIL.Image

from .mot import ClipDataset
from .transforms import (MultiCompose, MultiHSV, MultiNormalize,
                         MultiRandomCrop, MultiRandomHorizontalFlip,
                         MultiRandomResize, MultiRandomSelect)

CATEGORY_TO_LABEL = {
    "pedestrian": 0, "rider": 1, "car": 2, "truck": 3, "bus": 4,
    "train": 5, "motorcycle": 6, "bicycle": 7,
    "other vehicle": 2, "other person": 0, "trailer": 3,
}
LABEL_TO_CATEGORY = {
    0: "pedestrian", 1: "rider", 2: "car", 3: "truck", 4: "bus",
    5: "train", 6: "motorcycle", 7: "bicycle",
}
BDD_SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]


class BDD100K(ClipDataset):
    def __init__(self, config: dict, split: str, transform):
        super().__init__(config, transform)
        assert split == "train", f"BDD100K split {split} unsupported"
        root = config["DATA_ROOT"]
        self.images_dir = os.path.join(root, "BDD100K", "images/track/train/")
        self.gts_dir = os.path.join(root, "BDD100K", "filter_labels/track/train/")
        if not os.path.isdir(self.images_dir):
            raise FileNotFoundError(self.images_dir)
        for vid in sorted(os.listdir(self.images_dir)):
            self.register_video(vid)
            vdir = os.path.join(self.images_dir, vid)
            for fn in sorted(os.listdir(vdir)):
                gt_name = fn.replace(".jpg", ".txt")
                t = int(gt_name[:-4].split("-")[-1])
                gt_path = os.path.join(self.gts_dir, vid, gt_name)
                if not os.path.exists(gt_path):
                    continue
                rows = []
                with open(gt_path) as f:
                    for line in f:
                        c, i, *xywh = line.rstrip("\n").split(" ")
                        x, y, w, h = map(float, xywh)
                        rows.append((int(i), int(c) - 1, x, y, w, h))
                self.gts[vid][t] = rows
        self.set_epoch(0)

    def set_epoch(self, epoch: int):
        super().set_epoch(epoch)
        # filter begin frames whose consecutive window has missing GT frames
        filtered = []
        for vid, t in self.sample_begin_frames:
            if all((t + k) in self.gts[vid] for k in range(self.sample_length)):
                filtered.append((vid, t))
        self.sample_begin_frames = filtered

    def sample_frame_idxs(self, vid: str, begin: int):
        idxs = super().sample_frame_idxs(vid, begin)
        # missing-frame fallback to consecutive sampling (bdd100k.py:122-130)
        if any(t not in self.gts[vid] for t in idxs):
            idxs = [begin + k for k in range(self.sample_length)]
        return idxs

    def frame_path(self, vid: str, t: int) -> str:
        return os.path.join(self.images_dir, vid, f"{vid}-{t:07d}.jpg")

    def load_frame(self, vid: str, t: int):
        img = PIL.Image.open(self.frame_path(vid, t)).convert("RGB")
        rows = self.gts[vid].get(t, [])
        if not rows:
            # fake GT hack (bdd100k.py:177-182)
            rows = [(0, 0, 0.5, 0.5, 0.5, 0.5)]
        arr = np.asarray([r[2:] for r in rows], np.float32)
        boxes = np.concatenate([arr[:, :2], arr[:, :2] + arr[:, 2:]], -1)
        info = {
            "boxes": boxes,
            "ids": np.asarray([r[0] for r in rows], np.int64),
            "labels": np.asarray([r[1] for r in rows], np.int64),
            "areas": arr[:, 2] * arr[:, 3],
            "frame_idx": t,
        }
        return img, info


def transforms_for_train():
    return MultiCompose([
        MultiRandomHorizontalFlip(),
        MultiRandomSelect(
            MultiRandomResize(sizes=BDD_SCALES, max_size=1333),
            MultiCompose([
                MultiRandomResize([400, 500, 600]),
                MultiRandomCrop(min_size=384, max_size=600, overflow_bbox=True),
                MultiRandomResize(sizes=BDD_SCALES, max_size=1333),
            ])),
        MultiHSV(),
        MultiNormalize(),
    ])


def build(config: dict, split: str) -> BDD100K:
    assert split == "train"
    if config.get("TRAIN_SHORT_SIDES"):
        # TPU-native small-resolution knob (same as dancetrack.py build)
        from .transforms import transforms_for_train as shared_train_tf
        tf = shared_train_tf(sizes=config["TRAIN_SHORT_SIDES"],
                             max_size=config.get("TRAIN_MAX_SIZE", 1333))
        return BDD100K(config=config, split=split, transform=tf)
    return BDD100K(config=config, split=split, transform=transforms_for_train())
