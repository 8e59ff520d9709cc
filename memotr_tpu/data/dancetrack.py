"""DanceTrack / SportsMOT clip dataset.

Spec: ``/root/reference/data/dancetrack.py:19-149``.  Both datasets use the
MOT-format ``gt/gt.txt`` per sequence (frame, id, x, y, w, h, 1, 1, 1);
DanceTrack image files are 8-digit, SportsMOT 6-digit.
"""
from __future__ import annotations

import os

from .mot import ClipDataset
from .transforms import transforms_for_eval, transforms_for_train


class DanceTrack(ClipDataset):
    def __init__(self, config: dict, split: str, transform):
        super().__init__(config, transform)
        self.dataset_name = config["DATASET"]
        self.split_dir = os.path.join(config["DATA_ROOT"], self.dataset_name,
                                      split)
        if not os.path.isdir(self.split_dir):
            raise FileNotFoundError(self.split_dir)
        for vid in sorted(os.listdir(self.split_dir)):
            gt_path = os.path.join(self.split_dir, vid, "gt", "gt.txt")
            if not os.path.isfile(gt_path):
                continue
            self.register_video(vid)
            with open(gt_path) as f:
                for line in f:
                    parts = line.strip().split(",")
                    t, obj = int(parts[0]), int(parts[1])
                    x, y, w, h = map(float, parts[2:6])
                    # single class (people)
                    self.gts[vid].setdefault(t, []).append((obj, 0, x, y, w, h))
        self.set_epoch(0)

    def frame_path(self, vid: str, t: int) -> str:
        digits = 8 if self.dataset_name == "DanceTrack" else 6
        return os.path.join(self.split_dir, vid, "img1",
                            f"{t:0{digits}d}.jpg")


def build(config: dict, split: str) -> DanceTrack:
    if split == "train":
        transform = transforms_for_train(
            coco_size=config.get("COCO_SIZE", False),
            overflow_bbox=config.get("OVERFLOW_BBOX", False),
            reverse_clip=config.get("REVERSE_CLIP", 0.0),
            sizes=config.get("TRAIN_SHORT_SIDES", None),
            max_size=config.get("TRAIN_MAX_SIZE", 1536))
    else:
        transform = transforms_for_eval()
    return DanceTrack(config=config, split=split, transform=transform)
