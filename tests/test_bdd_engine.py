"""BDD100K end-to-end: 8-class train -> submit with the BDD JSON writer.

The DanceTrack e2e (test_engines.py) leaves the BDD100K dataset quirks
(per-frame filter_labels txts, fake-GT empty frames, consecutive-frame
fallback) and the BDD JSON result writer (submit_engine.py:133-169
equivalent) uncovered; this closes that."""
import json
import os

import jax as _jax
import numpy as np
import PIL.Image
import pytest

pytestmark = pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="engine e2e; run via scripts/test_cpu.sh")


@pytest.fixture(scope="module")
def bdd_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bdd")
    rng = np.random.default_rng(0)
    for split, vids in (("train", ("vid_a", "vid_b")), ("val", ("vid_c",))):
        for vid in vids:
            idir = root / "BDD100K" / "images" / "track" / split / vid
            idir.mkdir(parents=True)
            ldir = root / "BDD100K" / "filter_labels" / "track" / split / vid
            ldir.mkdir(parents=True)
            for t in range(1, 6):
                PIL.Image.fromarray(
                    rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
                    idir / f"{vid}-{t:07d}.jpg")
                lines = []
                for obj, cls in ((1, 1), (2, 3)):   # pedestrian, car (1-based)
                    lines.append(
                        f"{cls} {obj} {6 + 3 * t + 20 * obj} {8 + 6 * obj} 14 16\n")
                if t != 3:  # frame 3 of every video has NO GT (fake-GT path)
                    (ldir / f"{vid}-{t:07d}.txt").write_text("".join(lines))
                else:
                    (ldir / f"{vid}-{t:07d}.txt").write_text("")
    return str(root)


@pytest.mark.slow
def test_bdd_train_and_submit_json(bdd_root, tmp_path):
    from test_engines import _config

    outdir = str(tmp_path / "out")
    config = _config(bdd_root, outdir)
    config.update({
        "DATASET": "BDD100K", "TRAIN_SHORT_SIDES": [64],
        "TRAIN_MAX_SIZE": 96, "SAMPLE_INTERVALS": [1],
        "EVAL_SHORT_SIDE": 64, "EVAL_MAX_SIDE": 96,
        "MISS_TOLERANCE": 3,
    })

    from memotr_tpu.data import build_dataset
    ds = build_dataset(config, "train")
    assert len(ds.sample_begin_frames) > 0
    item = ds[0]
    assert len(item["imgs"]) == config["SAMPLE_LENGTHS"][0]
    assert all(0 <= int(l) < 8
               for info in item["infos"] for l in info["labels"])

    from memotr_tpu.engine import train as train_mod
    from memotr_tpu.data.loader import DataLoader as DL
    orig_iter = DL.__iter__

    def short_iter(self):
        batches = []
        for i, b in enumerate(orig_iter(self)):
            batches.append(b)
            if i >= 1:
                break
        yield from batches
    DL.__iter__ = short_iter
    try:
        train_mod.train(config)
    finally:
        DL.__iter__ = orig_iter

    from memotr_tpu.engine.submit import submit
    sub_cfg = dict(config)
    sub_cfg["SUBMIT_MODEL"] = "checkpoint_0"
    sub_cfg["SUBMIT_DATA_SPLIT"] = "val"
    submit(sub_cfg)

    out_json = os.path.join(outdir, "val", "tracker", "vid_c.json")
    assert os.path.isfile(out_json)
    frames = json.load(open(out_json))
    assert len(frames) == 5
    assert frames[0]["videoName"] == "vid_c"
    assert frames[0]["frameIndex"] == 0
    from memotr_tpu.data.bdd100k import LABEL_TO_CATEGORY
    for fr in frames:
        for lab in fr["labels"]:
            assert lab["category"] in LABEL_TO_CATEGORY.values()
            b = lab["box2d"]
            assert b["x2"] >= b["x1"] and b["y2"] >= b["y1"]
