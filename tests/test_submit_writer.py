"""Unit tests for the shared frame-result writer (format_frame_results).

The single filter+format path behind both the per-sequence ``Submitter``
and the lockstep ``BatchedSubmitter`` (reference writer:
submit_engine.py:138-186; BDD JSON: submit_engine.py:154-170).
"""
import numpy as np


def _results(boxes, scores, mask, ids, labels):
    """Batchify host-numpy results the way the eval step emits them."""
    return {
        "boxes": np.asarray(boxes, np.float32)[None],
        "scores": np.asarray(scores, np.float32)[None],
        "mask": np.asarray(mask, bool)[None],
        "ids": np.asarray(ids, np.int64)[None],
        "labels": np.asarray(labels, np.int64)[None],
    }


def test_mot_txt_lines_format_and_filters():
    from memotr_tpu.engine.submit import format_frame_results

    # slot 0 passes; slot 1 fails score; slot 2 fails area; slot 3 masked
    results = _results(
        boxes=[[0.5, 0.5, 0.2, 0.25], [0.1, 0.1, 0.2, 0.2],
               [0.5, 0.5, 0.001, 0.001], [0.5, 0.5, 0.2, 0.2]],
        scores=[0.9, 0.2, 0.9, 0.9],
        mask=[True, True, True, False],
        ids=[7, 8, 9, 10], labels=[0, 0, 0, 0])
    bdd, lines = format_frame_results(
        i=4, results=results, ori_hw=(100, 200), path="x/00000005.jpg",
        result_thresh=0.5, area_thresh=100.0, dataset_name="DanceTrack")
    assert bdd is None
    assert len(lines) == 1
    # frame index is 1-based; cxcywh(0.5,0.5,.2,.25)@(100,200) -> x1=80 y1=37.5
    f, tid, x1, y1, w, h, conf, a, b, c = lines[0].strip().split(",")
    assert (f, tid, conf, a, b, c) == ("5", "7", "1", "-1", "-1", "-1")
    assert np.isclose(float(x1), 80.0) and np.isclose(float(y1), 37.5)
    assert np.isclose(float(w), 40.0) and np.isclose(float(h), 25.0)


def test_bdd_record_fields():
    from memotr_tpu.engine.submit import BDD_LABEL_NAMES, format_frame_results

    results = _results(
        boxes=[[0.5, 0.5, 0.2, 0.25]], scores=[0.9], mask=[True],
        ids=[3], labels=[2])
    bdd, lines = format_frame_results(
        i=0, results=results, ori_hw=(100, 200),
        path="d/vid-0000001.jpg", result_thresh=0.5, area_thresh=100.0,
        dataset_name="BDD100K")
    assert lines is None
    assert bdd["name"] == "vid-0000001.jpg"
    assert bdd["videoName"] == "vid"          # img_name[:-12]
    assert bdd["frameIndex"] == 0
    (lab,) = bdd["labels"]
    assert lab["id"] == "3"
    assert lab["category"] == BDD_LABEL_NAMES[2]
    box = lab["box2d"]
    assert np.isclose(box["x1"], 80.0) and np.isclose(box["y1"], 37.5)
    assert np.isclose(box["x2"], 120.0) and np.isclose(box["y2"], 62.5)


def test_lane_selection_matches_single():
    """Lane k of a batched results dict formats identically to that lane
    sliced down to a single-sequence dict (the Submitter/BatchedSubmitter
    equivalence the dedup relies on)."""
    from memotr_tpu.engine.submit import format_frame_results

    rng = np.random.default_rng(0)
    b, s = 3, 5
    batched = {
        "boxes": rng.uniform(0.2, 0.6, (b, s, 4)).astype(np.float32),
        "scores": rng.uniform(0, 1, (b, s)).astype(np.float32),
        "mask": rng.uniform(0, 1, (b, s)) > 0.3,
        "ids": rng.integers(0, 50, (b, s)),
        "labels": np.zeros((b, s), np.int64),
    }
    for lane in range(b):
        single = {k: v[lane][None] for k, v in batched.items()}
        _, want = format_frame_results(
            2, single, (480, 640), "p/00000003.jpg", 0.5, 100.0, "MOT17")
        _, got = format_frame_results(
            2, batched, (480, 640), "p/00000003.jpg", 0.5, 100.0, "MOT17",
            lane=lane)
        assert got == want
