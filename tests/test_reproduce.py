"""Dry-run of tools/reproduce_dancetrack.py (VERDICT round-4 next #8).

Fabricates a reference-format ``.pth`` ({"model": state_dict()} — the exact
format ``utils.utils.save_checkpoint`` writes) from the ACTUAL reference
torch model at a tiny shape, a synthetic DanceTrack val split, and drives
the one-command reproduction path end to end: convert -> Orbax checkpoint
-> submit -> in-process metrics -> one JSON result line.  A user pointing
the same command at the released checkpoint + real dataset follows the
exact code path tested here.
"""
import io
import json
import os
import sys

import jax as _jax
import pytest as _pytest

pytestmark = [
    _pytest.mark.slow,
    _pytest.mark.skipif(
        _jax.devices()[0].platform != "cpu",
        reason="builds the reference torch model + full submit/eval; run "
               "via scripts/test_cpu.sh"),
]

import numpy as np
import PIL.Image
import pytest
import torch
import yaml

from test_reference_parity import REF_CFG, _import_reference

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _synth_dancetrack(root):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for vid in ("dancetrack0001", "dancetrack0002"):
            vdir = root / "DanceTrack" / split / vid
            (vdir / "img1").mkdir(parents=True)
            (vdir / "gt").mkdir(parents=True)
            lines = []
            for t in range(1, 7):
                img = PIL.Image.fromarray(
                    rng.integers(0, 255, (64, 96, 3), np.uint8))
                img.save(vdir / "img1" / f"{t:08d}.jpg")
                for obj in (1, 2):
                    lines.append(
                        f"{t},{obj},{8 + 4 * t + 20 * obj},{10 + 8 * obj},"
                        f"14,18,1,1,1\n")
            (vdir / "gt" / "gt.txt").write_text("".join(lines))
    return str(root)


def test_reproduce_dancetrack_dry_run(tmp_path):
    sys.path.insert(0, TOOLS)
    import reproduce_dancetrack

    ref_build, _, _ = _import_reference()
    torch.manual_seed(0)
    ref_model = ref_build(REF_CFG)
    pth = tmp_path / "memotr_tiny.pth"
    torch.save({"model": ref_model.state_dict()}, pth)

    root = _synth_dancetrack(tmp_path / "data")
    out = tmp_path / "repro"

    cfg = dict(
        REF_CFG,
        # engine keys the submit/eval path needs (test_engines._config)
        DATA_ROOT=root, OUTPUTS_DIR=str(out), TRACK_SLOTS=8, MAX_GTS=8,
        DTYPE="float32", MSDA_IMPL="xla", AUX_LOSS=True,
        PRETRAINED_MODEL=None, SEED=1, NUM_WORKERS=1,
        DET_SCORE_THRESH=0.0, TRACK_SCORE_THRESH=0.0,
        RESULT_SCORE_THRESH=0.0, MISS_TOLERANCE=5, USE_MOTION=False,
        MOTION_MIN_LENGTH=3, MOTION_MAX_LENGTH=5, MOTION_LAMBDA=0.5,
        EVAL_THREADS=1, EVAL_DATA_SPLIT="val", EVAL_MODE="specific",
        EVAL_MODEL=None, EVAL_DIR=str(out), SUBMIT_DIR=str(out),
        SUBMIT_MODEL=None, SUBMIT_DATA_SPLIT="val",
        EVAL_SHORT_SIDE=64, EVAL_MAX_SIDE=128, MESH_DEVICES=1,
    )
    cfg_path = tmp_path / "tiny_dancetrack.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = reproduce_dancetrack.main([
            "--checkpoint", str(pth), "--data-root", root,
            "--out", str(out), "--config", str(cfg_path), "--split", "val"])
    finally:
        sys.stdout = stdout
    output = buf.getvalue()
    print(output)
    assert rc == 0
    # converted checkpoint exists and the result line carries the metrics
    assert os.path.isdir(out / "checkpoint_converted")
    result = json.loads(output.strip().splitlines()[-1])
    for key in ("HOTA", "DetA", "AssA", "MOTA", "IDF1"):
        assert key in result, f"missing {key}: {result}"
    assert 0.0 <= result["HOTA"] <= 100.0
    # tracker txts were written for both val sequences
    tracker = out / "val" / "checkpoint_converted_tracker"
    assert sorted(os.listdir(tracker))[:2] == ["dancetrack0001.txt",
                                               "dancetrack0002.txt"]
