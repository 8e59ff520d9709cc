"""Demo-script e2e: synthetic video in -> annotated video out.

Covers SURVEY §2.3 "Demo notebook" (the reference ships tools/demo.ipynb;
ours is tools/demo.py) — checkpoint load, streaming step, box plotting,
video writing — on a random-weight tiny model."""
import os
import subprocess
import sys

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="spawns a fresh process + compiles; run via scripts/test_cpu.sh")

import jax
import jax.numpy as jnp
import numpy as np
import yaml


@_pytest.mark.slow
def test_demo_end_to_end(tmp_path):
    cv2 = _pytest.importorskip("cv2")
    from memotr_tpu.checkpoint.orbax_io import save_checkpoint
    from memotr_tpu.models.memotr import build_model
    from memotr_tpu.models.query_updater import build_query_updater
    from memotr_tpu.structures.track_state import TrackState

    config = {
        "DATASET": "DanceTrack", "HIDDEN_DIM": 32, "FFN_DIM": 64,
        "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 4, "NUM_ENC_POINTS": 4,
        "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": 1, "NUM_DEC_LAYERS": 2,
        "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": 10, "DROPOUT": 0.0,
        "USE_DAB": True, "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
        "USE_CHECKPOINT": False, "DTYPE": "float32", "MSDA_IMPL": "xla",
        "TRACK_SLOTS": 4, "DET_SCORE_THRESH": 0.3, "TRACK_SCORE_THRESH": 0.3,
        "MISS_TOLERANCE": 5, "EVAL_SHORT_SIDE": 64, "EVAL_MAX_SIDE": 96,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    model = build_model(config)
    updater = build_query_updater(config)
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, 4, 32, 1, use_dab=True)
    variables = model.init(rng, jnp.zeros((1, 64, 96, 3)),
                           jnp.zeros((1, 64, 96), bool),
                           st.query_embed, st.ref_pts, st.mask)
    uvars = updater.init(rng, st.query_embed, st.ref_pts, st.logits,
                         st.boxes, st.output_embed, st.last_output,
                         st.long_memory, st.mask)
    ckpt_dir = str(tmp_path / "checkpoint_0")
    save_checkpoint(ckpt_dir,
                    params={"model": variables["params"],
                            "updater": uvars["params"]},
                    frozen=variables["frozen"])

    video = str(tmp_path / "in.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"XVID"), 10,
                             (96, 64))
    rng_np = np.random.default_rng(0)
    for _ in range(3):
        writer.write(rng_np.integers(0, 255, (64, 96, 3), np.uint8))
    writer.release()

    out = str(tmp_path / "out.avi")
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/demo.py", "--config",
         str(cfg_path), "--checkpoint", ckpt_dir, "--video", video,
         "--out", out], env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "wrote" in proc.stdout and "3 frames" in proc.stdout
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3
