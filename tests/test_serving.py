"""Serving export: AOT artifact == live jitted streaming step.

memotr_tpu/serving.py serializes the packed streaming step via jax.export;
the deserialized artifact must reproduce the production step
(engine/submit.py make_eval_step_packed) frame for frame, stateful across a
sequence, and reset() must restart the track state exactly.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from memotr_tpu.engine.submit import make_eval_step_packed  # noqa: E402
from memotr_tpu.models.memotr import build_model  # noqa: E402
from memotr_tpu.models.query_updater import build_query_updater  # noqa: E402
from memotr_tpu.serving import ServingRuntime, export_streaming  # noqa: E402
from memotr_tpu.structures.track_state import TrackState  # noqa: E402

H, W, C, SLOTS = 64, 96, 32, 8

CONFIG = {
    "DATASET": "DanceTrack", "NUM_DET_QUERIES": 12, "NUM_FEATURE_LEVELS": 4,
    "HIDDEN_DIM": C, "FFN_DIM": 64, "NUM_HEADS": 4, "NUM_ENC_POINTS": 4,
    "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": 1, "NUM_DEC_LAYERS": 2,
    "MERGE_DET_TRACK_LAYER": 1, "DROPOUT": 0.0, "USE_DAB": True,
    "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01, "DTYPE": "float32",
    "MSDA_IMPL": "xla", "ENCODER_TYPE": "windowed", "TRACK_SLOTS": SLOTS,
    "DET_SCORE_THRESH": 0.0, "TRACK_SCORE_THRESH": 0.0,
    "RESULT_SCORE_THRESH": 0.0, "MISS_TOLERANCE": 3,
}


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = build_model(CONFIG)
    updater = build_query_updater(CONFIG)
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, SLOTS, C, 1, use_dab=True)
    img = jnp.zeros((1, H, W, 3))
    msk = jnp.zeros((1, H, W), bool)
    params = jax.jit(model.init)(rng, img, msk, st.query_embed, st.ref_pts,
                                 st.mask)
    uparams = jax.jit(updater.init)(rng, st.query_embed, st.ref_pts,
                                    st.logits, st.boxes, st.output_embed,
                                    st.last_output, st.long_memory, st.mask)
    out = str(tmp_path_factory.mktemp("serving") / "artifact")
    export_streaming(CONFIG, params, uparams, out, canvas_hw=(H, W))
    return out, model, updater, params, uparams


def _frames(n=3):
    rng = np.random.default_rng(7)
    return [(rng.integers(0, 255, (H, W, 3), np.uint8),
             np.zeros((H, W), bool)) for _ in range(n)]


def test_artifact_matches_live_step(artifact):
    out, model, updater, params, uparams = artifact
    rt = ServingRuntime.load(out)
    assert rt.manifest["packed_layout"][0] == "id"
    assert rt.manifest["track_slots"] == SLOTS

    live_step = make_eval_step_packed(model, updater, model.n_det_queries,
                                      0.0, 0.0, 3)
    state = TrackState.empty(1, SLOTS, C, 1, use_dab=True)
    for img, msk in _frames():
        got = rt.step(img, msk)
        want, state = live_step(params, uparams, jnp.asarray(img)[None],
                                jnp.asarray(msk)[None], state)
        assert got.shape == (SLOTS, 9)
        np.testing.assert_allclose(got, np.asarray(want)[0],
                                   rtol=1e-5, atol=1e-5)


def test_reset_restarts_state(artifact):
    out = artifact[0]
    rt = ServingRuntime.load(out)
    frames = _frames(2)
    first = [rt.step(i, m) for i, m in frames]
    rt.reset()
    again = [rt.step(i, m) for i, m in frames]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)


def test_artifact_is_self_contained(artifact, tmp_path):
    """Loading must not need the model classes: simulate by loading in a
    subprocess that never imports memotr_tpu model modules."""
    import subprocess
    import sys
    out = artifact[0]
    code = (
        "import sys, numpy as np, jax, json, os\n"
        "sys.path.insert(0, '/root/repo')\n"
        # only the serving module (jax.export loader + npz IO) — assert the
        # flax model stack is NOT imported as a side effect of stepping
        "from memotr_tpu.serving import ServingRuntime\n"
        f"rt = ServingRuntime.load({out!r})\n"
        "img = np.zeros((64, 96, 3), np.uint8)\n"
        "msk = np.zeros((64, 96), bool)\n"
        "rows = rt.step(img, msk)\n"
        "assert rows.shape == (8, 9)\n"
        "print('SELF_CONTAINED_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert "SELF_CONTAINED_OK" in r.stdout, r.stderr[-2000:]
