"""Batched streaming submit (serving mode): per-lane outputs must match the
B=1 per-sequence path — every op in the step is batch-pointwise, so lanes
are independent sequences (engine/submit.py BatchedSubmitter)."""
import os

import numpy as np
import PIL.Image
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "cpu",
    reason="submit e2e needs the scrubbed-CPU env (scripts/test_cpu.sh)")


def _make_seq(root, name, n_frames, seed):
    rng = np.random.default_rng(seed)
    vdir = os.path.join(root, "DanceTrack", "val", name)
    os.makedirs(os.path.join(vdir, "img1"), exist_ok=True)
    bg = rng.integers(0, 200, (64, 96, 3), np.uint8)
    for t in range(1, n_frames + 1):
        img = bg.copy()
        x = 8 + 6 * t
        img[20:38, x:x + 14] = 255
        PIL.Image.fromarray(img).save(
            os.path.join(vdir, "img1", f"{t:08d}.jpg"))
    return vdir


def _config():
    return {
        "DET_SCORE_THRESH": 0.0, "TRACK_SCORE_THRESH": 0.0,
        "RESULT_SCORE_THRESH": 0.0, "MISS_TOLERANCE": 3,
        "TRACK_SLOTS": 8, "HIDDEN_DIM": 32, "USE_DAB": True,
        "EVAL_SHORT_SIDE": 64, "EVAL_MAX_SIDE": 128, "USE_MOTION": False,
    }


def _parse(path):
    rows = []
    for line in open(path).read().strip().splitlines():
        parts = line.split(",")
        rows.append((int(parts[0]), int(parts[1]))
                    + tuple(float(p) for p in parts[2:6]))
    return rows


def test_batched_matches_sequential(tmp_path):
    import jax.numpy as jnp
    from memotr_tpu.data.seq_dataset import SeqDataset
    from memotr_tpu.engine.submit import BatchedSubmitter, Submitter
    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.models.query_updater import QueryUpdater
    from memotr_tpu.structures.track_state import TrackState

    root = str(tmp_path / "data")
    dirs = [_make_seq(root, "seq_a", 5, 1), _make_seq(root, "seq_b", 3, 2)]
    cfg = _config()

    model = MeMOTR(num_classes=1, n_det_queries=12, n_feature_levels=4,
                   hidden_dim=32, ffn_dim=64, n_heads=4, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   dtype=jnp.float32)
    updater = QueryUpdater(hidden_dim=32, ffn_dim=64, use_dab=True,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, 8, 32, 1, use_dab=True)
    imgs = jnp.zeros((1, 64, 128, 3))
    msk = jnp.zeros((1, 64, 128), bool)
    variables = model.init(rng, imgs, msk, st.query_embed, st.ref_pts,
                           st.mask)
    params = {"params": variables["params"], "frozen": variables["frozen"]}
    uparams = updater.init(rng, st.query_embed, st.ref_pts, st.logits,
                           st.boxes, st.output_embed, st.last_output,
                           st.long_memory, st.mask)

    seq_out = str(tmp_path / "seq_out")
    for d, name in zip(dirs, ("seq_a", "seq_b")):
        Submitter("DanceTrack", d, name, seq_out, model, updater, params,
                  uparams, cfg).run()

    bat_out = str(tmp_path / "bat_out")
    datasets = [SeqDataset(d, image_height=64, image_width=128)
                for d in dirs]
    dt, n_frames = BatchedSubmitter(
        "DanceTrack", datasets, ["seq_a", "seq_b"], bat_out, model, updater,
        params, uparams, cfg).run()
    assert n_frames == 8

    for name in ("seq_a", "seq_b"):
        ref = _parse(os.path.join(seq_out, "tracker", f"{name}.txt"))
        got = _parse(os.path.join(bat_out, "tracker", f"{name}.txt"))
        assert len(ref) == len(got), (name, len(ref), len(got))
        for r, g in zip(ref, got):
            assert r[:2] == g[:2], (name, r, g)          # frame, id
            np.testing.assert_allclose(r[2:], g[2:], atol=1e-2,
                                       err_msg=name)     # box pixels
    # lane b must not contain frames past its 3-frame sequence
    got_b = _parse(os.path.join(bat_out, "tracker", "seq_b.txt"))
    assert max(r[0] for r in got_b) <= 3

    # --- lanes sharded across a 2-device mesh == single-device batched ---
    if len(jax.devices()) >= 2:
        mesh_out = str(tmp_path / "mesh_out")
        sub = BatchedSubmitter(
            "DanceTrack", datasets, ["seq_a", "seq_b"], mesh_out, model,
            updater, params, uparams, {**cfg, "MESH_DEVICES": 2})
        assert sub.mesh is not None
        sub.run()
        for name in ("seq_a", "seq_b"):
            ref = _parse(os.path.join(bat_out, "tracker", f"{name}.txt"))
            got = _parse(os.path.join(mesh_out, "tracker", f"{name}.txt"))
            assert len(ref) == len(got)
            for r, g in zip(ref, got):
                assert r[:2] == g[:2]
                np.testing.assert_allclose(r[2:], g[2:], atol=1e-2,
                                           err_msg=name)
