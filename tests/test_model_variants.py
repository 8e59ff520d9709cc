import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

"""Model variants: D-DETR (USE_DAB=False) path, remat flag, debug dumper."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models.memotr import MeMOTR
from memotr_tpu.structures import TrackState


def _run(model, c, s=3):
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    qdim = c if model.use_dab else 2 * c
    tq = jnp.zeros((1, s, qdim))
    tr = jnp.zeros((1, s, 4))
    tm = jnp.zeros((1, s), bool)
    params = model.init(rng, imgs, mask, tq, tr, tm)
    return model.apply(params, imgs, mask, tq, tr, tm), params


def test_ddetr_variant_forward():
    c = 32
    model = MeMOTR(num_classes=1, n_det_queries=6, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=0, use_dab=False,
                   dtype=jnp.float32)
    out, params = _run(model, c)
    assert out["det_query_embed"].shape == (6, 2 * c)
    assert out["pred_boxes"].shape == (1, 9, 4)
    # D-DETR has the learned reference_points head (memotr.py:216)
    assert "reference_points" in params["params"]
    assert np.all(np.isfinite(np.asarray(out["pred_boxes"])))


def test_remat_matches_no_remat():
    c = 32
    kw = dict(num_classes=1, n_det_queries=6, n_feature_levels=4,
              hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=1,
              n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
              dtype=jnp.float32)
    m1 = MeMOTR(use_checkpoint=False, **kw)
    m2 = MeMOTR(use_checkpoint=True, **kw)
    out1, params = _run(m1, c)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    tq = jnp.zeros((1, 3, c))
    tr = jnp.zeros((1, 3, 4))
    tm = jnp.zeros((1, 3), bool)
    out2 = m2.apply(params, imgs, mask, tq, tr, tm)
    np.testing.assert_allclose(np.asarray(out1["pred_boxes"]),
                               np.asarray(out2["pred_boxes"]), atol=1e-5)


def test_extra_track_attn_variant():
    c = 32
    model = MeMOTR(num_classes=1, n_det_queries=6, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=1,
                   extra_track_attn=True, use_dab=True, dtype=jnp.float32)
    out, params = _run(model, c)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))
    # track_attn params exist for merged layers (>= merge layer)
    dec = params["params"]["transformer"]["decoder"]
    assert "track_attn" in dec["layer_1"]


def test_debug_dumper(tmp_path):
    from memotr_tpu.utils.debug_dump import DebugDumper
    d = DebugDumper(str(tmp_path / "viz"), enabled=True)
    st = TrackState.empty(1, 2, 4, 1)
    d.dump_frame(0, results={"boxes": jnp.ones((1, 2, 4))}, state=st)
    path = tmp_path / "viz" / "frame_000000.npz"
    assert path.exists()
    data = np.load(path)
    assert "results.boxes" in data
    assert any(k.startswith("state.") for k in data.files)
    # disabled dumper writes nothing
    d2 = DebugDumper(str(tmp_path / "viz2"), enabled=False)
    d2.dump_frame(0, results={"x": jnp.ones(2)})
    assert not os.path.exists(tmp_path / "viz2" / "frame_000000.npz")
