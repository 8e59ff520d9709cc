import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

"""Hybrid encoder (ENCODER_TYPE: hybrid): exact deformable attention on
coarse levels + windowed attention on fine levels + cross-level fusion.

Sampling semantics on the deformable levels match the reference kernel
(``/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-299``)
via the shared MSDA op (ops/msda.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.models.memotr import MeMOTR


def _model(**kw):
    base = dict(num_classes=1, n_det_queries=6, n_feature_levels=4,
                hidden_dim=32, ffn_dim=64, n_heads=4, n_enc_layers=2,
                n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                dtype=jnp.float32, encoder_type="hybrid")
    base.update(kw)
    return MeMOTR(**base)


def _run(model, s=3):
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 64, 3)) * 0.2
    mask = jnp.zeros((1, 64, 64), bool)
    tq = jnp.zeros((1, s, model.hidden_dim))
    tr = jnp.zeros((1, s, 4))
    tm = jnp.zeros((1, s), bool)
    params = model.init(rng, imgs, mask, tq, tr, tm)
    return model.apply(params, imgs, mask, tq, tr, tm), params, \
        (imgs, mask, tq, tr, tm)


def test_hybrid_forward_shapes_finite():
    model = _model()
    out, params, _ = _run(model)
    assert out["pred_boxes"].shape == (1, 9, 4)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))
    enc = params["params"]["transformer"]["encoder"]
    # each layer has a windowed fine branch and a deformable coarse branch
    assert "fine" in enc["layer_0"] and "coarse" in enc["layer_0"]
    assert "sampling_offsets" in enc["layer_0"]["coarse"]["self_attn"]


def test_hybrid_min_level_partitions():
    # deform_min_level=2: deformable on the last 2 levels only
    model = _model(hybrid_deform_min_level=2)
    out, params, _ = _run(model)
    enc = params["params"]["transformer"]["encoder"]
    offs = enc["layer_0"]["coarse"]["self_attn"]["sampling_offsets"]["kernel"]
    # offsets head: n_heads * n_levels * n_points * 2 = 4*2*4*2 = 64
    assert offs.shape[-1] == 64
    assert np.all(np.isfinite(np.asarray(out["pred_boxes"])))


def test_hybrid_remat_matches_and_grads_flow():
    m1 = _model(use_checkpoint=False)
    out1, params, args = _run(m1)
    m2 = _model(use_checkpoint=True)
    out2 = m2.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out1["pred_boxes"]),
                               np.asarray(out2["pred_boxes"]), atol=1e-5)

    def loss(p):
        # pred_logits, not pred_boxes: the bbox heads' final layer is
        # zero-initialized (memotr.py:82-90), so box grads wrt the encoder
        # are exactly zero at init
        return jnp.sum(m2.apply(p, *args)["pred_logits"])

    g = jax.grad(loss)(params)["params"]["transformer"]["encoder"]
    total = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g, 0.0)
    assert np.isfinite(total) and total > 0
