"""Conv-neck encoder (ENCODER_TYPE: conv): shapes, masking, gradients, and
MeMOTR integration (models/conv_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.models.conv_encoder import ConvEncoder
from memotr_tpu.models.memotr import MeMOTR

SHAPES = ((16, 24), (8, 12), (4, 6), (2, 3))
S_TOTAL = sum(h * w for h, w in SHAPES)


def _inputs(b=2, c=32):
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (b, S_TOTAL, c))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (b, S_TOTAL, c))
    mask = jnp.zeros((b, S_TOTAL), bool)
    return src, pos, mask


def test_shapes_and_finiteness():
    src, pos, mask = _inputs()
    enc = ConvEncoder(num_layers=2, d_model=32, d_ffn=64, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), src, SHAPES, None, pos, mask)
    out = enc.apply(params, src, SHAPES, None, pos, mask)
    assert out.shape == (2, S_TOTAL, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_padding_does_not_leak():
    """A fully-padded token region must not change valid-region outputs
    (the conv input is zeroed under the mask)."""
    src, pos, mask = _inputs(b=1)
    h0, w0 = SHAPES[0]
    m2 = np.asarray(mask).copy().reshape(1, -1)
    # mark the right half of level 0 as padding
    lvl0 = np.zeros((1, h0, w0), bool)
    lvl0[:, :, w0 // 2:] = True
    m2[:, :h0 * w0] = lvl0.reshape(1, -1)
    mask2 = jnp.asarray(m2)

    enc = ConvEncoder(num_layers=1, d_model=32, d_ffn=64, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), src, SHAPES, None, pos, mask2)
    base = enc.apply(params, src, SHAPES, None, pos, mask2)
    # perturb padded-region inputs only
    pert = np.asarray(src).copy()
    pert0 = pert[:, :h0 * w0].reshape(1, h0, w0, 32)
    pert0[:, :, w0 // 2 + 1:] += 100.0      # strictly inside padding
    out2 = enc.apply(params, jnp.asarray(pert), SHAPES, None, pos, mask2)
    a = np.asarray(base)[:, :h0 * w0].reshape(1, h0, w0, 32)
    b = np.asarray(out2)[:, :h0 * w0].reshape(1, h0, w0, 32)
    # valid columns except the conv's 1-px halo around the boundary
    np.testing.assert_allclose(a[:, :, :w0 // 2 - 1],
                               b[:, :, :w0 // 2 - 1], atol=1e-5)


def test_gradients_flow():
    src, pos, mask = _inputs(b=1)
    enc = ConvEncoder(num_layers=2, d_model=32, d_ffn=64, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), src, SHAPES, None, pos, mask)
    grads = jax.grad(lambda p: enc.apply(p, src, SHAPES, None, pos,
                                         mask).sum())(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.any(np.asarray(g) != 0), jax.tree_util.keystr(path)


def test_memotr_with_conv_encoder():
    model = MeMOTR(num_classes=1, n_det_queries=6, n_feature_levels=4,
                   hidden_dim=32, ffn_dim=64, n_heads=4, n_enc_layers=2,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   encoder_type="conv", dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 64, 3)) * 0.1
    mask = jnp.zeros((1, 64, 64), bool)
    tq = jnp.zeros((1, 3, 32))
    tr = jnp.zeros((1, 3, 4))
    tm = jnp.zeros((1, 3), bool)
    params = model.init(rng, imgs, mask, tq, tr, tm)
    out = model.apply(params, imgs, mask, tq, tr, tm)
    assert out["pred_boxes"].shape == (1, 9, 4)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))
    enc = params["params"]["transformer"]["encoder"]["layer_0"]
    assert "conv3x3" in enc and "topdown_mix" in enc
