"""models/eval_cache.py — the cross-frame eval constants (VERDICT r4 #6).

The numpy mirrors (sine position embedding, mask downsample, CPB tables,
pyramid shapes) must match their in-graph jnp originals, and a full model
forward with the attached collections must equal the uncached forward.
The full-model tests exercise the landed windowed-encoder/memotr read
hooks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models import eval_cache as ec
from memotr_tpu.models import windowed_encoder as we


def _mask(b, h, w, pad_frac=0.25):
    m = np.zeros((b, h, w), bool)
    m[0, int(h * (1 - pad_frac)):, :] = True
    if b > 1:
        m[1, :, int(w * (1 - pad_frac)):] = True
    return m


@pytest.mark.parametrize("hw", [(32, 48), (37, 53)])
def test_np_sine_matches_jax(hw):
    """Tight parity on VALID positions only: at padding positions the
    normalized coordinate is (0 - 0.5)/(0 + 1e-6)*2pi ~ -3e6 (the
    reference's own eps-division behavior), where the 1-ulp float32 pow
    difference between np and XLA dim_i amplifies to ~1e-2 in the sine.
    Padded-position embeddings are garbage in BOTH paths and are masked
    as attention keys downstream; the Submitter output-identity test
    (tests/test_windowed_encoder_opt.py) pins the padded-canvas
    integration end-to-end."""
    from memotr_tpu.models.position_embedding import sine_position_embedding
    m = _mask(2, *hw)
    want = np.asarray(sine_position_embedding(jnp.asarray(m), 16))
    got = ec.np_sine_position_embedding(m, 16)
    valid = ~m
    np.testing.assert_allclose(got[valid], want[valid],
                               rtol=1e-5, atol=1e-5)
    # padded positions: same bounded garbage (phase ~3e6 radians — a
    # 1-ulp frequency difference wanders the unit circle by ~0.1)
    assert np.all(np.isfinite(got[m]))
    np.testing.assert_allclose(got[m], want[m], rtol=0.0, atol=0.25)


def test_np_downsample_matches_model():
    from memotr_tpu.models.memotr import _downsample_mask
    m = _mask(2, 41, 59)
    for (h, w) in [(21, 30), (6, 8), (5, 7)]:
        want = np.asarray(_downsample_mask(jnp.asarray(m), h, w))
        got = ec.np_downsample_mask(m, h, w)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hw,expect", [
    ((800, 1536), ((100, 192), (50, 96), (25, 48), (13, 24))),
    ((801, 1533), ((101, 192), (51, 96), (26, 48), (13, 24))),
])
def test_pyramid_shapes(hw, expect):
    assert ec.pyramid_shapes(*hw, n_levels=4) == expect


def test_np_cpb_table_matches_graph():
    """numpy CPB mirror vs the in-graph _cpb_bias at both member grids."""
    rng = np.random.default_rng(0)
    k1 = rng.normal(size=(2, 64)).astype(np.float32)
    b1 = rng.normal(size=(64,)).astype(np.float32)
    k2 = rng.normal(size=(64, 8)).astype(np.float32)

    def jax_bias(n_h, n_w, scale):
        def c1(x):
            return x @ jnp.asarray(k1) + jnp.asarray(b1)

        def c2(x):
            return x @ jnp.asarray(k2)
        return np.asarray(we._cpb_bias(c1, c2, n_h, n_w, scale))

    got = ec._np_cpb_table(k1, b1, k2, 4, 4, 1)
    np.testing.assert_allclose(got, jax_bias(4, 4, 1), rtol=1e-5, atol=1e-5)
    got = ec._np_cpb_table(k1, b1, k2, 5, 7, 4)
    np.testing.assert_allclose(got, jax_bias(5, 7, 4), rtol=1e-5, atol=1e-5)


def test_full_model_cache_parity():
    """MeMOTR forward with attach_eval_cache == uncached forward (both
    collections: frame_ctx pos embeds + windowed cpb_cache)."""
    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.structures.track_state import TrackState

    c, slots = 32, 4
    model = MeMOTR(num_classes=1, n_det_queries=8, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=2,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   encoder_type="windowed", windowed_window=4)
    h, w = 96, 128
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
    mask_np = _mask(1, h, w)
    mask = jnp.asarray(mask_np)
    state = TrackState.empty(1, slots, c, 1, use_dab=True)
    variables = model.init(rng, images, mask, state.query_embed,
                           state.ref_pts, state.mask)

    base = model.apply(variables, images, mask, state.query_embed,
                       state.ref_pts, state.mask)

    cached_vars = ec.attach_eval_cache(model, variables, (h, w), mask_np)
    assert "frame_ctx" in cached_vars and "cpb_cache" in cached_vars
    # pyramid_shapes must agree with the model's actual level shapes
    shapes = ec.pyramid_shapes(h, w, 4)
    for (hh, ww), p in zip(shapes, cached_vars["frame_ctx"]["pos_embeds"]):
        assert p.shape == (1, hh, ww, c)

    got = model.apply(cached_vars, images, mask, state.query_embed,
                      state.ref_pts, state.mask)
    # Padded canvas: decoder MSDA bilinearly samples the feature map
    # without key masking, so the padded-position sine-embedding garbage
    # (reference-parity eps-division coords ~3e6, where a 1-ulp np-vs-XLA
    # pow difference wanders the unit circle — see test_np_sine_matches_jax)
    # leaks ~1e-3 into the outputs.  Bounded, not drift: the fully-valid
    # canvas below is tight, and the Submitter txt-identity test pins the
    # padded e2e path.
    for k in ("pred_logits", "pred_boxes", "outputs"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(base[k]),
                                   rtol=5e-3, atol=5e-3)

    # fully-valid canvas: no garbage positions -> tight parity
    mask0_np = np.zeros((1, h, w), bool)
    mask0 = jnp.asarray(mask0_np)
    base0 = model.apply(variables, images, mask0, state.query_embed,
                        state.ref_pts, state.mask)
    cached0 = ec.attach_eval_cache(model, variables, (h, w), mask0_np)
    got0 = model.apply(cached0, images, mask0, state.query_embed,
                       state.ref_pts, state.mask)
    for k in ("pred_logits", "pred_boxes", "outputs"):
        np.testing.assert_allclose(np.asarray(got0[k]), np.asarray(base0[k]),
                                   rtol=2e-4, atol=2e-4)


def test_eval_step_cache_parity_jitted():
    """The jitted streaming step accepts the augmented variables dict
    (extra collections ride the params argument) and tracks identically."""
    from memotr_tpu.engine.submit import make_eval_step
    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.models.query_updater import QueryUpdater
    from memotr_tpu.structures.track_state import TrackState

    c, slots = 32, 4
    model = MeMOTR(num_classes=1, n_det_queries=8, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=2,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   encoder_type="windowed", windowed_window=4)
    updater = QueryUpdater(hidden_dim=c, ffn_dim=64, use_dab=True)
    h, w = 96, 128
    rng = jax.random.PRNGKey(1)
    state = TrackState.empty(1, slots, c, 1, use_dab=True)
    images = jax.random.normal(rng, (1, h, w, 3), jnp.float32)
    mask_np = np.zeros((1, h, w), bool)
    mask = jnp.asarray(mask_np)
    params = model.init(rng, images, mask, state.query_embed,
                        state.ref_pts, state.mask)
    uparams = updater.init(rng, state.query_embed, state.ref_pts,
                           state.logits, state.boxes, state.output_embed,
                           state.last_output, state.long_memory, state.mask)
    step = make_eval_step(model, updater, 8, det_thresh=0.3,
                          track_thresh=0.3, miss_tolerance=5)

    cached = ec.attach_eval_cache(model, params, (h, w), mask_np)
    r_base, s_base = step(params, uparams, images, mask,
                          TrackState.empty(1, slots, c, 1, use_dab=True))
    r_got, s_got = step(cached, uparams, images, mask,
                        TrackState.empty(1, slots, c, 1, use_dab=True))
    np.testing.assert_array_equal(np.asarray(r_got["ids"]),
                                  np.asarray(r_base["ids"]))
    np.testing.assert_allclose(np.asarray(r_got["scores"]),
                               np.asarray(r_base["scores"]),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_got.boxes),
                               np.asarray(s_base.boxes),
                               rtol=5e-4, atol=5e-4)
