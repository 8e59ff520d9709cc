"""Parity pins for the round-5 windowed-encoder XLA-path restructure
(VERDICT r4 #6): hoisted pos/mask partitions, batched window-mode
attention, flattened FFN tail, and the cross-frame CPB bias cache must be
EXACTLY the historical per-level math (same params, same outputs).

The oracle below is the pre-restructure per-level layer body, kept
verbatim (modulo module reuse) from windowed_encoder.py @ commit 3073687.
Skips cleanly if the restructure has not landed yet (the staged file in
_landing/ replaces memotr_tpu/models/windowed_encoder.py at the
post-campaign landing window)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from memotr_tpu.models import windowed_encoder as we
from memotr_tpu.models.layers import MultiheadAttention

if not hasattr(we, "make_attention_ctx"):
    pytest.skip("windowed-encoder restructure not landed yet",
                allow_module_level=True)


class _OracleLayer(nn.Module):
    """The historical per-level XLA path (same param names/structure)."""
    d_model: int
    d_ffn: int
    n_heads: int
    window: int = 8
    grid: bool = False
    use_lepe: bool = True
    use_bottomup: bool = True
    use_relpos: bool = True
    relpos_hidden: int = 64
    prenorm: bool = False
    dtype: any = jnp.float32

    @nn.compact
    def __call__(self, levels, masks, poss, deterministic=True,
                 shared_bias=None):
        attn = MultiheadAttention(self.n_heads, 0.0, dtype=self.dtype,
                                  name="win_attn")
        if self.use_relpos and shared_bias is None:
            cpb1 = nn.Dense(self.relpos_hidden, dtype=jnp.float32,
                            name="cpb_mlp1")
            cpb2 = nn.Dense(self.n_heads, use_bias=False, dtype=jnp.float32,
                            name="cpb_mlp2")

            def relpos_bias(n_h, n_w, scale):
                return we._cpb_bias(cpb1, cpb2, n_h, n_w, scale)
        lepe = nn.Conv(self.d_model, (3, 3), padding="SAME",
                       feature_group_count=self.d_model, dtype=self.dtype,
                       name="lepe_dwconv") if self.use_lepe else None
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        lin1 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        topdown = nn.Dense(self.d_model, dtype=self.dtype, name="topdown_mix")
        bottomup = nn.Dense(self.d_model, dtype=self.dtype,
                            name="bottomup_mix")

        out = []
        for lvl, (x, m, pos) in enumerate(zip(levels, masks, poss)):
            b, h, w, _ = x.shape
            if lepe is not None:
                xz = jnp.where(m[..., None], 0.0, x)
                x = x + lepe(xz)
            xa = norm1(x).astype(x.dtype) if self.prenorm else x
            q = xa + pos.astype(x.dtype)
            qw, mw, hw_pad = we._block_partition(q, m, self.window, self.grid)
            xw, _, _ = we._block_partition(xa, m, self.window, self.grid)
            all_dead = jnp.all(mw, axis=1, keepdims=True)
            mw = jnp.where(all_dead, jnp.zeros_like(mw), mw)
            bias = None
            if shared_bias is not None:
                bias = shared_bias[lvl]
            elif self.use_relpos:
                hh, ww = hw_pad
                if self.grid:
                    bias = relpos_bias(hh // self.window, ww // self.window,
                                       self.window)
                else:
                    bias = relpos_bias(self.window, self.window, 1)
            aw = attn(qw, qw, xw, key_padding_mask=mw,
                      deterministic=deterministic, attn_bias=bias)
            y = we._block_merge(aw, hw_pad, b, h, w, self.window, self.grid)
            if self.prenorm:
                x = x + y
                f = lin2(nn.relu(lin1(norm2(x).astype(x.dtype))))
                x = x + f
            else:
                x = norm1(x + y)
                f = lin2(nn.relu(lin1(x)))
                x = norm2(x + f)
            out.append(x)

        return we.cross_level_fuse(out, topdown,
                                   bottomup if self.use_bottomup else None,
                                   self.dtype)


def _pyramid(rng, b=2, c=32, shapes=((17, 23), (9, 12), (5, 6))):
    """Non-multiple-of-window shapes with a padded region per sample."""
    ks = jax.random.split(rng, len(shapes) + 1)
    levels, masks, poss = [], [], []
    for k, (h, w) in zip(ks, shapes):
        k1, k2 = jax.random.split(k)
        levels.append(jax.random.normal(k1, (b, h, w, c), jnp.float32))
        poss.append(jax.random.normal(k2, (b, h, w, c), jnp.float32))
        m = np.zeros((b, h, w), bool)
        m[0, h - max(1, h // 4):, :] = True      # bottom band padded
        if b > 1:
            m[1, :, w - max(1, w // 3):] = True  # right band padded
        masks.append(jnp.asarray(m))
    return levels, masks, poss


@pytest.mark.parametrize("grid", [False, True])
@pytest.mark.parametrize("prenorm", [False, True])
@pytest.mark.parametrize("relpos", [True, False])
def test_layer_matches_oracle(grid, prenorm, relpos):
    levels, masks, poss = _pyramid(jax.random.PRNGKey(0))
    kw = dict(d_model=32, d_ffn=64, n_heads=4, window=4, grid=grid,
              prenorm=prenorm, use_relpos=relpos)
    new = we.WindowedEncoderLayer(**kw)
    old = _OracleLayer(**kw)
    params = new.init(jax.random.PRNGKey(1), levels, masks, poss)
    got = new.apply(params, levels, masks, poss)
    want = old.apply(params, levels, masks, poss)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-5, atol=2e-5)


def test_layer_matches_oracle_bf16():
    """Same comparison at the deployment dtype (exercises the f32-pos
    cast-at-add ordering)."""
    levels, masks, poss = _pyramid(jax.random.PRNGKey(2))
    levels = [lv.astype(jnp.bfloat16) for lv in levels]
    kw = dict(d_model=32, d_ffn=64, n_heads=4, window=4, grid=True,
              dtype=jnp.bfloat16)
    new = we.WindowedEncoderLayer(**kw)
    old = _OracleLayer(**kw)
    params = new.init(jax.random.PRNGKey(3), levels, masks, poss)
    got = new.apply(params, levels, masks, poss)
    want = old.apply(params, levels, masks, poss)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w_, np.float32),
                                   rtol=2e-2, atol=2e-2)


def _encoder_inputs(rng, b=1, c=32, shapes=((17, 23), (9, 12), (5, 6))):
    levels, masks, poss = _pyramid(rng, b=b, c=c, shapes=shapes)
    src = jnp.concatenate([lv.reshape(b, -1, c) for lv in levels], axis=1)
    mask = jnp.concatenate([m.reshape(b, -1) for m in masks], axis=1)
    pos = jnp.concatenate([p.reshape(b, -1, c) for p in poss], axis=1)
    return src, shapes, pos, mask


@pytest.mark.parametrize("use_checkpoint", [False, True])
def test_encoder_cpb_cache_parity(use_checkpoint):
    """Injecting the host-precomputed CPB tables as a ``cpb_cache``
    collection must reproduce the in-graph MLP path (models/eval_cache.py
    numpy mirror vs the layer's own _cpb_bias)."""
    from memotr_tpu.models.eval_cache import cpb_tables
    src, shapes, pos, mask = _encoder_inputs(jax.random.PRNGKey(4))
    enc = we.WindowedEncoder(num_layers=3, d_model=32, d_ffn=64, n_heads=4,
                             window=4, use_checkpoint=use_checkpoint)
    variables = enc.init(jax.random.PRNGKey(5), src, shapes, None, pos, mask)
    base = enc.apply(variables, src, shapes, None, pos, mask)

    tabs = cpb_tables(jax.tree.map(np.asarray, variables["params"]),
                      n_layers=3, window=4, shapes=shapes)
    assert tabs is not None and len(tabs) == 3
    cached = enc.apply({**variables, "cpb_cache": {"tables": tabs}},
                       src, shapes, None, pos, mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_encoder_shared_cpb_still_works():
    src, shapes, pos, mask = _encoder_inputs(jax.random.PRNGKey(6))
    enc = we.WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                             window=4, shared_cpb=True)
    variables = enc.init(jax.random.PRNGKey(7), src, shapes, None, pos, mask)
    out = enc.apply(variables, src, shapes, None, pos, mask)
    assert out.shape == src.shape
    # shared-CPB MLP lives at the encoder root, not in the layers
    assert "cpb_mlp1" in variables["params"]
    assert "cpb_mlp1" not in variables["params"]["layer_0"]


def test_layer_attn_ctx_supplied_equals_internal():
    """Passing a precomputed make_attention_ctx must equal the layer's
    internal build (the hybrid encoder calls with attn_ctx=None)."""
    levels, masks, poss = _pyramid(jax.random.PRNGKey(10))
    layer = we.WindowedEncoderLayer(d_model=32, d_ffn=64, n_heads=4,
                                    window=4, grid=True)
    params = layer.init(jax.random.PRNGKey(11), levels, masks, poss)
    base = layer.apply(params, levels, masks, poss)
    ctx = we.make_attention_ctx(poss, masks, 4, grid=True)
    got = layer.apply(params, levels, masks, poss, True, None, ctx)
    for g, w_ in zip(got, base):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_submitter_eval_cache_output_identity(tmp_path):
    """End-to-end Submitter with EVAL_CACHE on vs off writes identical
    MOT txt (integration: attach ordering, pipelined packed step, canvas
    mask plumbing)."""
    import os

    import PIL.Image

    from memotr_tpu.engine.submit import Submitter
    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.models.query_updater import QueryUpdater
    from memotr_tpu.structures.track_state import TrackState

    seq = tmp_path / "seq" / "img1"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(1, 4):
        img = rng.integers(0, 255, (64, 80, 3), np.uint8)
        img[20:40, 10 + 8 * t:30 + 8 * t] = 255
        PIL.Image.fromarray(img).save(seq / f"{t:08d}.jpg")

    c, slots = 32, 4
    model = MeMOTR(num_classes=1, n_det_queries=8, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=2,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   encoder_type="windowed", windowed_window=4)
    updater = QueryUpdater(hidden_dim=c, ffn_dim=64, use_dab=True)
    k = jax.random.PRNGKey(0)
    h, w = 64, 96
    state = TrackState.empty(1, slots, c, 1, use_dab=True)
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    mask = jnp.zeros((1, h, w), bool)
    params = model.init(k, images, mask, state.query_embed, state.ref_pts,
                        state.mask)
    uparams = updater.init(k, state.query_embed, state.ref_pts, state.logits,
                           state.boxes, state.output_embed, state.last_output,
                           state.long_memory, state.mask)
    config = {"DET_SCORE_THRESH": 0.0, "TRACK_SCORE_THRESH": 0.0,
              "RESULT_SCORE_THRESH": 0.0, "MISS_TOLERANCE": 3,
              "TRACK_SLOTS": slots, "HIDDEN_DIM": c, "USE_DAB": True,
              "EVAL_SHORT_SIDE": h, "EVAL_MAX_SIDE": w}

    outs = {}
    for on in (True, False):
        out_dir = tmp_path / f"out_{int(on)}"
        sub = Submitter("DanceTrack", str(tmp_path / "seq"), "seq",
                        str(out_dir), model, updater, params, uparams,
                        dict(config, EVAL_CACHE=on))
        if on:
            assert "frame_ctx" in sub.params and "cpb_cache" in sub.params
        else:
            assert "frame_ctx" not in sub.params
        sub.run()
        txt = os.path.join(str(out_dir), "tracker", "seq.txt")
        outs[on] = open(txt).read() if os.path.exists(txt) else ""
    assert outs[True] == outs[False]


def test_encoder_grad_with_checkpoint_and_shared_cpb():
    """remat + dynamic (array-valued) shared_bias: the bias tables must be
    traced, not static, through nn.remat (static_argnums pins only
    ``deterministic``)."""
    src, shapes, pos, mask = _encoder_inputs(jax.random.PRNGKey(8))
    enc = we.WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                             window=4, shared_cpb=True, use_checkpoint=True)
    variables = enc.init(jax.random.PRNGKey(9), src, shapes, None, pos, mask)

    def loss(p):
        return jnp.sum(enc.apply(
            {"params": p}, src, shapes, None, pos, mask,
            False) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0))
    assert np.isfinite(gnorm) and gnorm > 0
