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
        m[1, :, w - max(1, w // 3):] = True      # right band padded
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
