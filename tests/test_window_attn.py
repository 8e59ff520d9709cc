"""Parity tests for the fused window-attention kernel (ops/window_attn.py).

Three-way parity: Pallas kernel (interpret mode on CPU) == the pure-JAX
reference ``window_attention_xla`` == the production encoder path
(MultiheadAttention + _block_partition/_block_merge from
models/windowed_encoder.py), for window and grid modes, with padding
masks including fully-dead windows, bias on/off, plus gradient parity of
the custom VJP.  Reference behavior being matched: the window/grid
attention block of the TPU-native encoder (itself replacing the reference
deformable encoder, models/deformable_encoder.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models.layers import MultiheadAttention
from memotr_tpu.models.windowed_encoder import _block_merge, _block_partition
from memotr_tpu.ops.window_attn import (grid_transpose, grid_untranspose,
                                        window_attention_pallas,
                                        window_attention_xla)

B, H, W, C, HEADS, WIN = 2, 16, 24, 32, 4, 4


def make_inputs(seed=0, dead_window=True):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, H, W, C).astype(np.float32)
    pos = rng.randn(B, H, W, C).astype(np.float32) * 0.5
    mask = np.zeros((B, H, W), bool)
    mask[:, :, W - 3:] = True          # partial padding in last windows
    if dead_window:
        mask[1, :WIN, :WIN] = True     # one fully-dead window
    params = {}
    for name in ("q", "k", "v", "o"):
        params["w" + name] = (rng.randn(C, C) / np.sqrt(C)).astype(np.float32)
        params["b" + name] = (rng.randn(C) * 0.1).astype(np.float32)
    bias = (rng.randn(HEADS, WIN * WIN, WIN * WIN) * 0.3).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask),
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(bias))


def mha_path(x, pos, mask, p, bias, grid: bool):
    """The production encoder attention block, verbatim semantics."""
    b, h, w, c = x.shape
    q = x + pos
    qw, mw, hw_pad = _block_partition(q, mask, WIN, grid)
    xw, _, _ = _block_partition(x, mask, WIN, grid)
    all_dead = jnp.all(mw, axis=1, keepdims=True)
    mw = jnp.where(all_dead, jnp.zeros_like(mw), mw)
    attn = MultiheadAttention(HEADS, 0.0)
    variables = {"params": {
        "q_proj": {"kernel": p["wq"], "bias": p["bq"]},
        "k_proj": {"kernel": p["wk"], "bias": p["bk"]},
        "v_proj": {"kernel": p["wv"], "bias": p["bv"]},
        "out_proj": {"kernel": p["wo"], "bias": p["bo"]},
    }}
    aw = attn.apply(variables, qw, qw, xw, key_padding_mask=mw,
                    attn_bias=bias)
    return _block_merge(aw, hw_pad, b, h, w, WIN, grid)


def kernel_args(x, pos, mask, p, bias):
    return (x, pos, mask, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"],
            p["bv"], p["wo"], p["bo"], bias)


@pytest.mark.parametrize("with_bias", [True, False])
def test_xla_ref_matches_production_path(with_bias):
    x, pos, mask, p, bias = make_inputs()
    bias_ = bias if with_bias else None
    ref = window_attention_xla(*kernel_args(x, pos, mask, p, bias_)[:12],
                               HEADS, WIN, WIN)
    prod = mha_path(x, pos, mask, p, bias_, grid=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(prod),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_bias", [True, False])
def test_kernel_matches_xla_ref(with_bias):
    x, pos, mask, p, bias = make_inputs()
    bias_ = bias if with_bias else None
    args = kernel_args(x, pos, mask, p, bias_)
    got = window_attention_pallas(*args, HEADS, WIN, WIN, True)
    ref = window_attention_xla(*args, HEADS, WIN, WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grid_mode_matches_production_path():
    x, pos, mask, p, _ = make_inputs(seed=1)
    nbh, nbw = H // WIN, W // WIN
    bias = jnp.asarray(np.random.RandomState(2).randn(
        HEADS, nbh * nbw, nbh * nbw).astype(np.float32) * 0.3)
    xt = grid_transpose(x, WIN)
    post = grid_transpose(pos, WIN)
    mt = grid_transpose(mask, WIN)
    args = kernel_args(xt, post, mt, p, bias)
    got_t = window_attention_pallas(*args, HEADS, nbh, nbw, True)
    got = grid_untranspose(got_t, WIN)
    prod = mha_path(x, pos, mask, p, bias, grid=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(prod),
                               rtol=1e-5, atol=1e-5)
    # transpose round-trip is exact
    np.testing.assert_array_equal(
        np.asarray(grid_untranspose(grid_transpose(x, WIN), WIN)),
        np.asarray(x))


def test_gradients_match_xla_vjp():
    x, pos, mask, p, bias = make_inputs(seed=3)
    args = kernel_args(x, pos, mask, p, bias)

    def loss_pallas(x_, wq_, bias_):
        a = (x_, pos, mask, wq_) + args[4:11] + (bias_,)
        y = window_attention_pallas(*a, HEADS, WIN, WIN, True)
        return jnp.sum(y * y)

    def loss_xla(x_, wq_, bias_):
        a = (x_, pos, mask, wq_) + args[4:11] + (bias_,)
        y = window_attention_xla(*a, HEADS, WIN, WIN)
        return jnp.sum(y * y)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, p["wq"], bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, p["wq"], bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("wpp", [1, 2])
def test_kernel_chunked_window_rows(monkeypatch, wpp):
    """wpp < n_win_w: the per-program mask block must pick the right chunk.

    At the flagship shape (800x1536 grid-attention levels) the VMEM
    budget forces wpp=1 with n_win_w=8; the original (B, nWh, nWw, L)
    mask layout then failed Mosaic lowering (block (1,1,wpp,L) with wpp
    neither a multiple of 8 nor the full row).  The 5-d chunked layout
    keeps the block's last two dims equal to the array's at any wpp; this
    pins the numeric parity of the chunk indexing (interpret mode)."""
    import memotr_tpu.ops.window_attn as wa
    monkeypatch.setattr(wa, "pick_windows_per_program",
                        lambda *a, **k: wpp)
    x, pos, mask, p, bias = make_inputs(seed=5)
    args = kernel_args(x, pos, mask, p, bias)
    got = window_attention_pallas(*args, HEADS, WIN, WIN, True)
    ref = window_attention_xla(*args, HEADS, WIN, WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_smoke():
    x, pos, mask, p, bias = make_inputs(seed=4)
    xb, posb = x.astype(jnp.bfloat16), pos.astype(jnp.bfloat16)
    pb = {k: v.astype(jnp.bfloat16) if k.startswith(("w", "b")) else v
          for k, v in p.items()}
    args = kernel_args(xb, posb, mask, pb, bias)
    got = window_attention_pallas(*args, HEADS, WIN, WIN, True)
    ref = window_attention_xla(*args, HEADS, WIN, WIN)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)
