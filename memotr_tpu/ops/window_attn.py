"""Fused window attention for the TPU-native windowed encoder.

The windowed encoder's attention block (models/windowed_encoder.py) costs
~0.78 ms/layer at 800x1536 against a ~0.4 ms FLOP floor (PERF_NOTES.md
round-2 decomposition).  The XLA formulation materializes q=x+pos, two
6-d partition transposes, three projection outputs, per-window logits and
the merge transpose as separate HBM round-trips.  This kernel fuses the
whole block — q=x+pos, window partition, QKV projections, relative
position bias add, key-padding-masked softmax, value mix, output
projection, window merge — into ONE pass over the feature map: each
program reads its (window_h, wpp*window_w, C) strip of x and pos once and
writes the attention output strip once; every intermediate lives in VMEM.

Semantics exactly match ``models.layers.MultiheadAttention`` applied to
``_block_partition``-ed windows (q = k = x + pos, v = x, True=pad
key-padding mask, per-head additive bias, f32 softmax, fully-masked
windows opened — their outputs are padding and never read), including the
torch ``nn.MultiheadAttention`` projection layout the reference decoder
uses (deformable_decoder.py:200-205).  Grid (MaxViT-style strided)
attention reuses the same kernel on a block-transposed map — see
``grid_transpose``.

Backward: ``custom_vjp`` whose backward is the VJP of the numerically
matching XLA implementation (``window_attention_xla``) — training gets
exact XLA gradients while inference gets the fused forward (same recipe
as ops/msda_pallas.py).

Param layout: callers pass the four projection kernels/biases exactly as
stored by ``MultiheadAttention``'s q/k/v/out ``nn.Dense`` submodules, so
the XLA and Pallas paths share checkpoints freely.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_pallas import pallas_supported  # noqa: F401  (re-exported)

_NEG = float(jnp.finfo(jnp.float32).min)


def _divisors(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def pick_windows_per_program(n_win_w: int, n_heads: int, l_tokens: int,
                             budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest divisor of ``n_win_w`` whose f32 score block fits the VMEM
    budget (scores are the dominant per-program buffer)."""
    for d in _divisors(n_win_w):
        if d * n_heads * l_tokens * l_tokens * 4 <= budget_bytes:
            return d
    return 1


def window_attention_xla(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                         bias, n_heads: int, window_h: int, window_w: int):
    """Reference XLA implementation on an already-padded map.

    x, pos: (B, H, W, C) with H % window_h == 0 and W % window_w == 0;
    mask: (B, H, W) True = padding; bias: (n_heads, L, L) or None with
    L = window_h * window_w.  Returns the attention output map (B, H, W, C)
    (no residual).  Numerics mirror MultiheadAttention + _block_partition
    exactly (same where-based masking, f32 softmax, dtype casts).
    """
    b, h, w, c = x.shape
    wh, ww = window_h, window_w
    l = wh * ww
    dh = c // n_heads
    dt = x.dtype

    def part(t):
        t = t.reshape(b, h // wh, wh, w // ww, ww, t.shape[-1])
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, l, t.shape[-1])

    q = part(x + pos)
    xv = part(x)
    m = part(mask[..., None]).squeeze(-1)                     # (nW, L)
    all_dead = jnp.all(m, axis=1, keepdims=True)
    m = jnp.where(all_dead, jnp.zeros_like(m), m)

    def proj(t, kern, bias_):
        return (t @ kern.astype(dt)) + bias_.astype(dt)

    def split(t):
        nw = t.shape[0]
        return t.reshape(nw, l, n_heads, dh).transpose(0, 2, 1, 3)

    qh = split(proj(q, wq, bq))
    kh = split(proj(q, wk, bk))
    vh = split(proj(xv, wv, bv))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(dh, jnp.float32)).astype(dt)
    if bias is not None:
        logits = logits + bias[None].astype(logits.dtype)
    neg = jnp.asarray(_NEG, logits.dtype)
    logits = jnp.where(m[:, None, None, :], neg, logits)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    nw = out.shape[0]
    out = out.transpose(0, 2, 1, 3).reshape(nw, l, c)
    y = proj(out, wo, bo)
    y = y.reshape(b, h // wh, w // ww, wh, ww, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _kernel(x_ref, pos_ref, m_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, out_ref, *,
            wh: int, ww: int, wpp: int, n_heads: int, has_bias: bool):
    """One (batch, window-row, window-chunk): ``wpp`` windows end-to-end.

    x_ref/pos_ref: (1, wh, wpp*ww, C); m_ref: (1, 1, 1, wpp, L) f32 (1=pad,
    pre-partitioned in the wrapper — Mosaic cannot split the lane dim of
    the in-kernel mask reshape, and the mask is tiny anyway; the chunk
    axis is its own array dim so the block's last two dims always equal
    the array's, satisfying Mosaic's (8, 128)-or-full rule at ANY wpp —
    the (1, 1, wpp, L) layout failed lowering when wpp was neither a
    multiple of 8 nor the whole row, e.g. the flagship's grid-attention
    levels);
    w*_ref: (C, C); b*_ref: (1, C); bias_ref: (n_heads, L, L) f32.
    """
    c = x_ref.shape[-1]
    l = wh * ww
    dh = c // n_heads
    x = x_ref[0]                                       # (wh, wpp*ww, C)
    dt = x.dtype
    q_map = x + pos_ref[0]

    def part(t):                                       # -> (wpp, L, C)
        t = t.reshape(wh, wpp, ww, c).transpose(1, 0, 2, 3)
        return t.reshape(wpp, l, c)

    qw = part(q_map).reshape(wpp * l, c)
    xw = part(x).reshape(wpp * l, c)
    m = m_ref[0, 0, 0]                                 # (wpp, L)
    dead = jnp.min(m, axis=1, keepdims=True) > 0.5     # all keys padded
    m = jnp.where(dead, jnp.zeros_like(m), m)

    def proj(t2d, w_ref, b_ref):
        o = jnp.dot(t2d, w_ref[:].astype(dt),
                    preferred_element_type=jnp.float32)
        return o.astype(dt) + b_ref[0].astype(dt)

    qp = proj(qw, wq_ref, bq_ref)                      # (wpp*L, C)
    kp = proj(qw, wk_ref, bk_ref)
    vp = proj(xw, wv_ref, bv_ref)
    inv_scale = (1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))).astype(dt)
    neg = jnp.asarray(_NEG, dt)
    key_pad = (m > 0.5)[:, None, :]                    # (wpp, 1, L)
    # Static loop over heads: Mosaic supports one matmul batch dim and no
    # lane-splitting reshapes, so each head is a static 32-lane slice +
    # sublane-split reshape (probed supported).  The output projection
    # accumulates per head — concat(heads) @ Wo == sum_h head_h @ Wo_h.
    acc = jnp.zeros((wpp * l, c), jnp.float32)
    for hd in range(n_heads):
        sl = slice(hd * dh, (hd + 1) * dh)
        qh = qp[:, sl].reshape(wpp, l, dh)
        kh = kp[:, sl].reshape(wpp, l, dh)
        vh = vp[:, sl].reshape(wpp, l, dh)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt) * inv_scale
        if has_bias:
            logits = logits + bias_ref[hd][None].astype(dt)
        logits = jnp.where(key_pad, neg, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(dt)
        oh = jax.lax.dot_general(
            attn, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)  # (wpp, L, dh)
        acc = acc + jnp.dot(oh.reshape(wpp * l, dh),
                            wo_ref[sl, :].astype(dt),
                            preferred_element_type=jnp.float32)
    y = acc.astype(dt) + bo_ref[0].astype(dt)           # (wpp*L, C)
    y = y.reshape(wpp, wh, ww, c).transpose(1, 0, 2, 3)
    out_ref[0] = y.reshape(wh, wpp * ww, c)


def _forward(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias,
             n_heads: int, window_h: int, window_w: int, interpret: bool):
    b, h, w, c = x.shape
    wh, ww = window_h, window_w
    assert h % wh == 0 and w % ww == 0, (h, w, wh, ww)
    l = wh * ww
    n_win_w = w // ww
    wpp = pick_windows_per_program(n_win_w, n_heads, l)
    grid = (b, h // wh, n_win_w // wpp)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((1, 1, 1), jnp.float32)
    else:
        bias = bias.astype(jnp.float32)
    # pre-partition the mask to (B, nWh, nChunks, wpp, L): it is tiny (no
    # C axis), and the in-kernel lane-splitting reshape does not lower on
    # Mosaic; the explicit chunk axis keeps the block's last two dims
    # equal to the array's (Mosaic (8,128)-or-full rule) for any wpp
    mf = mask.astype(jnp.float32).reshape(b, h // wh, wh, n_win_w, ww)
    mf = mf.transpose(0, 1, 3, 2, 4).reshape(
        b, h // wh, n_win_w // wpp, wpp, l)

    def b2(v):                                          # (C,) -> (1, C)
        return v.reshape(1, -1)

    strip = pl.BlockSpec((1, wh, wpp * ww, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i, j, k: (0,) * len(shape), memory_space=pltpu.VMEM)
    flops_win = (3 * 2 * l * c * c + 2 * 2 * l * l * c + 2 * l * c * c)
    out = pl.pallas_call(
        functools.partial(_kernel, wh=wh, ww=ww, wpp=wpp, n_heads=n_heads,
                          has_bias=has_bias),
        grid=grid,
        in_specs=[
            strip, strip,
            pl.BlockSpec((1, 1, 1, wpp, l), lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            whole((c, c)), whole((1, c)), whole((c, c)), whole((1, c)),
            whole((c, c)), whole((1, c)), whole((c, c)), whole((1, c)),
            whole(bias.shape),
        ],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # let XLA fuse producers (the pad of x/pos/mask, LePE output)
            # into the kernel's input reads — the custom-call boundary
            # cost is exactly what inverted the decoder-scale MSDA kernel
            # win (PERF_NOTES round 4)
            allow_input_fusion=[True] * 12),
        cost_estimate=pl.CostEstimate(
            flops=b * (h // wh) * n_win_w * flops_win,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * (h // wh) * n_win_w * n_heads * l * l),
        interpret=interpret,
    )(x, pos, mf, wq, b2(bq), wk, b2(bk), wv, b2(bv), wo, b2(bo), bias)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def window_attention_pallas(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                            bias, n_heads: int, window_h: int,
                            window_w: int, interpret: bool = False):
    """Fused forward; signature/semantics match ``window_attention_xla``.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests)."""
    return _forward(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                    n_heads, window_h, window_w, interpret)


def _fwd(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias,
         n_heads, window_h, window_w, interpret):
    out = _forward(x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                   n_heads, window_h, window_w, interpret)
    return out, (x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias)


def _bwd(n_heads, window_h, window_w, interpret, residuals, g):
    x, pos, mask, wq, bq, wk, bk, wv, bv, wo, bo, bias = residuals
    diff = (x, pos, wq, bq, wk, bk, wv, bv, wo, bo) + (
        (bias,) if bias is not None else ())

    def f(*args):
        xx, pp = args[0], args[1]
        ws = args[2:10]
        bb = args[10] if bias is not None else None
        return window_attention_xla(xx, pp, mask, *ws, bb, n_heads,
                                    window_h, window_w)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(g)
    gx, gpos = grads[0], grads[1]
    gw = grads[2:10]
    gbias = grads[10] if bias is not None else None
    return (gx, gpos, None) + tuple(gw) + (gbias,)


window_attention_pallas.defvjp(_fwd, _bwd)


def grid_transpose(t: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, ...) -> block-transposed map where contiguous
    (H//win, W//win) windows are the MaxViT grid-attention groups.

    Element (b, i*nbh + a, j*nbw + bb) of the result is t[b, a*win + i,
    b*win + j] — grid attention on t == window attention on the result
    with window (nbh, nbw).  Requires H % win == 0 and W % win == 0.
    ``grid_untranspose`` inverts it."""
    b, h, w = t.shape[:3]
    nbh, nbw = h // win, w // win
    rest = t.shape[3:]
    t = t.reshape((b, nbh, win, nbw, win) + rest)
    t = t.transpose((0, 2, 1, 4, 3) + tuple(range(5, 5 + len(rest))))
    return t.reshape((b, win * nbh, win * nbw) + rest)


def grid_untranspose(t: jnp.ndarray, win: int) -> jnp.ndarray:
    """Inverse of ``grid_transpose``."""
    b, h, w = t.shape[:3]
    nbh, nbw = h // win, w // win
    rest = t.shape[3:]
    t = t.reshape((b, win, nbh, win, nbw) + rest)
    t = t.transpose((0, 2, 1, 4, 3) + tuple(range(5, 5 + len(rest))))
    return t.reshape((b, h, w) + rest)
