"""TPU-native encoder: alternating window/grid attention + cross-level fusion.

The reference encoder is multi-scale deformable self-attention — per-token
random-access gathers with no efficient exact TPU mapping (PERF_NOTES.md:
~54 ms/layer at 800x1536 vs <5 ms for dense block attention).  This module
is the TPU-first alternative for from-scratch training: same inputs/outputs
as the deformable ``Encoder`` so the rest of the model is unchanged, but the
computation is MXU-shaped:

- **local positional mixing**: a 3x3 depthwise conv residual per level
  (LePE/CPE-style) before attention — cheap VPU work that carries precise
  localization cues dense attention lacks;
- **window attention** (even layers): dense self-attention inside
  non-overlapping PxP blocks;
- **grid attention** (odd layers): dense self-attention across the strided
  grid — element (i, j) attends to all (i + a*P_h, j + b*P_w) — the MaxViT
  pattern; one window+grid pair gives every token a global receptive field
  with exact padding masks and none of the shifted-window roll/mask
  bookkeeping;
- **bidirectional cross-level fusion** per layer: top-down (upsampled
  coarser level, mixed and added) and bottom-up (2x2-avg-pooled finer
  level, mixed and added) — the cross-scale exchange that deformable
  attention's multi-level sampling provided;
- shared FFN, residuals and norms mirror the deformable encoder layer.

This changes the architecture (NOT checkpoint-compatible with the
reference); select it with ``ENCODER_TYPE: windowed``.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import MultiheadAttention


class _ProjParams(nn.Module):
    """Declares one Dense projection's params without computing — same
    names/initializers as ``nn.Dense``, so the fused-kernel path shares
    checkpoints with the ``MultiheadAttention`` path bit-for-bit."""
    d_model: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.linear.default_kernel_init,
                          (self.d_model, self.d_model))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.d_model,))
        return kern, bias


class _AttnParams(nn.Module):
    """Param-tree twin of ``MultiheadAttention`` (q/k/v/out projections)
    for the fused window-attention kernel (ops/window_attn.py)."""
    d_model: int

    @nn.compact
    def __call__(self):
        return [_ProjParams(self.d_model, name=n)()
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")]


def _block_partition(x: jnp.ndarray, mask: jnp.ndarray, win: int,
                     grid: bool):
    """(B, H, W, C) -> (B*nW, L, C) + key-padding mask.

    ``grid=False``: contiguous PxP windows.  ``grid=True``: the transposed
    (MaxViT) decomposition — groups are strided positions, attention spans
    the whole map at stride P.  Pads H/W to multiples of ``win`` (padding
    tokens masked)."""
    b, h, w, c = x.shape
    ph = (-h) % win
    pw = (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    m = jnp.pad(mask, ((0, 0), (0, ph), (0, pw)), constant_values=True)
    hh, ww = x.shape[1], x.shape[2]
    x = x.reshape(b, hh // win, win, ww // win, win, c)
    m = m.reshape(b, hh // win, win, ww // win, win)
    if grid:
        # groups = (win_pos_h, win_pos_w); members = (block_h, block_w)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * win * win, (hh // win) * (ww // win), c)
        m = m.transpose(0, 2, 4, 1, 3).reshape(
            b * win * win, (hh // win) * (ww // win))
    else:
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        m = m.transpose(0, 1, 3, 2, 4).reshape(-1, win * win)
    return x, m, (hh, ww)


def _relpos_table(n_h: int, n_w: int, scale: int) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Static relative-position geometry for an (n_h, n_w) member grid.

    Returns ``(coords, index)``: ``coords`` is the table of unique relative
    offsets, shape ((2*n_h-1)*(2*n_w-1), 2), log-scaled to ~[-1, 1]
    (Swin-v2 continuous-CPB normalization); ``index`` maps each (i, j)
    member pair to its table row, shape (L, L) with L = n_h*n_w.  ``scale``
    converts member units to feature-map pixels (1 for window attention,
    the window size for grid attention, whose members are whole blocks).
    All computed in numpy at trace time — shapes are static per level.
    """
    dy = np.arange(-(n_h - 1), n_h)[:, None] * scale
    dx = np.arange(-(n_w - 1), n_w)[None, :] * scale
    coords = np.stack(np.broadcast_arrays(dy, dx), axis=-1).reshape(-1, 2)
    coords = np.sign(coords) * np.log1p(np.abs(coords)) / np.log1p(1024.0)
    yy, xx = np.meshgrid(np.arange(n_h), np.arange(n_w), indexing="ij")
    mem = np.stack([yy.ravel(), xx.ravel()], axis=-1)        # (L, 2)
    rel = mem[:, None] - mem[None, :]                        # (L, L, 2)
    index = (rel[..., 0] + n_h - 1) * (2 * n_w - 1) + (rel[..., 1] + n_w - 1)
    return coords.astype(np.float32), index


def _cpb_bias(cpb1, cpb2, n_h: int, n_w: int, scale: int) -> jnp.ndarray:
    """Continuous position bias table for an (n_h, n_w) member grid:
    (H, L, L) with L = n_h*n_w (Swin-v2 CPB: MLP over log-scaled offsets,
    16*sigmoid bounding)."""
    coords, index = _relpos_table(n_h, n_w, scale)
    table = cpb2(nn.relu(cpb1(jnp.asarray(coords))))    # (T, H)
    table = 16.0 * nn.sigmoid(table)
    bias = table[jnp.asarray(index)]                    # (L, L, H)
    return bias.transpose(2, 0, 1)


def _block_merge(xw: jnp.ndarray, hw_pad: Tuple[int, int], b: int, h: int,
                 w: int, win: int, grid: bool) -> jnp.ndarray:
    hh, ww = hw_pad
    c = xw.shape[-1]
    if grid:
        x = xw.reshape(b, win, win, hh // win, ww // win, c)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, hh, ww, c)
    else:
        x = xw.reshape(b, hh // win, ww // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
    return x[:, :h, :w]


def cross_level_fuse(out: List[jnp.ndarray], topdown, bottomup,
                     dtype) -> List[jnp.ndarray]:
    """Bidirectional cross-level fusion: top-down (nearest-upsampled coarser
    level, mixed and added) then optional bottom-up (2x2-avg-pooled finer
    level) — the cross-scale exchange the reference encoder gets from
    multi-level deformable sampling (ms_deform_attn.py:108-120)."""
    fused = list(out)
    for i in range(len(fused) - 2, -1, -1):          # top-down
        up = jax.image.resize(fused[i + 1],
                              fused[i].shape[:1] + fused[i].shape[1:3]
                              + fused[i + 1].shape[-1:], method="nearest")
        fused[i] = fused[i] + topdown(up.astype(dtype))
    if bottomup is not None:
        for i in range(1, len(fused)):               # bottom-up
            src = fused[i - 1]
            th, tw = fused[i].shape[1], fused[i].shape[2]
            ph = (-src.shape[1]) % (2 * th) if src.shape[1] != 2 * th else 0
            pw = (-src.shape[2]) % (2 * tw) if src.shape[2] != 2 * tw else 0
            if ph or pw:
                src = jnp.pad(src, ((0, 0), (0, ph), (0, pw), (0, 0)))
            down = src.reshape(src.shape[0], th, src.shape[1] // th,
                               tw, src.shape[2] // tw, src.shape[-1])
            down = down.mean(axis=(2, 4))
            fused[i] = fused[i] + bottomup(down.astype(dtype))
    return fused


class WindowedEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_heads: int
    window: int = 8
    grid: bool = False            # False: window attention, True: grid attn
    use_lepe: bool = True         # 3x3 depthwise-conv positional residual
    use_bottomup: bool = True     # bottom-up cross-level fusion
    use_relpos: bool = True       # continuous relative position bias (CPB)
    relpos_hidden: int = 64
    prenorm: bool = False         # pre-norm residual blocks (stabler deep
    #                               stacks; post-norm mirrors the reference
    #                               encoder layer, deformable_encoder.py:63)
    attn_impl: str = "xla"        # "xla" | "pallas" | "auto" — the fused
    #                               one-pass kernel (ops/window_attn.py) vs
    #                               the MultiheadAttention formulation;
    #                               checkpoint-compatible either way
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray], masks: List[jnp.ndarray],
                 poss: List[jnp.ndarray], deterministic: bool = True,
                 shared_bias: Any = None):
        """levels: per-level (B, H_l, W_l, C); masks: (B, H_l, W_l) True=pad.

        ``shared_bias``: optional per-level list of precomputed (H, L, L)
        relative-position bias tables (WINDOWED_SHARED_CPB — one CPB MLP in
        the parent encoder, evaluated once and reused by every layer, saving
        the ~0.18 ms/layer table recompute, PERF_NOTES.md)."""
        impl = self.attn_impl
        if impl == "auto":
            # "auto" resolves to XLA: the in-pipeline A/B on hardware was
            # run and DECIDED against the fused kernel at the flagship
            # shape (53.5 vs 68.2 FPS warm, PERF_NOTES round-4 session 9)
            # despite its isolated microbench win — XLA fuses the attn
            # with the surrounding LePE/FFN, which the custom-call
            # boundary forbids.  "pallas" remains an explicit override.
            impl = "xla"
        # NOTE: use_fused must depend only on STATIC config (impl,
        # dropout), never on the runtime ``deterministic`` flag —
        # otherwise init/eval and train would declare different param
        # trees for the same module.  pallas + dropout>0 therefore uses
        # the XLA path in BOTH modes (the fused kernel has no dropout).
        use_fused = impl == "pallas" and self.dropout == 0.0
        if use_fused:
            from ..ops.window_attn import (grid_transpose, grid_untranspose,
                                           pallas_supported,
                                           window_attention_pallas)
            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = _AttnParams(
                self.d_model, name="win_attn")()
        else:
            attn = MultiheadAttention(self.n_heads, self.dropout,
                                      dtype=self.dtype, name="win_attn")
        if self.use_relpos and shared_bias is None:
            # Swin-v2-style continuous position bias: a small MLP maps
            # log-scaled relative offsets to per-head biases.  An MLP (not a
            # table) because grid-attention group shapes vary per level; one
            # MLP is shared across this layer's levels.
            cpb1 = nn.Dense(self.relpos_hidden, dtype=jnp.float32,
                            name="cpb_mlp1")
            cpb2 = nn.Dense(self.n_heads, use_bias=False, dtype=jnp.float32,
                            name="cpb_mlp2")

            def relpos_bias(n_h: int, n_w: int, scale: int) -> jnp.ndarray:
                return _cpb_bias(cpb1, cpb2, n_h, n_w, scale)     # (H, L, L)
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
                # local positional mixing; zero padded pixels so the conv
                # does not smear padding into the valid region
                xz = jnp.where(m[..., None], 0.0, x)
                x = x + lepe(xz)
            xa = norm1(x).astype(x.dtype) if self.prenorm else x
            if use_fused:
                # fused one-pass kernel: pad to window multiples, (grid
                # mode: block-transpose so groups become contiguous
                # windows), run, crop.  Same math as the branch below —
                # parity in tests/test_window_attn.py.
                win = self.window
                ph, pw = (-h) % win, (-w) % win
                xp = jnp.pad(xa, ((0, 0), (0, ph), (0, pw), (0, 0)))
                pp = jnp.pad(pos.astype(x.dtype),
                             ((0, 0), (0, ph), (0, pw), (0, 0)))
                mp = jnp.pad(m, ((0, 0), (0, ph), (0, pw)),
                             constant_values=True)
                hh, wwp = h + ph, w + pw
                interp = not pallas_supported()
                if self.grid:
                    nbh, nbw = hh // win, wwp // win
                    bias = (shared_bias[lvl] if shared_bias is not None
                            else relpos_bias(nbh, nbw, win)
                            if self.use_relpos else None)
                    yt = window_attention_pallas(
                        grid_transpose(xp, win), grid_transpose(pp, win),
                        grid_transpose(mp, win), wq, bq, wk, bk, wv, bv,
                        wo, bo, bias, self.n_heads, nbh, nbw, interp)
                    y = grid_untranspose(yt, win)[:, :h, :w]
                else:
                    bias = (shared_bias[lvl] if shared_bias is not None
                            else relpos_bias(win, win, 1)
                            if self.use_relpos else None)
                    y = window_attention_pallas(
                        xp, pp, mp, wq, bq, wk, bk, wv, bv, wo, bo, bias,
                        self.n_heads, win, win, interp)[:, :h, :w]
                drop = nn.Dropout(self.dropout, deterministic=deterministic)
                if self.prenorm:
                    x = x + drop(y)
                    f = lin2(drop(nn.relu(lin1(norm2(x).astype(x.dtype)))))
                    x = x + drop(f)
                else:
                    x = norm1(x + drop(y))
                    f = lin2(drop(nn.relu(lin1(x))))
                    x = norm2(x + drop(f))
                out.append(x)
                continue
            q = xa + pos.astype(x.dtype)
            qw, mw, hw_pad = _block_partition(q, m, self.window, self.grid)
            xw, _, _ = _block_partition(xa, m, self.window, self.grid)
            # fully-masked groups (all padding) would NaN the softmax; open
            # one dummy key — their outputs are padding and never read
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
            y = _block_merge(aw, hw_pad, b, h, w, self.window, self.grid)
            drop = nn.Dropout(self.dropout, deterministic=deterministic)
            if self.prenorm:
                x = x + drop(y)
                f = lin2(drop(nn.relu(lin1(norm2(x).astype(x.dtype)))))
                x = x + drop(f)
            else:
                x = norm1(x + drop(y))
                f = lin2(drop(nn.relu(lin1(x))))
                x = norm2(x + drop(f))
            out.append(x)

        return cross_level_fuse(out, topdown,
                                bottomup if self.use_bottomup else None,
                                self.dtype)


class WindowedEncoder(nn.Module):
    """Drop-in replacement for the deformable ``Encoder`` (same signature)."""
    num_layers: int
    d_model: int
    d_ffn: int
    n_heads: int
    window: int = 8
    use_lepe: bool = True
    use_bottomup: bool = True
    use_relpos: bool = True
    prenorm: bool = False
    shared_cpb: bool = False   # one CPB MLP for all layers; its two bias
    #                            tables (window + per-level grid) are
    #                            computed once per forward instead of per
    #                            layer (~0.18 ms/layer, PERF_NOTES.md)
    attn_impl: str = "xla"     # window-attention impl (WINDOWED_ATTN_IMPL)
    dropout: float = 0.0
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, padding_mask,
                 deterministic: bool = True):
        del valid_ratios
        b = src.shape[0]
        c = src.shape[-1]
        # un-flatten into per-level maps
        levels, masks, poss = [], [], []
        start = 0
        for (h, w) in spatial_shapes:
            sl = slice(start, start + h * w)
            levels.append(src[:, sl].reshape(b, h, w, c))
            masks.append(padding_mask[:, sl].reshape(b, h, w))
            poss.append(pos[:, sl].reshape(b, h, w, c))
            start += h * w

        # cross-frame CPB bias constants (streaming eval; eval_cache.py):
        # tables depend only on params; when the collection is present,
        # layers get them as shared_bias and skip the MLP+gather recompute
        cpb_const = None
        if self.use_relpos and self.has_variable("cpb_cache", "tables"):
            cpb_const = self.get_variable("cpb_cache", "tables")

        win_bias = grid_bias = None
        if self.use_relpos and self.shared_cpb and cpb_const is None:
            cpb1 = nn.Dense(64, dtype=jnp.float32, name="cpb_mlp1")
            cpb2 = nn.Dense(self.n_heads, use_bias=False, dtype=jnp.float32,
                            name="cpb_mlp2")
            w = self.window
            win_one = _cpb_bias(cpb1, cpb2, w, w, 1)
            win_bias = [win_one] * len(spatial_shapes)
            grid_bias = [_cpb_bias(cpb1, cpb2, (h + (-h) % w) // w,
                                   (ww + (-ww) % w) // w, w)
                         for (h, ww) in spatial_shapes]

        layer_cls = WindowedEncoderLayer
        if self.use_checkpoint:
            layer_cls = nn.remat(WindowedEncoderLayer, static_argnums=(4,))
        for i in range(self.num_layers):
            grid = i % 2 == 1
            levels = layer_cls(self.d_model, self.d_ffn, self.n_heads,
                               self.window, grid=grid,
                               use_lepe=self.use_lepe,
                               use_bottomup=self.use_bottomup,
                               use_relpos=self.use_relpos,
                               prenorm=self.prenorm,
                               attn_impl=self.attn_impl,
                               dropout=self.dropout, dtype=self.dtype,
                               name=f"layer_{i}")(
                levels, masks, poss, deterministic,
                list(cpb_const[i]) if cpb_const is not None else
                ((grid_bias if grid else win_bias)
                 if self.shared_cpb and self.use_relpos else None))
        if self.prenorm:
            final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="final_norm")
            levels = [final(lv).astype(lv.dtype) for lv in levels]
        return jnp.concatenate(
            [lv.reshape(b, -1, c) for lv in levels], axis=1)
