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

Round-5 XLA-path restructure (VERDICT r4 #6 — same math, same param tree,
parity-pinned by tests/test_windowed_encoder_opt.py):

- the window/grid partitions of the position embeddings and padding masks
  are layer-invariant: built ONCE per encoder forward
  (``make_attention_ctx``) and shared by every layer of that mode — and
  the per-layer query partition is computed once and reused for both the
  q and k/v streams (previously 3 partition transposes per level per
  layer, now 1);
- window-mode levels all share block length L = P*P and one bias table, so
  their attention runs as ONE batched call across levels (grid-mode block
  lengths differ per level and stay per-level);
- the residual + FFN tail is pointwise per token and runs once on the
  flattened all-level token axis instead of per level;
- the CPB bias tables depend only on parameters: when a ``cpb_cache``
  collection is present in the variables (attach via
  ``models/eval_cache.attach_eval_cache`` — streaming eval only), layers
  skip the per-frame MLP+gather recompute (~0.18 ms/layer, PERF_NOTES.md).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

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


def _partition_x(x: jnp.ndarray, win: int, grid: bool):
    """(B, H, W, C) -> (B*nW, L, C) window/grid blocks.

    ``grid=False``: contiguous PxP windows (L = P*P).  ``grid=True``: the
    transposed (MaxViT) decomposition — groups are strided positions,
    members span the whole map at stride P (L = ceil(H/P)*ceil(W/P)).
    Pads H/W to multiples of ``win``."""
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    x = x.reshape(b, hh // win, win, ww // win, win, c)
    if grid:
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * win * win, (hh // win) * (ww // win), c)
    else:
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
    return x, (hh, ww)


def _partition_m(m: jnp.ndarray, win: int, grid: bool) -> jnp.ndarray:
    """(B, H, W) bool -> (B*nW, L) key-padding mask (padding tokens True)."""
    b, h, w = m.shape
    ph, pw = (-h) % win, (-w) % win
    m = jnp.pad(m, ((0, 0), (0, ph), (0, pw)), constant_values=True)
    hh, ww = h + ph, w + pw
    m = m.reshape(b, hh // win, win, ww // win, win)
    if grid:
        return m.transpose(0, 2, 4, 1, 3).reshape(
            b * win * win, (hh // win) * (ww // win))
    return m.transpose(0, 1, 3, 2, 4).reshape(-1, win * win)


def _block_partition(x: jnp.ndarray, mask: jnp.ndarray, win: int,
                     grid: bool):
    """(B, H, W, C) -> (B*nW, L, C) + key-padding mask (combined helper,
    kept for ops/window_attn.py parity tests)."""
    xw, hw = _partition_x(x, win, grid)
    return xw, _partition_m(mask, win, grid), hw


def _pad_hw(h: int, w: int, win: int) -> Tuple[int, int]:
    return h + (-h) % win, w + (-w) % win


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


def make_attention_ctx(poss: List[jnp.ndarray], masks: List[jnp.ndarray],
                       win: int, grid: bool) -> dict:
    """Layer-invariant attention context for one partition mode, built ONCE
    per encoder forward and shared by every layer of that mode (the pos and
    mask re-partitions were 2 of the 3 partition transposes per level per
    layer — VERDICT r4 #6):

    - ``pos``: per-level partitioned position embeddings, kept in float32
      (cast to the stream dtype at the add, matching the per-layer math);
    - ``mask``: per-level partitioned key-padding masks with the
      fully-masked-group escape pre-applied (a group of only padding
      tokens would NaN the softmax; one dummy key is opened — its outputs
      are padding and never read).

    Padded (hh, ww) shapes are NOT carried here: they are static and
    re-derived from level shapes in the layer (``_pad_hw``), so the ctx
    stays a pure array pytree (safe through ``nn.remat``)."""
    pos_parts, mask_parts = [], []
    for pos, m in zip(poss, masks):
        pw_, _ = _partition_x(pos, win, grid)
        mw_ = _partition_m(m, win, grid)
        all_dead = jnp.all(mw_, axis=1, keepdims=True)
        mask_parts.append(jnp.where(all_dead, jnp.zeros_like(mw_), mw_))
        pos_parts.append(pw_)
    return {"pos": tuple(pos_parts), "mask": tuple(mask_parts)}


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
                 shared_bias: Any = None, attn_ctx: Optional[dict] = None):
        """levels: per-level (B, H_l, W_l, C); masks: (B, H_l, W_l) True=pad.

        ``shared_bias``: optional per-level list of precomputed (H, L, L)
        relative-position bias tables — either the parent encoder's
        shared-CPB tables (WINDOWED_SHARED_CPB: one CPB MLP evaluated once
        per forward) or the cross-frame ``cpb_cache`` constants
        (models/eval_cache.py).  ``attn_ctx``: optional precomputed
        partition context from ``make_attention_ctx`` (built internally
        when None, e.g. from the hybrid encoder's per-layer call).

        With ``dropout > 0`` the batched/flattened attention+FFN calls
        consume RNG in a different per-level pattern than the historical
        per-level calls (same distribution, different masks); all shipped
        configs train at dropout 0."""
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
        win = self.window
        b = levels[0].shape[0]

        if use_fused:
            # fused one-pass kernel: pad to window multiples, (grid mode:
            # block-transpose so groups become contiguous windows), run,
            # crop.  Same math as the XLA path — parity in
            # tests/test_window_attn.py.  Kept per-level and self-contained
            # (an opt-in path; the in-pipeline A/B decided against it).
            out = []
            for lvl, (x, m, pos) in enumerate(zip(levels, masks, poss)):
                _, h, w, _ = x.shape
                if lepe is not None:
                    xz = jnp.where(m[..., None], 0.0, x)
                    x = x + lepe(xz)
                xa = norm1(x).astype(x.dtype) if self.prenorm else x
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
            return cross_level_fuse(out, topdown,
                                    bottomup if self.use_bottomup else None,
                                    self.dtype)

        # ---- XLA path ----------------------------------------------------
        if attn_ctx is None:
            attn_ctx = make_attention_ctx(poss, masks, win, self.grid)

        # local positional mixing; zero padded pixels so the conv does not
        # smear padding into the valid region
        xs = []
        for x, m in zip(levels, masks):
            if lepe is not None:
                xz = jnp.where(m[..., None], 0.0, x)
                x = x + lepe(xz)
            xs.append(x)

        if shared_bias is not None:
            biases = list(shared_bias)
        elif self.use_relpos:
            if self.grid:
                biases = [relpos_bias(hh // win, ww // win, win)
                          for (hh, ww) in
                          (_pad_hw(x.shape[1], x.shape[2], win) for x in xs)]
            else:
                # level-independent table (member grid is always win x win)
                biases = [relpos_bias(win, win, 1)] * len(xs)
        else:
            biases = [None] * len(xs)

        xa_maps = [norm1(x).astype(x.dtype) if self.prenorm else x
                   for x in xs]
        ys = []
        if not self.grid:
            # every level shares L = win*win and one bias table: one
            # attention call over the concatenated window batch
            parts = [_partition_x(xa, win, False)[0] for xa in xa_maps]
            sizes = [p.shape[0] for p in parts]
            xw = jnp.concatenate(parts, axis=0)
            qw = jnp.concatenate(
                [p + pp.astype(p.dtype)
                 for p, pp in zip(parts, attn_ctx["pos"])], axis=0)
            mw = jnp.concatenate(attn_ctx["mask"], axis=0)
            aw = attn(qw, qw, xw, key_padding_mask=mw,
                      deterministic=deterministic, attn_bias=biases[0])
            for sp, x in zip(jnp.split(aw, list(np.cumsum(sizes))[:-1],
                                       axis=0), xs):
                h, w = x.shape[1], x.shape[2]
                ys.append(_block_merge(sp, _pad_hw(h, w, win), b, h, w,
                                       win, False))
        else:
            for xa, pp, mw, bias_l, x in zip(xa_maps, attn_ctx["pos"],
                                             attn_ctx["mask"], biases, xs):
                xw, hw_pad = _partition_x(xa, win, True)
                qw = xw + pp.astype(xw.dtype)
                aw = attn(qw, qw, xw, key_padding_mask=mw,
                          deterministic=deterministic, attn_bias=bias_l)
                ys.append(_block_merge(aw, hw_pad, b, x.shape[1], x.shape[2],
                                       win, True))

        # residual + FFN: pointwise per token — once over the flattened
        # all-level token axis (identical math to the per-level form)
        c = xs[0].shape[-1]
        xf = jnp.concatenate([x.reshape(b, -1, c) for x in xs], axis=1)
        yf = jnp.concatenate([y.reshape(b, -1, c) for y in ys], axis=1)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.prenorm:
            xf = xf + drop(yf)
            f = lin2(drop(nn.relu(lin1(norm2(xf).astype(xf.dtype)))))
            xf = xf + drop(f)
        else:
            xf = norm1(xf + drop(yf))
            f = lin2(drop(nn.relu(lin1(xf))))
            xf = norm2(xf + drop(f))
        out, start = [], 0
        for x in xs:
            h, w = x.shape[1], x.shape[2]
            out.append(xf[:, start:start + h * w].reshape(b, h, w, c))
            start += h * w

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
        # tables depend only on params, so recomputing them per frame is
        # pure overhead — when the collection is present, every layer gets
        # its tables as shared_bias and skips the MLP+gather
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

        # layer-invariant partitioned pos/mask contexts, one per attention
        # mode, shared by every layer of that mode (VERDICT r4 #6)
        win_ctx = make_attention_ctx(poss, masks, self.window, grid=False)
        grid_ctx = (make_attention_ctx(poss, masks, self.window, grid=True)
                    if self.num_layers > 1 else None)

        layer_cls = WindowedEncoderLayer
        if self.use_checkpoint:
            # static_argnums counts self as 0 (flax linen subtracts 1
            # before the core lift): 4 = ``deterministic``.  shared_bias
            # (5) and attn_ctx (6) stay dynamic — they carry traced arrays
            # under shared_cpb / cpb_cache.
            layer_cls = nn.remat(WindowedEncoderLayer, static_argnums=(4,))
        for i in range(self.num_layers):
            grid = i % 2 == 1
            if cpb_const is not None:
                sb = list(cpb_const[i])
            elif self.shared_cpb and self.use_relpos:
                sb = grid_bias if grid else win_bias
            else:
                sb = None
            levels = layer_cls(self.d_model, self.d_ffn, self.n_heads,
                               self.window, grid=grid,
                               use_lepe=self.use_lepe,
                               use_bottomup=self.use_bottomup,
                               use_relpos=self.use_relpos,
                               prenorm=self.prenorm,
                               attn_impl=self.attn_impl,
                               dropout=self.dropout, dtype=self.dtype,
                               name=f"layer_{i}")(
                levels, masks, poss, deterministic, sb,
                grid_ctx if grid else win_ctx)
        if self.prenorm:
            final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="final_norm")
            levels = [final(lv).astype(lv.dtype) for lv in levels]
        return jnp.concatenate(
            [lv.reshape(b, -1, c) for lv in levels], axis=1)
