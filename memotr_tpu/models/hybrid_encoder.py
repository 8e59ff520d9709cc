"""Hybrid encoder: exact deformable attention on coarse levels, windowed
dense attention on fine levels.

Fourth encoder option (``ENCODER_TYPE: hybrid``).  Rationale: the exact
multi-scale deformable encoder (the reference's design,
/root/reference/models/deformable_encoder.py:21-131) wins on quality at small
data scale — its sparse-sampling prior is the right inductive bias — but its
random-access gathers are element-throughput-bound on TPU (~54 ms/layer at
800x1536, PERF_NOTES.md), and ~75% of the tokens (and hence gather work) live
in the single stride-8 level.  This encoder keeps the exact deformable
operator where it is affordable — the coarse levels (strides 16/32/64 by
default, ~6.3k of 25.5k tokens => ~4x cheaper per layer; set
``HYBRID_DEFORM_MIN_LEVEL: 2`` for strides 32/64 only, ~16x cheaper) — and
covers the fine level(s) with the TPU-native windowed/grid attention
(windowed_encoder.py).  Bidirectional cross-level fusion exchanges
information between the two groups every layer, so fine tokens still see the
deformably-mixed coarse context and vice versa.

Matches the sampling semantics of the reference CUDA kernel on the levels
where it runs (ms_deform_im2col_cuda.cuh:238-299 via ops/msda.py).
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from .encoder import EncoderLayer, encoder_reference_points
from .windowed_encoder import WindowedEncoderLayer, cross_level_fuse


class HybridEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_heads: int
    n_points: int
    n_coarse_levels: int
    window: int = 8
    grid: bool = False        # fine-level attention pattern for this layer
    use_lepe: bool = True
    use_relpos: bool = True
    prenorm: bool = False
    use_bottomup: bool = True
    attn_impl: str = "xla"    # fine-level window-attention impl
    dropout: float = 0.0
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray], masks: List[jnp.ndarray],
                 poss: List[jnp.ndarray], coarse_ref_pts: jnp.ndarray,
                 coarse_shapes, deterministic: bool = True):
        """levels/masks/poss: full pyramid (fine first); the last
        ``n_coarse_levels`` entries form the deformable group.
        coarse_ref_pts: (B, N_coarse, L_coarse, 2) grid reference points."""
        n_fine = len(levels) - self.n_coarse_levels
        b = levels[0].shape[0]
        c = levels[0].shape[-1]

        # --- fine group: windowed/grid dense attention -----------------------
        fine = WindowedEncoderLayer(
            self.d_model, self.d_ffn, self.n_heads, self.window,
            grid=self.grid, use_lepe=self.use_lepe,
            use_bottomup=self.use_bottomup, use_relpos=self.use_relpos,
            prenorm=self.prenorm, attn_impl=self.attn_impl,
            dropout=self.dropout, dtype=self.dtype,
            name="fine")(levels[:n_fine], masks[:n_fine], poss[:n_fine],
                         deterministic)

        # --- coarse group: exact multi-scale deformable self-attention -------
        src = jnp.concatenate(
            [lv.reshape(b, -1, c) for lv in levels[n_fine:]], axis=1)
        pos = jnp.concatenate(
            [p.reshape(b, -1, c) for p in poss[n_fine:]], axis=1)
        pad = jnp.concatenate(
            [m.reshape(b, -1) for m in masks[n_fine:]], axis=1)
        src = EncoderLayer(self.d_model, self.d_ffn, self.n_coarse_levels,
                           self.n_heads, self.n_points, self.dropout,
                           self.msda_impl, self.dtype, name="coarse")(
            src, pos, coarse_ref_pts, coarse_shapes, pad, deterministic)
        coarse = []
        start = 0
        for (h, w) in coarse_shapes:
            coarse.append(src[:, start:start + h * w].reshape(b, h, w, c))
            start += h * w

        # --- cross-group exchange: bidirectional fusion over the pyramid -----
        topdown = nn.Dense(self.d_model, dtype=self.dtype, name="topdown_mix")
        bottomup = nn.Dense(self.d_model, dtype=self.dtype,
                            name="bottomup_mix") if self.use_bottomup else None
        return cross_level_fuse(fine + coarse, topdown, bottomup, self.dtype)


class HybridEncoder(nn.Module):
    """Drop-in replacement for the deformable ``Encoder`` (same signature)."""
    num_layers: int
    d_model: int
    d_ffn: int
    n_heads: int
    n_points: int = 4
    deform_min_level: int = 1      # levels >= this use exact deformable attn
    window: int = 8
    use_lepe: bool = True
    use_bottomup: bool = True
    use_relpos: bool = True
    prenorm: bool = False
    attn_impl: str = "xla"         # fine-level window-attention impl
    dropout: float = 0.0
    use_checkpoint: bool = False
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, padding_mask,
                 deterministic: bool = True):
        b = src.shape[0]
        c = src.shape[-1]
        n_fine = max(1, min(self.deform_min_level, len(spatial_shapes) - 1))
        levels, masks, poss = [], [], []
        start = 0
        for (h, w) in spatial_shapes:
            sl = slice(start, start + h * w)
            levels.append(src[:, sl].reshape(b, h, w, c))
            masks.append(padding_mask[:, sl].reshape(b, h, w))
            poss.append(pos[:, sl].reshape(b, h, w, c))
            start += h * w

        coarse_shapes = tuple(spatial_shapes[n_fine:])
        coarse_refs = encoder_reference_points(
            coarse_shapes, valid_ratios[:, n_fine:])

        layer_cls = HybridEncoderLayer
        if self.use_checkpoint:
            # static: coarse_shapes (python tuple), deterministic
            layer_cls = nn.remat(HybridEncoderLayer, static_argnums=(5, 6))
        for i in range(self.num_layers):
            levels = layer_cls(self.d_model, self.d_ffn, self.n_heads,
                               self.n_points, len(coarse_shapes),
                               window=self.window, grid=(i % 2 == 1),
                               use_lepe=self.use_lepe,
                               use_relpos=self.use_relpos,
                               prenorm=self.prenorm,
                               use_bottomup=self.use_bottomup,
                               attn_impl=self.attn_impl,
                               dropout=self.dropout,
                               msda_impl=self.msda_impl, dtype=self.dtype,
                               name=f"layer_{i}")(
                levels, masks, poss, coarse_refs, coarse_shapes,
                deterministic)
        if self.prenorm:
            final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="final_norm")
            levels = [final(lv).astype(lv.dtype) for lv in levels]
        return jnp.concatenate(
            [lv.reshape(b, -1, c) for lv in levels], axis=1)
