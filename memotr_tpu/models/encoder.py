"""Deformable transformer encoder.

Behavioral spec: ``/root/reference/models/deformable_encoder.py:21-131``.
Each layer is MSDeformAttn self-attention (+pos embed on the query side only)
with residual+LayerNorm, then a linear-ReLU-linear FFN with residual+LayerNorm.
Per-level grid reference points are scaled by the batch's valid ratios
(deformable_encoder.py:28-40).

Gradient checkpointing is applied per-layer with ``nn.remat`` instead of the
reference's grouped-by-3 torch checkpointing (deformable_encoder.py:46-57) —
XLA rematerialization makes the grouping unnecessary.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


def encoder_reference_points(spatial_shapes: Tuple[Tuple[int, int], ...],
                             valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Per-token grid reference points, all levels flattened.

    valid_ratios: (B, L, 2) as (w_ratio, h_ratio).
    Returns (B, sum(HW), L, 2) in [0, 1] relative to the *valid* region,
    replicated across target levels (deformable_encoder.py:28-40).
    """
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([gx, gy], axis=-1))        # (B, HW, 2)
    ref = jnp.concatenate(refs, axis=1)                   # (B, N, 2)
    return ref[:, :, None] * valid_ratios[:, None]        # (B, N, L, 2)


class EncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.0
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 padding_mask, deterministic: bool = True):
        from .msda_module import MSDeformAttn
        q = src + pos.astype(src.dtype)
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            dtype=self.dtype, name="self_attn")(
            q, reference_points, src, spatial_shapes, padding_mask)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src)

        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        src = src + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src)
        return src


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.0
    use_checkpoint: bool = False
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, padding_mask,
                 deterministic: bool = True):
        reference_points = encoder_reference_points(spatial_shapes, valid_ratios)
        layer_cls = EncoderLayer
        if self.use_checkpoint:
            # static: spatial_shapes (python tuple), deterministic (bool);
            # flax counts `self` as argnum 0
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4, 6))
        out = src
        for i in range(self.num_layers):
            out = layer_cls(self.d_model, self.d_ffn, self.n_levels,
                            self.n_heads, self.n_points, self.dropout,
                            self.msda_impl, self.dtype, name=f"layer_{i}")(
                out, pos, reference_points, spatial_shapes, padding_mask,
                deterministic)
        return out
