"""Sine position embedding over padded-image masks.

Math matches the reference's ``PositionEmbeddingSine``
(``/root/reference/models/position_embedding.py:10-47``): cumulative sums over
the *valid* (non-padding) region normalize coordinates to (0, 2*pi], and —
importantly — MeMOTR uses **temperature 20**, not DETR's 10000
(position_embedding.py:47).  Returns NHWC ``(B, H, W, 2*num_pos_feats)``; the
reference returns NCHW, but layout is an implementation detail and NHWC is the
TPU-native choice.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sine_position_embedding(mask: jnp.ndarray, num_pos_feats: int,
                            temperature: float = 20.0,
                            scale: float = 2 * np.pi) -> jnp.ndarray:
    """mask: (B, H, W) bool, True = padding. -> (B, H, W, 2*num_pos_feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y = jnp.cumsum(not_mask, axis=1)
    x = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    y = (y - 0.5) / (y[:, -1:, :] + eps) * scale
    x = (x - 0.5) / (x[:, :, -1:] + eps) * scale

    dim_i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_i = temperature ** (2.0 * jnp.floor(dim_i / 2.0) / num_pos_feats)
    pos_x = x[..., None] / dim_i                     # (B, H, W, F)
    pos_y = y[..., None] / dim_i
    # interleave sin(even) / cos(odd), matching the torch stack+flatten
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*x.shape, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*y.shape, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
