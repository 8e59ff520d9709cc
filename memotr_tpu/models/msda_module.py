"""MSDeformAttn layer: projections + sampling-location math around the op.

Mirrors the reference module (``/root/reference/models/ops/modules/ms_deform_attn.py:36-130``):

- value/output projections (xavier init) and sampling-offset /
  attention-weight heads (zero kernels),
- the directional-ring bias init of the offset head (ms_deform_attn.py:72-80),
- 2-d reference points: ``loc = ref + offset / (W_l, H_l)``  (:116-117),
- 4-d reference boxes:  ``loc = ref_xy + offset / P * ref_wh * 0.5`` (:119-120),
- softmax (or sigmoid) attention weights over levels x points.

Sampling locations and attention weights are computed in float32 regardless
of the compute dtype — bilinear tap positions are precision-sensitive.
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msda import ms_deform_attn


def ring_offset_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional ring init: head h points along angle 2*pi*h/M, scaled by
    point index (reference ms_deform_attn.py:72-80)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)      # (M, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    sigmoid_attn: bool = False
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, reference_points: jnp.ndarray,
                 src: jnp.ndarray, spatial_shapes: Tuple[Tuple[int, int], ...],
                 src_padding_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """query: (B, Lq, C); reference_points: (B, Lq, L, 2|4) in [0,1];
        src: (B, sum(HW), C); src_padding_mask: (B, sum(HW)) True=pad."""
        b, lq, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(src)
        if src_padding_mask is not None:
            value = jnp.where(src_padding_mask[..., None], 0.0, value)
        value = value.reshape(b, -1, m, d)

        offsets = nn.Dense(
            m * l * p * 2, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(ring_offset_bias(m, l, p)),
            name="sampling_offsets",
        )(query.astype(jnp.float32)).reshape(b, lq, m, l, p, 2)

        attn = nn.Dense(
            m * l * p, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query.astype(jnp.float32))
        if self.sigmoid_attn:
            attn = nn.sigmoid(attn).reshape(b, lq, m, l, p)
        else:
            attn = nn.softmax(attn.reshape(b, lq, m, l * p), axis=-1)
            attn = attn.reshape(b, lq, m, l, p)

        ref = reference_points.astype(jnp.float32)
        if ref.shape[-1] == 2:
            # normalize offsets by each level's (W, H)
            wh = jnp.asarray([[w_, h_] for (h_, w_) in spatial_shapes],
                             jnp.float32)                      # (L, 2) as (W, H)
            loc = ref[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]
        elif ref.shape[-1] == 4:
            loc = (ref[:, :, None, :, None, :2]
                   + offsets / p * ref[:, :, None, :, None, 2:] * 0.5)
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=self.impl)
        out = out.astype(self.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
