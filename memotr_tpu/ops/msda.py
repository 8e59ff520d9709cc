"""Multi-scale deformable attention — the framework's hot op.

Replaces the reference's CUDA extension
(``/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-299``)
with TPU-native implementations.  The algorithmic contract is the pure-torch
oracle ``ms_deform_attn_core_pytorch``
(``/root/reference/models/ops/functions/ms_deform_attn_func.py:44-64``):

    for each level l:  sample value_l at ``2*loc-1`` via bilinear
    ``grid_sample`` (padding zeros, align_corners=False), then
    ``sum(stack(samples) * attention_weights)`` over (levels x points).

With ``align_corners=False`` and grid ``g = 2*loc - 1``, the pixel-space
sample coordinate is ``loc * size - 0.5`` (pixel centers at integer+0.5
normalized positions) and out-of-bounds taps contribute zero — matching the
CUDA kernel's ``ms_deform_attn_im2col_bilinear``
(ms_deform_im2col_cuda.cuh:33-85, 285-286).

Two implementations:

- ``ms_deform_attn_xla``: gathers via ``take_along_axis``; XLA lowers these to
  TPU gather ops.  Fully differentiable through JAX autodiff (gather grad =
  scatter-add).  Used as the test oracle and as a fallback.
- ``ms_deform_attn_pallas`` (ops/msda_pallas.py): fused Pallas kernel keeping
  each level's value map in VMEM.

``spatial_shapes`` must be a static (python) tuple of (H, W) pairs — shapes
are compile-time constants on TPU by design.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_sample(value_l: jnp.ndarray, loc: jnp.ndarray,
                  h: int, w: int) -> jnp.ndarray:
    """Bilinearly sample one level.

    value_l: (B, H*W, M, D); loc: (B, Lq, M, P, 2) normalized [0,1] (x, y).
    Returns samples (B, Lq, M, P, D).
    """
    b, hw, m, d = value_l.shape
    _, lq, _, p, _ = loc.shape

    # grid_sample(align_corners=False) pixel coords.
    px = loc[..., 0] * w - 0.5                       # (B, Lq, M, P)
    py = loc[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0                                     # fractional offsets
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # (B, M, HW, D) so the gather axis is a single flattened spatial axis.
    v = jnp.transpose(value_l, (0, 2, 1, 3))

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        idx = jnp.transpose(idx, (0, 2, 1, 3)).reshape(b, m, lq * p)
        g = jnp.take_along_axis(v, idx[..., None], axis=2)   # (B, M, Lq*P, D)
        g = g.reshape(b, m, lq, p, d)
        wgt = jnp.where(valid, wgt, 0.0)
        wgt = jnp.transpose(wgt, (0, 2, 1, 3))               # (B, M, Lq, P)
        return g * wgt[..., None].astype(g.dtype)

    out = (corner(x0i,     y0i,     (1 - fx) * (1 - fy))
           + corner(x0i + 1, y0i,     fx * (1 - fy))
           + corner(x0i,     y0i + 1, (1 - fx) * fy)
           + corner(x0i + 1, y0i + 1, fx * fy))              # (B, M, Lq, P, D)
    return jnp.transpose(out, (0, 2, 1, 3, 4))               # (B, Lq, M, P, D)


def ms_deform_attn_xla(value: jnp.ndarray,
                       spatial_shapes: Tuple[Tuple[int, int], ...],
                       sampling_locations: jnp.ndarray,
                       attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful implementation using XLA gathers.

    value: (B, sum(H_l*W_l), M, D)
    spatial_shapes: static ((H0, W0), ...)
    sampling_locations: (B, Lq, M, L, P, 2) in [0,1]
    attention_weights: (B, Lq, M, L, P)
    Returns: (B, Lq, M*D)
    """
    b, _, m, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert nl == len(spatial_shapes)

    out = jnp.zeros((b, lq, m, d), value.dtype)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        samples = _level_sample(value_l, sampling_locations[:, :, :, lid], h, w)
        aw = attention_weights[:, :, :, lid].astype(samples.dtype)
        out = out + jnp.einsum("blmpd,blmp->blmd", samples, aw)
    return out.reshape(b, lq, m * d)


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights, impl: str = "auto"):
    """Dispatching entry point.  ``impl``: auto | pallas | xla."""
    if impl in ("pallas", "auto"):
        try:
            from .msda_pallas import ms_deform_attn_pallas, pallas_supported
            if impl == "pallas" or pallas_supported():
                return ms_deform_attn_pallas(
                    value, spatial_shapes, sampling_locations, attention_weights)
        except ImportError:
            if impl == "pallas":
                raise
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                              attention_weights)
