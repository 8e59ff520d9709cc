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

Implementation: ``ms_deform_attn_xla`` — one flattened PROMISE_IN_BOUNDS
``lax.gather`` covering every (level, point, corner) tap, one fused einsum
for bilinear lerp + attention weighting.  Fully differentiable through JAX
autodiff (gather grad = scatter-add).  A Pallas kernel is blocked on current
Mosaic gather support — see ``ops/msda_pallas.py`` and PERF_NOTES.md.

``spatial_shapes`` must be a static (python) tuple of (H, W) pairs — shapes
are compile-time constants on TPU by design.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _level_sample(value_l: jnp.ndarray, loc: jnp.ndarray,
                  h: int, w: int) -> jnp.ndarray:
    """Bilinearly sample one level.

    value_l: (B, H*W, M, D); loc: (B, Lq, M, P, 2) normalized [0,1] (x, y).
    Returns samples (B, Lq, M, P, D).

    All four corners of every tap go through ONE flattened
    ``lax.gather`` with PROMISE_IN_BOUNDS (indices are pre-clipped;
    out-of-bounds taps are zeroed through their weights) — measured ~25%
    faster than per-corner ``take_along_axis`` on v5e.
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

    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)   # (B,Lq,M,P,4)
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    wts = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                     (1 - fx) * fy, fx * fy], axis=-1)
    valid = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    rows = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)

    # flatten (batch, head, spatial) into one gather table
    table = jnp.transpose(value_l, (0, 2, 1, 3)).reshape(b * m * hw, d)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None, None]
    midx = jnp.arange(m, dtype=jnp.int32)[None, None, :, None, None]
    gidx = ((bidx * m + midx) * hw + rows).reshape(-1, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    g = jax.lax.gather(table, gidx, dn, slice_sizes=(1, d),
                       mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    g = g.reshape(b, lq, m, p, 4, d)
    # accumulate in the value dtype: f32 corner-lerp costs ~30% streaming FPS
    # in bf16 models; checkpoint-parity evaluations should set DTYPE=float32
    # to run the whole model in f32 instead
    wts = jnp.where(valid, wts, 0.0).astype(g.dtype)
    return jnp.einsum("blmpcd,blmpc->blmpd", g, wts)


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

    Per level, all taps x four bilinear corners go through ONE flattened
    PROMISE_IN_BOUNDS gather (see ``_level_sample``).  A fully level-merged
    single gather was measured *slower* end-to-end (3.09 vs 3.51 FPS): the
    merged (B,Lq,M,L,P,4,D) intermediate defeats fusion and raises HBM
    pressure, while the per-level loop lets XLA fuse each level's lerp into
    its gather consumer.
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
    """Dispatching entry point.  ``impl``: auto | pallas | xla.

    ``auto`` resolves by QUERY COUNT, on full-pipeline evidence (both
    directions measured on the chip, PERF_NOTES round 4):

    - decoder scale (Lq 364): the gather path WINS in-pipeline — flagship
      68.0 FPS (xla) vs 56.5 (pallas in the 6 decoder layers) despite the
      kernel's isolated 1.21x microbench win; XLA fuses the gathers with
      the surrounding projections, which the opaque custom-call boundary
      forbids.
    - encoder scale (Lq 6312 coarse / 25512 full): the query-tiled kernel
      WINS in-pipeline too — hybrid 32.7 FPS (pallas) vs 23.5 (xla),
      exact deformable-3L 9.1 vs 6.7 (BENCH_MSDA_IMPL A/B, session 6);
      at these sizes the gather floor (~4 Gelem/s) dominates anything
      fusion saves.

    The crossover sits between 364 and 6312 queries; ``auto`` uses
    Lq >= 2048 -> pallas (on TPU), else xla.  Explicit ``xla``/``pallas``
    remain full overrides.

    Provenance: the threshold was measured at BATCH 1 (flagship streaming
    inference).  The crossover is really about total gather volume
    (B * Lq), so large-batch decoder-scale work (e.g. SUBMIT_BATCH=8
    eval, B*Lq ~= 2912) may sit on the wrong side of the heuristic —
    both paths are parity-tested, so this costs speed only, never
    correctness.  Fold batch into the rule only if a measured A/B at
    batch>1 shows an inversion.
    """
    if impl == "auto":
        from .msda_pallas import pallas_supported
        lq = sampling_locations.shape[1]
        impl = "pallas" if (lq >= 2048 and pallas_supported()) else "xla"
    if impl == "pallas":
        from .msda_pallas import ms_deform_attn_pallas
        return ms_deform_attn_pallas(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                              attention_weights)
