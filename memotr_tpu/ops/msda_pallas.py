"""Pallas MSDA kernel — decoder-scale fused multi-scale deformable attention.

Replaces the XLA-gather path for the ~hundreds-of-queries decoder workload
(reference CUDA kernel: ms_deform_im2col_cuda.cuh:238-299; algorithmic
contract: ms_deform_attn_core_pytorch, ms_deform_attn_func.py:44-64).

Why not a gather kernel: Mosaic's ``tpu.dynamic_gather`` only gathers within
a single vreg, so a VMEM-table row gather is not expressible (PERF_NOTES.md).
This kernel instead reformulates bilinear sampling as TWO MXU matmuls with
NO gathers:

1. **y-interpolation**: a one-hot-with-weights matrix ``OY (Q, H)`` (two
   nonzeros per row: ``1-fy`` at ``y0``, ``fy`` at ``y0+1``, attention weight
   folded in, out-of-bounds rows naturally zero because the compare never
   fires) contracts against the level's value block ``(H, W*D)``:
   ``Y = OY @ V`` gives every query its y-lerped row for ALL x positions.
2. **x-selection**: the x one-hot is expanded to the lane dimension
   (``OXL (Q, W*D)``, weights at lanes ``x*D..x*D+D``) and applied
   elementwise; the surviving ``(Q, W*D)`` product is reduced to ``(Q, D)``
   by a matmul with a stacked-identity constant ``S (W*D, D)``,
   ``S[w*D+d, d] = 1`` — a strided lane reduction on the MXU.

Per level the grid is ``(heads, points)``; each program owns one head's
value block and accumulates its point's contribution into the head's output
block (sequential TPU grid, ``p == 0`` initializes).  The W axis is chunked
to bound VMEM.  Levels are separate ``pallas_call``s (shapes differ), summed
on the outside; batch is ``jax.vmap``.

Backward: the kernel is wrapped in ``custom_vjp`` whose backward is the VJP
of the numerically-identical XLA-gather implementation (``ms_deform_attn_xla``
— torch-oracle parity-tested) — training uses exact gradients while
streaming inference gets the fused forward.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    """The fused kernel targets TPU; other backends use interpret mode."""
    return jax.default_backend() == "tpu"


def _pick_chunk(w: int, max_chunk: int = 64) -> int:
    for c in range(min(w, max_chunk), 0, -1):
        if w % c == 0:
            return c
    return w


def _level_kernel(loc_ref, aw_ref, val_ref, out_ref, *, h: int, w: int,
                  d: int, cw: int):
    """One (head, point) program: (Qp,) queries of one head, one point.

    loc_ref: (1, 1, Qp, 2) f32 [x, y] in [0, 1]
    aw_ref:  (1, 1, Qp, 1) f32 attention weights
    val_ref: (1, H, W*D)   value block of this head
    out_ref: (1, Qp, D)    f32, accumulated over the point grid axis
    """
    p = pl.program_id(1)
    qp = loc_ref.shape[2]
    loc = loc_ref[0, 0]                                   # (Qp, 2)
    aw = aw_ref[0, 0, :, 0]                               # (Qp,)

    # grid_sample(align_corners=False) pixel coords (msda.py:53-61)
    px = loc[:, 0] * w - 0.5
    py = loc[:, 1] * h - 0.5
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = (px - x0f)[:, None]                              # (Qp, 1)
    fy = (py - y0f)[:, None]
    x0 = x0f.astype(jnp.int32)[:, None]
    y0 = y0f.astype(jnp.int32)[:, None]

    # y one-hot with bilinear weights and the attention weight folded in;
    # OOB y0/y1 never match the iota -> rows vanish (zero-padding semantics)
    hy = jax.lax.broadcasted_iota(jnp.int32, (qp, h), 1)
    oy = (jnp.where(hy == y0, 1.0 - fy, 0.0)
          + jnp.where(hy == y0 + 1, fy, 0.0)) * aw[:, None]

    vdt = val_ref.dtype
    # x one-hot expanded to lanes: weight of column x lives at lanes
    # [x*D, (x+1)*D); compare against lane//D
    acc = jnp.zeros((qp, d), jnp.float32)
    # stacked identity S (CW*D, D): S[w*D+dd, dd] = 1  (lane regrouping)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cw * d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cw * d, d), 1)
    sel = (rows % d == cols).astype(vdt)

    for wc in range(0, w, cw):
        vblk = val_ref[0, :, wc * d:(wc + cw) * d]        # (H, CW*D)
        y_blk = jnp.dot(oy.astype(vdt), vblk,
                        preferred_element_type=jnp.float32)   # (Qp, CW*D)
        lane_x = jax.lax.broadcasted_iota(
            jnp.int32, (qp, cw * d), 1) // d + wc
        oxl = (jnp.where(lane_x == x0, 1.0 - fx, 0.0)
               + jnp.where(lane_x == x0 + 1, fx, 0.0))
        prod = (y_blk * oxl).astype(vdt)
        acc = acc + jnp.dot(prod, sel,
                            preferred_element_type=jnp.float32)

    @pl.when(p == 0)
    def _():
        out_ref[0] = acc

    @pl.when(p > 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _level_pallas(value_l, loc_l, aw_l, h: int, w: int,
                  interpret: bool) -> jnp.ndarray:
    """value_l: (M, H, W*D); loc_l: (M, P, Qp, 2); aw_l: (M, P, Qp, 1).
    Returns (M, Qp, D) f32."""
    m, _, wd = value_l.shape
    d = wd // w
    _, p, qp, _ = loc_l.shape
    cw = _pick_chunk(w)
    kern = functools.partial(_level_kernel, h=h, w=w, d=d, cw=cw)
    return pl.pallas_call(
        kern,
        grid=(m, p),
        in_specs=[
            pl.BlockSpec((1, 1, qp, 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qp, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, qp, d), jnp.float32),
        interpret=interpret,
    )(loc_l, aw_l, value_l)


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             interpret: bool):
    b, hw, m, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert nl == len(spatial_shapes)
    qp = -(-lq // 8) * 8                                  # sublane-pad queries

    loc = jnp.transpose(sampling_locations, (0, 2, 4, 1, 3, 5))
    loc = jnp.pad(loc.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, 0), (0, qp - lq), (0, 0), (0, 0)))
    aw = jnp.transpose(attention_weights, (0, 2, 4, 1, 3))
    aw = jnp.pad(aw.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, 0), (0, qp - lq), (0, 0)))

    out = jnp.zeros((b, m, qp, d), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        # (B, H*W, M, D) -> (B, M, H, W*D)
        value_l = jnp.transpose(value_l, (0, 2, 1, 3)).reshape(
            b, m, h, w * d)
        run = functools.partial(_level_pallas, h=h, w=w, interpret=interpret)
        out = out + jax.vmap(run)(value_l, loc[..., lid, :],
                                  aw[..., lid, None])
    out = jnp.transpose(out[:, :, :lq], (0, 2, 1, 3))     # (B, Lq, M, D)
    return out.reshape(b, lq, m * d).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, interpret: bool = False):
    """Fused forward; signature matches ``ms_deform_attn_xla``.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights, interpret)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights,
         interpret):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights, interpret)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, interpret, residuals, g):
    from .msda import ms_deform_attn_xla
    value, loc, aw = residuals
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, aw)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
