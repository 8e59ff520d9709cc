"""Pallas MSDA kernel — decoder-scale fused multi-scale deformable attention.

Replaces the XLA-gather path for the ~hundreds-of-queries decoder workload
(reference CUDA kernel: ms_deform_im2col_cuda.cuh:238-299; algorithmic
contract: ms_deform_attn_core_pytorch, ms_deform_attn_func.py:44-64).

Why not a gather kernel: Mosaic's ``tpu.dynamic_gather`` only gathers within
a single vreg, so a VMEM-table row gather is not expressible (PERF_NOTES.md).
This kernel reformulates bilinear sampling as TWO MXU matmuls with NO
gathers, x-interpolation first (sum_l H_l*D < sum_l W_l*D, so putting H in
the lane expansion halves the VPU work vs y-first):

1. **x-interpolation**: a tent-weight matrix ``OX (Q, W)`` — weight
   ``max(0, 1 - |px - w|)`` is exactly the bilinear pair ``(1-fx, fx)`` at
   ``floor(px), floor(px)+1`` and zero elsewhere, with the attention weight
   folded in — contracts against the level's value block laid out as
   ``(W, H*D)``: ``T = OX @ V`` x-lerps every query's sample for ALL rows h.
2. **y-selection**: the y tent weight is evaluated directly on the lane
   grid (``lane // D`` is the h coordinate), applied elementwise to ``T``,
   and the surviving ``(Q, H*D)`` product is reduced to ``(Q, D)`` by a
   matmul with a stacked-identity constant ``S[h*D+d, d] = 1`` — a strided
   lane reduction on the MXU.

Out-of-bounds samples need no special casing: the tent is zero outside
``(-1, size)``, and the half-in border corners hit zero-padded rows/lanes of
the value block, reproducing grid_sample's zero padding exactly.

ALL levels live in one ``pallas_call``: level blocks are stacked along the
sublane (W) axis and lane-padded to a common ``H*D`` width (zero-padded, see
above), so the per-call overhead (~0.1 ms each, measured) is paid once.  The
grid is ``(heads, query_tiles)``: the head's value block stays VMEM-resident
across its query tiles, queries are tiled at ``Q_TILE`` so the ``(P*Qt,
lanes)`` stage intermediates fit VMEM at ANY query count — this is what
makes the kernel feasible at the hybrid encoder's coarse-level scale
(~6.3k queries over strides 16/32/64, VERDICT.md round-3 #4), not just the
decoder's ~364.  Points are batched into the matmul rows (``P*Qt`` tall
tents) so each level-chunk costs ONE x-interp matmul and one y-reduction
matmul instead of ``P`` of each.  Batch is ``jax.vmap``.

Backward: ``custom_vjp`` whose backward is the VJP of the
numerically-identical XLA-gather implementation (``ms_deform_attn_xla`` —
torch-oracle parity-tested) — training uses exact gradients while streaming
inference gets the fused forward.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(loc_ref, aw_ref, val_ref, out_ref, *, shapes, d: int,
            lane_pads, w_starts, n_points: int, max_lanes: int):
    """One (head, query-tile): all levels, points batched into matmul rows.

    loc_ref: (1, L, P, Qt, 2) f32 [x, y] in [0, 1]
    aw_ref:  (1, L, P, Qt, 1) f32 attention weights
    val_ref: (1, sumW, HDmax)  value blocks stacked along sublanes,
             level l at rows [w_starts[l], +W_l), lanes [0, H_l*D) real,
             rest ZERO (makes border corners and pad lanes contribute 0)
    out_ref: (1, Qt, D) f32
    """
    qt = loc_ref.shape[3]
    pq = n_points * qt
    vdt = val_ref.dtype
    acc = jnp.zeros((qt, d), jnp.float32)

    for lid, (h, w) in enumerate(shapes):
        hd = lane_pads[lid]                       # padded H*D lane width
        ws = w_starts[lid]
        # stack the points along sublanes: ONE (P*Qt)-tall tent per level
        # feeds one matmul per lane chunk instead of P of them (better MXU
        # row utilization, P-fold fewer dot invocations)
        px = jnp.concatenate(
            [(loc_ref[0, lid, p_, :, 0] * w - 0.5)[:, None]
             for p_ in range(n_points)], axis=0)               # (P*Qt, 1)
        py = jnp.concatenate(
            [(loc_ref[0, lid, p_, :, 1] * h - 0.5)[:, None]
             for p_ in range(n_points)], axis=0)
        aw = jnp.concatenate(
            [aw_ref[0, lid, p_, :, :] for p_ in range(n_points)], axis=0)
        # Mosaic iota must be integer-typed
        wx = jax.lax.broadcasted_iota(
            jnp.int32, (pq, w), 1).astype(jnp.float32)
        # bilinear tent in x, attention weight folded in
        ox = jnp.maximum(1.0 - jnp.abs(px - wx), 0.0) * aw

        # chunk the H*D lane axis to bound the (P*Qt, lanes) intermediates;
        # stage-2 runs in the value dtype (the XLA path also casts its
        # bilinear weights to the value dtype, msda.py:83)
        for c0 in range(0, hd, max_lanes):
            cl = min(max_lanes, hd - c0)                   # lanes
            vblk = val_ref[0, ws:ws + w, c0:c0 + cl]       # (W, cl)
            # Mosaic requires 32-bit matmul accumulators; cast after
            t = jnp.dot(ox.astype(vdt), vblk,
                        preferred_element_type=jnp.float32
                        ).astype(vdt)                      # (P*Qt, cl)
            lane_h = jax.lax.broadcasted_iota(
                jnp.int32, (pq, cl), 1) // d + (c0 // d)
            oyl = jnp.maximum(
                1.0 - jnp.abs(py - lane_h.astype(jnp.float32)), 0.0)
            prod = t * oyl.astype(vdt)
            rows = jax.lax.broadcasted_iota(jnp.int32, (cl, d), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (cl, d), 1)
            sel = (rows % d == cols).astype(vdt)
            pacc = jnp.dot(prod, sel,
                           preferred_element_type=jnp.float32)  # (P*Qt, D)
            for p_ in range(n_points):
                acc = acc + pacc[p_ * qt:(p_ + 1) * qt]
    out_ref[0] = acc


# Query-tile size: bounds the kernel's (P*Qt, lanes) stage intermediates so
# VMEM use is flat in the query count (feasibility at encoder scales).  256
# rows x 512 lanes f32 x P=4 is ~2 MB per stage buffer.
_Q_TILE = 256


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             interpret: bool):
    b, hw, m, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert nl == len(spatial_shapes)
    if lq > _Q_TILE:
        q_tile = _Q_TILE
        qp = _round_up(lq, q_tile)
    else:
        q_tile = qp = _round_up(lq, 8)
    n_qt = qp // q_tile

    # (B, Lq, M, L, P, 2) -> (B, M, L, P, Qp, 2)
    loc = jnp.transpose(sampling_locations, (0, 2, 3, 4, 1, 5))
    loc = jnp.pad(loc.astype(jnp.float32),
                  ((0, 0),) * 4 + ((0, qp - lq), (0, 0)))
    aw = jnp.transpose(attention_weights, (0, 2, 3, 4, 1))[..., None]
    aw = jnp.pad(aw.astype(jnp.float32),
                 ((0, 0),) * 4 + ((0, qp - lq), (0, 0)))

    # stack level value blocks (W_l, H_l*D) along sublanes, zero lane-pad to
    # a common width (zero pad rows/lanes absorb border-corner taps)
    hd_max = _round_up(max(h * d for h, _ in spatial_shapes), 128)
    lane_pads, w_starts, blocks = [], [], []
    start = 0
    wsum = 0
    for (h, w) in spatial_shapes:
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        start += h * w
        # (B, H*W, M, D) -> (B, M, W, H*D); sublane-align each level's row
        # offset to 8 with zero rows (never referenced: the x tent only
        # materializes columns [0, W))
        w_pad = _round_up(w, 8)
        vl = value_l.reshape(b, h, w, m, d).transpose(0, 3, 2, 1, 4)
        vl = vl.reshape(b, m, w, h * d)
        blocks.append(jnp.pad(vl, ((0, 0), (0, 0), (0, w_pad - w),
                                   (0, hd_max - h * d))))
        # each level only reads its own (128-rounded) H*D lane width —
        # chunking over the full hd_max would quadruple small-level work
        lane_pads.append(_round_up(h * d, 128))
        w_starts.append(wsum)
        wsum += w_pad
    val = jnp.concatenate(blocks, axis=2)                 # (B, M, sumW, HDmax)

    # lane-chunk size: a multiple of D (the kernel derives each lane's h
    # coordinate as ``lane // d + c0 // d``) and of the 128-lane vreg width
    # whenever D allows it
    max_lanes = max(1, 512 // d) * d

    kern = functools.partial(
        _kernel, shapes=tuple(spatial_shapes), d=d,
        lane_pads=tuple(lane_pads), w_starts=tuple(w_starts), n_points=p,
        max_lanes=max_lanes)

    def run(val_b, loc_b, aw_b):
        return pl.pallas_call(
            kern,
            # query tiles innermost: the head's value block stays
            # VMEM-resident across its query tiles
            grid=(m, n_qt),
            in_specs=[
                pl.BlockSpec((1, nl, p, q_tile, 2),
                             lambda i, j: (i, 0, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nl, p, q_tile, 1),
                             lambda i, j: (i, 0, 0, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wsum, hd_max), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, qp, d), jnp.float32),
            interpret=interpret,
            # let XLA fuse the producer transposes/pads of loc/aw/value
            # (lines above) into the kernel's input reads — the opaque
            # custom-call boundary is what inverted the decoder-scale
            # microbench win in-pipeline (PERF_NOTES round-4 landing)
            compiler_params=None if interpret else pltpu.CompilerParams(
                allow_input_fusion=[True, True, True]),
        )(loc_b, aw_b, val_b)

    out = jax.vmap(run)(val, loc, aw)                     # (B, M, Qp, D)
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
