"""Pallas MSDA kernel — status and hardware analysis.

A fused Pallas kernel for multi-scale deformable attention requires an
arbitrary-index row gather from a VMEM-resident value table.  On current
Mosaic (jax 0.9 / v5e) that primitive does not exist:

- ``tpu.dynamic_gather`` (reached via equal-shape ``jnp.take_along_axis``
  inside a kernel) gathers only within a **single vreg** along the gather
  dimension — compiling against a real table fails with
  "Not implemented: Multiple source vregs along gather dimension"
  (verified on-chip; see PERF_NOTES.md).
- Scalar-prefetch-driven BlockSpec index_maps allow data-dependent DMA at
  *block* granularity, but MSDA needs ~13M independent 4-corner taps per
  encoder layer — per-tap DMA is descriptor-latency-bound by orders of
  magnitude.
- Reformulating the gather as one-hot MXU matmuls multiplies FLOPs by the
  table height (x19200 for level 0) — unviable.

The production path is therefore ``ms_deform_attn_xla`` (XLA gathers,
~4 Gelem/s element-bound on v5e), with sequence-parallel token sharding
(``TOKEN_SHARD_AXIS``) to divide the gather across chips, and a TPU-native
encoder redesign tracked in PERF_NOTES.md.  This module keeps the dispatch
seam: when Mosaic grows a cross-vreg gather, ``pallas_supported`` flips on
and the kernel drops in behind the same signature.
"""
from __future__ import annotations


def pallas_supported() -> bool:
    """Mosaic cannot express the cross-vreg gather MSDA needs (yet)."""
    return False


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    raise NotImplementedError(
        "Pallas MSDA is blocked on Mosaic's single-vreg dynamic_gather "
        "limit; see memotr_tpu/ops/msda_pallas.py and PERF_NOTES.md. "
        "Use MSDA_IMPL=xla (default fallback).")
