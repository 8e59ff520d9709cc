"""Microbench: XLA-gather vs query-tiled Pallas MSDA at the three scales.

Motivation (VERDICT round-3 #4): the hybrid encoder's coarse-level exact
MSDA costs ~13 ms/layer through the XLA gather path (~4 Gelem/s arbitrary-
index gather floor, PERF_NOTES.md), holding hybrid at 23.4 FPS — below the
3x-A100 north star (30 FPS).  The query-tiled Pallas kernel
(ops/msda_pallas.py) reformulates the op as MXU matmuls (~114 GFLOP/layer
at coarse scale) and is now VMEM-feasible at any query count; this tool
measures whether it clears the gap on the real chip.

Scales (800x1536 R50 pyramid; reference op contract
ms_deform_attn_func.py:44-64):
  decoder  — 364 queries x 4 levels (the round-2 parity result)
  coarse   — 6312 queries x 3 levels, strides 16/32/64 (the hybrid target)
  encoder  — 25512 queries x 4 levels (round-1 infeasible; now tiled)

Timing (CLAUDE.md): through the axon relay ``block_until_ready`` acks
before execution finishes, and per-jit-call dispatch is ~1.6 ms — so each
measurement runs K chained op instances inside ONE jit (fori_loop whose
carry perturbs the locations to defeat loop hoisting) and forces one host
fetch of a dependent scalar.

Usage: python tools/profile_msda.py [n_iters] [impl,impl,...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

SCALES = {
    "decoder": {"shapes": ((100, 192), (50, 96), (25, 48), (13, 24)),
                "lq": 364},
    "coarse": {"shapes": ((50, 96), (25, 48), (13, 24)), "lq": 6312},
    "encoder": {"shapes": ((100, 192), (50, 96), (25, 48), (13, 24)),
                "lq": 25512},
}
M, D, P = 8, 32, 4


def _matmul_gflops(shapes, lq, d=D, m=M, p=P) -> float:
    """FLOPs of the dense-matmul (Pallas) formulation, for achieved-TFLOPs."""
    from memotr_tpu.ops.msda_pallas import _Q_TILE, _round_up
    qp = _round_up(lq, _Q_TILE if lq > _Q_TILE else 8)
    fl = 0
    for h, w in shapes:
        hd = _round_up(h * d, 128)
        fl += 2 * p * qp * w * hd        # x-interp matmul
        fl += 2 * p * qp * hd * d        # y-reduction matmul
    return fl * m / 1e9


def time_impl(scale: str, impl: str, n_iters: int) -> float:
    from memotr_tpu.ops.msda import ms_deform_attn_xla
    from memotr_tpu.ops.msda_pallas import ms_deform_attn_pallas

    cfg = SCALES[scale]
    shapes, lq = cfg["shapes"], cfg["lq"]
    hw = sum(h * w for h, w in shapes)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    value = jax.random.normal(k1, (1, hw, M, D), jnp.bfloat16)
    loc = jax.random.uniform(k2, (1, lq, M, len(shapes), P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (1, lq, M, len(shapes) * P), jnp.float32)
    ).reshape(1, lq, M, len(shapes), P)

    def op(v, l, a):
        if impl == "pallas":
            return ms_deform_attn_pallas(v, shapes, l, a, False)
        return ms_deform_attn_xla(v, shapes, l, a)

    @jax.jit
    def run_k(v, l, a):
        def body(_, carry):
            acc, li = carry
            out = op(v, li, a)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            # loop-carried perturbation: defeats hoisting, negligible value
            return acc, li + acc * 1e-30
        acc, _ = jax.lax.fori_loop(
            0, n_iters, body, (jnp.float32(0.0), l))
        return acc

    float(run_k(value, loc, aw))          # compile + warm
    t0 = time.perf_counter()
    r = float(run_k(value, loc, aw))      # host fetch forces completion
    dt = (time.perf_counter() - t0) / n_iters
    assert r == r, "nan"
    return dt


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    impls = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["xla", "pallas"])
    rows = {}
    for scale in SCALES:
        for impl in impls:
            ms = time_impl(scale, impl, n_iters) * 1e3
            row = {"ms_per_layer": round(ms, 3)}
            if impl == "pallas":
                g = _matmul_gflops(SCALES[scale]["shapes"],
                                   SCALES[scale]["lq"])
                row["matmul_gflops"] = round(g, 1)
                row["achieved_tflops"] = round(g / ms, 1)
            rows[f"{scale}/{impl}"] = row
            print(json.dumps({f"{scale}/{impl}": row}), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
