"""Benchmark: streaming tracking FPS on one chip (flagship model, 800px).

Measures the full per-frame step — MeMOTR forward (R50 + 6+6 deformable
transformer, 300 det queries, 64 track slots) + runtime-tracker lifecycle +
long-term-memory query update — at the reference's eval resolution
(800 x 1536, seq_dataset.py:20-21), steady-state, on the available device.

Baseline: MOTR-family trackers at this resolution run ~= 9-10 FPS on an A100
(MeMOTR paper setup); BASELINE.json's north star is >= 3x that on one v5e.
``vs_baseline`` is FPS / 10.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_BASELINE_FPS = 10.0


def main():
    import sys

    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.models.query_updater import QueryUpdater
    from memotr_tpu.engine.submit import make_eval_step
    from memotr_tpu.structures.track_state import TrackState

    # "windowed" = the TPU-native flagship encoder (quality evidence:
    # tools/flagship_eval.py trains both variants head-to-head on synthetic
    # tracking data and scores HOTA through the real engines);
    # "exact" = the reference-faithful deformable encoder.
    # "windowed" / "exact" = per-frame streaming (latency mode, batch 1);
    # "serveN" (e.g. serve8) = batched serving throughput — N sequences in
    # lockstep, one TrackState lane each (engine/submit.py BatchedSubmitter)
    variant = sys.argv[1] if len(sys.argv) > 1 else "windowed"
    batch = 1
    if variant.startswith("serve"):
        batch = int(variant[5:] or 8)
        variant = f"windowed-serve{batch}"
        encoder_type = "windowed"
    else:
        encoder_type = variant if variant in ("windowed", "conv") \
            else "deformable"

    dtype = jnp.bfloat16
    c, slots, n_det = 256, 64, 300
    model = MeMOTR(num_classes=1, n_det_queries=n_det, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=2048, n_heads=8, n_enc_layers=6,
                   n_dec_layers=6, merge_det_track_layer=1, use_dab=True,
                   dtype=dtype, msda_impl="auto", encoder_type=encoder_type)
    updater = QueryUpdater(hidden_dim=c, ffn_dim=2048, use_dab=True,
                           dtype=dtype)

    h, w = 800, 1536
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, h, w, 3), jnp.float32) * 0.5
    mask = jnp.zeros((batch, h, w), bool)
    state = TrackState.empty(batch, slots, c, 1, use_dab=True)

    # jit the inits: eager init compiles hundreds of ops one-by-one through
    # the remote compile helper (~7 min); one jitted program is ~1 min
    params = jax.jit(model.init)(rng, images, mask, state.query_embed,
                                 state.ref_pts, state.mask)
    uparams = jax.jit(updater.init)(rng, state.query_embed, state.ref_pts,
                                    state.logits, state.boxes,
                                    state.output_embed, state.last_output,
                                    state.long_memory, state.mask)

    step = make_eval_step(model, updater, n_det, det_thresh=0.5,
                          track_thresh=0.5, miss_tolerance=30)

    # warmup / compile; a host fetch (not just block_until_ready) is required
    # because the axon relay acks dispatch before execution completes
    results, state = step(params, uparams, images, mask, state)
    _ = float(jnp.sum(results["scores"]))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        results, state = step(params, uparams, images, mask, state)
    # the state dependency chains all steps; one scalar fetch forces them
    _ = float(jnp.sum(results["scores"]))
    dt = (time.perf_counter() - t0) / n_iters
    fps = batch / dt

    print(json.dumps({
        "metric": f"streaming tracking FPS/chip "
                  f"({variant} encoder, R50, 800x1536, 64 slots)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
