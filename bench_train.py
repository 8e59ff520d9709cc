"""Training-step throughput + memory on one chip at the reference's shape.

Measures the full compiled train step (forward over a clip + criterion +
in-graph Hungarian + grads + AdamW) at the reference's per-GPU training
shape: batch 1, 768x1408 canvas, remat on — the TPU analogue of the
reference's 8-GPU batch-1 setup (/root/reference/README.md:102-108, which
reports ~10 GB/GPU at clip 2 and >30 GB at the clip-5 final stage).

Usage: ``python bench_train.py [windowed|deformable]`` (default: windowed —
the TPU-native flagship encoder).  ``BENCH_CLIP`` overrides the clip length
(default 2; the reference's DanceTrack curriculum ends at 5 —
SAMPLE_LENGTHS in configs/train_dancetrack.yaml).  Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where value is seconds/iter,
plus a second line with the XLA memory analysis of the compiled step
(argument/output/temp/peak bytes) so the train-memory row vs the
reference's GPU numbers is a committed measurement, not an estimate.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


import os as _os

# encoder depth defaults to the flagship shape (3 windowed layers,
# configs/train_dancetrack_windowed.yaml); BENCH_LAYERS overrides for A/B.
# Recorded PERF_NOTES numbers: 0.187 s/iter was the round-2 6-layer shape.
_N_ENC_LAYERS = int(_os.environ.get("BENCH_LAYERS", "3"))
_CLIP = int(_os.environ.get("BENCH_CLIP", "2"))


def config(encoder_type: str) -> dict:
    return {
        "DATASET": "DanceTrack", "HIDDEN_DIM": 256, "FFN_DIM": 2048,
        "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 8, "NUM_ENC_POINTS": 4,
        "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": _N_ENC_LAYERS,
        "NUM_DEC_LAYERS": 6,
        "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": 300, "DROPOUT": 0.0,
        "USE_DAB": True, "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
        "USE_CHECKPOINT": True, "CHECKPOINT_LEVEL": 2, "AUX_LOSS": True,
        "MATCH_COST_CLASS": 2, "MATCH_COST_BBOX": 5, "MATCH_COST_GIOU": 2,
        "LOSS_WEIGHT_FOCAL": 2, "LOSS_WEIGHT_L1": 5, "LOSS_WEIGHT_GIOU": 2,
        "AUX_LOSS_WEIGHT": [1.0] * 5, "TRACK_SLOTS": 64, "MAX_GTS": 128,
        "DTYPE": "bfloat16", "MSDA_IMPL": "auto", "ENCODER_TYPE": encoder_type,
        "LR": 2e-4, "LR_BACKBONE": 2e-5, "LR_POINTS": 1e-5,
        "WEIGHT_DECAY": 5e-4, "CLIP_MAX_NORM": 0.1,
        "LR_SCHEDULER": "MultiStep", "LR_DROP_MILESTONES": [12],
        "LR_DROP_RATE": 0.1, "ONLY_TRAIN_QUERY_UPDATER_AFTER": 100,
        "EXTRA_TRACK_ATTN": False,
    }


def main():
    encoder_type = sys.argv[1] if len(sys.argv) > 1 else "windowed"
    from memotr_tpu.engine.trainer import (group_lrs, init_train_state,
                                           label_tree, make_optimizer,
                                           make_train_step, static_config)
    from memotr_tpu.models.criterion import build_criterion
    from memotr_tpu.models.memotr import build_model
    from memotr_tpu.models.query_updater import build_query_updater
    from memotr_tpu.structures.track_state import TrackState

    cfg = config(encoder_type)
    model = build_model(cfg)
    updater = build_query_updater(cfg)

    b, t, h, w, g, s, c = 1, _CLIP, 768, 1408, 32, cfg["TRACK_SLOTS"], 256
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, s, c, 1, use_dab=True)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool),
        st.query_embed, st.ref_pts, st.mask)
    uvars = jax.jit(updater.init)(
        rng, st.query_embed, st.ref_pts, st.logits, st.boxes,
        st.output_embed, st.last_output, st.long_memory, st.mask)

    criterion = build_criterion(cfg)
    optimizer = make_optimizer(cfg)
    state = init_train_state(variables["params"], uvars["params"], optimizer)
    labels = label_tree(state.params)
    frozen = {"frozen": variables["frozen"]}
    cs = static_config(cfg, model, world_size=1)
    train_step = make_train_step(model, updater, criterion, optimizer, cs,
                                 labels)  # already jitted (donated arg 0)

    rng_d = jax.random.PRNGKey(1)
    batch = {
        "images": jax.random.normal(rng_d, (b, t, h, w, 3)) * 0.2,
        "mask": jnp.zeros((b, t, h, w), bool),
        "gt_boxes": jnp.clip(
            jax.random.uniform(rng_d, (b, t, g, 4)) * 0.4 + 0.1, 0.05, 0.9),
        "gt_ids": jnp.tile(jnp.arange(g, dtype=jnp.int32)[None, None],
                           (b, t, 1)),
        "gt_labels": jnp.zeros((b, t, g), jnp.int32),
        "gt_mask": jnp.ones((b, t, g), bool),
    }
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in group_lrs(cfg, 0).items()}

    # XLA memory analysis of the compiled step (exact, from the compiler —
    # works without executing).  The persistent compile cache shares the
    # compilation with the timed call below.
    mem = {}
    try:
        lowered = train_step.lower(
            state, frozen, batch, jax.random.PRNGKey(2), lrs)
        ma = lowered.compile().memory_analysis()
        if ma is not None:
            gib = 1024 ** 3
            mem = {
                "args_gib": round(ma.argument_size_in_bytes / gib, 3),
                "output_gib": round(ma.output_size_in_bytes / gib, 3),
                "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
                "code_gib": round(ma.generated_code_size_in_bytes / gib, 3),
            }
            mem["total_gib"] = round(sum(mem.values()), 3)
    except Exception as e:   # relay/backend may not expose the analysis
        mem = {"error": str(e)[:200]}

    # warmup / compile; host-fetch forces execution through the axon relay
    state, logs = train_step(state, frozen, batch, jax.random.PRNGKey(2), lrs)
    _ = float(jax.device_get(logs["total_loss"]))

    try:   # live HBM high-water mark, when the backend exposes it
        stats = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            mem["peak_hbm_gib"] = round(
                stats["peak_bytes_in_use"] / 1024 ** 3, 3)
    except Exception:
        pass

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, logs = train_step(state, frozen, batch,
                                 jax.random.PRNGKey(3 + i), lrs)
    _ = float(jax.device_get(logs["total_loss"]))  # chains all iterations
    spi = (time.perf_counter() - t0) / n_iters

    # reference trains ~1 s/iter-ish per GPU at this shape on V100/A100-class
    # hardware; report s/iter directly, vs_baseline = 1.0 s / spi
    print(json.dumps({
        "metric": f"train step s/iter ({encoder_type} encoder, "
                  f"{_N_ENC_LAYERS} enc layers, clip={_CLIP}, "
                  f"768x1408, batch 1, remat)",
        "value": round(spi, 3),
        "unit": "s/iter",
        "vs_baseline": round(1.0 / spi, 3),
    }))
    if mem:
        print(json.dumps({"memory_analysis": mem,
                          "note": "XLA-reported bytes for the compiled "
                                  "donated train step; reference trains "
                                  "~10 GB/GPU at clip 2 "
                                  "(README.md:102-108)"}))


if __name__ == "__main__":
    main()
