"""Cold-compile cost of the train step: unrolled frames vs TRAIN_FRAME_SCAN.

VERDICT round-3 item 7: the clip loop is Python-unrolled per frame inside
one jit (engine/trainer.py clip_loss), so cold-compile time grows with the
clip length and eats campaign windows (~90 s windowed / ~4 min deformable
at proxy scale, ROUND3.md).  ``_clip_loss_scan`` (TRAIN_FRAME_SCAN) traces
the frame body once under ``lax.scan``; numerics equality is tested in
tests/test_trainer_scan.py.  This tool measures what the flag actually
buys: trace time + XLA compile time of the full train step (grads + AdamW)
at proxy-v2 scale, for clip lengths 3 and 5, scan off vs on, against a
FRESH compile-cache directory so every compile is genuinely cold.

Run on the chip (compiles go through the axon relay exactly like campaign
runs do).  Prints one JSON line per (clip, scan) cell.

Reference analogue being accelerated: the per-frame training loop in
/root/reference/train_engine.py:201-230.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# fresh cache dir => cold compiles (the point of the measurement)
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, W = 256, 320          # proxy-v2 canvas (tools/flagship_eval.py)
SLOTS, GTS = 24, 20


def config(clip_len: int, frame_scan: bool) -> dict:
    # proxy-v2 shape (tools/flagship_eval.py base_config), windowed encoder
    return {
        "DATASET": "DanceTrack", "HIDDEN_DIM": 64, "FFN_DIM": 256,
        "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 8, "NUM_ENC_POINTS": 4,
        "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": 3, "NUM_DEC_LAYERS": 3,
        "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": 40, "DROPOUT": 0.0,
        "USE_DAB": True, "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
        "USE_CHECKPOINT": False, "CHECKPOINT_LEVEL": 2, "AUX_LOSS": True,
        "MATCH_COST_CLASS": 2, "MATCH_COST_BBOX": 5, "MATCH_COST_GIOU": 2,
        "LOSS_WEIGHT_FOCAL": 2, "LOSS_WEIGHT_L1": 5, "LOSS_WEIGHT_GIOU": 2,
        "AUX_LOSS_WEIGHT": [1.0, 1.0], "TRACK_SLOTS": SLOTS, "MAX_GTS": GTS,
        "DTYPE": "float32", "MSDA_IMPL": "xla", "ENCODER_TYPE": "windowed",
        "LR": 2e-4, "LR_BACKBONE": 2e-5, "LR_POINTS": 2e-5,
        "WEIGHT_DECAY": 1e-4, "CLIP_MAX_NORM": 0.1,
        "LR_SCHEDULER": "MultiStep", "LR_DROP_MILESTONES": [8],
        "LR_DROP_RATE": 0.1, "ONLY_TRAIN_QUERY_UPDATER_AFTER": 999,
        "EXTRA_TRACK_ATTN": False, "TRAIN_FRAME_SCAN": frame_scan,
        "_clip": clip_len,
    }


def measure(clip_len: int, frame_scan: bool) -> dict:
    from memotr_tpu.engine.trainer import (group_lrs, init_train_state,
                                           label_tree, make_optimizer,
                                           make_train_step, static_config)
    from memotr_tpu.models.criterion import build_criterion
    from memotr_tpu.models.memotr import build_model
    from memotr_tpu.models.query_updater import build_query_updater
    from memotr_tpu.structures.track_state import TrackState

    cfg = config(clip_len, frame_scan)
    model = build_model(cfg)
    updater = build_query_updater(cfg)
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, SLOTS, 64, 1, use_dab=True)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W), bool),
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
    step = make_train_step(model, updater, criterion, optimizer, cs, labels)

    b, t = 1, clip_len
    rng_d = jax.random.PRNGKey(1)
    batch = {
        "images": jax.random.normal(rng_d, (b, t, H, W, 3)) * 0.2,
        "mask": jnp.zeros((b, t, H, W), bool),
        "gt_boxes": jnp.clip(
            jax.random.uniform(rng_d, (b, t, GTS, 4)) * 0.4 + 0.1,
            0.05, 0.9),
        "gt_ids": jnp.tile(jnp.arange(GTS, dtype=jnp.int32)[None, None],
                           (b, t, 1)),
        "gt_labels": jnp.zeros((b, t, GTS), jnp.int32),
        "gt_mask": jnp.ones((b, t, GTS), bool),
    }
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in group_lrs(cfg, 0).items()}

    t0 = time.perf_counter()
    lowered = step.lower(state, frozen, batch, jax.random.PRNGKey(2), lrs)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    # steady-state step time (the other half of the default decision:
    # lax.scan can block cross-frame fusion, so a compile-time win must
    # not buy a step-time regression).  The state is donated, so feed
    # each step from the previous one; the host fetch of a loss that
    # depends on the computation forces execution through the relay
    # (CLAUDE.md benchmarking rule).
    loss = None
    step_times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, logs = compiled(state, frozen, batch,
                               jax.random.PRNGKey(2 + i), lrs)
        loss = float(jax.device_get(logs["total_loss"]))
        step_times.append(time.perf_counter() - t0)
    return {"clip": clip_len, "frame_scan": frame_scan,
            "trace_s": round(t_trace, 2), "compile_s": round(t_compile, 2),
            "total_s": round(t_trace + t_compile, 2),
            "step_s": round(min(step_times[1:]), 3),
            "loss_finite": bool(jnp.isfinite(loss))}


def main():
    rows = []
    for clip_len in (3, 5):
        for frame_scan in (False, True):
            row = measure(clip_len, frame_scan)
            rows.append(row)
            print(json.dumps(row), flush=True)
    # paired summary
    for clip_len in (3, 5):
        off = next(r for r in rows
                   if r["clip"] == clip_len and not r["frame_scan"])
        on = next(r for r in rows
                  if r["clip"] == clip_len and r["frame_scan"])
        print(json.dumps({
            "clip": clip_len,
            "cold_compile_speedup": round(off["total_s"]
                                          / max(on["total_s"], 1e-9), 2),
            "step_slowdown": round(on["step_s"]
                                   / max(off["step_s"], 1e-9), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
