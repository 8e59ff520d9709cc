"""Decompose the streaming frame step's on-chip time by component.

Times the full jitted eval step (make_eval_step: forward + lifecycle +
query updater) at the flagship shape under ablated layer counts; the
differences isolate per-component cost:

  full(6 enc, 6 dec)        - enc0(0 enc, 6 dec)  = encoder
  enc0(0 enc, 6 dec)        - enc0dec1(0 enc, 1 dec) = 5 decoder layers
  enc0dec1                  ~= backbone + projections + heads + updater floor

Timing caveat (CLAUDE.md): through the axon relay ``block_until_ready``
acks before execution finishes — every measurement loops K dispatches whose
state chains, then forces ONE host fetch of a dependent scalar.

Usage: python tools/profile_stream.py [windowed|deformable] [n_iters]
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


def time_step(encoder_type: str, n_enc: int, n_dec: int, n_iters: int,
              h: int = 800, w: int = 1536) -> float:
    from memotr_tpu.models.memotr import MeMOTR
    from memotr_tpu.models.query_updater import QueryUpdater
    from memotr_tpu.engine.submit import make_eval_step
    from memotr_tpu.structures.track_state import TrackState

    c, slots, n_det = 256, 64, 300
    model = MeMOTR(num_classes=1, n_det_queries=n_det, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=2048, n_heads=8, n_enc_layers=n_enc,
                   n_dec_layers=n_dec,
                   merge_det_track_layer=min(1, n_dec - 1), use_dab=True,
                   dtype=jnp.bfloat16, msda_impl="auto",
                   encoder_type=encoder_type)
    updater = QueryUpdater(hidden_dim=c, ffn_dim=2048, use_dab=True,
                           dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (1, h, w, 3), jnp.float32) * 0.5
    mask = jnp.zeros((1, h, w), bool)
    state = TrackState.empty(1, slots, c, 1, use_dab=True)
    params = jax.jit(model.init)(rng, images, mask, state.query_embed,
                                 state.ref_pts, state.mask)
    uparams = jax.jit(updater.init)(rng, state.query_embed, state.ref_pts,
                                    state.logits, state.boxes,
                                    state.output_embed, state.last_output,
                                    state.long_memory, state.mask)
    step = make_eval_step(model, updater, n_det, det_thresh=0.5,
                          track_thresh=0.5, miss_tolerance=30)
    results, state = step(params, uparams, images, mask, state)
    _ = float(jnp.sum(results["scores"]))        # compile + settle
    t0 = time.perf_counter()
    for _ in range(n_iters):
        results, state = step(params, uparams, images, mask, state)
    _ = float(jnp.sum(results["scores"]))        # dependent host fetch
    return (time.perf_counter() - t0) / n_iters


def time_backbone(n_iters: int, h: int = 800, w: int = 1536) -> float:
    """Backbone alone (R50, bf16, NHWC) at the flagship shape — splits the
    floor into backbone vs projections+PE+heads+updater."""
    from memotr_tpu.models.resnet import ResNet50

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (1, h, w, 3), jnp.float32) * 0.5
    model = ResNet50(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(rng, images.astype(jnp.bfloat16))

    @jax.jit
    def run(p, x, acc):
        feats = model.apply(p, (x + acc).astype(jnp.bfloat16))
        return acc + jnp.float32(feats[-1].mean()) * 1e-9

    acc = jnp.float32(0.0)
    acc = run(params, images, acc)
    _ = float(acc)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = run(params, images, acc)
    _ = float(acc)                               # dependent host fetch
    return (time.perf_counter() - t0) / n_iters


def main():
    encoder_type = sys.argv[1] if len(sys.argv) > 1 else "windowed"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    confs = {
        "full_6enc_6dec": (6, 6),
        "0enc_6dec": (0, 6),
        "0enc_1dec": (0, 1),
    }
    out = {}
    for name, (ne, nd) in confs.items():
        dt = time_step(encoder_type, ne, nd, n_iters)
        out[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt * 1e3:.2f} ms/frame", flush=True)
    bb = time_backbone(n_iters)
    out["backbone_only"] = round(bb * 1e3, 2)
    print(f"backbone_only: {bb * 1e3:.2f} ms/frame", flush=True)
    enc = out["full_6enc_6dec"] - out["0enc_6dec"]
    dec5 = out["0enc_6dec"] - out["0enc_1dec"]
    report = {
        "encoder_type": encoder_type,
        "ms_per_frame": out,
        "derived_ms": {
            "encoder_6layers": round(enc, 2),
            "decoder_5layers": round(dec5, 2),
            "decoder_per_layer": round(dec5 / 5, 2),
            "backbone_heads_updater_floor": out["0enc_1dec"],
            "proj_pe_heads_updater": round(out["0enc_1dec"]
                                           - out["backbone_only"], 2),
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
