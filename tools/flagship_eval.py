"""Windowed-vs-deformable quality evidence on synthetic tracking data.

The TPU-native windowed encoder (models/windowed_encoder.py) is an
architecture change vs the reference's deformable encoder, so reference
checkpoints say nothing about its quality.  This harness trains BOTH encoder
variants from scratch under identical data/seed/schedule on a synthetic
multi-object dataset (textured moving squares with crossing paths — both
detection and association matter), then submits + scores HOTA/DetA/AssA on a
held-out split through the real engines.

Usage:  python tools/flagship_eval.py [workdir] [epochs] [variants] [seed]
Writes <workdir>/flagship_eval.json and prints a one-line JSON summary.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, W = 256, 320
N_OBJ = 5


def make_synvalue(root: str, split: str, n_seqs: int, n_frames: int,
                  seed: int):
    """Textured background + moving textured squares, MOT-format GT."""
    import PIL.Image
    rng = np.random.default_rng(seed)
    for s in range(n_seqs):
        vdir = os.path.join(root, "DanceTrack", split, f"dancetrack{s:04d}")
        os.makedirs(os.path.join(vdir, "img1"), exist_ok=True)
        os.makedirs(os.path.join(vdir, "gt"), exist_ok=True)
        bg = rng.integers(40, 140, (H, W, 3), np.uint8)
        # object state: position, velocity, size, texture
        pos = rng.uniform([0, 0], [W - 60, H - 60], (N_OBJ, 2))
        vel = rng.uniform(-6, 6, (N_OBJ, 2))
        size = rng.integers(28, 52, (N_OBJ, 2))
        tex = [rng.integers(100, 255, (size[i, 1], size[i, 0], 3), np.uint8)
               for i in range(N_OBJ)]
        lines = []
        for t in range(1, n_frames + 1):
            img = bg.copy()
            order = rng.permutation(N_OBJ)
            for i in order:
                x, y = pos[i]
                w, h = size[i]
                xi, yi = int(round(x)), int(round(y))
                img[yi:yi + h, xi:xi + w] = tex[i]
                lines.append(f"{t},{i + 1},{xi},{yi},{w},{h},1,1,1\n")
            PIL.Image.fromarray(img).save(
                os.path.join(vdir, "img1", f"{t:08d}.jpg"))
            pos += vel
            for d, lim in ((0, W), (1, H)):
                over = (pos[:, d] < 0) | (pos[:, d] + size[:, d] > lim)
                vel[over, d] *= -1
                pos[:, d] = np.clip(pos[:, d], 0, lim - size[:, d])
        with open(os.path.join(vdir, "gt", "gt.txt"), "w") as f:
            f.write("".join(lines))


def base_config(root: str, outdir: str, encoder_type: str,
                epochs: int) -> dict:
    return {
        "DATASET": "DanceTrack", "DATA_ROOT": root, "OUTPUTS_DIR": outdir,
        "HIDDEN_DIM": 64, "FFN_DIM": 256, "NUM_FEATURE_LEVELS": 4,
        "NUM_HEADS": 8, "NUM_ENC_POINTS": 4, "NUM_DEC_POINTS": 4,
        "NUM_ENC_LAYERS": 3, "NUM_DEC_LAYERS": 3, "MERGE_DET_TRACK_LAYER": 1,
        "NUM_DET_QUERIES": 30, "DROPOUT": 0.0, "USE_DAB": True,
        "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
        "USE_CHECKPOINT": False, "CHECKPOINT_LEVEL": 2, "AUX_LOSS": True,
        "EXTRA_TRACK_ATTN": False, "PRETRAINED_MODEL": None, "RESUME": None,
        "SEED": 42, "EPOCHS": epochs, "BATCH_SIZE": 1, "NUM_WORKERS": 2,
        "ACCUMULATION_STEPS": 1, "ONLY_TRAIN_QUERY_UPDATER_AFTER": 999,
        "SAMPLE_STEPS": [max(1, epochs // 2)], "SAMPLE_LENGTHS": [2, 3],
        "SAMPLE_MODES": ["random_interval"], "SAMPLE_INTERVALS": [4],
        "COCO_SIZE": False, "OVERFLOW_BBOX": False, "REVERSE_CLIP": 0.0,
        "LR": 2e-4, "LR_BACKBONE": 2e-5, "LR_POINTS": 2e-5,
        "WEIGHT_DECAY": 1e-4, "CLIP_MAX_NORM": 0.1,
        "LR_SCHEDULER": "MultiStep",
        "LR_DROP_MILESTONES": [max(2, epochs - 2)], "LR_DROP_RATE": 0.1,
        "NO_GRAD_FRAMES": None,
        "MATCH_COST_CLASS": 2, "MATCH_COST_BBOX": 5, "MATCH_COST_GIOU": 2,
        "LOSS_WEIGHT_FOCAL": 2, "LOSS_WEIGHT_L1": 5, "LOSS_WEIGHT_GIOU": 2,
        "AUX_LOSS_WEIGHT": [1.0, 1.0], "TRACK_SLOTS": 16, "MAX_GTS": 16,
        "DTYPE": "float32", "MSDA_IMPL": "xla", "TP_DROP_RATE": 0.0,
        "FP_INSERT_RATE": 0.0, "MULTI_CHECKPOINT": False,
        "DET_SCORE_THRESH": 0.5, "TRACK_SCORE_THRESH": 0.5,
        "RESULT_SCORE_THRESH": 0.5, "MISS_TOLERANCE": 5,
        "USE_MOTION": False, "MOTION_MIN_LENGTH": 3, "MOTION_MAX_LENGTH": 5,
        "MOTION_LAMBDA": 0.5, "EVAL_THREADS": 1, "EVAL_DATA_SPLIT": "val",
        "EVAL_DIR": outdir, "EVAL_MODE": "specific", "EVAL_MODEL": None,
        "SUBMIT_DIR": outdir, "SUBMIT_MODEL": None, "SUBMIT_DATA_SPLIT": "val",
        "EVAL_SHORT_SIDE": H, "EVAL_MAX_SIDE": W,
        "TRAIN_SHORT_SIDES": [H], "TRAIN_MAX_SIZE": W,
        "FIXED_TRAIN_CANVAS": [H, W],
        "MESH_DEVICES": 1, "ENCODER_TYPE": encoder_type,
    }


# named variants: (encoder_type, config overrides).  The plain pair is the
# controlled comparison; extra rows probe windowed-encoder scaling (its
# layers are ~40x cheaper on-chip than exact deformable ones, so a deeper
# stack is still far below the deformable encoder's wall-clock).
VARIANTS = {
    "windowed": ("windowed", {}),
    "deformable": ("deformable", {}),
    "windowed_enc6": ("windowed", {"NUM_ENC_LAYERS": 6}),
    "deformable_enc6": ("deformable", {"NUM_ENC_LAYERS": 6}),
    "windowed_enc4": ("windowed", {"NUM_ENC_LAYERS": 4}),
    "windowed_win12": ("windowed", {"WINDOW_SIZE": 12}),
    "conv": ("conv", {}),
    "conv_enc6": ("conv", {"NUM_ENC_LAYERS": 6}),
    "windowed_prenorm": ("windowed", {"WINDOWED_PRENORM": True}),
    "windowed_prenorm_enc6": ("windowed", {"WINDOWED_PRENORM": True,
                                           "NUM_ENC_LAYERS": 6}),
}


def run_variant(root: str, workdir: str, name: str, epochs: int,
                seed: int = 42) -> dict:
    from memotr_tpu.engine.train import train
    from memotr_tpu.engine.eval import eval_model
    from memotr_tpu.log.logger import Logger

    encoder_type, overrides = VARIANTS[name]
    outdir = os.path.join(workdir, name)
    cfg = base_config(root, outdir, encoder_type, epochs)
    cfg.update(overrides)
    cfg["SEED"] = seed
    done = os.path.join(outdir, "val",
                        f"checkpoint_{epochs - 1}_metrics.json")
    if os.path.isfile(done):      # variant already trained+scored: reuse
        with open(done) as f:
            metrics = json.load(f)
        return {k: round(float(metrics[k]), 3) for k in
                ("HOTA", "DetA", "AssA", "MOTA", "IDF1") if k in metrics}
    train(cfg)
    ckpt = f"checkpoint_{epochs - 1}"
    metrics = eval_model(dict(cfg), outdir, ckpt,
                         Logger(logdir=os.path.join(outdir, "val")))
    keep = {k: round(float(metrics[k]), 3) for k in
            ("HOTA", "DetA", "AssA", "MOTA", "IDF1") if k in metrics}
    return keep


if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_eval"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    names = sys.argv[3].split(",") if len(sys.argv) > 3 \
        else ["windowed", "deformable"]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    root = os.path.join(workdir, "data")
    if not os.path.isdir(os.path.join(root, "DanceTrack", "train")):
        make_synvalue(root, "train", 6, 40, seed=3)
        make_synvalue(root, "val", 3, 40, seed=99)
    results = {}
    for enc in names:
        print(f"=== training {enc} ===", flush=True)
        results[enc] = run_variant(root, workdir, enc, epochs, seed)
        print(enc, results[enc], flush=True)
    with open(os.path.join(workdir, "flagship_eval.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
