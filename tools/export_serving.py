"""Export a trained checkpoint as a self-contained serving artifact.

AOT-serializes the streaming tracking step (StableHLO via ``jax.export``)
plus params and the fresh track state, so inference hosts need only JAX and
the artifact directory — no model code (memotr_tpu/serving.py has the
layout; the reference has no AOT path, its serving is the torch submit
loop, submit_engine.py:187-252).

Usage:
  python tools/export_serving.py --submit-dir outputs/run --submit-model \
      checkpoint_19 --out artifact/ [--height 800 --width 1536] [--batch 1]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser("export_serving")
    p.add_argument("--submit-dir", required=True,
                   help="training outputs dir (contains train/config.yaml)")
    p.add_argument("--submit-model", required=True,
                   help="checkpoint dir name, e.g. checkpoint_19")
    p.add_argument("--out", required=True)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    from memotr_tpu.checkpoint.orbax_io import load_checkpoint
    from memotr_tpu.config import yaml_to_dict
    from memotr_tpu.serving import export_streaming

    config = yaml_to_dict(os.path.join(args.submit_dir, "train/config.yaml"))
    ckpt = load_checkpoint(os.path.join(args.submit_dir, args.submit_model))
    params = {"params": ckpt["params"]["model"]}
    if "frozen" in ckpt:
        params["frozen"] = ckpt["frozen"]
    uparams = {"params": ckpt["params"]["updater"]}

    canvas = None
    if args.height and args.width:
        canvas = (args.height, args.width)
    out = export_streaming(config, params, uparams, args.out,
                           canvas_hw=canvas, batch=args.batch)
    print(f"exported serving artifact -> {out}")


if __name__ == "__main__":
    main()
