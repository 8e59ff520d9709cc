"""CLI entry: train / submit / eval mode dispatch.

Behavioral spec: ``/root/reference/main.py:15-124`` — YAML experiment config
plus argparse overlay (any provided flag must name an existing config key,
CLI wins), then mode dispatch.  The NCCL/process-group setup is replaced by
``jax.distributed.initialize()`` when running multi-host.
"""
from __future__ import annotations

import argparse

from memotr_tpu.config import update_config, yaml_to_dict


def parse_option():
    p = argparse.ArgumentParser("MeMOTR-TPU")
    p.add_argument("--config-path", type=str, required=True)
    p.add_argument("--mode", type=str, required=True,
                   choices=["train", "submit", "eval"])
    # common overlays (main.py:15-90); any --key matching a config key works
    for flag in ["data-root", "outputs-dir", "seed", "batch-size", "epochs",
                 "lr", "lr-backbone", "lr-points", "weight-decay",
                 "resume", "pretrained-model", "use-checkpoint",
                 "submit-dir", "submit-model", "submit-data-split",
                 "eval-dir", "eval-mode", "eval-model", "eval-data-split",
                 "eval-threads", "det-score-thresh", "track-score-thresh",
                 "result-score-thresh", "miss-tolerance", "use-motion",
                 "track-slots", "max-gts", "dtype", "msda-impl",
                 "num-workers", "accumulation-steps", "dataset",
                 "encoder-type", "window-size", "submit-batch",
                 "mesh-devices", "mesh-seq-devices", "token-shard-axis",
                 "distill-teacher", "warmup-iters", "visualize",
                 "windowed-prenorm", "windowed-shared-cpb",
                 "hybrid-deform-min-level", "pretrain-skip-encoder"]:
        p.add_argument(f"--{flag}", type=str, default=None)
    p.add_argument("--multi-host", action="store_true",
                   help="initialize jax.distributed for multi-host runs")
    return p.parse_args()


def _coerce(v):
    if not isinstance(v, str):
        return v
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main():
    args = parse_option()
    if args.multi_host:
        import jax
        jax.distributed.initialize()

    config = yaml_to_dict(args.config_path)
    options = {k: _coerce(v) for k, v in vars(args).items()
               if k not in ("config_path", "multi_host") and v is not None}
    config = update_config(config, options)

    if args.mode == "train":
        from memotr_tpu.engine.train import train
        train(config)
    elif args.mode == "submit":
        from memotr_tpu.engine.submit import submit
        submit(config)
    elif args.mode == "eval":
        from memotr_tpu.engine.eval import evaluate
        evaluate(config)


if __name__ == "__main__":
    main()
