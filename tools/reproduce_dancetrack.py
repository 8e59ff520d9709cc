"""One-command reproduction of the reference's DanceTrack benchmark.

The reference publishes DanceTrack checkpoints and numbers
(/root/reference/README.md:141-147 — MeMOTR test-set HOTA 68.5 / DetA 80.5 /
AssA 58.4).  This tool is the end-to-end verification path for a user who
has that released ``.pth`` and the real dataset:

    python tools/reproduce_dancetrack.py \
        --checkpoint ./memotr_dancetrack.pth \
        --data-root  /path/to/DATADIR \
        --out        /tmp/repro_dancetrack \
        --split      val --expected-hota <paper val HOTA>

which runs, in one step,

1. **convert**: ``torch.load`` the ``.pth`` (the exact
   ``{"model": state_dict}`` format ``utils.utils.save_checkpoint``
   writes; a bare state dict works too) through
   ``checkpoint.torch_convert.convert_torch_state_dict`` — full key
   coverage is asserted, mirroring the reference's strict consumption in
   ``models/utils.py:88-168`` — and save a native Orbax checkpoint;
2. **submit**: stream every sequence of ``--split`` through the compiled
   eval step (``engine/submit.py``), writing MOT-format txts;
3. **score**: the in-process TrackEval-parity metrics
   (``memotr_tpu/metrics/``), printing one JSON line with
   HOTA/DetA/AssA/MOTA/IDF1.

With ``--expected-hota`` the exit code asserts |HOTA - expected| <= 0.5
(the parity budget: XLA-vs-CUDA reductions differ in rounding, not in
distribution).  The DanceTrack *test* split has no public GT — submit its
tracker txts to the challenge server instead; local scoring needs ``val``.

The CLI intentionally consumes the SAME config file shipped for training
(configs/train_dancetrack.yaml = the released checkpoints' architecture),
so there is nothing to hand-sync.  ``tests/test_reproduce.py`` dry-runs
this whole path on a synthetic dataset + a fabricated reference-format
checkpoint.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PUBLISHED_TEST = {"HOTA": 68.5, "DetA": 80.5, "AssA": 58.4}  # README test set


def convert_pth(pth_path: str, out_dir: str, use_dab: bool) -> str:
    """Released ``.pth`` -> native Orbax checkpoint dir; returns its name."""
    import torch

    from memotr_tpu.checkpoint.orbax_io import save_checkpoint
    from memotr_tpu.checkpoint.torch_convert import convert_torch_state_dict

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]          # utils.utils.save_checkpoint wrapping
    params, uparams, frozen = convert_torch_state_dict(sd, use_dab=use_dab)
    unconverted = params.pop("_unconverted", [])
    if unconverted:
        raise SystemExit(
            f"converter missed {len(unconverted)} keys (is this a MeMOTR "
            f"checkpoint?): {unconverted[:8]}")
    name = "checkpoint_converted"
    save_checkpoint(os.path.join(out_dir, name),
                    {"model": params, "updater": uparams}, frozen=frozen)
    print(f"[convert] {pth_path} -> {os.path.join(out_dir, name)} "
          f"(model/updater/frozen trees, 0 unconverted keys)")
    return name


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="released MeMOTR .pth -> convert -> submit -> HOTA")
    p.add_argument("--checkpoint", required=True,
                   help=".pth (reference format) or native Orbax ckpt dir")
    p.add_argument("--data-root", required=True,
                   help="DATADIR containing DanceTrack/")
    p.add_argument("--out", required=True, help="working/output directory")
    p.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "..", "configs/train_dancetrack.yaml"),
        help="architecture config (default: the released-checkpoint shape)")
    p.add_argument("--split", default="val",
                   help="val (scored locally) or test (txts only, no GT)")
    p.add_argument("--expected-hota", type=float, default=None,
                   help="assert |HOTA-expected| <= tolerance")
    p.add_argument("--tolerance", type=float, default=0.5)
    p.add_argument("--submit-batch", type=int, default=None,
                   help="serve N sequences per compiled step (SUBMIT_BATCH)")
    args = p.parse_args(argv)

    from memotr_tpu.config import yaml_to_dict
    from memotr_tpu.engine.eval import eval_model
    from memotr_tpu.engine.submit import submit
    from memotr_tpu.log.logger import Logger

    cfg = yaml_to_dict(args.config)
    cfg["DATA_ROOT"] = args.data_root
    cfg["EVAL_DATA_SPLIT"] = args.split
    cfg["OUTPUTS_DIR"] = args.out
    if args.submit_batch:
        cfg["SUBMIT_BATCH"] = args.submit_batch
    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)

    # submit/eval read the training run's config from <out>/train/config.yaml
    # (submit_engine.py:195 semantics) — materialize this run as one.
    import yaml
    with open(os.path.join(args.out, "train/config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    ckpt = args.checkpoint
    if os.path.isfile(ckpt) and ckpt.endswith((".pth", ".pt", ".bin")):
        model_name = convert_pth(ckpt, args.out, bool(cfg.get("USE_DAB")))
    elif os.path.isdir(ckpt):
        model_name = os.path.basename(os.path.normpath(ckpt))
        link = os.path.join(args.out, model_name)
        if not os.path.exists(link):
            os.symlink(os.path.abspath(ckpt), link)
    else:
        raise SystemExit(f"--checkpoint {ckpt}: not a .pth file or a "
                         f"checkpoint directory")

    logger = Logger(logdir=os.path.join(args.out, args.split))
    if args.split == "test":
        # no public GT: produce tracker txts for the challenge server
        sub_cfg = dict(cfg, SUBMIT_DIR=args.out, SUBMIT_MODEL=model_name,
                       SUBMIT_DATA_SPLIT="test")
        submit(sub_cfg)
        print(json.dumps({"split": "test", "tracker_dir":
                          os.path.join(args.out, "test/tracker"),
                          "published_test": PUBLISHED_TEST,
                          "note": "no local GT; submit txts to the "
                                  "DanceTrack server"}))
        return 0

    cfg["EVAL_DIR"] = args.out
    metrics = eval_model(cfg, args.out, model_name, logger)
    result = {k: round(float(metrics[k]), 3)
              for k in ("HOTA", "DetA", "AssA", "MOTA", "IDF1")
              if k in metrics}
    result["split"] = args.split
    result["published_test"] = PUBLISHED_TEST
    if args.expected_hota is not None:
        delta = float(metrics["HOTA"]) - args.expected_hota
        result["expected_hota"] = args.expected_hota
        result["delta"] = round(delta, 3)
        result["pass"] = abs(delta) <= args.tolerance
    print(json.dumps(result))
    return 0 if result.get("pass", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
