"""Evaluation engine: submit + metric computation, in-process.

Behavioral spec: ``/root/reference/eval_engine.py:12-130``, minus the two
``os.system`` process boundaries: the reference shells out to a distributed
submit run and then to TrackEval; here both happen in-process — submit via
``engine.submit`` and metrics via ``memotr_tpu.metrics`` (validated 1e-10
against TrackEval).  Modes:

- ``specific``: evaluate one checkpoint (EVAL_MODEL),
- ``continue``: poll ``checkpoint_{i}`` dirs as training produces them,
  keeping an ``eval_states.yaml`` cursor (eval_engine.py:21-56).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import yaml

from ..config import yaml_to_dict
from ..log.logger import Logger
from ..metrics import evaluate_mot_challenge
from ..metrics.evaluator import write_summary
from .submit import submit


def eval_model(config: dict, eval_dir: str, model_name: str,
               logger: Logger) -> Dict[str, float]:
    """Submit on the eval split, then score (eval_engine.py:66-124)."""
    split = config["EVAL_DATA_SPLIT"]
    sub_cfg = dict(config)
    sub_cfg["SUBMIT_DIR"] = eval_dir
    sub_cfg["SUBMIT_MODEL"] = model_name
    sub_cfg["SUBMIT_DATA_SPLIT"] = split
    submit(sub_cfg)

    train_config = yaml_to_dict(os.path.join(eval_dir, "train/config.yaml"))
    dataset = train_config["DATASET"]
    tracker_dir = os.path.join(eval_dir, split, "tracker")
    # move tracker dir to a per-checkpoint name (eval_engine.py:80-82)
    named_dir = os.path.join(eval_dir, split, f"{model_name}_tracker")
    if os.path.isdir(named_dir):
        import shutil
        shutil.rmtree(named_dir)
    os.rename(tracker_dir, named_dir)

    if dataset in ("DanceTrack", "SportsMOT"):
        gt_dir = os.path.join(config["DATA_ROOT"], dataset, split)
    else:
        gt_dir = os.path.join(config["DATA_ROOT"], dataset, "images", split)
    # the reference always scores against a seqmap subset when one exists
    # (eval_engine.py:93-97 passes --SEQMAP_FILE {split}_seqmap.txt)
    seqmap = os.path.join(config["DATA_ROOT"], dataset, f"{split}_seqmap.txt")
    metrics = evaluate_mot_challenge(
        gt_dir, named_dir, dataset=dataset,
        num_parallel=int(config.get("EVAL_THREADS", 8) or 8),
        seqmap_file=seqmap if os.path.isfile(seqmap) else None)
    write_summary(metrics, os.path.join(named_dir, "pedestrian_summary.txt"))
    logger.show(head=f"[eval {model_name}]",
                log={k: round(v, 3) for k, v in metrics.items()
                     if k in ("HOTA", "DetA", "AssA", "MOTA", "IDF1")})
    logger.write({k: float(v) for k, v in metrics.items()},
                 filename=f"{model_name}_metrics.json", mode="w")
    # eval metrics -> scalar stream, per checkpoint epoch (the reference's
    # metrics_to_tensorboard, eval_engine.py:127-130)
    tail = model_name.rsplit("_", 1)[-1].split(".")[0]
    epoch = int(tail) if tail.isdigit() else 0
    logger.scalars({k: float(v) for k, v in metrics.items()
                    if isinstance(v, (int, float))}, step=epoch, mode="epochs")
    return metrics


def evaluate(config: dict):
    eval_dir = config["EVAL_DIR"]
    logger = Logger(logdir=os.path.join(eval_dir, config["EVAL_DATA_SPLIT"]))
    mode = config.get("EVAL_MODE", "specific")
    if mode == "specific":
        assert config.get("EVAL_MODEL"), "--eval-model required"
        return eval_model(config, eval_dir, config["EVAL_MODEL"], logger)
    if mode == "continue":
        # poll checkpoints as training writes them (eval_engine.py:39-56)
        states_path = os.path.join(eval_dir, "eval_states.yaml")
        states = {"last": -1}
        if os.path.exists(states_path):
            with open(states_path) as f:
                states.update(yaml.safe_load(f) or {})
        total_epochs = config["EPOCHS"]
        while states["last"] + 1 < total_epochs:
            nxt = f"checkpoint_{states['last'] + 1}"
            if os.path.isdir(os.path.join(eval_dir, nxt)):
                eval_model(config, eval_dir, nxt, logger)
                states["last"] += 1
                with open(states_path, "w") as f:
                    yaml.dump(states, f)
            else:
                time.sleep(30)
        return None
    raise ValueError(f"Unknown EVAL_MODE '{mode}'")
