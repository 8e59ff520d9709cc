"""Config system: flat UPPER_CASE YAML files + CLI overlay.

Reproduces the semantics of the reference config system
(``/root/reference/configs/utils.py:7-84``): a YAML experiment file defines the
full (flat, UPPER_CASE) key space; command-line options recursively overlay
onto it, the CLI always wins, and an option whose key does not exist anywhere
in the YAML is an error.  The resolved config is re-serialized next to the
training outputs and later consumed by the submit engine
(``/root/reference/submit_engine.py:195``).
"""
from __future__ import annotations

import copy
from typing import Any

import yaml


def yaml_to_dict(path: str) -> dict:
    """Load a YAML file into a plain dict (reference: utils/utils.py:52-54)."""
    with open(path) as f:
        return yaml.load(f.read(), yaml.FullLoader)


def dict_to_yaml(config: dict, path: str) -> None:
    """Serialize a resolved config (reference: log/logger.py yaml writer)."""
    with open(path, "w") as f:
        yaml.dump(config, f, allow_unicode=True, sort_keys=False)


def _key_occurrences(config: Any, key: str) -> int:
    """Count how many times ``key`` appears anywhere in the (nested) config.

    Mirrors the reference's ``is_unique`` check (configs/utils.py:60-84) used
    to guarantee a CLI option maps to exactly one YAML key.
    """
    count = 0
    if isinstance(config, dict):
        for k, v in config.items():
            if k == key:
                count += 1
            count += _key_occurrences(v, key)
    return count


def _overlay(config: dict, key: str, value: Any) -> bool:
    """Recursively set ``key = value`` wherever ``key`` exists. Returns True
    if the key was found (reference: configs/utils.py:37-57)."""
    found = False
    for k in list(config.keys()):
        if k == key:
            config[k] = value
            found = True
        elif isinstance(config[k], dict):
            found = _overlay(config[k], key, value) or found
    return found


def update_config(config: dict, options: dict) -> dict:
    """Overlay CLI ``options`` onto a YAML ``config``; CLI wins.

    Options with value ``None`` are skipped (flag not provided).  An option
    key that does not exist in the YAML raises ``KeyError`` — unless it is a
    known TPU-native key (``_DEFAULTS``), which older experiment yamls may
    omit; those overlay at the top level.  A key that is ambiguous (appears
    more than once in a nested config) raises ``ValueError``.
    """
    config = copy.deepcopy(config)
    for key, value in options.items():
        if value is None:
            continue
        key = key.upper().replace("-", "_")
        n = _key_occurrences(config, key)
        if n == 0 and key in _DEFAULTS:
            config[key] = value
            continue
        if n == 0:
            raise KeyError(f"CLI option '{key}' does not match any config key.")
        if n > 1:
            raise ValueError(f"CLI option '{key}' is ambiguous ({n} matches).")
        _overlay(config, key, value)
    return config


# Defaults for keys that older experiment YAMLs may omit; consulted through
# `cfg_get` so model builders never KeyError (mirrors the scattered
# ``if "X" in config`` guards of the reference, e.g. criterion.py:490).
_DEFAULTS = {
    "MERGE_DET_TRACK_LAYER": 0,
    "TP_DROP_RATE": 0.0,
    "FP_INSERT_RATE": 0.0,
    "USE_MOTION": False,
    "MOTION_MIN_LENGTH": 3,
    "MOTION_MAX_LENGTH": 5,
    "EXTRA_TRACK_ATTN": False,
    "USE_DAB": True,
    "NUM_WORKERS": 4,
    "ACCUMULATION_STEPS": 1,
    "COCO_SIZE": False,
    "OVERFLOW_BBOX": False,
    "REVERSE_CLIP": 0.0,
    "NO_GRAD_FRAMES": None,
    # TPU-native knobs (no reference counterpart):
    "TRACK_SLOTS": 64,           # fixed per-frame track-query slot count
    "MAX_GTS": 128,              # padded GT capacity per frame
    "DTYPE": "bfloat16",         # compute dtype for backbone/transformer
    "EVAL_SHORT_SIDE": 800,      # streaming-eval resize (seq_dataset.py:20-21)
    "EVAL_MAX_SIDE": 1536,
    "MSDA_IMPL": "auto",         # auto | pallas | xla
    "MESH_DEVICES": None,        # cap the data-mesh device count (None = all)
    "TOKEN_SHARD_AXIS": None,    # mesh axis for sequence-parallel encoder tokens
    "ENCODER_TYPE": "deformable",  # deformable | windowed | conv (TPU-native)
    "WINDOWED_LEPE": True,       # windowed-encoder ablation knobs
    "WINDOWED_BOTTOMUP": True,
    "WINDOWED_RELPOS": True,     # continuous relative position bias
    "WINDOW_SIZE": 8,            # window/grid block size (windowed encoder)
    "WINDOWED_PRENORM": False,   # pre-norm residual blocks (deep stacks)
    "WINDOWED_SHARED_CPB": False,  # one CPB MLP/table set for all layers
    "HYBRID_DEFORM_MIN_LEVEL": 1,  # hybrid: first exact-deformable level
    "WARMUP_ITERS": 0,           # linear LR warmup iterations (0 = off)
    "SUBMIT_BATCH": 1,           # serving mode: sequences streamed per step
    "FIXED_TRAIN_CANVAS": None,  # (H, W) pad every train batch to one canvas
    "MESH_SEQ_DEVICES": 1,       # seq-parallel chips per data replica
    "DISTILL_TEACHER": None,     # Orbax ckpt dir of a trained teacher
    "DISTILL_WEIGHT_MEMORY": 1.0,
    "DISTILL_WEIGHT_LOGIT": 1.0,
    "DISTILL_WEIGHT_BOX": 1.0,
    "PRETRAIN_SKIP_ENCODER": None,  # None = auto (skip iff encoder family
    #                                 differs from the checkpoint's)
    "VISUALIZE": False,          # tensor dumps (train + submit paths)
}


def cfg_get(config: dict, key: str, default: Any = None) -> Any:
    if key in config and config[key] is not None:
        return config[key]
    if key in _DEFAULTS:
        return _DEFAULTS[key]
    return default


def num_classes_for_dataset(dataset: str) -> int:
    """Dataset -> class count map (reference: models/memotr.py:291-297)."""
    table = {
        "DanceTrack": 1,
        "SportsMOT": 1,
        "MOT17": 1,
        "MOT17_SPLIT": 1,
        "BDD100K": 8,
    }
    if dataset not in table:
        raise ValueError(f"Unknown dataset '{dataset}'.")
    return table[dataset]
