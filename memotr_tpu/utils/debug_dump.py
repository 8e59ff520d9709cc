"""Debug-by-artifact: dump intermediate tensors for offline inspection.

The reference's VISUALIZE flag writes intermediate tensors to
``./outputs/visualize_tmp/`` from inside modules (memotr.py:164-176,
deformable_decoder.py:97-136, query_updater.py:86-97,
runtime_tracker.py:96-99).  A functional JAX model can't write files from
inside jit, so the equivalent here is a host-side dumper applied to the
*outputs* of each compiled step: the full model-output dict, the slot state,
and (optionally) per-layer stacks, saved as compressed ``.npz`` per frame.

Usage (streaming):
    dumper = DebugDumper("outputs/visualize", enabled=config["VISUALIZE"])
    ...
    dumper.dump_frame(i, model_out=results, state=state)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, out)
    elif hasattr(tree, "shape"):
        out[prefix] = np.asarray(jax.device_get(tree))
    elif hasattr(tree, "__dict__") or hasattr(tree, "_fields") or \
            hasattr(tree, "keys"):
        pass
    else:
        try:
            leaves = jax.tree_util.tree_leaves_with_path(tree)
            for path, leaf in leaves:
                name = prefix + "".join(str(getattr(p, "name", p)) for p in path)
                out[name] = np.asarray(jax.device_get(leaf))
        except Exception:
            pass


class DebugDumper:
    def __init__(self, out_dir: str, enabled: bool = False):
        self.out_dir = out_dir
        self.enabled = enabled
        if enabled:
            os.makedirs(out_dir, exist_ok=True)

    def dump_frame(self, frame_idx: int, **named_trees):
        if not self.enabled:
            return
        arrays: Dict[str, np.ndarray] = {}
        for name, tree in named_trees.items():
            if hasattr(tree, "shape"):
                arrays[name] = np.asarray(jax.device_get(tree))
            elif isinstance(tree, dict):
                _flatten(name, tree, arrays)
            else:  # pytree (e.g. TrackState)
                for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                    key = name + "".join(
                        f".{getattr(p, 'name', getattr(p, 'key', p))}"
                        for p in path)
                    arrays[key] = np.asarray(jax.device_get(leaf))
        np.savez_compressed(
            os.path.join(self.out_dir, f"frame_{frame_idx:06d}.npz"),
            **arrays)
