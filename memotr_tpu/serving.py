"""AOT serving export: the streaming step as a self-contained artifact.

The reference's only serving path is its torch submit loop — the model
classes must be importable wherever inference runs
(``/root/reference/submit_engine.py:58-120``).  On TPU the natural
production story is ahead-of-time: ``jax.export`` serializes the jitted
streaming step (StableHLO + calling convention) so a serving host can run
tracking with **only JAX and this artifact** — no Flax, no model-building
code, no config system.

Artifact layout (``<outdir>/``):

- ``step.jaxexp``     — serialized ``jax.export.Exported`` streaming step
  with flattened calling convention
  ``(params…, uparams…, image, mask, *state_leaves) ->
  (packed, *state_leaves')``;
- ``params.npz``      — model + updater params, ``/``-joined paths
  (bfloat16 leaves stored as float32 and re-cast on load — npz cannot
  hold ml_dtypes);
- ``init_state.npz``  — the fresh ``TrackState`` leaves in treedef order;
- ``manifest.json``   — canvas/dtype/threshold metadata, leaf inventory,
  and the packed-row layout.

The packed per-frame result row mirrors the pipelined submit path
(``engine/submit.py:make_eval_step_packed``): one ``(B, S, 9)`` float32
array ``[id, label, cx, cy, w, h, score, alive, overflow]`` — a single
device fetch per frame.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: the model stack (flax modules, engines) is imported lazily inside
# export_streaming() only — ServingRuntime.load/step need nothing beyond
# this module, jax and numpy, which is the point of the artifact.

PACKED_LAYOUT = ["id", "label", "cx", "cy", "w", "h", "score", "alive",
                 "slot_overflow"]


def _flatten_params(tree, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = prefix + (str(k),)
        if isinstance(v, dict):
            out.update(_flatten_params(v, path))
        else:
            out["/".join(path)] = np.asarray(v)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _save_npz(path: str, flat: Dict[str, np.ndarray]) -> Dict[str, str]:
    """Save arrays; bfloat16 goes to disk as float32 (npz can't hold
    ml_dtypes).  Returns {key: original_dtype} for the cast-back on load."""
    dtypes = {}
    disk = {}
    for k, v in flat.items():
        dtypes[k] = str(v.dtype)
        disk[k] = v.astype(np.float32) if v.dtype.name == "bfloat16" else v
    np.savez(path, **disk)
    return dtypes


def _load_npz(path: str, dtypes: Dict[str, str]) -> Dict[str, np.ndarray]:
    import ml_dtypes
    with np.load(path) as z:
        out = {}
        for k in z.files:
            v = z[k]
            if dtypes.get(k) == "bfloat16":
                v = v.astype(ml_dtypes.bfloat16)
            out[k] = v
        return out


def _packed_core(model, updater, n_det: int, det_thresh: float,
                 track_thresh: float, miss_tolerance: int):
    """Unjitted packed step (row layout shared with the pipelined submit
    via ``engine.submit.pack_results``)."""
    from .engine.submit import _eval_core, pack_results
    core = _eval_core(model, updater, n_det, det_thresh, track_thresh,
                      miss_tolerance)

    def step(params, uparams, images, mask, state):
        results, state = core(params, uparams, images, mask, state)
        return pack_results(results), state

    return step


def export_streaming(config: dict, params: dict, uparams: dict, outdir: str,
                     canvas_hw: Tuple[int, int] | None = None,
                     batch: int = 1, input_dtype=jnp.uint8) -> str:
    """Export the streaming step for ``config`` + trained params to
    ``outdir``.  ``params``/``uparams`` are the variable dicts the engines
    use (``{"params": ..., "frozen"?: ...}``).  Returns ``outdir``."""
    from .config import cfg_get, num_classes_for_dataset
    from .models.memotr import build_model
    from .models.query_updater import build_query_updater
    from .structures.track_state import TrackState

    model = build_model(config)
    updater = build_query_updater(config)
    h = int(canvas_hw[0] if canvas_hw else cfg_get(config, "EVAL_SHORT_SIDE",
                                                   800))
    w = int(canvas_hw[1] if canvas_hw else cfg_get(config, "EVAL_MAX_SIDE",
                                                   1536))
    slots = int(cfg_get(config, "TRACK_SLOTS", 64))
    use_dab = bool(cfg_get(config, "USE_DAB", True))
    thresholds = {
        "det": float(config["DET_SCORE_THRESH"]),
        "track": float(config["TRACK_SCORE_THRESH"]),
        "miss_tolerance": int(config["MISS_TOLERANCE"]),
    }
    num_classes = num_classes_for_dataset(config["DATASET"])
    state0 = TrackState.empty(batch, slots, int(config["HIDDEN_DIM"]),
                              num_classes, use_dab=use_dab)
    leaves0, treedef = jax.tree_util.tree_flatten(state0)

    step = _packed_core(model, updater, model.n_det_queries,
                        thresholds["det"], thresholds["track"],
                        thresholds["miss_tolerance"])

    def step_flat(params, uparams, images, mask, *leaves):
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        packed, new_state = step(params, uparams, images, mask, state)
        return (packed,) + tuple(jax.tree_util.tree_leaves(new_state))

    spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)  # noqa: E731
    args = (jax.tree.map(spec, params), jax.tree.map(spec, uparams),
            jax.ShapeDtypeStruct((batch, h, w, 3), input_dtype),
            jax.ShapeDtypeStruct((batch, h, w), jnp.bool_),
            *[spec(l) for l in leaves0])
    exported = jax.export.export(jax.jit(step_flat))(*args)

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "step.jaxexp"), "wb") as f:
        f.write(exported.serialize())
    p_dtypes = _save_npz(os.path.join(outdir, "params.npz"),
                         _flatten_params(params))
    u_dtypes = _save_npz(os.path.join(outdir, "uparams.npz"),
                         _flatten_params(uparams))
    np.savez(os.path.join(outdir, "init_state.npz"),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves0)})
    manifest = {
        "canvas_hw": [h, w], "batch": batch, "track_slots": slots,
        "input_dtype": str(jnp.dtype(input_dtype)),
        "thresholds": thresholds, "packed_layout": PACKED_LAYOUT,
        "n_state_leaves": len(leaves0),
        "param_dtypes": p_dtypes, "uparam_dtypes": u_dtypes,
        "platforms": list(exported.platforms),
        "result_score_thresh": float(config.get("RESULT_SCORE_THRESH", 0.5)),
    }
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return outdir


class ServingRuntime:
    """Run an exported streaming-step artifact (no model code needed).

    >>> rt = ServingRuntime.load("artifact/")
    >>> rows = rt.step(frame_u8, valid_mask)   # (S, 9) float32 per frame
    >>> rt.reset()                             # next sequence
    """

    def __init__(self, exported, params, uparams, init_leaves, manifest):
        self._exported = exported
        self._params = params
        self._uparams = uparams
        self._init_leaves = init_leaves
        self.manifest = manifest
        self._leaves = None
        self._call = jax.jit(exported.call)
        self.reset()

    @classmethod
    def load(cls, outdir: str) -> "ServingRuntime":
        with open(os.path.join(outdir, "manifest.json")) as f:
            manifest = json.load(f)
        with open(os.path.join(outdir, "step.jaxexp"), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        params = _unflatten_params(_load_npz(
            os.path.join(outdir, "params.npz"), manifest["param_dtypes"]))
        uparams = _unflatten_params(_load_npz(
            os.path.join(outdir, "uparams.npz"), manifest["uparam_dtypes"]))
        with np.load(os.path.join(outdir, "init_state.npz")) as z:
            leaves = [z[f"leaf_{i}"]
                      for i in range(manifest["n_state_leaves"])]
        return cls(exported, params, uparams, leaves, manifest)

    def reset(self):
        """Fresh track state (start of a new sequence)."""
        self._leaves = [jnp.asarray(l) for l in self._init_leaves]

    def step(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """One frame -> ``(S, 9)`` packed rows (see ``PACKED_LAYOUT``).
        ``image`` is ``(H, W, 3)`` of the manifest's input dtype; ``mask``
        is ``(H, W)`` bool, True = padding."""
        batch = self.manifest["batch"]
        if image.ndim == 3:
            image, mask = image[None], mask[None]
        assert image.shape[0] == batch, \
            f"artifact was exported for batch={batch}"
        out = self._call(self._params, self._uparams, jnp.asarray(image),
                         jnp.asarray(mask), *self._leaves)
        packed, self._leaves = out[0], list(out[1:])
        return np.asarray(packed)[0] if batch == 1 else np.asarray(packed)
