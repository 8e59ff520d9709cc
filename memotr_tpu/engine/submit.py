"""Streaming-inference submit engine.

Behavioral spec: ``/root/reference/submit_engine.py:24-252``.  Per sequence:
decode/resize frames, run the compiled per-frame step (model forward ->
runtime tracker lifecycle -> query updater), filter by score/area, convert to
pixel xyxy, write MOT txt (or BDD100K JSON).  Sequences are sharded across
hosts (submit_engine.py:225-231); the per-frame step compiles once per
sequence orientation because all frames share a fixed canvas.

The host-side loop overlaps the next frame's decode with the device step via
a one-deep prefetch thread.
"""
from __future__ import annotations

import json
import os
import threading
import queue as queue_mod
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg_get, yaml_to_dict
from ..data.seq_dataset import SeqDataset
from ..log.logger import Logger
from ..models.frame_step import apply_query_updater, model_forward
from ..models.memotr import build_model
from ..models.query_updater import build_query_updater
from ..models.runtime_tracker import runtime_tracker_step
from ..structures.padded_frame import PaddedFrames
from ..structures.track_state import TrackState
from ..utils.misc import logits_to_scores

BDD_LABEL_NAMES = {
    0: "pedestrian", 1: "rider", 2: "car", 3: "truck", 4: "bus",
    5: "train", 6: "motorcycle", 7: "bicycle",
}


def results_to_pixels(results: Dict, ori_hw, result_thresh: float,
                      area_thresh: float = 100.0, lane: int = 0):
    """Slot results -> pixel-space detections for the writers.

    Predictions are normalized to the valid (unpadded) region — the
    valid-ratio machinery makes them padding-invariant — so they scale by
    the original frame dims directly (submit_engine.py:89-98).  Returns
    (keep indices, x1, y1, w, h, ids, labels) in original pixels; ``keep``
    applies the score and the >100 px^2 area filters
    (submit_engine.py:122-131).  ``lane`` selects the batch item (the
    batched-serving path streams one sequence per lane).
    """
    import numpy as np
    ori_h, ori_w = ori_hw
    keep = results["mask"][lane] & (results["scores"][lane] > result_thresh)
    boxes = results["boxes"][lane]
    cx = boxes[:, 0] * ori_w
    cy = boxes[:, 1] * ori_h
    w = boxes[:, 2] * ori_w
    h = boxes[:, 3] * ori_h
    keep = keep & (w * h > area_thresh)
    return (np.nonzero(keep)[0], cx - w / 2, cy - h / 2, w, h,
            results["ids"][lane], results["labels"][lane])


def format_frame_results(i: int, results: Dict, ori_hw, path: str,
                         result_thresh: float, area_thresh: float,
                         dataset_name: str, lane: int = 0):
    """One frame's (host numpy) results -> its output record.

    Returns ``(bdd_frame_dict, None)`` for BDD100K or ``(None, txt_lines)``
    for the MOT txt format — the single filter+format path behind both the
    per-sequence ``Submitter`` and the lockstep ``BatchedSubmitter``
    (reference writer: submit_engine.py:138-186; BDD JSON quirks:
    submit_engine.py:154-170).
    """
    keep_idx, x1, y1, w, h, ids, labels = results_to_pixels(
        results, ori_hw, result_thresh, area_thresh, lane=lane)
    if dataset_name == "BDD100K":
        img_name = os.path.basename(path)
        frame_result = {
            "name": img_name, "videoName": img_name[:-12],
            "frameIndex": i, "labels": []}
        for j in keep_idx:
            frame_result["labels"].append({
                "id": str(int(ids[j])),
                "category": BDD_LABEL_NAMES[int(labels[j])],
                "box2d": {"x1": float(x1[j]), "y1": float(y1[j]),
                          "x2": float(x1[j] + w[j]),
                          "y2": float(y1[j] + h[j])}})
        return frame_result, None
    return None, [f"{i + 1},{int(ids[j])},{x1[j]},{y1[j]},"
                  f"{w[j]},{h[j]},1,-1,-1,-1\n" for j in keep_idx]


_EVAL_STEP_CACHE: Dict[tuple, "object"] = {}


class _PrefetchFailure:
    """Queue sentinel carrying a prefetch-worker exception.  A worker that
    died silently would otherwise either truncate the sequence (rc=0, wrong
    metrics — the old ``finally: q.put(None)``) or hang the consumer on
    ``q.get()`` forever (no handler at all)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _drain(q: "queue_mod.Queue"):
    """Yield queue items until the None end-marker, re-raising any
    prefetch-worker failure in the consuming thread."""
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, _PrefetchFailure):
            raise item.exc
        yield item


def _guarded(fn, q: "queue_mod.Queue"):
    """Wrap a prefetch-worker body: end-marker on success, failure sentinel
    on any exception."""
    def worker():
        try:
            fn()
            q.put(None)
        except BaseException as e:      # noqa: BLE001 - re-raised by _drain
            q.put(_PrefetchFailure(e))
    return worker


def _maybe_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """On-device ImageNet normalization for raw uint8 frames.

    Shipping uint8 to the device quarters the host->device bytes per frame
    (the per-frame transfer is the streaming bottleneck through any
    host link); the normalize then rides the compiled step."""
    if images.dtype == jnp.uint8:
        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        images = (images.astype(jnp.float32) / 255.0 - mean) / std
    return images


def _eval_core(model, updater, n_det: int, det_thresh: float,
               track_thresh: float, miss_tolerance: int):
    def step(params, uparams, images, mask, state):
        frames = PaddedFrames(images=_maybe_normalize(images), mask=mask)
        out = model_forward(model, params, frames, state, deterministic=True)
        state, overflow = runtime_tracker_step(
            state, out, n_det, det_thresh, track_thresh, miss_tolerance,
            with_overflow=True)
        state = apply_query_updater(updater, uparams, state,
                                    deterministic=True)
        results = {
            "ids": state.ids,
            "labels": state.labels,
            "boxes": state.boxes,
            "scores": jnp.max(logits_to_scores(state.logits), axis=-1),
            "mask": state.mask,
            "slot_overflow": overflow,
        }
        return results, state

    return step


def make_eval_step(model, updater, n_det: int, det_thresh: float,
                   track_thresh: float, miss_tolerance: int):
    """Jitted streaming step: (params, uparams, images, mask, state) ->
    (results, state).  uint8 images are ImageNet-normalized on device.

    Memoized per (model, updater, thresholds): every Submitter (one per
    sequence) must share one jitted function — a fresh closure per sequence
    forces a full re-trace each time (~minutes of host work per sequence on
    this box even when the persistent compile cache hits)."""
    key = ("dict", id(model), id(updater), n_det, det_thresh, track_thresh,
           miss_tolerance)
    if key in _EVAL_STEP_CACHE:
        return _EVAL_STEP_CACHE[key][0]
    step = _eval_core(model, updater, n_det, det_thresh, track_thresh,
                      miss_tolerance)
    jitted = jax.jit(step, donate_argnums=(4,))
    # hold the module refs: id() keys must not be recycled by the GC while
    # the cache entry lives
    _EVAL_STEP_CACHE[key] = (jitted, model, updater)
    return jitted


def pack_results(results: Dict) -> jnp.ndarray:
    """Results dict -> ONE packed (B, S, 9) float32 array
    [id, label, cx, cy, w, h, score, alive, overflow].  Shared by the
    pipelined submit path and the AOT serving export (serving.py): one
    device fetch per frame, and the packed buffer does NOT alias the
    TrackState outputs (the next dispatch donates the state; aliased
    results fetched late would read deleted buffers).  The per-lane
    overflow count is replicated across that lane's S slot rows."""
    b, s = results["ids"].shape
    over = jnp.broadcast_to(
        results["slot_overflow"].astype(jnp.float32)[:, None], (b, s))
    return jnp.concatenate([
        results["ids"][..., None].astype(jnp.float32),
        results["labels"][..., None].astype(jnp.float32),
        results["boxes"].astype(jnp.float32),
        results["scores"][..., None].astype(jnp.float32),
        results["mask"][..., None].astype(jnp.float32),
        over[..., None],
    ], axis=-1)


def make_eval_step_packed(model, updater, n_det: int, det_thresh: float,
                          track_thresh: float, miss_tolerance: int):
    """Streaming step for the pipelined submit path: ``pack_results`` of
    the core step, memoized and jitted with a donated state."""
    key = ("packed", id(model), id(updater), n_det, det_thresh, track_thresh,
           miss_tolerance)
    if key in _EVAL_STEP_CACHE:
        return _EVAL_STEP_CACHE[key][0]
    core = _eval_core(model, updater, n_det, det_thresh, track_thresh,
                      miss_tolerance)

    def step(params, uparams, images, mask, state):
        results, state = core(params, uparams, images, mask, state)
        return pack_results(results), state

    jitted = jax.jit(step, donate_argnums=(4,))
    _EVAL_STEP_CACHE[key] = (jitted, model, updater)
    return jitted


class Submitter:
    def __init__(self, dataset_name: str, seq_dir: str, seq_name: str,
                 outputs_dir: str, model, updater, params, uparams,
                 config: dict):
        self.dataset_name = dataset_name
        self.seq_name = seq_name
        self.predict_dir = os.path.join(outputs_dir, "tracker")
        os.makedirs(self.predict_dir, exist_ok=True)
        self.model, self.updater = model, updater
        self.params, self.uparams = params, uparams
        self.det_thresh = config["DET_SCORE_THRESH"]
        self.track_thresh = config["TRACK_SCORE_THRESH"]
        self.result_thresh = config["RESULT_SCORE_THRESH"]
        self.miss_tolerance = config["MISS_TOLERANCE"]
        self.track_slots = cfg_get(config, "TRACK_SLOTS", 64)
        self.hidden_dim = config["HIDDEN_DIM"]
        self.use_dab = cfg_get(config, "USE_DAB", True)
        self.area_thresh = 100
        self.use_motion = bool(config.get("USE_MOTION", False))
        self.motion_lambda = config.get("MOTION_LAMBDA", 0.5)
        if self.use_motion:
            from ..models.motion import MotionBank
            self.motion_bank = MotionBank(
                config.get("MOTION_MIN_LENGTH", 3),
                config.get("MOTION_MAX_LENGTH", 5))
        # The default streaming loop is pipelined: raw uint8 frames are
        # uploaded ahead by the prefetch thread (4x fewer host->device bytes
        # than f32, normalized on device), the host dispatches steps without
        # waiting, and a writer thread fetches each frame's packed results
        # and writes them in order — decode, upload, device step and result
        # fetch all overlap.  VISUALIZE and USE_MOTION need per-frame host
        # state, so they fall back to the synchronous loop.
        self.pipelined = not (config.get("VISUALIZE")
                              or config.get("USE_MOTION"))
        self.dataset = SeqDataset(
            seq_dir,
            image_height=cfg_get(config, "EVAL_SHORT_SIDE", 800),
            image_width=cfg_get(config, "EVAL_MAX_SIDE", 1536),
            uint8=self.pipelined)
        # cross-frame eval constants (pos embeds + windowed CPB tables):
        # the canvas mask is sequence-constant, so they are computed once
        # host-side and ride the variables dict (models/eval_cache.py,
        # VERDICT r4 #6).  EVAL_CACHE: 0 restores per-frame recompute.
        if bool(config.get("EVAL_CACHE", True)):
            from ..models.eval_cache import attach_eval_cache
            _m0 = np.asarray(self.dataset[0]["mask"])
            self.params = attach_eval_cache(model, self.params,
                                            _m0.shape, _m0[None])
        self.step = make_eval_step(model, updater, model.n_det_queries,
                                   self.det_thresh, self.track_thresh,
                                   self.miss_tolerance)
        if self.pipelined:
            self.step_packed = make_eval_step_packed(
                model, updater, model.n_det_queries, self.det_thresh,
                self.track_thresh, self.miss_tolerance)
        from ..utils.debug_dump import DebugDumper
        self.dumper = DebugDumper(
            os.path.join(outputs_dir, "visualize", seq_name),
            enabled=bool(config.get("VISUALIZE", False)))
        txt = os.path.join(self.predict_dir, f"{seq_name}.txt")
        if os.path.exists(txt):
            os.remove(txt)

    def _prefetch(self):
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

        def body():
            for i in range(len(self.dataset)):
                q.put(self.dataset[i])

        threading.Thread(target=_guarded(body, q), daemon=True).start()
        yield from _drain(q)

    def run(self) -> float:
        """Returns seconds for FPS reporting: accumulated dispatch+fetch
        time on the sync path, loop wall time on the pipelined path (its
        dispatch never blocks on the device, so per-step timing would
        measure nothing — see ``_run_pipelined``)."""
        import contextlib
        ctx = contextlib.nullcontext()
        if getattr(self.model, "token_shard_axis", None) and \
                len(jax.devices()) > 1:
            # sequence-parallel streaming: encoder tokens shard across chips
            from ..parallel.mesh import make_mesh
            ctx = jax.set_mesh(make_mesh(axis=self.model.token_shard_axis))
        with ctx:
            return self._run_inner()

    def _write_frame(self, i: int, results: Dict, ori_hw,
                     path: str, bdd_results: List[Dict]):
        """Filter one frame's (host numpy) results and write them."""
        bdd_frame, txt_lines = format_frame_results(
            i, results, ori_hw, path, self.result_thresh, self.area_thresh,
            self.dataset_name)
        if bdd_frame is not None:
            bdd_results.append(bdd_frame)
        else:
            with open(os.path.join(self.predict_dir,
                                   f"{self.seq_name}.txt"), "a") as f:
                f.write("".join(txt_lines))

    def _finish(self, bdd_results: List[Dict], overflow_total: int):
        if self.dataset_name == "BDD100K":
            with open(os.path.join(self.predict_dir,
                                   f"{self.seq_name}.json"), "w") as f:
                json.dump(bdd_results, f)
        if overflow_total:
            print(f"[submit {self.seq_name}] WARNING: {overflow_total} "
                  f"newborn tracks dropped (all {self.track_slots} slots "
                  f"full) — raise TRACK_SLOTS", flush=True)

    def _run_inner(self) -> float:
        if self.pipelined:
            return self._run_pipelined()
        return self._run_sync()

    def _run_sync(self) -> float:
        """Per-frame synchronous loop (VISUALIZE / USE_MOTION paths that
        need host state each frame)."""
        import time
        state = TrackState.empty(
            1, self.track_slots, self.hidden_dim, self.model.num_classes,
            use_dab=self.use_dab)
        bdd_results: List[Dict] = []
        device_time = 0.0
        overflow_total = 0
        for i, item in enumerate(self._prefetch()):
            images = jnp.asarray(item["image"])[None]
            mask = jnp.asarray(item["mask"])[None]
            t0 = time.time()
            results, state = self.step(self.params, self.uparams, images,
                                       mask, state)
            results = jax.device_get(results)
            device_time += time.time() - t0
            overflow_total += int(np.sum(results.pop("slot_overflow")))
            self.dumper.dump_frame(i, results=results, state=state)
            if self.use_motion:
                state = self._apply_motion(state)
            self._write_frame(i, results, item["ori_hw"], item["path"],
                              bdd_results)
        self._finish(bdd_results, overflow_total)
        return device_time

    def _run_pipelined(self) -> float:
        """Default streaming loop: the main thread only dispatches compiled
        steps; frame upload (prefetch thread, uint8) and result fetch+write
        (writer thread, one packed array per frame) overlap with device
        execution.  Matches the reference loop's outputs exactly
        (submit_engine.py:58-120) — only the scheduling differs."""
        import time
        state = TrackState.empty(
            1, self.track_slots, self.hidden_dim, self.model.num_classes,
            use_dab=self.use_dab)
        bdd_results: List[Dict] = []
        totals = {"overflow": 0}
        errs: List[BaseException] = []
        results_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)

        def writer():
            try:
                while True:
                    got = results_q.get()
                    if got is None:
                        return
                    i, packed, ori_hw, path = got
                    arr = np.asarray(jax.device_get(packed))[0]  # (S, 9)
                    results = {
                        "ids": arr[:, 0].astype(np.int64)[None],
                        "labels": arr[:, 1].astype(np.int64)[None],
                        "boxes": arr[:, 2:6][None],
                        "scores": arr[:, 6][None],
                        "mask": (arr[:, 7] > 0.5)[None],
                    }
                    totals["overflow"] += int(arr[0, 8])
                    self._write_frame(i, results, ori_hw, path, bdd_results)
            except BaseException as e:   # noqa: BLE001 - surfaced below
                errs.append(e)

        def put_checked(entry) -> bool:
            """Enqueue for the writer, polling for its death: a plain
            blocking put() could wait forever on a full queue after the
            writer thread has died (nothing drains it) — the dispatch loop
            must observe ``errs`` instead of hanging (ROUND3.md nit)."""
            while not errs:
                try:
                    results_q.put(entry, timeout=0.5)
                    return True
                except queue_mod.Full:
                    continue
            return False

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()
        t0 = time.time()
        for i, item in enumerate(self._prefetch_device()):
            packed, state = self.step_packed(
                self.params, self.uparams, item["image_dev"],
                item["mask_dev"], state)
            if not put_checked((i, packed, item["ori_hw"], item["path"])):
                break
        put_checked(None)
        wt.join()
        if errs:
            raise errs[0]
        # Wall time of the dispatch+write loop, NOT accumulated device-step
        # time: dispatches return before the device finishes, so per-step
        # host timing would measure queueing, not work.  For a streaming
        # (latency-bound) loop wall == end-to-end time anyway; bench.py
        # labels the derived number "e2e FPS" accordingly.
        wall_time = time.time() - t0
        self._finish(bdd_results, totals["overflow"])
        return wall_time

    def _prefetch_device(self):
        """Prefetch thread that also uploads: decode i+1/i+2 and push their
        uint8 canvases to the device while frame i is being processed."""
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

        def body():
            for i in range(len(self.dataset)):
                item = self.dataset[i]
                item["image_dev"] = jnp.asarray(item.pop("image"))[None]
                item["mask_dev"] = jnp.asarray(item.pop("mask"))[None]
                q.put(item)

        threading.Thread(target=_guarded(body, q), daemon=True).start()
        yield from _drain(q)

    def _apply_motion(self, state):
        """Post-hoc motion extrapolation of disappeared tracks' reference
        points (submit_engine.py:78-87); host-side, off by default."""
        import numpy as np
        from ..utils.misc import logits_to_scores
        mask = np.asarray(jax.device_get(state.mask[0]))
        ids = np.asarray(jax.device_get(state.ids[0]))
        boxes = np.asarray(jax.device_get(state.boxes[0]))
        last_appear = np.asarray(jax.device_get(state.last_appear_boxes[0]))
        disappear = np.asarray(jax.device_get(state.disappear_time[0]))
        if not hasattr(self, "_prev_disappear"):
            self._prev_disappear = {}
        new_ref = None
        for s in np.nonzero(mask)[0]:
            if disappear[s] == 0:
                # clear history on re-sighting (runtime_tracker.py:47-52)
                reappeared = self._prev_disappear.get(int(ids[s]), 0) > 0
                self.motion_bank.observe(ids[s], boxes[s],
                                         reappeared=reappeared)
            elif disappear[s] > 0:
                extra = self.motion_bank.extrapolate(
                    ids[s], last_appear[s], int(disappear[s]),
                    self.motion_lambda)
                if extra is not None:
                    if new_ref is None:
                        new_ref = np.asarray(
                            jax.device_get(state.ref_pts[0])).copy()
                    from scipy.special import logit
                    clipped = np.clip(extra, 1e-5, 1 - 1e-5)
                    new_ref[s] = logit(clipped)
        for s in np.nonzero(mask)[0]:
            self._prev_disappear[int(ids[s])] = int(disappear[s])
        if new_ref is not None:
            state = state.replace(
                ref_pts=state.ref_pts.at[0].set(jnp.asarray(new_ref)))
        return state


class BatchedSubmitter:
    """Lockstep streaming over B sequences in ONE compiled step — a
    TPU-native serving mode with no reference counterpart (the reference
    parallelizes sequences across processes, submit_engine.py:225-231; here
    one chip amortizes its fixed per-step cost over B batch lanes).

    Every op in the streaming step (forward, lifecycle, query updater, id
    assignment) is batch-pointwise, so each lane tracks its sequence exactly
    as the B=1 path does (asserted in tests/test_submit_batched.py).
    Sequences must share a padded canvas — the caller groups them by
    orientation.  Lanes whose sequence has ended are fed their last frame
    again (keeping shapes static and masks non-degenerate) and their outputs
    dropped.
    """

    def __init__(self, dataset_name: str, datasets: List[SeqDataset],
                 seq_names: List[str], outputs_dir: str, model, updater,
                 params, uparams, config: dict):
        assert len(datasets) == len(seq_names) and datasets
        canvases = {ds.padded_canvas() for ds in datasets}
        assert len(canvases) == 1, \
            f"batch lanes must share a canvas, got {canvases}"
        # Lanes shard over their own data mesh; a model built with a
        # sequence-parallel token axis would hit with_sharding_constraint
        # with an unbound (or conflicting) axis name inside the lane step.
        assert getattr(model, "token_shard_axis", None) is None, \
            "SUBMIT_BATCH>1 is incompatible with TOKEN_SHARD_AXIS; " \
            "use the sequential submit path"
        self.dataset_name = dataset_name
        self.datasets = datasets
        self.seq_names = list(seq_names)
        self.predict_dir = os.path.join(outputs_dir, "tracker")
        os.makedirs(self.predict_dir, exist_ok=True)
        self.model, self.updater = model, updater
        self.params, self.uparams = params, uparams
        self.result_thresh = config["RESULT_SCORE_THRESH"]
        self.miss_tolerance = config["MISS_TOLERANCE"]
        self.track_slots = cfg_get(config, "TRACK_SLOTS", 64)
        self.hidden_dim = config["HIDDEN_DIM"]
        self.use_dab = cfg_get(config, "USE_DAB", True)
        self.area_thresh = 100
        if bool(config.get("EVAL_CACHE", True)):
            # per-lane masks differ; the canvas is asserted shared above
            from ..models.eval_cache import attach_eval_cache
            _m0 = np.stack([ds[0]["mask"] for ds in datasets])
            self.params = attach_eval_cache(model, self.params,
                                            _m0.shape[1:], _m0)
        self.step = make_eval_step(model, updater, model.n_det_queries,
                                   config["DET_SCORE_THRESH"],
                                   config["TRACK_SCORE_THRESH"],
                                   self.miss_tolerance)
        # multi-chip serving: lanes shard across a data mesh when they
        # divide the device count — each chip streams B/n lanes, the same
        # compiled program (the whole step is batch-pointwise, so GSPMD
        # partitions it without collectives)
        self.mesh = None
        n_dev = cfg_get(config, "MESH_DEVICES", None) or len(jax.devices())
        n_dev = min(int(n_dev), len(jax.devices()))
        if n_dev > 1 and len(datasets) % n_dev == 0:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(n_dev)

    def _prefetch(self, lens: List[int]):
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

        def body():
            for i in range(max(lens)):
                items = [ds[min(i, n - 1)]
                         for ds, n in zip(self.datasets, lens)]
                q.put((np.stack([it["image"] for it in items]),
                       np.stack([it["mask"] for it in items]),
                       [it["ori_hw"] for it in items],
                       [it["path"] for it in items]))

        threading.Thread(target=_guarded(body, q), daemon=True).start()
        yield from _drain(q)

    def run(self):
        """Returns (model-step seconds, total frames processed)."""
        import time
        b = len(self.datasets)
        lens = [len(ds) for ds in self.datasets]
        state = TrackState.empty(b, self.track_slots, self.hidden_dim,
                                 self.model.num_classes, use_dab=self.use_dab)
        params, uparams = self.params, self.uparams
        put = jnp.asarray
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicate, shard_batch
            state = shard_batch(self.mesh, state)
            params = replicate(self.mesh, params)
            uparams = replicate(self.mesh, uparams)
            sh = batch_sharding(self.mesh)
            put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731
        txt_lines: List[List[str]] = [[] for _ in range(b)]
        bdd_results: List[List[Dict]] = [[] for _ in range(b)]
        device_time = 0.0
        overflow_total = 0
        for i, (images, mask, ori_hws, paths) in enumerate(
                self._prefetch(lens)):
            t0 = time.time()
            results, state = self.step(params, uparams, put(images),
                                       put(mask), state)
            results = jax.device_get(results)
            device_time += time.time() - t0
            # count only lanes still streaming: ended lanes replay their
            # last frame (shapes stay static) and would otherwise inflate
            # the TRACK_SLOTS warning with phantom overflow
            active = np.asarray([i < n for n in lens])
            overflow_total += int(
                np.sum(np.asarray(results.pop("slot_overflow"))[active]))
            for lane in range(b):
                if i >= lens[lane]:        # this lane's sequence has ended
                    continue
                bdd_frame, lines = format_frame_results(
                    i, results, ori_hws[lane], paths[lane],
                    self.result_thresh, self.area_thresh,
                    self.dataset_name, lane=lane)
                if bdd_frame is not None:
                    bdd_results[lane].append(bdd_frame)
                else:
                    txt_lines[lane].extend(lines)
        for lane, name in enumerate(self.seq_names):
            if self.dataset_name == "BDD100K":
                with open(os.path.join(self.predict_dir,
                                       f"{name}.json"), "w") as f:
                    json.dump(bdd_results[lane], f)
            else:
                with open(os.path.join(self.predict_dir,
                                       f"{name}.txt"), "w") as f:
                    f.write("".join(txt_lines[lane]))
        if overflow_total:
            print(f"[submit batch {self.seq_names}] WARNING: "
                  f"{overflow_total} newborn tracks dropped (all "
                  f"{self.track_slots} slots full) — raise TRACK_SLOTS",
                  flush=True)
        return device_time, sum(lens)


def submit(config: dict):
    """Submit entry (submit_engine.py:187-252)."""
    logger = Logger(logdir=os.path.join(config["SUBMIT_DIR"],
                                        config["SUBMIT_DATA_SPLIT"]))
    train_config = yaml_to_dict(
        os.path.join(config["SUBMIT_DIR"], "train/config.yaml"))
    dataset_name = train_config["DATASET"]
    config = dict(config)
    config["DATASET"] = dataset_name
    for key in ("HIDDEN_DIM", "TRACK_SLOTS", "USE_DAB"):
        if key in train_config:
            config.setdefault(key, train_config[key])

    model = build_model(train_config)
    updater = build_query_updater(train_config)
    from ..checkpoint.orbax_io import load_checkpoint
    ckpt = load_checkpoint(
        os.path.join(config["SUBMIT_DIR"], config["SUBMIT_MODEL"]))
    params = {"params": ckpt["params"]["model"]}
    if "frozen" in ckpt:
        params["frozen"] = ckpt["frozen"]
    uparams = {"params": ckpt["params"]["updater"]}

    split = config["SUBMIT_DATA_SPLIT"]
    root = config["DATA_ROOT"]
    if dataset_name in ("DanceTrack", "SportsMOT"):
        split_dir = os.path.join(root, dataset_name, split)
    elif dataset_name == "BDD100K":
        split_dir = os.path.join(root, dataset_name, "images/track/", split)
    else:
        split_dir = os.path.join(root, dataset_name, "images", split)
    seq_names = sorted(os.listdir(split_dir))
    # shard sequences across hosts (submit_engine.py:225-231)
    seq_names = seq_names[jax.process_index()::jax.process_count()]

    outputs_dir = os.path.join(config["SUBMIT_DIR"], split)
    batch = int(cfg_get(config, "SUBMIT_BATCH", 1) or 1)
    if batch > 1 and (config.get("VISUALIZE") or config.get("USE_MOTION")
                      or cfg_get(config, "TOKEN_SHARD_AXIS", None)):
        logger.show(head="SUBMIT_BATCH ignored: VISUALIZE/USE_MOTION/"
                         "TOKEN_SHARD_AXIS force the sequential submit path")
        batch = 1
    if batch > 1:
        # serving mode: group sequences by canvas orientation, stream up to
        # `batch` of them per compiled step (one TrackState lane each)
        h = cfg_get(config, "EVAL_SHORT_SIDE", 800)
        w = cfg_get(config, "EVAL_MAX_SIDE", 1536)
        groups: Dict[tuple, List[tuple]] = {}
        for seq in seq_names:
            ds = SeqDataset(os.path.join(split_dir, seq), image_height=h,
                            image_width=w)
            groups.setdefault(ds.padded_canvas(), []).append((seq, ds))
        for canvas, members in groups.items():
            for i in range(0, len(members), batch):
                chunk = members[i:i + batch]
                names = [m[0] for m in chunk]
                logger.show(head=f"Submitting batch {names} "
                                 f"(canvas {canvas})")
                BatchedSubmitter(dataset_name, [m[1] for m in chunk], names,
                                 outputs_dir, model, updater, params,
                                 uparams, config).run()
        return
    for seq in seq_names:
        logger.show(head=f"Submitting {seq}")
        Submitter(dataset_name, os.path.join(split_dir, seq), seq,
                  outputs_dir, model, updater, params, uparams, config).run()
