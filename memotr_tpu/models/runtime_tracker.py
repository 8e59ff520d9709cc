"""Streaming track lifecycle (inference), fixed-slot formulation.

Behavioral spec: ``/root/reference/models/runtime_tracker.py:13-101`` and the
eval branch of ``select_active_tracks`` (query_updater.py:243-254).  All
lifecycle decisions are masked tensor ops on the ``TrackState`` slot bank so
the whole per-frame step stays inside one compiled function:

- existing tracks absorb the frame's track-query outputs (boxes/logits/
  output_embed),
- ``disappear_time`` increments when the track's class score (at its birth
  label) drops below TRACK_SCORE_THRESH, resets otherwise; hitting
  MISS_TOLERANCE kills the slot (id -> -1, slot freed),
- detection queries with max score >= DET_SCORE_THRESH become newborn
  candidates; ids are assigned monotonically from the per-row ``next_id``
  counter in detection-query order (runtime_tracker.py:83-87),
- newborn query embeddings come from the second-to-last decoder layer's
  output (``queries[-1]``), reference points from ``last_ref_pts``
  (runtime_tracker.py:59-74),
- newborns' ``last_output``/``long_memory`` are initialized from their output
  embedding / query embedding (query_updater.py:246-251).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..structures.track_state import TrackState, insert_tracks
from ..utils.misc import logits_to_scores


def update_tracked_slots(state: TrackState, model_out: Dict, n_det: int) -> TrackState:
    """Write the frame's track-query outputs into live slots
    (runtime_tracker.py:39-42 / criterion.py:372-386)."""
    gate = state.mask[..., None]
    boxes = model_out["pred_boxes"][:, n_det:]
    logits = model_out["pred_logits"][:, n_det:]
    out_embed = model_out["outputs"][:, n_det:]
    return state.replace(
        boxes=jnp.where(gate, boxes, state.boxes),
        logits=jnp.where(gate, logits, state.logits),
        output_embed=jnp.where(gate, out_embed, state.output_embed),
    )


def runtime_lifecycle(state: TrackState, track_score_thresh: float,
                      miss_tolerance: int) -> TrackState:
    """Disappear-time bookkeeping and track killing
    (runtime_tracker.py:43-54)."""
    scores = logits_to_scores(state.logits)                    # (B, S, K)
    label_score = jnp.take_along_axis(
        scores, jnp.clip(state.labels, 0)[..., None], axis=-1)[..., 0]
    low = label_score < track_score_thresh
    disappear = jnp.where(state.mask & low, state.disappear_time + 1, 0)
    reappeared = state.mask & ~low & (state.disappear_time > 0)
    last_appear = jnp.where((state.mask & ~low)[..., None], state.boxes,
                            state.last_appear_boxes)
    dead = disappear >= miss_tolerance
    ids = jnp.where(state.mask & dead, -1, state.ids)
    return state.replace(
        disappear_time=disappear, ids=ids,
        last_appear_boxes=last_appear,
        mask=state.mask & ~dead,
    )


def newborn_candidates(state: TrackState, model_out: Dict, n_det: int,
                       det_score_thresh: float) -> Tuple[Dict, jnp.ndarray]:
    """Detection queries above threshold become newborn track candidates
    (runtime_tracker.py:56-94).  Returns (candidates dict for insert_tracks,
    updated next_id)."""
    det_logits = model_out["pred_logits"][:, :n_det]           # (B, Nd, K)
    det_scores = logits_to_scores(det_logits)
    max_scores = jnp.max(det_scores, axis=-1)
    born = max_scores >= det_score_thresh                      # (B, Nd)

    # monotonic id assignment in detection-query order
    rank = jnp.cumsum(born.astype(jnp.int32), axis=1) - 1
    ids = jnp.where(born, state.next_id[:, None] + rank, -1)
    next_id = state.next_id + jnp.sum(born.astype(jnp.int32), axis=1)

    # queries[-1] = output embedding of the second-to-last decoder layer
    newborn_embed = model_out["queries"][-1][:, :n_det]
    if "det_query_embed" in model_out and newborn_embed.shape[-1] * 2 == \
            model_out["det_query_embed"].shape[-1]:
        # D-DETR: positional half from the learned det queries
        # (runtime_tracker.py:68-74)
        c = newborn_embed.shape[-1]
        pos_half = jnp.broadcast_to(
            model_out["det_query_embed"][None, :, :c],
            newborn_embed.shape)
        newborn_embed = jnp.concatenate([pos_half, newborn_embed], axis=-1)

    cand = {
        "mask": born,
        "ids": ids,
        "labels": jnp.argmax(det_scores, axis=-1).astype(jnp.int32),
        "logits": det_logits,
        "boxes": model_out["pred_boxes"][:, :n_det],
        "ref_pts": model_out["last_ref_pts"][:, :n_det],
        "output_embed": model_out["outputs"][:, :n_det],
        "query_embed": newborn_embed,
        "disappear_time": jnp.zeros_like(ids),
        # eval-path init (query_updater.py:246-251)
        "last_output": model_out["outputs"][:, :n_det],
        "long_memory": (newborn_embed if newborn_embed.shape[-1] ==
                        model_out["outputs"].shape[-1]
                        else newborn_embed[..., newborn_embed.shape[-1] // 2:]),
        "last_appear_boxes": model_out["pred_boxes"][:, :n_det],
    }
    return cand, next_id


def runtime_tracker_step(state: TrackState, model_out: Dict, n_det: int,
                         det_score_thresh: float, track_score_thresh: float,
                         miss_tolerance: int, with_overflow: bool = False):
    """Full eval-time lifecycle: absorb outputs, kill, spawn, merge.

    Mirrors submit_engine.py:67-72: RuntimeTracker.update followed by the
    eval branch of select_active_tracks (keep ids >= 0, concat newborns).
    With ``with_overflow`` also returns the number of newborn candidates
    silently dropped because no free slot remained ((B,) int32).
    """
    from ..structures.track_state import overflow_count

    state = update_tracked_slots(state, model_out, n_det)
    state = runtime_lifecycle(state, track_score_thresh, miss_tolerance)
    cand, next_id = newborn_candidates(state, model_out, n_det,
                                       det_score_thresh)
    state = state.replace(next_id=next_id)
    state = state.select(state.ids >= 0)   # eval keeps identified slots only
    if with_overflow:
        return insert_tracks(state, cand), overflow_count(state, cand)
    return insert_tracks(state, cand)
