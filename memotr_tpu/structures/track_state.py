"""Fixed-shape track-slot state.

The reference carries per-object state in a ragged, per-frame-variable
``TrackInstances`` tensor bag (``/root/reference/structures/track_instances.py:7-129``)
and re-pads track queries to the batch max every frame
(``/root/reference/models/memotr.py:209-278``).  On TPU that shape churn forces
a recompile whenever the number of live tracks changes — fatal for streaming.

Here every per-object field lives in a ``(B, S, ...)`` array with a fixed slot
count ``S``; a boolean ``mask`` marks occupied slots.  Track birth, death and
update are masked writes, so one compiled per-frame step serves the entire
sequence.  The field set matches the reference's ``TrackInstances``
(track_instances.py:19-37) plus the explicit ``mask`` and a per-batch-row
``next_id`` counter replacing ``RuntimeTracker.max_obj_id``
(runtime_tracker.py:83-87).

``ref_pts`` is stored in *logit* space (pre-sigmoid), exactly like the
reference's ``ref_pts`` field.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrackState:
    # --- identity / lifecycle ------------------------------------------------
    mask: jnp.ndarray            # (B, S) bool — slot holds an active track query
    ids: jnp.ndarray             # (B, S) int32 — object id; -1 = no identity
    labels: jnp.ndarray          # (B, S) int32
    disappear_time: jnp.ndarray  # (B, S) int32
    next_id: jnp.ndarray         # (B,)  int32 — monotonic id counter
    # --- query tensors -------------------------------------------------------
    query_embed: jnp.ndarray     # (B, S, C) for DAB, (B, S, 2C) for D-DETR
    ref_pts: jnp.ndarray         # (B, S, 4) logit-space anchors
    # --- last-frame outputs ---------------------------------------------------
    logits: jnp.ndarray          # (B, S, K)
    boxes: jnp.ndarray           # (B, S, 4) normalized cxcywh
    output_embed: jnp.ndarray    # (B, S, C)
    # --- memory ---------------------------------------------------------------
    last_output: jnp.ndarray     # (B, S, C)
    long_memory: jnp.ndarray     # (B, S, C)
    last_appear_boxes: jnp.ndarray  # (B, S, 4)
    # --- training bookkeeping --------------------------------------------------
    matched_idx: jnp.ndarray     # (B, S) int32 — index into this frame's GT list; -1 none
    iou: jnp.ndarray             # (B, S) f32 — IoU vs matched GT (updater gating)

    # ------------------------------------------------------------------ helpers
    @property
    def batch_size(self) -> int:
        return self.mask.shape[0]

    @property
    def num_slots(self) -> int:
        return self.mask.shape[1]

    @staticmethod
    def empty(batch_size: int, num_slots: int, hidden_dim: int,
              num_classes: int, use_dab: bool = True,
              dtype: Any = jnp.float32) -> "TrackState":
        """An all-free slot bank (reference: TrackInstances.init_tracks)."""
        b, s, c = batch_size, num_slots, hidden_dim
        qdim = c if use_dab else 2 * c
        zeros = lambda *shape, dt=dtype: jnp.zeros(shape, dt)  # noqa: E731
        return TrackState(
            mask=jnp.zeros((b, s), jnp.bool_),
            ids=jnp.full((b, s), -1, jnp.int32),
            labels=jnp.zeros((b, s), jnp.int32),
            disappear_time=jnp.zeros((b, s), jnp.int32),
            next_id=jnp.zeros((b,), jnp.int32),
            query_embed=zeros(b, s, qdim),
            ref_pts=zeros(b, s, 4),
            logits=jnp.full((b, s, num_classes), -10.0, dtype),
            boxes=zeros(b, s, 4),
            output_embed=zeros(b, s, c),
            last_output=zeros(b, s, c),
            long_memory=zeros(b, s, c),
            last_appear_boxes=zeros(b, s, 4),
            matched_idx=jnp.full((b, s), -1, jnp.int32),
            iou=zeros(b, s),
        )

    # Fields written per-slot by masked updates.
    _SLOT_FIELDS = (
        "mask", "ids", "labels", "disappear_time", "query_embed", "ref_pts",
        "logits", "boxes", "output_embed", "last_output", "long_memory",
        "last_appear_boxes", "matched_idx", "iou",
    )

    def select(self, keep: jnp.ndarray) -> "TrackState":
        """Kill slots where ``keep`` is False (masked equivalent of the
        reference's boolean indexing ``tracks[keep_idxes]``)."""
        return self.replace(mask=self.mask & keep)

    def where(self, cond: jnp.ndarray, other: "TrackState") -> "TrackState":
        """Per-slot select between two states: cond True -> self's slot."""
        def pick(a, b):
            c = cond.reshape(cond.shape + (1,) * (a.ndim - cond.ndim))
            return jnp.where(c, a, b)
        updates = {f: pick(getattr(self, f), getattr(other, f))
                   for f in self._SLOT_FIELDS}
        return self.replace(**updates)


def _insert_row(state_row: dict, cand_row: dict, num_slots: int) -> dict:
    """Insert candidate entries into free slots of one batch row.

    ``state_row`` / ``cand_row`` are dicts of per-slot arrays with leading dim
    S (slots) / N (candidates) and a boolean "mask".  Candidates are placed in
    candidate order into free slots in slot order; overflow candidates are
    dropped.  This is the fixed-shape equivalent of the reference's
    ``TrackInstances.cat_tracked_instances`` (track_instances.py:87-94).
    """
    mask = state_row["mask"]
    cand_mask = cand_row["mask"]
    # Free slots in increasing slot order: argsort(False<True) is stable.
    free_order = jnp.argsort(mask, stable=True)          # (S,), free first
    n_free = jnp.sum(~mask)
    cand_rank = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1   # (N,)
    ok = cand_mask & (cand_rank < n_free)
    slot_idx = free_order[jnp.clip(cand_rank, 0, num_slots - 1)]
    # Route dropped candidates out of range; scatter mode='drop' discards them.
    slot_idx = jnp.where(ok, slot_idx, num_slots)
    out = {}
    for key, arr in state_row.items():
        val = cand_row[key]
        out[key] = arr.at[slot_idx].set(val, mode="drop")
    return out


def overflow_count(state: TrackState, candidates: dict) -> jnp.ndarray:
    """Candidates that will NOT fit in free slots, per batch item.

    ``insert_tracks`` silently drops overflow (documented); this companion
    makes the drop observable so engines can surface it ((B,) int32,
    jit-safe).  Per-lane rather than batch-summed so the batched submit
    path can exclude ended lanes (whose replayed last frames would
    otherwise inflate the TRACK_SLOTS warning)."""
    n_free = jnp.sum(~state.mask, axis=1)                     # (B,)
    n_cand = jnp.sum(candidates["mask"].astype(jnp.int32), axis=1)
    return jnp.maximum(n_cand - n_free, 0)


def insert_tracks(state: TrackState, candidates: dict) -> TrackState:
    """Write candidate tracks into free slots (vmapped over batch).

    ``candidates`` maps slot-field names -> (B, N, ...) arrays and must
    include "mask" (B, N) marking real candidates.  Fields not provided
    default to zeros (ids default to -1).  Returns the updated state.
    """
    b, s = state.mask.shape
    n = candidates["mask"].shape[1]
    full: dict[str, jnp.ndarray] = {}
    for f in TrackState._SLOT_FIELDS:
        cur = getattr(state, f)
        if f in candidates:
            cand = candidates[f].astype(cur.dtype)
        elif f == "ids" or f == "matched_idx":
            cand = jnp.full((b, n), -1, cur.dtype)
        else:
            cand = jnp.zeros((b, n) + cur.shape[2:], cur.dtype)
        full[f] = cand
    state_fields = {f: getattr(state, f) for f in TrackState._SLOT_FIELDS}
    merged = jax.vmap(lambda sr, cr: _insert_row(sr, cr, s))(state_fields, full)
    return state.replace(**merged)
