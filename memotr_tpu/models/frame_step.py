"""Per-frame step functions: the compiled units of training and streaming.

These wire the model forward, criterion, track selection and query updater
into pure functions over ``TrackState`` — the fixed-shape counterparts of the
reference's per-frame loop bodies (``train_engine.py:201-230`` and
``submit_engine.py:64-102``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..structures.track_state import TrackState
from ..utils.misc import logits_to_scores
from .criterion import ClipCriterion, FrameGT
from .runtime_tracker import runtime_tracker_step
from .track_selection import select_active_tracks_train


def model_forward(model, params, frames, state: TrackState,
                  deterministic: bool = True, rngs=None) -> Dict:
    """Run the detector+decoder on one frame with the current track slots."""
    return model.apply(
        params, frames.images, frames.mask,
        state.query_embed, state.ref_pts, state.mask,
        deterministic, rngs=rngs)


def apply_query_updater(updater, updater_params, state: TrackState,
                        deterministic: bool = True, rngs=None) -> TrackState:
    """Run the long-term-memory update on the slot bank
    (memotr.py:280-287 -> query_updater.forward)."""
    upd = updater.apply(
        updater_params, state.query_embed, state.ref_pts, state.logits,
        state.boxes, state.output_embed, state.last_output,
        state.long_memory, state.mask, deterministic, rngs=rngs)
    return state.replace(**upd)


def train_frame_step(model, updater, params, updater_params,
                     criterion: ClipCriterion, frames, gt: FrameGT,
                     state: TrackState, rng: jax.Array,
                     update_threshold: float,
                     tp_drop_ratio: float = 0.0,
                     fp_insert_ratio: float = 0.0,
                     no_augment: bool = False,
                     deterministic: bool = True,
                     ) -> Tuple[Dict, jnp.ndarray, TrackState]:
    """One training frame: forward -> losses -> select -> update memory.

    Returns (loss dict, n_gts (B,), next TrackState)."""
    rng_model, rng_sel, rng_upd = jax.random.split(rng, 3)
    out = model_forward(model, params, frames, state,
                        deterministic=deterministic,
                        rngs={"dropout": rng_model} if not deterministic else None)
    losses, n_gts, state, new_cand, um_cand = criterion.process_frame(
        out, state, gt)
    state = select_active_tracks_train(
        state, new_cand, um_cand, rng_sel, update_threshold,
        tp_drop_ratio, fp_insert_ratio, no_augment)
    state = apply_query_updater(
        updater, updater_params, state, deterministic=deterministic,
        rngs={"dropout": rng_upd} if not deterministic else None)
    return losses, n_gts, state


def eval_frame_step(model, updater, params, updater_params, frames,
                    state: TrackState, n_det: int,
                    det_score_thresh: float, track_score_thresh: float,
                    miss_tolerance: int) -> Tuple[Dict, TrackState]:
    """One streaming frame: forward -> lifecycle -> memory update.

    Returns (frame outputs dict for the writer, next TrackState).  The
    returned dict contains the *post-update* slot tensors the submit engine
    filters and writes (submit_engine.py:89-102)."""
    out = model_forward(model, params, frames, state, deterministic=True)
    state = runtime_tracker_step(state, out, n_det, det_score_thresh,
                                 track_score_thresh, miss_tolerance)
    state = apply_query_updater(updater, updater_params, state,
                                deterministic=True)
    results = {
        "ids": state.ids,
        "labels": state.labels,
        "boxes": state.boxes,
        "scores": jnp.max(logits_to_scores(state.logits), axis=-1),
        "mask": state.mask,
    }
    return results, state
