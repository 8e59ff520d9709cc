"""Training-time active-track selection, fixed-slot formulation.

Behavioral spec: the training branch of ``select_active_tracks``
(``/root/reference/models/query_updater.py:168-242``):

- default path (no augmentation): previous tracks + newborn tracks +
  unmatched detections are kept if ``score > UPDATE_THRESH`` or they carry an
  identity; tracks whose IoU vs their GT fell below 0.5 lose their identity
  (id -> -1) but stay active as hard-negative queries (:186-192),
- TP-drop: live (iou>0.5, id>=0) tracks are randomly dropped (:196-199),
- FP-insert: with prob ``fp_insert_ratio`` per live track, the unmatched
  detection with highest IoU overlap against the selected live tracks is
  injected as a false-positive query (:200-217),
- if a batch row ends with zero active tracks, one random "fake" track with
  id -2 is installed so training dynamics match the reference's fallback
  (:219-241) — with fixed slots this is a masked write to slot 0.

Slot capacity: candidates are inserted newborn-tracks-first, then unmatched
detections; overflow beyond the S slots is dropped (the reference is
unbounded; configure TRACK_SLOTS generously).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..structures.track_state import TrackState, insert_tracks
from ..utils.misc import logits_to_scores


def _cand_scores(cand: Dict) -> jnp.ndarray:
    return jnp.max(logits_to_scores(cand["logits"].astype(jnp.float32)), -1)


def select_active_tracks_train(state: TrackState, new_cand: Dict,
                               um_cand: Dict, rng: jax.Array,
                               update_threshold: float,
                               tp_drop_ratio: float = 0.0,
                               fp_insert_ratio: float = 0.0,
                               no_augment: bool = False) -> TrackState:
    b, s = state.mask.shape
    rng_tp, rng_fp, rng_fake = jax.random.split(rng, 3)

    prev_scores = jnp.max(logits_to_scores(state.logits.astype(jnp.float32)), -1)

    if tp_drop_ratio == 0.0 and fp_insert_ratio == 0.0:
        # --- default path (query_updater.py:186-192) -------------------------
        keep_prev = state.mask & ((prev_scores > update_threshold)
                                  | (state.ids >= 0))
        state = state.select(keep_prev)
        state = state.replace(
            ids=jnp.where(state.mask & (state.iou < 0.5), -1, state.ids))

        new_keep = new_cand["mask"]  # ids >= 0 always
        new_ids = jnp.where(new_cand["iou"] < 0.5, -1, new_cand["ids"])
        um_keep = um_cand["mask"] & (_cand_scores(um_cand) > update_threshold)

        cand = {k: jnp.concatenate([new_cand[k], um_cand[k]], axis=1)
                for k in new_cand}
        cand["mask"] = jnp.concatenate([new_keep, um_keep], axis=1)
        cand["ids"] = jnp.concatenate([new_ids, um_cand["ids"]], axis=1)
        state = insert_tracks(state, cand)
    else:
        # --- augmented path (query_updater.py:193-217) ------------------------
        keep_prev = state.mask & (state.iou > 0.5) & (state.ids >= 0)
        state = state.select(keep_prev)
        new_keep = new_cand["mask"] & (new_cand["iou"] > 0.5) \
            & (new_cand["ids"] >= 0)

        if tp_drop_ratio > 0.0 and not no_augment:
            drop_prev = jax.random.uniform(rng_tp, state.mask.shape) \
                <= tp_drop_ratio
            state = state.select(~drop_prev)
            drop_new = jax.random.uniform(
                jax.random.fold_in(rng_tp, 1), new_keep.shape) <= tp_drop_ratio
            new_keep = new_keep & ~drop_new

        fp_keep = jnp.zeros(um_cand["mask"].shape, bool)
        if fp_insert_ratio > 0.0 and not no_augment:
            # choose live tracks to shadow with an FP
            sel_prev = state.mask & (jax.random.uniform(
                rng_fp, state.mask.shape) < fp_insert_ratio)
            sel_new = new_keep & (jax.random.uniform(
                jax.random.fold_in(rng_fp, 1), new_keep.shape)
                < fp_insert_ratio)
            from ..utils import box_ops
            sel_boxes = jnp.concatenate(
                [state.boxes, new_cand["boxes"]], axis=1)      # (B, S+G, 4)
            sel_mask = jnp.concatenate([sel_prev, sel_new], axis=1)
            iou, _ = box_ops.box_iou_union(
                box_ops.box_cxcywh_to_xyxy(um_cand["boxes"]),
                box_ops.box_cxcywh_to_xyxy(sel_boxes))         # (B, Nd, S+G)
            iou = jnp.where(sel_mask[:, None, :] & um_cand["mask"][:, :, None],
                            iou, -1.0)
            best_um = jnp.argmax(iou, axis=1)                  # (B, S+G)
            hit = jnp.max(iou, axis=1) > -1.0
            fp_keep = jax.vmap(
                lambda bu, h, n: jnp.zeros((n,), bool).at[bu].set(h),
                in_axes=(0, 0, None))(best_um, hit, um_cand["mask"].shape[1])
            fp_keep = fp_keep & um_cand["mask"]

        cand = {k: jnp.concatenate([new_cand[k], um_cand[k]], axis=1)
                for k in new_cand}
        cand["mask"] = jnp.concatenate([new_keep, fp_keep], axis=1)
        state = insert_tracks(state, cand)

    # --- fake-track fallback for empty rows (query_updater.py:219-241) -------
    none_active = ~state.mask.any(axis=1)                      # (B,)
    qdim = state.query_embed.shape[-1]
    c = state.output_embed.shape[-1]
    k = state.logits.shape[-1]
    fake_q = jax.random.normal(rng_fake, (b, qdim))
    fake_out = jax.random.normal(jax.random.fold_in(rng_fake, 1), (b, c))
    fake_ref = jax.random.normal(jax.random.fold_in(rng_fake, 2), (b, 4))
    fake_box = jax.random.normal(jax.random.fold_in(rng_fake, 3), (b, 4))
    fake_log = jax.random.normal(jax.random.fold_in(rng_fake, 4), (b, k))
    fake_mem = jax.random.normal(jax.random.fold_in(rng_fake, 5), (b, c))

    def put0(arr, val):
        w = none_active.reshape((b,) + (1,) * (arr.ndim - 1))
        return jnp.where(w, arr.at[:, 0].set(val.astype(arr.dtype)), arr)

    state = state.replace(
        mask=jnp.where(none_active[:, None],
                       state.mask.at[:, 0].set(True), state.mask),
        ids=put0(state.ids, jnp.full((b,), -2, jnp.int32)),
        matched_idx=put0(state.matched_idx, jnp.full((b,), -2, jnp.int32)),
        query_embed=put0(state.query_embed, fake_q),
        output_embed=put0(state.output_embed, fake_out),
        ref_pts=put0(state.ref_pts, fake_ref),
        boxes=put0(state.boxes, fake_box),
        logits=put0(state.logits, fake_log),
        iou=put0(state.iou, jnp.zeros((b,))),
        last_output=put0(state.last_output, fake_out),
        long_memory=put0(state.long_memory, fake_mem),
    )
    return state
