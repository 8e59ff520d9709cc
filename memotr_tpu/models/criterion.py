"""Clip criterion: tracking-aware detection losses, fixed-shape.

Behavioral spec: ``/root/reference/models/criterion.py:26-494``.  Per frame:

1. tracked slots absorb the frame's outputs; each live slot looks up its GT
   by identity (criterion.py:165-181) -> ``matched_idx`` (-1 if disappeared),
2. GTs not covered by a live track are Hungarian-matched against the 300
   detection queries only (criterion.py:182-197) with cost
   ``5*L1 + 2*focal-class + 2*(-GIoU)`` (matcher.py:100-121),
3. focal label loss over *all* unmasked queries (background = no-object
   class), L1+GIoU over matched pairs, each normalized later by the
   all-reduced GT count (criterion.py:118-136, 388-439),
4. aux losses per decoder layer with re-matching; layers below
   ``merge_det_track_layer`` match against *all* GTs and carry no track
   assignments (criterion.py:277-315),
5. matched detections become newborn track candidates carrying the
   second-to-last decoder layer's output embedding (criterion.py:210-238),
   unmatched detections are collected for the FP-insert augmentation
   (criterion.py:317-347), and per-slot IoU vs GT is refreshed for the query
   updater's gating (criterion.py:354-368).

GTs arrive padded: ``FrameGT`` arrays of static shape (B, G, ...) with a
validity mask, so the whole frame step jits once.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.hungarian import hungarian_cost_padded
from ..structures.track_state import TrackState
from ..utils import box_ops
from ..utils.misc import logits_to_scores


@struct.dataclass
class FrameGT:
    boxes: jnp.ndarray    # (B, G, 4) normalized cxcywh
    labels: jnp.ndarray   # (B, G) int32
    ids: jnp.ndarray      # (B, G) int32
    mask: jnp.ndarray     # (B, G) bool


def focal_class_cost(det_probs: jnp.ndarray, gt_labels: jnp.ndarray,
                     alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """(B, Nd, K) x (B, G) -> (B, G, Nd) focal matching cost
    (matcher.py:101-106)."""
    pos = alpha * ((1 - det_probs) ** gamma) * (-jnp.log(det_probs + 1e-8))
    neg = (1 - alpha) * (det_probs ** gamma) * (-jnp.log(1 - det_probs + 1e-8))
    cost = pos - neg                                        # (B, Nd, K)
    # select per-GT label column -> (B, G, Nd)
    lab = jnp.clip(gt_labels, 0)
    return jnp.take_along_axis(
        jnp.swapaxes(cost, 1, 2), lab[:, :, None], axis=1)


def match_cost_matrix(det_logits, det_boxes, gt: FrameGT,
                      w_class: float, w_bbox: float, w_giou: float):
    """Cost (B, G, Nd) with reference weights (matcher.py:113-121)."""
    probs = logits_to_scores(det_logits)
    c_class = focal_class_cost(probs, gt.labels)
    c_bbox = jnp.sum(jnp.abs(gt.boxes[:, :, None, :] - det_boxes[:, None, :, :]),
                     axis=-1)                                # (B, G, Nd)
    giou = box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(gt.boxes),
        box_ops.box_cxcywh_to_xyxy(det_boxes))               # (B, G, Nd)
    return w_bbox * c_bbox + w_class * c_class - w_giou * giou


def _invert_assignment(col4row: jnp.ndarray, row_mask: jnp.ndarray,
                       n_cols: int) -> jnp.ndarray:
    """(B, G) row->col assignment to (B, n_cols) col->row; -1 unassigned."""
    b, g = col4row.shape
    gt_index = jnp.broadcast_to(jnp.arange(g, dtype=jnp.int32)[None], (b, g))
    idx = jnp.where(row_mask & (col4row >= 0), col4row, n_cols)

    def scatter_one(idx_row, gt_row):
        out = jnp.full((n_cols,), -1, jnp.int32)
        return out.at[idx_row].set(gt_row, mode="drop")

    return jax.vmap(scatter_one)(idx, gt_index)


def sigmoid_focal_loss(logits, targets_onehot, valid,
                       alpha: float = 0.25, gamma: float = 2.0):
    """Reference focal loss (criterion.py:442-467): per-element focal BCE,
    mean over classes, summed over valid queries."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    loss = alpha_t * loss
    per_query = jnp.mean(loss, axis=-1)                     # (B, N)
    return jnp.sum(jnp.where(valid, per_query, 0.0))


class ClipCriterion:
    """Stateless per-frame loss computation; the trainer accumulates the
    returned loss dict across the clip and normalizes by psum'd GT count."""

    def __init__(self, num_classes: int, n_det_queries: int,
                 w_match_class: float = 2.0, w_match_bbox: float = 5.0,
                 w_match_giou: float = 2.0,
                 merge_det_track_layer: int = 0,
                 aux_weights=None, use_dab: bool = True,
                 hidden_dim: int = 256, aux_loss: bool = True):
        self.num_classes = num_classes
        self.n_det = n_det_queries
        self.w_match = (w_match_class, w_match_bbox, w_match_giou)
        self.merge_layer = merge_det_track_layer
        self.aux_weights = aux_weights
        self.use_dab = use_dab
        self.hidden_dim = hidden_dim
        self.aux_loss = aux_loss

    # ------------------------------------------------------------------ losses
    def _label_loss(self, logits, query_valid, q2gt, gt: FrameGT):
        """Focal loss over all valid queries; background where q2gt < 0."""
        lab = jnp.take_along_axis(gt.labels, jnp.clip(q2gt, 0), axis=1)
        lab = jnp.where(q2gt >= 0, lab, self.num_classes)    # (B, N)
        onehot = jax.nn.one_hot(lab, self.num_classes + 1)[..., :-1]
        return sigmoid_focal_loss(logits, onehot, query_valid)

    def _box_loss(self, boxes, query_valid, q2gt, gt: FrameGT):
        matched = (q2gt >= 0) & query_valid                  # (B, N)
        gt_boxes = jnp.take_along_axis(
            gt.boxes, jnp.clip(q2gt, 0)[..., None], axis=1)  # (B, N, 4)
        l1 = jnp.sum(jnp.abs(boxes - gt_boxes), axis=-1)
        loss_l1 = jnp.sum(jnp.where(matched, l1, 0.0))
        giou = box_ops.generalized_box_iou_pairwise(
            box_ops.box_cxcywh_to_xyxy(boxes),
            box_ops.box_cxcywh_to_xyxy(gt_boxes))
        loss_giou = jnp.sum(jnp.where(matched, 1.0 - giou, 0.0))
        return loss_l1, loss_giou

    def _match_dets(self, det_logits, det_boxes, gt: FrameGT, row_mask):
        """Hungarian over (masked) GT rows x det queries; no gradients."""
        cost = match_cost_matrix(
            jax.lax.stop_gradient(det_logits.astype(jnp.float32)),
            jax.lax.stop_gradient(det_boxes.astype(jnp.float32)),
            gt, *self.w_match)
        return hungarian_cost_padded(cost, row_mask)          # (B, G)

    # ------------------------------------------------------------- frame step
    def process_frame(self, model_out: Dict, state: TrackState, gt: FrameGT
                      ) -> Tuple[Dict, jnp.ndarray, TrackState, Dict, Dict]:
        """Returns (loss dict, n_gts (B,), state with refreshed bookkeeping,
        new-track candidates, unmatched-det candidates)."""
        nd = self.n_det
        b, g = gt.mask.shape

        # 1-2. tracked slots absorb outputs & look up their GT by identity
        gate = state.mask[..., None]
        state = state.replace(
            boxes=jnp.where(gate, model_out["pred_boxes"][:, nd:], state.boxes),
            logits=jnp.where(gate, model_out["pred_logits"][:, nd:], state.logits),
            output_embed=jnp.where(gate, model_out["outputs"][:, nd:],
                                   state.output_embed),
        )
        eq = ((state.ids[:, :, None] == gt.ids[:, None, :])
              & state.mask[:, :, None] & gt.mask[:, None, :]
              & (state.ids >= 0)[:, :, None])                 # (B, S, G)
        matched_idx = jnp.where(eq.any(-1), jnp.argmax(eq, -1), -1)
        state = state.replace(matched_idx=matched_idx.astype(jnp.int32))
        tracked_gt = eq.any(axis=1)                           # (B, G)
        untracked = gt.mask & ~tracked_gt

        # 5. Hungarian: untracked GTs x detection queries (final layer)
        det_logits = model_out["pred_logits"][:, :nd]
        det_boxes = model_out["pred_boxes"][:, :nd]
        col4row = self._match_dets(det_logits, det_boxes, gt, untracked)
        det2gt = _invert_assignment(col4row, untracked, nd)   # (B, Nd)

        # 7. combined query->GT assignment for the final layer
        q2gt = jnp.concatenate([det2gt, state.matched_idx], axis=1)
        query_valid = ~model_out["query_mask"]

        losses = {}
        losses["label_focal_loss"] = self._label_loss(
            model_out["pred_logits"].astype(jnp.float32), query_valid, q2gt, gt)
        l1, giou = self._box_loss(
            model_out["pred_boxes"].astype(jnp.float32), query_valid, q2gt, gt)
        losses["box_l1_loss"] = l1
        losses["box_giou_loss"] = giou

        # 11. aux per decoder layer (all but last)
        if self.aux_loss:
            n_layers = model_out["all_logits"].shape[0]
            aux_l1 = aux_giou = aux_focal = 0.0
            for i in range(n_layers - 1):
                a_logits = model_out["all_logits"][i].astype(jnp.float32)
                a_boxes = model_out["all_boxes"][i].astype(jnp.float32)
                if i < self.merge_layer:
                    a_col = self._match_dets(a_logits[:, :nd], a_boxes[:, :nd],
                                             gt, gt.mask)
                    a_det2gt = _invert_assignment(a_col, gt.mask, nd)
                    a_q2gt = jnp.concatenate(
                        [a_det2gt, jnp.full_like(state.matched_idx, -1)], axis=1)
                else:
                    a_col = self._match_dets(a_logits[:, :nd], a_boxes[:, :nd],
                                             gt, untracked)
                    a_det2gt = _invert_assignment(a_col, untracked, nd)
                    a_q2gt = jnp.concatenate([a_det2gt, state.matched_idx],
                                             axis=1)
                w = self.aux_weights[i] if self.aux_weights else 1.0
                aux_focal += w * self._label_loss(a_logits, query_valid,
                                                  a_q2gt, gt)
                a_l1, a_giou = self._box_loss(a_boxes, query_valid, a_q2gt, gt)
                aux_l1 += w * a_l1
                aux_giou += w * a_giou
            losses["aux_label_focal_loss"] = aux_focal
            losses["aux_box_l1_loss"] = aux_l1
            losses["aux_box_giou_loss"] = aux_giou

        n_gts = jnp.sum(gt.mask, axis=1)                      # (B,)

        # ------- new-track candidates: matched dets adopt the GT identity ----
        q = jnp.clip(col4row, 0)                              # (B, G)
        born = untracked                                       # every valid row matched

        def take_det(arr):                                     # (B, Nd, ...) -> (B, G, ...)
            return jax.vmap(lambda a, qi: a[qi])(arr, q)

        new_embed = take_det(model_out["queries"][-1][:, :nd])
        if not self.use_dab:
            pos_half = jnp.broadcast_to(
                model_out["det_query_embed"][None, :, :self.hidden_dim],
                (b, nd, self.hidden_dim))
            new_embed = jnp.concatenate([take_det(pos_half), new_embed], -1)
        new_boxes = take_det(det_boxes)
        new_iou = box_ops.box_iou_pairwise(
            box_ops.box_cxcywh_to_xyxy(new_boxes),
            box_ops.box_cxcywh_to_xyxy(gt.boxes))
        new_cand = {
            "mask": born,
            "ids": jnp.where(born, gt.ids, -1),
            "labels": gt.labels.astype(jnp.int32),
            "matched_idx": jnp.where(
                born, jnp.arange(g, dtype=jnp.int32)[None], -1),
            "query_embed": new_embed,
            "ref_pts": take_det(model_out["last_ref_pts"][:, :nd]),
            "output_embed": take_det(model_out["outputs"][:, :nd]),
            "boxes": new_boxes,
            "logits": take_det(det_logits),
            "iou": jnp.where(born, new_iou, 0.0),
            "last_output": take_det(model_out["outputs"][:, :nd]),
            "long_memory": (new_embed if self.use_dab
                            else new_embed[..., self.hidden_dim:]),
        }

        # ------- unmatched detections (criterion.py:317-347) -----------------
        unmatched = det2gt < 0                                 # (B, Nd)
        um_embed = model_out["queries"][-1][:, :nd]
        if not self.use_dab:
            um_embed = jnp.concatenate(
                [jnp.broadcast_to(
                    model_out["det_query_embed"][None, :, :self.hidden_dim],
                    (b, nd, self.hidden_dim)), um_embed], -1)
        um_cand = {
            "mask": unmatched,
            "ids": jnp.full((b, nd), -1, jnp.int32),
            "matched_idx": jnp.full((b, nd), -1, jnp.int32),
            "labels": jnp.zeros((b, nd), jnp.int32),
            "query_embed": um_embed,
            "ref_pts": model_out["init_ref_pts"][:, :nd],
            "output_embed": model_out["outputs"][:, :nd],
            "boxes": det_boxes,
            "logits": det_logits,
            "iou": jnp.zeros((b, nd)),
            "last_output": model_out["outputs"][:, :nd],
            "long_memory": (um_embed if self.use_dab
                            else um_embed[..., self.hidden_dim:]),
        }

        # ------- refresh tracked-slot IoU for updater gating ------------------
        has_gt = state.matched_idx >= 0
        track_gt_boxes = jnp.take_along_axis(
            gt.boxes, jnp.clip(state.matched_idx, 0)[..., None], axis=1)
        track_iou = box_ops.box_iou_pairwise(
            box_ops.box_cxcywh_to_xyxy(state.boxes),
            box_ops.box_cxcywh_to_xyxy(track_gt_boxes))
        state = state.replace(iou=jnp.where(has_gt & state.mask, track_iou,
                                            state.iou))

        return losses, n_gts, state, new_cand, um_cand


def build_criterion(config: dict) -> ClipCriterion:
    from ..config import cfg_get, num_classes_for_dataset
    return ClipCriterion(
        num_classes=num_classes_for_dataset(config["DATASET"]),
        n_det_queries=config["NUM_DET_QUERIES"],
        w_match_class=config["MATCH_COST_CLASS"],
        w_match_bbox=config["MATCH_COST_BBOX"],
        w_match_giou=config["MATCH_COST_GIOU"],
        merge_det_track_layer=cfg_get(config, "MERGE_DET_TRACK_LAYER", 0),
        aux_weights=config.get("AUX_LOSS_WEIGHT"),
        use_dab=cfg_get(config, "USE_DAB", True),
        hidden_dim=config["HIDDEN_DIM"],
        aux_loss=config.get("AUX_LOSS", True),
    )
