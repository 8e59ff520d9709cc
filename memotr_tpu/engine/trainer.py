"""Training step: clip loss, optimizer, LR schedule, parameter groups.

Behavioral spec: ``/root/reference/train_engine.py``.

- **param groups** (train_engine.py:291-336): backbone (LR_BACKBONE),
  reference_points + sampling_offsets heads (LR_POINTS), query updater (LR),
  everything else (LR).  The ResNet stem + layer1 are frozen
  (backbone.py:72-74) -> zero LR mask.  After
  ``ONLY_TRAIN_QUERY_UPDATER_AFTER`` epochs every group except the query
  updater gets LR 0 (train_engine.py:104-107).
- **optimizer**: AdamW semantics (clip-grad-global-norm 0.1 -> adam ->
  decoupled weight decay -> per-group LR), grad accumulation by averaging
  micro-batch gradients (train_engine.py:237-246).
- **loss**: sum of per-frame weighted focal/L1/GIoU (+aux) normalized by the
  all-reduced GT count (criterion.py:118-136) — here the normalization is a
  plain global sum because the step is compiled over the *global* batch and
  XLA inserts the cross-device reductions.
- **clip loop**: frames run sequentially inside one differentiable step (one
  joint graph across frames, train_engine.py:201-230); ``NO_GRAD_FRAMES``
  stops gradients through the first k frames (train_engine.py:119-124).
  The last frame skips the selection/updater postprocess, like
  train_engine.py:213-215.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import cfg_get
from ..models.criterion import ClipCriterion, FrameGT
from ..models.frame_step import (apply_query_updater, model_forward)
from ..models.track_selection import select_active_tracks_train
from ..structures.padded_frame import PaddedFrames
from ..structures.track_state import TrackState

LOSS_WEIGHT_KEYS = ("label_focal_loss", "box_l1_loss", "box_giou_loss")


# --------------------------------------------------------------- param groups
def param_group_label(path: Tuple[str, ...]) -> str:
    """Map a parameter path to its LR group (train_engine.py:291-336)."""
    joined = "/".join(str(p) for p in path)
    if "backbone" in joined:
        if any(f"backbone/{frozen}" in joined
               for frozen in ("conv1", "bn1", "layer1_")):
            return "frozen"
        return "backbone"
    if "reference_points" in joined or "sampling_offsets" in joined:
        return "points"
    if joined.startswith("updater") or "query_updater" in joined:
        return "query_updater"
    return "base"


def label_tree(params) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = [param_group_label(tuple(getattr(k, "key", getattr(k, "idx", ""))
                                      for k in path)) for path, _ in flat]
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, labels)


def lr_schedule_factory(config: dict):
    """Per-epoch LR multiplier (train_engine.py:56-68)."""
    kind = config.get("LR_SCHEDULER", "MultiStep")
    if kind == "MultiStep":
        milestones = list(config["LR_DROP_MILESTONES"])
        gamma = config["LR_DROP_RATE"]

        def schedule(epoch: int) -> float:
            return gamma ** sum(1 for m in milestones if epoch >= m)
    elif kind == "Cosine":
        t_max = config["EPOCHS"]

        def schedule(epoch: int) -> float:
            import math
            return 0.5 * (1 + math.cos(math.pi * epoch / t_max))
    else:
        raise ValueError(f"Unknown LR scheduler '{kind}'")
    return schedule


def warmup_scale(global_iter: int, warmup_iters: int) -> float:
    """Linear LR warmup multiplier (TPU-native knob, WARMUP_ITERS; the
    reference schedule has none).  1.0 once ``global_iter >= warmup_iters``
    or when warmup is off."""
    if warmup_iters <= 0 or global_iter >= warmup_iters:
        return 1.0
    return (global_iter + 1) / warmup_iters


def group_lrs(config: dict, epoch: int) -> Dict[str, float]:
    """Resolved per-group LR for this epoch, including the updater-only
    freeze (train_engine.py:104-107)."""
    mult = lr_schedule_factory(config)(epoch)
    lrs = {
        "backbone": config["LR_BACKBONE"] * mult,
        "points": config["LR_POINTS"] * mult,
        "query_updater": config["LR"] * mult,
        "base": config["LR"] * mult,
        "frozen": 0.0,
    }
    if epoch >= config.get("ONLY_TRAIN_QUERY_UPDATER_AFTER", 10 ** 9):
        lrs["backbone"] = lrs["points"] = lrs["base"] = 0.0
    return lrs


def make_optimizer(config: dict) -> optax.GradientTransformation:
    """clip(0.1) -> adam -> decoupled weight decay.  The per-group LR is
    applied separately in ``apply_updates_grouped`` so it can change every
    epoch without rebuilding optimizer state."""
    return optax.chain(
        optax.clip_by_global_norm(config.get("CLIP_MAX_NORM", 0.1)),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(config.get("WEIGHT_DECAY", 0.0)),
    )


class TrainState(NamedTuple):
    params: Any            # trainable {"model": ..., "updater": ...}
    opt_state: Any


def zero_frozen_grads(grads, labels):
    """Zero frozen-group gradients before clipping and the optimizer.

    The reference's ``clip_grad_norm_(model.parameters(), 0.1)`` only sees
    trainable gradients — frozen stem/layer1 params have ``.grad = None``
    (``/root/reference/models/backbone.py:72-74``, requires_grad_(False)) —
    whereas our frozen-label leaves live in the same trainable tree (their
    updates are LR-0'd).  Letting their grads enter
    ``optax.clip_by_global_norm`` inflates the global norm and over-clips
    the live grads whenever the 0.1 cap engages; it also distorts the
    logged ``grad_norm``."""
    return jax.tree.map(
        lambda g, lbl: jnp.zeros_like(g) if lbl == "frozen" else g,
        grads, labels)


# --------------------------------------------------------------- distillation
def distill_frame_losses(out: Dict, t_out: Dict, n_det: int) -> Dict:
    """Per-frame teacher->student distillation terms (no reference
    counterpart; the TPU-native lever for closing the windowed-vs-deformable
    quality gap, QUALITY.md):

    - ``distill_memory``: masked MSE between encoder memories — trains the
      TPU-native encoder to reproduce the deformable encoder's features
      (shapes match: same backbone strides and hidden dim);
    - ``distill_logit``: sigmoid BCE of student detection logits against
      teacher probabilities (soft targets);
    - ``distill_box``: teacher-confidence-weighted L1 between detection-query
      boxes, so background queries do not dominate.
    """
    valid = (~out["memory_mask"])[..., None].astype(jnp.float32)
    s_mem = out["memory"].astype(jnp.float32)
    t_mem = t_out["memory"].astype(jnp.float32)
    mem = jnp.sum(valid * (s_mem - t_mem) ** 2) / (
        jnp.maximum(jnp.sum(valid), 1.0) * s_mem.shape[-1])

    s_log = out["pred_logits"][:, :n_det].astype(jnp.float32)
    t_prob = jax.nn.sigmoid(t_out["pred_logits"][:, :n_det]
                            .astype(jnp.float32))
    bce = optax.sigmoid_binary_cross_entropy(s_log, t_prob)
    logit = jnp.mean(bce)

    conf = jnp.max(t_prob, axis=-1)                         # (B, Nd)
    l1 = jnp.sum(jnp.abs(out["pred_boxes"][:, :n_det].astype(jnp.float32)
                         - t_out["pred_boxes"][:, :n_det]
                         .astype(jnp.float32)), axis=-1)
    box = jnp.sum(conf * l1) / jnp.maximum(jnp.sum(conf), 1e-6)
    return {"distill_memory": mem, "distill_logit": logit,
            "distill_box": box}


# ------------------------------------------------------------------ clip loss
def clip_loss(trainable, frozen, model, updater, criterion: ClipCriterion,
              batch: Dict, rng: jax.Array, config_static: Dict,
              distill=None, teacher_params=None
              ) -> Tuple[jnp.ndarray, Dict]:
    """Loss over one clip batch.

    batch: images (B,T,H,W,3), mask (B,T,H,W), gt_* (B,T,G,...).
    config_static: hashable subset (n_frames, thresholds, weights...).
    distill: optional {"model": teacher_model, "weights": {name: w}} —
    the teacher forward (stop-gradient, empty track slots: neither the
    memory nor the det-query outputs depend on live tracks) is run per frame
    and ``distill_frame_losses`` terms are added to the total.

    ``TRAIN_FRAME_SCAN`` (config, default off) dispatches to the
    ``lax.scan`` formulation ``_clip_loss_scan`` below — identical numerics
    (tests/test_trainer_scan.py), one traced frame body instead of T.
    """
    cs = config_static
    if cs.get("frame_scan") and not cs.get("visualize") \
            and images_frames_scannable(batch, cs):
        return _clip_loss_scan(trainable, frozen, model, updater, criterion,
                               batch, rng, config_static, distill=distill,
                               teacher_params=teacher_params)
    images = batch["images"]
    b, t = images.shape[0], images.shape[1]
    model_params = {"params": trainable["model"], **frozen}
    updater_params = {"params": trainable["updater"]}

    state = TrackState.empty(b, cs["track_slots"], cs["hidden_dim"],
                             cs["num_classes"], use_dab=cs["use_dab"])
    loss_acc: Dict[str, jnp.ndarray] = {}
    frame_logs: Dict[str, jnp.ndarray] = {}
    n_gts_total = jnp.zeros((), jnp.float32)
    distill_acc = jnp.zeros((), jnp.float32)
    deterministic = cs["dropout"] == 0.0

    for f in range(t):
        no_grad = f < cs["no_grad_frames"]
        gt = FrameGT(boxes=batch["gt_boxes"][:, f],
                     labels=batch["gt_labels"][:, f],
                     ids=batch["gt_ids"][:, f],
                     mask=batch["gt_mask"][:, f])
        frames = PaddedFrames(images=images[:, f], mask=batch["mask"][:, f])
        rng, r_model, r_sel, r_upd = jax.random.split(rng, 4)

        def frame_body(state, trainable):
            mp = {"params": trainable["model"], **frozen}
            up = {"params": trainable["updater"]}
            out = model_forward(
                model, mp, frames, state, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": r_model})
            dterms = {}
            if distill is not None:
                t_state = TrackState.empty(
                    b, cs["track_slots"], cs["hidden_dim"],
                    cs["num_classes"], use_dab=cs["use_dab"])
                t_out = jax.lax.stop_gradient(model_forward(
                    distill["model"], teacher_params, frames, t_state,
                    deterministic=True))
                dterms = distill_frame_losses(out, t_out,
                                              model.n_det_queries)
            dbg_out = {}
            if cs.get("visualize"):
                dbg_out = {k: jax.lax.stop_gradient(out[k]) for k in
                           ("pred_logits", "pred_boxes", "last_ref_pts")}
            losses, n_gts, state, new_cand, um_cand = criterion.process_frame(
                out, state, gt)
            if f < t - 1:   # last frame skips postprocess (train_engine:213)
                state = select_active_tracks_train(
                    state, new_cand, um_cand, r_sel, cs["update_threshold"],
                    cs["tp_drop_ratio"], cs["fp_insert_ratio"],
                    no_augment=no_grad and f < cs["no_grad_frames"] - 1)
                state = apply_query_updater(
                    updater, up, state, deterministic=deterministic,
                    rngs=None if deterministic else {"dropout": r_upd})
            return losses, n_gts, state, dterms, dbg_out

        if no_grad:
            losses, n_gts, state, dterms, dbg_out = jax.lax.stop_gradient(
                frame_body(state, trainable))
        else:
            losses, n_gts, state, dterms, dbg_out = frame_body(
                state, trainable)

        for k, v in dterms.items():
            w = distill["weights"].get(k, 1.0)
            distill_acc = distill_acc + w * v / t
            frame_logs[k] = frame_logs.get(k, 0.0) + v / t

        if cs.get("visualize"):
            # training-path VISUALIZE: per-frame decoder outputs + post-
            # update track state, dumped by the train loop (the reference
            # dumps decoder/updater internals during training too,
            # deformable_decoder.py:97-136, query_updater.py:86-97)
            dbg = frame_logs.setdefault("debug", {})
            for k, v in dbg_out.items():
                dbg[f"frame{f}.{k}"] = v
            dbg[f"frame{f}.track_query_embed"] = jax.lax.stop_gradient(
                state.query_embed)
            dbg[f"frame{f}.track_long_memory"] = jax.lax.stop_gradient(
                state.long_memory)
            dbg[f"frame{f}.track_mask"] = state.mask

        for k, v in losses.items():
            loss_acc[k] = loss_acc.get(k, 0.0) + v * cs["frame_weight"]
        frame_gts = jnp.sum(n_gts).astype(jnp.float32)
        n_gts_total = n_gts_total + frame_gts
        # per-frame normalized logs (criterion.py:131-135, 272-274)
        frame_norm = jnp.maximum(frame_gts / cs["world_size"], 1.0) \
            * cs["world_size"]
        for k in ("box_l1_loss", "box_giou_loss", "label_focal_loss"):
            if k in losses:
                frame_logs[f"frame{f}_{k}"] = losses[k] / frame_norm

    # normalization identical to criterion.get_mean_by_n_gts under DDP
    world = cs["world_size"]
    normalizer = jnp.maximum(n_gts_total / world, 1.0) * world
    weights = cs["loss_weights"]

    def w_for(name):
        for k in LOSS_WEIGHT_KEYS:
            if k in name:
                return weights[k]
        return 1.0

    total = sum(w_for(k) * v for k, v in loss_acc.items()) / normalizer
    total = total + distill_acc
    logs = {k: v / normalizer for k, v in loss_acc.items()}
    logs.update(frame_logs)
    logs["total_loss"] = total
    logs["n_gts"] = n_gts_total
    return total, logs


def images_frames_scannable(batch, cs) -> bool:
    """Scan pays off only when >= 2 frames land inside the scanned span
    (frames [no_grad, t-1); the prefix and the last frame stay unrolled)."""
    t = batch["images"].shape[1]
    return (t - 1 - cs["no_grad_frames"]) >= 2


def _clip_loss_scan(trainable, frozen, model, updater, criterion,
                    batch: Dict, rng: jax.Array, config_static: Dict,
                    distill=None, teacher_params=None
                    ) -> Tuple[jnp.ndarray, Dict]:
    """``lax.scan`` formulation of ``clip_loss`` (TRAIN_FRAME_SCAN).

    The unrolled clip loop traces and compiles the frame body T times — the
    dominant cold-compile cost of the train step (~90 s windowed / ~4 min
    deformable at proxy scale, ROUND3.md).  Here the frame body is traced
    ONCE: the no-grad prefix frames (stop-gradient, like
    train_engine.py:119-124) and the postprocess-free last frame
    (train_engine.py:213-215) stay unrolled, frames [k, t-1) run under one
    ``lax.scan``.  Numerics match the unrolled path to float tolerance
    (tests/test_trainer_scan.py); VISUALIZE keeps the unrolled path (its
    per-frame debug dict is not scan-stackable).
    """
    cs = config_static
    images = batch["images"]
    b, t = images.shape[0], images.shape[1]
    k = cs["no_grad_frames"]
    deterministic = cs["dropout"] == 0.0

    keys = jax.random.split(rng, 3 * t)
    keys = keys.reshape((t, 3) + keys.shape[1:])

    def empty_state():
        return TrackState.empty(b, cs["track_slots"], cs["hidden_dim"],
                                cs["num_classes"], use_dab=cs["use_dab"])

    def frame_body(state, f_images, f_mask, f_gtb, f_gtl, f_gti, f_gtm,
                   f_keys, postprocess, no_augment):
        """One frame: forward -> distill terms -> criterion -> (postprocess).
        Returns (losses, n_gts(B,), next_state, dterms)."""
        gt = FrameGT(boxes=f_gtb, labels=f_gtl, ids=f_gti, mask=f_gtm)
        frames = PaddedFrames(images=f_images, mask=f_mask)
        mp = {"params": trainable["model"], **frozen}
        up = {"params": trainable["updater"]}
        out = model_forward(
            model, mp, frames, state, deterministic=deterministic,
            rngs=None if deterministic else {"dropout": f_keys[0]})
        dterms = {}
        if distill is not None:
            t_out = jax.lax.stop_gradient(model_forward(
                distill["model"], teacher_params, frames, empty_state(),
                deterministic=True))
            dterms = distill_frame_losses(out, t_out, model.n_det_queries)
        losses, n_gts, state, new_cand, um_cand = criterion.process_frame(
            out, state, gt)
        if postprocess:
            state = select_active_tracks_train(
                state, new_cand, um_cand, f_keys[1], cs["update_threshold"],
                cs["tp_drop_ratio"], cs["fp_insert_ratio"],
                no_augment=no_augment)
            state = apply_query_updater(
                updater, up, state, deterministic=deterministic,
                rngs=None if deterministic else {"dropout": f_keys[2]})
        return losses, n_gts, state, dterms

    def frame_args(f):
        return (images[:, f], batch["mask"][:, f], batch["gt_boxes"][:, f],
                batch["gt_labels"][:, f], batch["gt_ids"][:, f],
                batch["gt_mask"][:, f], keys[f])

    state = empty_state()
    per_frame = []      # (losses, n_gts(B,), dterms) in frame order

    # no-grad prefix, unrolled under stop_gradient (train_engine.py:119-124)
    for f in range(k):
        losses, n_gts, state, dterms = jax.lax.stop_gradient(frame_body(
            state, *frame_args(f), postprocess=True,
            no_augment=f < k - 1))
        per_frame.append((losses, n_gts, dterms))

    # frames [k, t-1): ONE scanned body with postprocess
    def scan_step(state, xs):
        losses, n_gts, state, dterms = frame_body(
            state, *xs, postprocess=True, no_augment=False)
        return state, (losses, n_gts, dterms)

    xs = (jnp.moveaxis(images[:, k:t - 1], 1, 0),
          jnp.moveaxis(batch["mask"][:, k:t - 1], 1, 0),
          jnp.moveaxis(batch["gt_boxes"][:, k:t - 1], 1, 0),
          jnp.moveaxis(batch["gt_labels"][:, k:t - 1], 1, 0),
          jnp.moveaxis(batch["gt_ids"][:, k:t - 1], 1, 0),
          jnp.moveaxis(batch["gt_mask"][:, k:t - 1], 1, 0),
          keys[k:t - 1])         # keys are already time-major (t, 3, ...)
    state, (s_losses, s_ngts, s_dterms) = jax.lax.scan(scan_step, state, xs)
    n_scan = t - 1 - k
    for i in range(n_scan):
        per_frame.append((
            jax.tree.map(lambda x: x[i], s_losses),
            jax.tree.map(lambda x: x[i], s_ngts),
            jax.tree.map(lambda x: x[i], s_dterms)))

    # last frame, unrolled, skips postprocess (train_engine.py:213-215)
    losses, n_gts, state, dterms = frame_body(
        state, *frame_args(t - 1), postprocess=False, no_augment=False)
    per_frame.append((losses, n_gts, dterms))

    # accumulation identical to the unrolled path
    loss_acc: Dict[str, jnp.ndarray] = {}
    frame_logs: Dict[str, jnp.ndarray] = {}
    n_gts_total = jnp.zeros((), jnp.float32)
    distill_acc = jnp.zeros((), jnp.float32)
    for f, (losses, n_gts, dterms) in enumerate(per_frame):
        for name, v in dterms.items():
            w = distill["weights"].get(name, 1.0)
            distill_acc = distill_acc + w * v / t
            frame_logs[name] = frame_logs.get(name, 0.0) + v / t
        for name, v in losses.items():
            loss_acc[name] = loss_acc.get(name, 0.0) + v * cs["frame_weight"]
        frame_gts = jnp.sum(n_gts).astype(jnp.float32)
        n_gts_total = n_gts_total + frame_gts
        frame_norm = jnp.maximum(frame_gts / cs["world_size"], 1.0) \
            * cs["world_size"]
        for name in ("box_l1_loss", "box_giou_loss", "label_focal_loss"):
            if name in losses:
                frame_logs[f"frame{f}_{name}"] = losses[name] / frame_norm

    world = cs["world_size"]
    normalizer = jnp.maximum(n_gts_total / world, 1.0) * world
    weights = cs["loss_weights"]

    def w_for(name):
        for key_ in LOSS_WEIGHT_KEYS:
            if key_ in name:
                return weights[key_]
        return 1.0

    total = sum(w_for(name) * v for name, v in loss_acc.items()) / normalizer
    total = total + distill_acc
    logs = {name: v / normalizer for name, v in loss_acc.items()}
    logs.update(frame_logs)
    logs["total_loss"] = total
    logs["n_gts"] = n_gts_total
    return total, logs


def static_config(config: dict, model, world_size: int = 1) -> Dict:
    no_grad = cfg_get(config, "NO_GRAD_FRAMES", None)
    return {
        "track_slots": cfg_get(config, "TRACK_SLOTS", 64),
        "hidden_dim": config["HIDDEN_DIM"],
        "num_classes": model.num_classes,
        "use_dab": cfg_get(config, "USE_DAB", True),
        "update_threshold": config["UPDATE_THRESH"],
        "tp_drop_ratio": cfg_get(config, "TP_DROP_RATE", 0.0),
        "fp_insert_ratio": cfg_get(config, "FP_INSERT_RATE", 0.0),
        "no_grad_frames": 0 if no_grad is None else no_grad,
        "frame_scan": bool(config.get("TRAIN_FRAME_SCAN", False)),
        "visualize": bool(config.get("VISUALIZE", False)),
        "dropout": config.get("DROPOUT", 0.0),
        "frame_weight": 1.0,
        "world_size": world_size,
        "loss_weights": {
            "label_focal_loss": config["LOSS_WEIGHT_FOCAL"],
            "box_l1_loss": config["LOSS_WEIGHT_L1"],
            "box_giou_loss": config["LOSS_WEIGHT_GIOU"],
        },
    }


def make_train_step(model, updater, criterion: ClipCriterion,
                    optimizer: optax.GradientTransformation,
                    config_static: Dict, labels, distill=None):
    """Build the jitted (donated) train step.

    signature: (train_state, frozen, batch, rng, lrs[, teacher_params])
    -> (train_state, logs)
    ``labels``: param-group label tree (static, closed over).
    ``lrs``: per-group learning rates as a dict of scalars (jnp arrays so an
    epoch LR change does not retrigger compilation).
    ``distill``: optional {"model", "weights"}; when set, pass the teacher's
    variables as the extra ``teacher_params`` argument.
    """

    def loss_fn(trainable, frozen, batch, rng, teacher_params):
        return clip_loss(trainable, frozen, model, updater, criterion,
                         batch, rng, config_static, distill=distill,
                         teacher_params=teacher_params)

    def step(train_state: TrainState, frozen, batch, rng, lrs,
             teacher_params=None):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_state.params, frozen, batch, rng, teacher_params)
        grads = zero_frozen_grads(grads, labels)
        updates, new_opt = optimizer.update(grads, train_state.opt_state,
                                            train_state.params)
        # per-group LR applied leaf-wise (AdamW: p -= lr*(adam + wd*p))
        updates = jax.tree.map(
            lambda u, lbl: u * -lrs[lbl], updates, labels)
        new_params = optax.apply_updates(train_state.params, updates)
        grad_norm = optax.global_norm(grads)
        logs = dict(logs, grad_norm=grad_norm)
        return TrainState(new_params, new_opt), logs

    return jax.jit(step, donate_argnums=(0,))


def make_accum_steps(model, updater, criterion: ClipCriterion,
                     optimizer: optax.GradientTransformation,
                     config_static: Dict, labels, accumulation: int,
                     distill=None):
    """Gradient accumulation: the loss is divided by ACCUMULATION_STEPS and
    micro-batch gradients summed before one optimizer hit, matching the
    reference exactly (train_engine.py:237-246).

    Returns (grad_step, apply_step):
      grad_step(params, frozen, batch, rng, grad_accum[, teacher_params])
        -> (grad_accum, logs)
      apply_step(train_state, grad_accum, lrs) -> train_state
    """

    def loss_fn(trainable, frozen, batch, rng, teacher_params):
        total, logs = clip_loss(trainable, frozen, model, updater, criterion,
                                batch, rng, config_static, distill=distill,
                                teacher_params=teacher_params)
        return total / accumulation, logs

    def grad_step(params, frozen, batch, rng, grad_accum,
                  teacher_params=None):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frozen, batch, rng, teacher_params)
        grads = zero_frozen_grads(grads, labels)
        if grad_accum is None:
            return grads, logs
        return jax.tree.map(jnp.add, grad_accum, grads), logs

    def apply_step(train_state: TrainState, grad_accum, lrs):
        updates, new_opt = optimizer.update(grad_accum, train_state.opt_state,
                                            train_state.params)
        updates = jax.tree.map(lambda u, lbl: u * -lrs[lbl], updates, labels)
        new_params = optax.apply_updates(train_state.params, updates)
        return TrainState(new_params, new_opt)

    return (jax.jit(grad_step, donate_argnums=(4,)),
            jax.jit(apply_step, donate_argnums=(0, 1)))


def no_grad_frames_for_epoch(config: Dict, epoch: int):
    """Resolve the NO_GRAD_FRAMES schedule (train_engine.py:119-124):
    NO_GRAD_STEPS is a descending epoch-threshold list; the first threshold
    the epoch has reached selects the matching NO_GRAD_FRAMES entry."""
    steps = config.get("NO_GRAD_STEPS")
    frames = config.get("NO_GRAD_FRAMES")
    if not steps or frames is None:
        return frames if isinstance(frames, int) else None
    if isinstance(frames, int):
        frames = [frames] * len(steps)
    for i, s in enumerate(steps):
        if epoch >= s:
            return frames[i]
    return None


def init_train_state(params_model: Dict, params_updater: Dict,
                     optimizer: optax.GradientTransformation) -> TrainState:
    trainable = {"model": params_model, "updater": params_updater}
    opt_state = optimizer.init(trainable)
    return TrainState(trainable, opt_state)
