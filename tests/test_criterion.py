"""Criterion semantics on a hand-constructed frame (criterion.py:138-370)."""
import jax.numpy as jnp
import numpy as np

from memotr_tpu.models.criterion import ClipCriterion, FrameGT
from memotr_tpu.structures.track_state import TrackState

B, S, C, K, ND, G, L = 1, 3, 8, 1, 4, 3, 2


def _logits(scores):
    s = np.clip(np.asarray(scores, np.float64), 1e-6, 1 - 1e-6)
    return np.log(s / (1 - s)).astype(np.float32)


def _setup():
    crit = ClipCriterion(num_classes=K, n_det_queries=ND, hidden_dim=C,
                         merge_det_track_layer=1, aux_weights=[1.0],
                         aux_loss=True)
    # GT: three boxes with ids 100, 101, 102
    gt = FrameGT(
        boxes=jnp.asarray([[[0.2, 0.2, 0.1, 0.1],
                            [0.5, 0.5, 0.1, 0.1],
                            [0.8, 0.8, 0.1, 0.1]]]),
        labels=jnp.zeros((B, G), jnp.int32),
        ids=jnp.asarray([[100, 101, 102]], jnp.int32),
        mask=jnp.ones((B, G), bool))

    # one live track already following id 100, predicted right on target
    state = TrackState.empty(B, S, C, K)
    state = state.replace(
        mask=jnp.asarray([[True, False, False]]),
        ids=jnp.asarray([[100, -1, -1]], jnp.int32))

    nq = ND + S
    det_boxes = np.tile([[0.05, 0.05, 0.02, 0.02]], (ND, 1)).astype(np.float32)
    det_boxes[1] = [0.5, 0.5, 0.1, 0.1]    # det query 1 sits on gt 101
    det_boxes[3] = [0.8, 0.8, 0.1, 0.1]    # det query 3 sits on gt 102
    det_scores = [0.1, 0.9, 0.1, 0.9]
    track_boxes = np.asarray([[0.2, 0.2, 0.1, 0.1],
                              [0.0, 0.0, 0.01, 0.01],
                              [0.0, 0.0, 0.01, 0.01]], np.float32)
    boxes = np.concatenate([det_boxes, track_boxes])[None]
    logits = np.concatenate([_logits(det_scores),
                             _logits([0.9, 0.5, 0.5])])[None, :, None]
    model_out = {
        "pred_boxes": jnp.asarray(boxes),
        "pred_logits": jnp.asarray(logits),
        "outputs": jnp.ones((B, nq, C)),
        "queries": jnp.ones((L, B, nq, C)),
        "last_ref_pts": jnp.zeros((B, nq, 4)),
        "init_ref_pts": jnp.zeros((B, nq, 4)),
        "det_query_embed": jnp.ones((ND, C)),
        "query_mask": jnp.asarray([[False] * ND + [False, True, True]]),
        "all_logits": jnp.tile(jnp.asarray(logits)[None], (L, 1, 1, 1)),
        "all_boxes": jnp.tile(jnp.asarray(boxes)[None], (L, 1, 1, 1)),
    }
    return crit, gt, state, model_out


def test_identity_carryover_and_matching():
    crit, gt, state, out = _setup()
    losses, n_gts, state2, new_cand, um_cand = crit.process_frame(
        out, state, gt)
    # tracked slot keeps gt 100 (index 0)
    assert int(state2.matched_idx[0, 0]) == 0
    # untracked gts (101, 102) matched to det queries 1 and 3
    nc_mask = np.asarray(new_cand["mask"][0])
    assert nc_mask.tolist() == [False, True, True]
    assert int(new_cand["ids"][0, 1]) == 101
    assert int(new_cand["ids"][0, 2]) == 102
    # new-track candidates carry perfect-IoU bookkeeping
    np.testing.assert_allclose(np.asarray(new_cand["iou"][0, 1]), 1.0,
                               atol=1e-5)
    # unmatched dets are exactly queries 0 and 2
    um = np.asarray(um_cand["mask"][0])
    assert um.tolist() == [True, False, True, False]
    # tracked slot's iou refreshed to 1.0 (prediction == gt box)
    np.testing.assert_allclose(float(state2.iou[0, 0]), 1.0, atol=1e-5)
    assert int(n_gts[0]) == 3
    for v in losses.values():
        assert np.isfinite(float(v))


def test_box_loss_zero_when_perfect():
    crit, gt, state, out = _setup()
    losses, *_ = crit.process_frame(out, state, gt)
    # all three matched boxes are exact -> L1 and GIoU losses ~0
    assert float(losses["box_l1_loss"]) < 1e-5
    assert float(losses["box_giou_loss"]) < 1e-4


def test_disappeared_track_gets_background():
    crit, gt, state, out = _setup()
    # make the tracked id not exist in this frame's GT
    gt2 = FrameGT(boxes=gt.boxes, labels=gt.labels,
                  ids=jnp.asarray([[900, 101, 102]], jnp.int32), mask=gt.mask)
    losses, _, state2, new_cand, _ = crit.process_frame(out, state, gt2)
    assert int(state2.matched_idx[0, 0]) == -1
    # gt 900 (box index 0) is untracked now -> 3 new candidates
    assert np.asarray(new_cand["mask"][0]).sum() == 3


def test_losses_increase_when_boxes_wrong():
    crit, gt, state, out = _setup()
    base, *_ = crit.process_frame(out, state, gt)
    out_bad = dict(out)
    out_bad["pred_boxes"] = out["pred_boxes"].at[0, 1].set(
        jnp.asarray([0.4, 0.4, 0.2, 0.2]))
    bad, *_ = crit.process_frame(out_bad, state, gt)
    assert float(bad["box_l1_loss"]) > float(base["box_l1_loss"])
