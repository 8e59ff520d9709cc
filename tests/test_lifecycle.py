"""Track lifecycle semantics: runtime tracker, selection rules, updater
gating — hand-crafted slot tensors, no backbone involved."""
import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.models.runtime_tracker import (newborn_candidates,
                                               runtime_lifecycle,
                                               runtime_tracker_step,
                                               update_tracked_slots)
from memotr_tpu.models.track_selection import select_active_tracks_train
from memotr_tpu.structures.track_state import TrackState

B, S, C, K, ND = 1, 4, 8, 1, 6


def _state(ids, mask, scores=None, disappear=None):
    st = TrackState.empty(B, S, C, K)
    st = st.replace(ids=jnp.asarray([ids], jnp.int32),
                    mask=jnp.asarray([mask]),
                    labels=jnp.zeros((B, S), jnp.int32))
    if scores is not None:
        # logits so that sigmoid(logit) == score
        logits = np.log(np.asarray(scores) / (1 - np.asarray(scores)))
        st = st.replace(logits=jnp.asarray(logits, jnp.float32
                                           ).reshape(B, S, K))
    if disappear is not None:
        st = st.replace(disappear_time=jnp.asarray([disappear], jnp.int32))
    return st


def _model_out(det_scores, track_scores=None, n=ND):
    """Minimal fake model output dict."""
    def to_logits(s):
        s = np.clip(np.asarray(s, np.float64), 1e-6, 1 - 1e-6)
        return np.log(s / (1 - s)).astype(np.float32)
    track_scores = track_scores if track_scores is not None else [0.9] * S
    logits = np.concatenate([to_logits(det_scores), to_logits(track_scores)])
    nq = n + S
    return {
        "pred_logits": jnp.asarray(logits).reshape(1, nq, 1),
        "pred_boxes": jnp.tile(jnp.asarray([[0.5, 0.5, 0.1, 0.1]]),
                               (1, nq, 1)).reshape(1, nq, 4),
        "outputs": jnp.ones((1, nq, C)),
        "last_ref_pts": jnp.zeros((1, nq, 4)),
        "init_ref_pts": jnp.zeros((1, nq, 4)),
        "queries": jnp.ones((2, 1, nq, C)),
        "det_query_embed": jnp.ones((n, C)),
        "query_mask": jnp.zeros((1, nq), bool),
    }


def test_disappear_time_and_kill():
    # score at the track's label below thresh -> disappear++, kill at tol
    st = _state(ids=[0, 1, -1, -1], mask=[True, True, False, False],
                scores=[[0.2], [0.9], [0.5], [0.5]], disappear=[1, 0, 0, 0])
    st2 = runtime_lifecycle(st, track_score_thresh=0.5, miss_tolerance=2)
    assert int(st2.disappear_time[0, 0]) == 2
    assert int(st2.ids[0, 0]) == -1          # killed at tolerance
    assert not bool(st2.mask[0, 0])
    assert int(st2.disappear_time[0, 1]) == 0  # confident -> reset
    assert int(st2.ids[0, 1]) == 1


def test_reappearance_resets_counter():
    st = _state(ids=[0, -1, -1, -1], mask=[True, False, False, False],
                scores=[[0.9], [0.5], [0.5], [0.5]], disappear=[3, 0, 0, 0])
    st2 = runtime_lifecycle(st, track_score_thresh=0.5, miss_tolerance=5)
    assert int(st2.disappear_time[0, 0]) == 0
    assert bool(st2.mask[0, 0])


def test_newborn_ids_monotonic_in_det_order():
    st = TrackState.empty(B, S, C, K).replace(next_id=jnp.asarray([7]))
    out = _model_out(det_scores=[0.9, 0.1, 0.8, 0.1, 0.95, 0.2])
    cand, next_id = newborn_candidates(st, out, ND, det_score_thresh=0.7)
    ids = np.asarray(cand["ids"][0])
    assert ids.tolist() == [7, -1, 8, -1, 9, -1]
    assert int(next_id[0]) == 10
    assert np.asarray(cand["mask"][0]).tolist() == [True, False, True, False,
                                                    True, False]


def test_full_tracker_step_spawns_and_fills_slots():
    st = TrackState.empty(B, S, C, K)
    out = _model_out(det_scores=[0.9, 0.8, 0.85, 0.75, 0.95, 0.9])
    st2 = runtime_tracker_step(st, out, ND, det_score_thresh=0.7,
                               track_score_thresh=0.5, miss_tolerance=5)
    # 6 newborns into 4 slots -> first 4 kept in det order
    assert int(st2.mask.sum()) == S
    assert sorted(np.asarray(st2.ids[0]).tolist()) == [0, 1, 2, 3]


def test_selection_default_rules():
    st = _state(ids=[5, 6, -1, -1], mask=[True, True, False, False],
                scores=[[0.9], [0.2], [0.5], [0.5]])
    st = st.replace(iou=jnp.asarray([[0.8, 0.8, 0.0, 0.0]]))
    empty_cand = {
        "mask": jnp.zeros((B, 2), bool), "ids": jnp.full((B, 2), -1, jnp.int32),
        "labels": jnp.zeros((B, 2), jnp.int32),
        "matched_idx": jnp.full((B, 2), -1, jnp.int32),
        "query_embed": jnp.zeros((B, 2, C)), "ref_pts": jnp.zeros((B, 2, 4)),
        "output_embed": jnp.zeros((B, 2, C)), "boxes": jnp.zeros((B, 2, 4)),
        "logits": jnp.zeros((B, 2, K)), "iou": jnp.zeros((B, 2)),
        "last_output": jnp.zeros((B, 2, C)), "long_memory": jnp.zeros((B, 2, C)),
    }
    st2 = select_active_tracks_train(st, empty_cand, empty_cand,
                                     jax.random.PRNGKey(0),
                                     update_threshold=0.5)
    # slot 0: score .9 + id -> kept; slot 1: score .2 but id >= 0 -> kept
    assert bool(st2.mask[0, 0]) and bool(st2.mask[0, 1])
    # iou >= 0.5 so ids preserved
    assert int(st2.ids[0, 0]) == 5 and int(st2.ids[0, 1]) == 6


def test_selection_low_iou_drops_identity_keeps_query():
    st = _state(ids=[5, -1, -1, -1], mask=[True, False, False, False],
                scores=[[0.9], [0.5], [0.5], [0.5]])
    st = st.replace(iou=jnp.asarray([[0.3, 0.0, 0.0, 0.0]]))
    empty = {
        "mask": jnp.zeros((B, 1), bool), "ids": jnp.full((B, 1), -1, jnp.int32),
        "labels": jnp.zeros((B, 1), jnp.int32),
        "matched_idx": jnp.full((B, 1), -1, jnp.int32),
        "query_embed": jnp.zeros((B, 1, C)), "ref_pts": jnp.zeros((B, 1, 4)),
        "output_embed": jnp.zeros((B, 1, C)), "boxes": jnp.zeros((B, 1, 4)),
        "logits": jnp.zeros((B, 1, K)), "iou": jnp.zeros((B, 1)),
        "last_output": jnp.zeros((B, 1, C)), "long_memory": jnp.zeros((B, 1, C)),
    }
    st2 = select_active_tracks_train(st, empty, empty, jax.random.PRNGKey(0),
                                     update_threshold=0.5)
    assert bool(st2.mask[0, 0])              # stays active as hard negative
    assert int(st2.ids[0, 0]) == -1          # identity dropped (iou < 0.5)


def test_fake_track_on_empty_row():
    st = TrackState.empty(B, S, C, K)   # nothing active
    empty = {
        "mask": jnp.zeros((B, 1), bool), "ids": jnp.full((B, 1), -1, jnp.int32),
        "labels": jnp.zeros((B, 1), jnp.int32),
        "matched_idx": jnp.full((B, 1), -1, jnp.int32),
        "query_embed": jnp.zeros((B, 1, C)), "ref_pts": jnp.zeros((B, 1, 4)),
        "output_embed": jnp.zeros((B, 1, C)), "boxes": jnp.zeros((B, 1, 4)),
        "logits": jnp.zeros((B, 1, K)), "iou": jnp.zeros((B, 1)),
        "last_output": jnp.zeros((B, 1, C)), "long_memory": jnp.zeros((B, 1, C)),
    }
    st2 = select_active_tracks_train(st, empty, empty, jax.random.PRNGKey(0),
                                     update_threshold=0.5)
    # reference installs one random fake track with id -2 (query_updater:219-241)
    assert int(st2.mask.sum()) == 1
    assert int(st2.ids[0, 0]) == -2
    assert float(jnp.abs(st2.query_embed[0, 0]).sum()) > 0


def test_update_tracked_slots_only_live():
    st = _state(ids=[3, -1, -1, -1], mask=[True, False, False, False])
    out = _model_out(det_scores=[0.5] * ND)
    st2 = update_tracked_slots(st, out, ND)
    assert float(st2.output_embed[0, 0].sum()) == C      # live slot updated
    assert float(st2.output_embed[0, 1].sum()) == 0      # dead slot untouched
