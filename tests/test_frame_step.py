import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

"""Integration: tiny model, full train/eval frame steps over track slots."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models.criterion import ClipCriterion, FrameGT
from memotr_tpu.models.frame_step import (eval_frame_step, train_frame_step)
from memotr_tpu.models.memotr import MeMOTR
from memotr_tpu.models.query_updater import QueryUpdater
from memotr_tpu.structures import TrackState, PaddedFrames


B, S, C, K, ND, G = 1, 6, 32, 1, 10, 4
H = W = 64


@pytest.fixture(scope="module")
def setup():
    model = MeMOTR(num_classes=K, n_det_queries=ND, n_feature_levels=4,
                   hidden_dim=C, ffn_dim=64, n_heads=4, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   dtype=jnp.float32)
    updater = QueryUpdater(hidden_dim=C, ffn_dim=64, use_dab=True,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (B, H, W, 3)) * 0.1
    mask = jnp.zeros((B, H, W), bool)
    frames = PaddedFrames(images=imgs, mask=mask)
    state = TrackState.empty(B, S, C, K, use_dab=True)
    params = model.init(rng, imgs, mask, state.query_embed, state.ref_pts,
                        state.mask)
    upd_params = updater.init(rng, state.query_embed, state.ref_pts,
                              state.logits, state.boxes, state.output_embed,
                              state.last_output, state.long_memory, state.mask)
    criterion = ClipCriterion(num_classes=K, n_det_queries=ND,
                              merge_det_track_layer=1, hidden_dim=C,
                              aux_weights=[1.0] * 4)
    return model, updater, params, upd_params, criterion, frames, state


def _gt():
    boxes = jnp.asarray([[[0.3, 0.3, 0.1, 0.2], [0.6, 0.6, 0.2, 0.1],
                          [0.5, 0.2, 0.1, 0.1], [0.0, 0.0, 0.0, 0.0]]])
    labels = jnp.zeros((B, G), jnp.int32)
    ids = jnp.asarray([[100, 101, 102, -1]], jnp.int32)
    mask = jnp.asarray([[True, True, True, False]])
    return FrameGT(boxes=boxes, labels=labels, ids=ids, mask=mask)


def test_train_frame_step_losses_and_state(setup):
    model, updater, params, upd_params, criterion, frames, state = setup
    rng = jax.random.PRNGKey(1)
    losses, n_gts, state2 = train_frame_step(
        model, updater, params, upd_params, criterion, frames, _gt(), state,
        rng, update_threshold=0.5)
    assert set(losses) == {"label_focal_loss", "box_l1_loss", "box_giou_loss",
                           "aux_label_focal_loss", "aux_box_l1_loss",
                           "aux_box_giou_loss"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert int(n_gts[0]) == 3
    # all 3 untracked GTs must be matched and became track candidates
    assert int(state2.mask.sum()) >= 3
    born_ids = set(np.asarray(state2.ids[0]).tolist())
    # ids may be dropped to -1 by the iou<0.5 rule early in training
    assert born_ids.issubset({-1, -2, 100, 101, 102})


def test_second_frame_carries_identity(setup):
    model, updater, params, upd_params, criterion, frames, state = setup
    rng = jax.random.PRNGKey(2)
    gt = _gt()
    _, _, state1 = train_frame_step(model, updater, params, upd_params,
                                    criterion, frames, gt, state, rng,
                                    update_threshold=0.5)
    losses2, n2, state2 = train_frame_step(model, updater, params, upd_params,
                                           criterion, frames, gt, state1, rng,
                                           update_threshold=0.5)
    for v in losses2.values():
        assert np.isfinite(float(v))
    assert state2.mask.shape == (B, S)


def test_gradients_flow(setup):
    model, updater, params, upd_params, criterion, frames, state = setup
    rng = jax.random.PRNGKey(3)
    gt = _gt()

    def loss_fn(p, up):
        losses, n_gts, _ = train_frame_step(
            model, updater, p, up, criterion, frames, gt, state, rng,
            update_threshold=0.5)
        total = (2.0 * losses["label_focal_loss"] + 5.0 * losses["box_l1_loss"]
                 + 2.0 * losses["box_giou_loss"])
        return total / jnp.maximum(jnp.sum(n_gts), 1)

    grads, ugrads = jax.grad(loss_fn, argnums=(0, 1))(params, upd_params)
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_eval_streaming_step(setup):
    model, updater, params, upd_params, criterion, frames, state = setup
    results, state1 = eval_frame_step(
        model, updater, params, upd_params, frames, state, ND,
        det_score_thresh=0.0, track_score_thresh=0.5, miss_tolerance=2)
    # det_score_thresh=0 -> every det query spawns until slots fill
    assert int(state1.mask.sum()) == S
    assert results["boxes"].shape == (B, S, 4)
    # ids assigned monotonically from 0
    live_ids = np.asarray(state1.ids[0])[np.asarray(state1.mask[0])]
    assert sorted(live_ids.tolist()) == list(range(S))
    # next frame reuses the same compiled shapes
    results2, state2 = eval_frame_step(
        model, updater, params, upd_params, frames, state1, ND,
        det_score_thresh=0.9, track_score_thresh=0.0, miss_tolerance=2)
    assert state2.mask.shape == (B, S)
