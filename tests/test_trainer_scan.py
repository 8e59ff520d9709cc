"""TRAIN_FRAME_SCAN: the ``lax.scan`` clip loop matches the unrolled loop.

VERDICT round-3 item 7: the clip loop is Python-unrolled per frame inside
one jit, so the frame body is traced and compiled T times — the dominant
cold-compile cost of the train step (~90 s windowed / ~4 min deformable at
proxy scale, ROUND3.md).  ``_clip_loss_scan`` traces it once; these tests
pin loss/log/gradient equality against the unrolled reference path.

Scope note: equality holds for the deterministic pieces.  The two paths
draw per-frame PRNG keys from DIFFERENT streams (sequential split per frame
vs one up-front split), so runs with DROPOUT or TP_DROP/FP_INSERT noise are
equally-distributed but not bit-equal — tested here with those off, like
the reference's own determinism assumptions (train_engine.py:201-230).
"""
import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

import jax
import jax.numpy as jnp
import numpy as np


def _setup(t=4, no_grad=1, distill=False):
    import __graft_entry__ as ge
    from memotr_tpu.engine.trainer import static_config
    from memotr_tpu.models.criterion import build_criterion
    from memotr_tpu.models.memotr import build_model
    from memotr_tpu.models.query_updater import build_query_updater
    from memotr_tpu.structures.track_state import TrackState

    config = ge._tiny_config(track_slots=4, max_gts=4)
    config.update({"NUM_ENC_LAYERS": 1, "NUM_DEC_LAYERS": 2,
                   "NUM_DET_QUERIES": 20, "HIDDEN_DIM": 32, "FFN_DIM": 64,
                   "NO_GRAD_FRAMES": no_grad})
    model = build_model(config)
    updater = build_query_updater(config)
    rng = jax.random.PRNGKey(0)
    h = w = 64
    st = TrackState.empty(1, 4, 32, 1, use_dab=True)
    variables = model.init(rng, jnp.zeros((1, h, w, 3)),
                           jnp.zeros((1, h, w), bool),
                           st.query_embed, st.ref_pts, st.mask)
    uvars = updater.init(rng, st.query_embed, st.ref_pts, st.logits,
                         st.boxes, st.output_embed, st.last_output,
                         st.long_memory, st.mask)
    criterion = build_criterion(config)
    trainable = {"model": variables["params"], "updater": uvars["params"]}
    frozen = {"frozen": variables["frozen"]}
    cs = static_config(config, model)

    b, g = 2, 4
    rng_d = jax.random.PRNGKey(1)
    batch = {
        "images": jax.random.normal(rng_d, (b, t, h, w, 3)) * 0.1,
        "mask": jnp.zeros((b, t, h, w), bool),
        "gt_boxes": jnp.clip(
            jax.random.uniform(jax.random.fold_in(rng_d, 1), (b, t, g, 4))
            * 0.4 + 0.1, 0.05, 0.9),
        "gt_ids": jnp.tile(jnp.arange(g, dtype=jnp.int32)[None, None],
                           (b, t, 1)),
        "gt_labels": jnp.zeros((b, t, g), jnp.int32),
        "gt_mask": jnp.ones((b, t, g), bool),
    }
    dist = None
    teacher_params = None
    if distill:
        dist = {"model": model, "weights": {"distill_memory": 1.0,
                                            "distill_logit": 1.0,
                                            "distill_box": 1.0}}
        tvars = jax.tree.map(lambda x: x + 0.05, variables)
        teacher_params = {"params": tvars["params"],
                          "frozen": tvars["frozen"]}
    return (model, updater, criterion, trainable, frozen, batch, cs,
            dist, teacher_params)


def _loss_and_grads(frame_scan, t=4, no_grad=1, distill=False):
    from memotr_tpu.engine.trainer import clip_loss

    (model, updater, criterion, trainable, frozen, batch, cs,
     dist, teacher_params) = _setup(t, no_grad, distill)
    cs = dict(cs, frame_scan=frame_scan)

    def loss_fn(tr):
        return clip_loss(tr, frozen, model, updater, criterion, batch,
                         jax.random.PRNGKey(5), cs, distill=dist,
                         teacher_params=teacher_params)

    (total, logs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(trainable)
    return float(total), jax.device_get(logs), jax.device_get(grads)


def _assert_close(a, b, rtol, atol, msg):
    np.testing.assert_allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64),
                               rtol=rtol, atol=atol, err_msg=msg)


def test_scan_matches_unrolled():
    """Loss, every log scalar, and every gradient leaf agree between the
    scan and unrolled formulations (fp-reassociation tolerance only)."""
    t_u, logs_u, g_u = _loss_and_grads(frame_scan=False)
    t_s, logs_s, g_s = _loss_and_grads(frame_scan=True)
    _assert_close(t_u, t_s, 1e-5, 1e-7, "total loss")
    assert set(logs_u) == set(logs_s)
    for k in logs_u:
        _assert_close(logs_u[k], logs_s[k], 5e-4, 1e-6, f"log {k}")
    flat_u = jax.tree_util.tree_flatten_with_path(g_u)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    assert len(flat_u) == len(flat_s)
    for (path, a), (_, b) in zip(flat_u, flat_s):
        _assert_close(a, b, 5e-4, 1e-6, f"grad {jax.tree_util.keystr(path)}")


def test_scan_matches_unrolled_distill():
    """Same equality with the distillation terms in the loss (the campaign
    lever path: teacher forward inside the scanned body)."""
    t_u, logs_u, _ = _loss_and_grads(frame_scan=True, distill=True)
    t_s, logs_s, _ = _loss_and_grads(frame_scan=False, distill=True)
    _assert_close(t_u, t_s, 1e-5, 1e-7, "total loss (distill)")
    assert set(logs_u) == set(logs_s)
    for k in ("distill_memory", "distill_logit", "distill_box"):
        assert k in logs_u
        _assert_close(logs_u[k], logs_s[k], 5e-4, 1e-6, f"log {k}")


def test_scan_dispatch_conditions():
    """The scan path only engages when >= 2 frames land in the scanned span
    and VISUALIZE is off; otherwise clip_loss stays unrolled."""
    from memotr_tpu.engine.trainer import images_frames_scannable
    batch4 = {"images": jnp.zeros((1, 4, 8, 8, 3))}
    batch2 = {"images": jnp.zeros((1, 2, 8, 8, 3))}
    assert images_frames_scannable(batch4, {"no_grad_frames": 1})
    assert images_frames_scannable(batch4, {"no_grad_frames": 0})
    assert not images_frames_scannable(batch4, {"no_grad_frames": 2})
    assert not images_frames_scannable(batch2, {"no_grad_frames": 0})
