import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

"""Partial pretrain transplant + teacher->student distillation.

The transplant loader mirrors the reference's skip-and-remap pretrain
semantics (``/root/reference/models/utils.py:88-168``) extended with the
encoder-skip rule for TPU-native encoder families; distillation is the
TPU-native quality lever (no reference counterpart) — see
engine/trainer.py ``distill_frame_losses``.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.checkpoint.orbax_io import save_checkpoint
from memotr_tpu.engine.train import init_model_params, load_pretrained
from memotr_tpu.engine.trainer import (init_train_state, label_tree,
                                       make_optimizer, make_train_step,
                                       static_config, group_lrs)
from memotr_tpu.log.logger import Logger
from memotr_tpu.models.criterion import build_criterion
from memotr_tpu.models.memotr import build_model
from memotr_tpu.models.query_updater import build_query_updater


def _tiny_cfg(encoder_type: str, **kw):
    cfg = {
        "DATASET": "DanceTrack", "HIDDEN_DIM": 32, "FFN_DIM": 64,
        "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 4, "NUM_ENC_POINTS": 4,
        "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": 2, "NUM_DEC_LAYERS": 2,
        "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": 6, "DROPOUT": 0.0,
        "USE_DAB": True, "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
        "USE_CHECKPOINT": False, "AUX_LOSS": True, "EXTRA_TRACK_ATTN": False,
        "MATCH_COST_CLASS": 2, "MATCH_COST_BBOX": 5, "MATCH_COST_GIOU": 2,
        "LOSS_WEIGHT_FOCAL": 2, "LOSS_WEIGHT_L1": 5, "LOSS_WEIGHT_GIOU": 2,
        "AUX_LOSS_WEIGHT": [1.0], "TRACK_SLOTS": 4, "MAX_GTS": 4,
        "DTYPE": "float32", "MSDA_IMPL": "xla", "LR": 2e-4,
        "LR_BACKBONE": 2e-5, "LR_POINTS": 1e-5, "WEIGHT_DECAY": 0.0,
        "CLIP_MAX_NORM": 0.1, "LR_SCHEDULER": "MultiStep",
        "LR_DROP_MILESTONES": [10], "LR_DROP_RATE": 0.1,
        "ONLY_TRAIN_QUERY_UPDATER_AFTER": 100,
        "ENCODER_TYPE": encoder_type,
    }
    cfg.update(kw)
    return cfg


def _leaf_equal(a, b):
    return jax.tree_util.tree_all(jax.tree.map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y)), a, b))


def _make_teacher(tmp_path, cfg):
    model = build_model(cfg)
    updater = build_query_updater(cfg)
    variables, uvars = init_model_params(cfg, model, updater, seed=7)
    # make teacher values distinguishable from any fresh init
    variables = jax.tree.map(lambda x: x + 0.25, variables)
    uvars = jax.tree.map(lambda x: x + 0.25, uvars)
    ckpt = os.path.join(str(tmp_path), "teacher", "checkpoint_0")
    save_checkpoint(ckpt, params={"model": variables["params"],
                                  "updater": uvars["params"]},
                    frozen=variables["frozen"])
    os.makedirs(os.path.join(str(tmp_path), "teacher", "train"),
                exist_ok=True)
    from memotr_tpu.config import dict_to_yaml
    dict_to_yaml(cfg, os.path.join(str(tmp_path), "teacher", "train",
                                   "config.yaml"))
    return ckpt, variables, uvars


def test_transplant_skips_encoder_loads_rest(tmp_path):
    t_cfg = _tiny_cfg("deformable")
    ckpt, t_vars, t_uvars = _make_teacher(tmp_path, t_cfg)

    s_cfg = _tiny_cfg("windowed", PRETRAINED_MODEL=ckpt)
    model = build_model(s_cfg)
    updater = build_query_updater(s_cfg)
    variables, uvars = init_model_params(s_cfg, model, updater, seed=11)
    fresh_enc = jax.tree.map(np.asarray,
                             variables["params"]["transformer"]["encoder"])

    logger = Logger(logdir=str(tmp_path / "log"))
    new_vars, new_uvars = load_pretrained(s_cfg, variables, uvars, logger)

    # backbone / decoder / det queries / frozen stats come from the teacher
    assert _leaf_equal(new_vars["params"]["backbone"],
                       t_vars["params"]["backbone"])
    assert _leaf_equal(new_vars["params"]["transformer"]["decoder"],
                       t_vars["params"]["transformer"]["decoder"])
    np.testing.assert_allclose(np.asarray(new_vars["params"]["det_query_embed"]),
                               np.asarray(t_vars["params"]["det_query_embed"]))
    assert _leaf_equal(new_vars["frozen"], t_vars["frozen"])
    assert _leaf_equal(new_uvars["params"], t_uvars["params"])
    # ... but the windowed encoder keeps its fresh init (skip rule): the
    # teacher's deformable-encoder norm1/linear1 leaves share names+shapes
    # and would otherwise partially load
    assert _leaf_equal(new_vars["params"]["transformer"]["encoder"],
                       fresh_enc)


def test_transplant_same_family_loads_encoder(tmp_path):
    t_cfg = _tiny_cfg("deformable")
    ckpt, t_vars, _ = _make_teacher(tmp_path, t_cfg)
    s_cfg = _tiny_cfg("deformable", PRETRAINED_MODEL=ckpt)
    model = build_model(s_cfg)
    updater = build_query_updater(s_cfg)
    variables, uvars = init_model_params(s_cfg, model, updater, seed=11)
    logger = Logger(logdir=str(tmp_path / "log2"))
    new_vars, _ = load_pretrained(s_cfg, variables, uvars, logger)
    assert _leaf_equal(new_vars["params"]["transformer"]["encoder"],
                       t_vars["params"]["transformer"]["encoder"])


def _batch(b=1, t=2, h=64, w=64, g=4):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(size=(b, t, h, w, 3)) * 0.1,
                              jnp.float32),
        "mask": jnp.zeros((b, t, h, w), bool),
        "gt_boxes": jnp.tile(jnp.asarray([[0.4, 0.4, 0.2, 0.2]]),
                             (b, t, g, 1)),
        "gt_ids": jnp.tile(jnp.arange(g, dtype=jnp.int32)[None, None],
                           (b, t, 1)),
        "gt_labels": jnp.zeros((b, t, g), jnp.int32),
        "gt_mask": jnp.tile(jnp.asarray([True, True, False, False])[None,
                                                                    None],
                            (b, t, 1)),
    }


def test_distill_train_step_runs_and_flows(tmp_path):
    t_cfg = _tiny_cfg("deformable")
    teacher = build_model(t_cfg)
    t_updater = build_query_updater(t_cfg)
    t_vars, _ = init_model_params(t_cfg, teacher, t_updater, seed=3)
    teacher_params = {"params": t_vars["params"], "frozen": t_vars["frozen"]}

    s_cfg = _tiny_cfg("windowed")
    model = build_model(s_cfg)
    updater = build_query_updater(s_cfg)
    variables, uvars = init_model_params(s_cfg, model, updater, seed=4)

    criterion = build_criterion(s_cfg)
    optimizer = make_optimizer(s_cfg)
    state = init_train_state(variables["params"], uvars["params"], optimizer)
    labels = label_tree(state.params)
    cs = static_config(s_cfg, model)
    distill = {"model": teacher, "weights": {"distill_memory": 1.0,
                                             "distill_logit": 1.0,
                                             "distill_box": 1.0}}
    step = make_train_step(model, updater, criterion, optimizer, cs, labels,
                           distill=distill)
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in group_lrs(s_cfg, 0).items()}
    frozen = {"frozen": variables["frozen"]}
    before = jax.tree.map(np.asarray, state.params)   # step donates state
    new_state, logs = step(state, frozen, _batch(), jax.random.PRNGKey(0),
                           lrs, teacher_params)
    for k in ("distill_memory", "distill_logit", "distill_box"):
        assert k in logs and np.isfinite(float(logs[k])), k
        assert float(logs[k]) > 0
    assert np.isfinite(float(logs["total_loss"]))
    assert float(logs["grad_norm"]) > 0
    # total includes the distillation terms
    base_keys = [k for k in logs if k.startswith("distill_")]
    assert len(base_keys) == 3
    # params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or pair, jax.tree.map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
            new_state.params, before), False)
    assert moved


def test_visualize_train_debug_outputs():
    """VISUALIZE adds per-frame decoder outputs + post-update track state to
    the step logs (training-path dumps, reference
    deformable_decoder.py:97-136 / query_updater.py:86-97)."""
    cfg = _tiny_cfg("windowed", VISUALIZE=True)
    model = build_model(cfg)
    updater = build_query_updater(cfg)
    variables, uvars = init_model_params(cfg, model, updater, seed=1)
    criterion = build_criterion(cfg)
    optimizer = make_optimizer(cfg)
    state = init_train_state(variables["params"], uvars["params"], optimizer)
    labels = label_tree(state.params)
    cs = static_config(cfg, model)
    assert cs["visualize"]
    step = make_train_step(model, updater, criterion, optimizer, cs, labels)
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in group_lrs(cfg, 0).items()}
    _, logs = step(state, {"frozen": variables["frozen"]}, _batch(),
                   jax.random.PRNGKey(0), lrs)
    dbg = logs["debug"]
    for f in range(2):
        for k in ("pred_logits", "pred_boxes", "last_ref_pts",
                  "track_query_embed", "track_long_memory", "track_mask"):
            assert f"frame{f}.{k}" in dbg, (f, k)
    assert dbg["frame0.pred_boxes"].shape[1] == 6 + 4  # det + slots
    # visualize off -> no debug key in logs
    cs2 = static_config(_tiny_cfg("windowed"), model)
    assert not cs2["visualize"]
