"""Trainer internals: param-group labeling, LR schedules, optimizer."""
import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.engine.trainer import (group_lrs, label_tree,
                                       lr_schedule_factory, make_optimizer,
                                       param_group_label)


def test_param_group_labels():
    assert param_group_label(("model", "backbone", "layer2_0", "conv1",
                              "kernel")) == "backbone"
    # stem + layer1 frozen (backbone.py:72-74)
    assert param_group_label(("model", "backbone", "conv1", "kernel")) == "frozen"
    assert param_group_label(("model", "backbone", "layer1_0", "conv2",
                              "kernel")) == "frozen"
    assert param_group_label(("model", "transformer", "encoder", "layer_0",
                              "self_attn", "sampling_offsets",
                              "kernel")) == "points"
    assert param_group_label(("model", "reference_points", "kernel")) == "points"
    assert param_group_label(("updater", "memory_attn", "q_proj",
                              "kernel")) == "query_updater"
    assert param_group_label(("model", "transformer", "decoder",
                              "class_embed_0", "bias")) == "base"


def test_label_tree_structure():
    params = {"model": {"backbone": {"conv1": {"kernel": jnp.zeros(1)}},
                        "det_query_embed": jnp.zeros(2)},
              "updater": {"memory_norm": {"scale": jnp.zeros(3)}}}
    labels = label_tree(params)
    assert labels["model"]["backbone"]["conv1"]["kernel"] == "frozen"
    assert labels["model"]["det_query_embed"] == "base"
    assert labels["updater"]["memory_norm"]["scale"] == "query_updater"


def _cfg(**kw):
    cfg = {"LR": 2e-4, "LR_BACKBONE": 2e-5, "LR_POINTS": 1e-5,
           "WEIGHT_DECAY": 5e-4, "CLIP_MAX_NORM": 0.1,
           "LR_SCHEDULER": "MultiStep", "LR_DROP_MILESTONES": [12],
           "LR_DROP_RATE": 0.1, "EPOCHS": 20,
           "ONLY_TRAIN_QUERY_UPDATER_AFTER": 20}
    cfg.update(kw)
    return cfg


def test_multistep_schedule():
    sched = lr_schedule_factory(_cfg())
    assert sched(0) == 1.0 and sched(11) == 1.0
    assert np.isclose(sched(12), 0.1) and np.isclose(sched(19), 0.1)


def test_cosine_schedule():
    sched = lr_schedule_factory(_cfg(LR_SCHEDULER="Cosine"))
    assert np.isclose(sched(0), 1.0)
    assert np.isclose(sched(10), 0.5)


def test_group_lrs_with_updater_freeze():
    lrs = group_lrs(_cfg(ONLY_TRAIN_QUERY_UPDATER_AFTER=5), epoch=6)
    assert lrs["backbone"] == 0.0 and lrs["base"] == 0.0
    assert lrs["query_updater"] > 0
    assert lrs["frozen"] == 0.0
    lrs2 = group_lrs(_cfg(), epoch=13)
    assert np.isclose(lrs2["base"], 2e-5)       # dropped by 0.1 at 12
    assert np.isclose(lrs2["backbone"], 2e-6)


def test_optimizer_adamw_semantics():
    opt = make_optimizer(_cfg())
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.full((4,), 100.0)}   # will be clipped to norm 0.1
    updates, _ = opt.update(grads, state, params)
    # clip: ||g|| = 200 -> scaled to 0.1; adam normalizes magnitude ~1
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    # weight decay adds wd * p to the update direction
    assert np.all(np.asarray(updates["w"]) != 0)


def test_accumulation_matches_single_step():
    """Two identical micro-batches accumulated == one fused step (since
    (g/2 + g/2) == g), reference semantics of train_engine.py:237-246."""
    import jax
    from memotr_tpu.engine.trainer import (init_train_state, label_tree,
                                           make_accum_steps, make_train_step)

    def quad_loss(trainable, frozen, batch, rng):
        del frozen, rng
        total = sum(jnp.sum((l - batch["t"]) ** 2)
                    for l in jax.tree.leaves(trainable))
        return total, {"total_loss": total, "n_gts": jnp.zeros(())}

    import memotr_tpu.engine.trainer as tr
    orig = tr.clip_loss
    # **kw absorbs the distill/teacher_params kwargs loss_fn always passes
    tr.clip_loss = lambda t, f, m, u, c, b, r, cs, **kw: quad_loss(t, f, b, r)
    try:
        opt = make_optimizer(_cfg())
        params = {"model": {"w": jnp.ones((4,))},
                  "updater": {"v": jnp.full((3,), 2.0)}}
        labels = label_tree(params)
        batch = {"t": jnp.asarray(0.5)}
        lrs = {k: jnp.asarray(v, jnp.float32)
               for k, v in {"backbone": 1e-2, "points": 1e-2, "base": 1e-2,
                            "query_updater": 1e-2, "frozen": 0.0}.items()}
        s1 = init_train_state(jax.tree.map(jnp.copy, params["model"]),
                              jax.tree.map(jnp.copy, params["updater"]), opt)
        fused = make_train_step(None, None, None, opt, {}, labels)
        s1, _ = fused(s1, {}, batch, jax.random.PRNGKey(0), lrs)

        s2 = init_train_state(jax.tree.map(jnp.copy, params["model"]),
                              jax.tree.map(jnp.copy, params["updater"]), opt)
        grad_step, apply_step = make_accum_steps(None, None, None, opt, {},
                                                 labels, accumulation=2)
        acc, _ = grad_step(s2.params, {}, batch, jax.random.PRNGKey(0), None)
        acc, _ = grad_step(s2.params, {}, batch, jax.random.PRNGKey(0), acc)
        s2 = apply_step(s2, acc, lrs)

        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    finally:
        tr.clip_loss = orig


def test_no_grad_frames_schedule():
    from memotr_tpu.engine.trainer import no_grad_frames_for_epoch
    cfg = {"NO_GRAD_STEPS": [20, 10], "NO_GRAD_FRAMES": [3, 1]}
    assert no_grad_frames_for_epoch(cfg, 25) == 3
    assert no_grad_frames_for_epoch(cfg, 15) == 1
    assert no_grad_frames_for_epoch(cfg, 5) is None
    assert no_grad_frames_for_epoch({"NO_GRAD_FRAMES": 2}, 0) == 2
    assert no_grad_frames_for_epoch({}, 0) is None


def test_warmup_scale():
    from memotr_tpu.engine.trainer import warmup_scale
    assert warmup_scale(0, 0) == 1.0                       # off
    assert warmup_scale(0, 4) == 0.25                      # linear ramp
    assert warmup_scale(3, 4) == 1.0
    assert warmup_scale(100, 4) == 1.0
    ramp = [warmup_scale(i, 10) for i in range(12)]
    assert ramp == sorted(ramp) and ramp[-1] == 1.0


def test_frozen_grads_excluded_from_clip_and_norm():
    """Frozen-group gradients must not enter clip_by_global_norm or the
    logged grad_norm: the reference's clip_grad_norm_ only ever sees
    trainable grads (frozen stem/layer1 params have .grad = None,
    /root/reference/models/backbone.py:72-74).  A huge frozen grad must
    therefore leave the live-parameter update bit-identical to a run where
    the frozen leaf contributes no loss at all."""
    from memotr_tpu.engine.trainer import (init_train_state, make_train_step,
                                           zero_frozen_grads)

    params = {"model": {"backbone": {"conv1": {"kernel": jnp.ones((4,))}},
                        "w": jnp.ones((4,))},
              "updater": {"v": jnp.full((3,), 2.0)}}
    labels = label_tree(params)
    assert labels["model"]["backbone"]["conv1"]["kernel"] == "frozen"
    assert labels["model"]["w"] == "base"

    # unit: zero_frozen_grads zeros exactly the frozen leaves
    grads = jax.tree.map(jnp.ones_like, params)
    zeroed = zero_frozen_grads(grads, labels)
    np.testing.assert_array_equal(
        np.asarray(zeroed["model"]["backbone"]["conv1"]["kernel"]), 0.0)
    np.testing.assert_array_equal(np.asarray(zeroed["model"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(zeroed["updater"]["v"]), 1.0)

    # integration: giant frozen grad vs zero frozen grad -> same live update
    def loss_with_frozen_scale(scale):
        def fn(trainable, frozen, batch, rng):
            del frozen, rng
            live = (jnp.sum((trainable["model"]["w"] - batch["t"]) ** 2)
                    + jnp.sum((trainable["updater"]["v"] - batch["t"]) ** 2))
            froz = jnp.sum(
                trainable["model"]["backbone"]["conv1"]["kernel"] ** 2)
            return live + scale * froz, {"total_loss": live,
                                         "n_gts": jnp.zeros(())}
        return fn

    import memotr_tpu.engine.trainer as tr
    orig = tr.clip_loss
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in {"backbone": 1e-2, "points": 1e-2, "base": 1e-2,
                        "query_updater": 1e-2, "frozen": 0.0}.items()}
    batch = {"t": jnp.asarray(0.5)}
    results = {}
    try:
        for name, scale in (("big", 1e6), ("none", 0.0)):
            tr.clip_loss = (lambda s: lambda t, f, m, u, c, b, r, cs, **kw:
                            loss_with_frozen_scale(s)(t, f, b, r))(scale)
            opt = make_optimizer(_cfg())
            st = init_train_state(
                jax.tree.map(jnp.copy, params["model"]),
                jax.tree.map(jnp.copy, params["updater"]), opt)
            step = make_train_step(None, None, None, opt, {}, labels)
            st, logs = step(st, {}, batch, jax.random.PRNGKey(0), lrs)
            results[name] = (st.params, logs)
    finally:
        tr.clip_loss = orig

    for key in (("model", "w"), ("updater", "v")):
        a = results["big"][0][key[0]][key[1]]
        b = results["none"][0][key[0]][key[1]]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=str(key))
    # the frozen param itself never moves (LR 0)
    np.testing.assert_array_equal(
        np.asarray(results["big"][0]["model"]["backbone"]["conv1"]["kernel"]),
        1.0)
    # logged grad_norm reflects live grads only
    np.testing.assert_allclose(np.asarray(results["big"][1]["grad_norm"]),
                               np.asarray(results["none"][1]["grad_norm"]),
                               rtol=1e-6)
