"""Training entry point.

Behavioral spec: ``/root/reference/train_engine.py:28-288``.  The epoch loop
keeps the reference's structure — logger + resolved-config dump, seeding,
pretrained load, per-epoch dataset curriculum, LR schedule with the
updater-only freeze, gradient accumulation, per-epoch checkpointing policy —
but the inner work is one compiled ``train_step`` over the global batch on a
data mesh instead of a DDP-wrapped eager loop.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.orbax_io import load_checkpoint, save_checkpoint
from ..checkpoint.torch_convert import (convert_torch_state_dict,
                                        remap_pretrained_dab)
from ..config import cfg_get, dict_to_yaml, yaml_to_dict
from ..data import build_dataloader, build_dataset
from ..log.logger import Logger, MetricLog
from ..models.criterion import build_criterion
from ..models.memotr import build_model
from ..models.query_updater import build_query_updater
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..structures.track_state import TrackState
from ..utils.misc import set_seed
from .trainer import (TrainState, group_lrs, init_train_state, label_tree,
                      make_accum_steps, make_optimizer, make_train_step,
                      no_grad_frames_for_epoch, static_config, warmup_scale)


def init_model_params(config: dict, model, updater, seed: int = 0):
    """Initialize parameter trees with a minimal dummy trace."""
    rng = jax.random.PRNGKey(seed)
    c = config["HIDDEN_DIM"]
    s = cfg_get(config, "TRACK_SLOTS", 64)
    use_dab = cfg_get(config, "USE_DAB", True)
    k = model.num_classes
    st = TrackState.empty(1, s, c, k, use_dab=use_dab)
    imgs = jnp.zeros((1, 128, 128, 3))
    mask = jnp.zeros((1, 128, 128), bool)
    # jit the inits: eager init compiles hundreds of ops one-by-one through
    # the remote compile helper (minutes through the axon relay on a cold
    # cache); one jitted program compiles in seconds (see bench.py)
    variables = jax.jit(model.init)(rng, imgs, mask, st.query_embed,
                                    st.ref_pts, st.mask)
    uvars = jax.jit(updater.init)(rng, st.query_embed, st.ref_pts, st.logits,
                                  st.boxes, st.output_embed, st.last_output,
                                  st.long_memory, st.mask)
    return variables, uvars


def load_pretrained(config: dict, variables, uvars, logger: Logger):
    """Load pretrained weights into freshly-initialized trees.

    Two source formats:

    - a reference-format **PyTorch** checkpoint (``.pth``) — converted and
      key-remapped like ``load_pretrained_model``
      (``/root/reference/models/utils.py:88-168``);
    - a **native Orbax checkpoint directory** from a previous run of this
      framework — the partial-transplant path (e.g. a trained deformable
      teacher's backbone/decoder/heads/query-embeds into a windowed student).

    Either way the merge is strict=False with shape checks, PLUS an encoder
    skip rule: when the target model's encoder family differs from the
    deformable encoder the checkpoint was trained with (any
    ``ENCODER_TYPE != deformable`` unless ``PRETRAIN_SKIP_ENCODER`` says
    otherwise), the ``transformer/encoder`` subtree is excluded entirely —
    several leaf names (norm1/linear1/...) collide across encoder families
    with matching shapes, and a silent partial load would be wrong."""
    path = config.get("PRETRAINED_MODEL")
    if not path or not os.path.exists(path):
        if path:
            logger.show(head=f"[warn] PRETRAINED_MODEL {path} not found; "
                             f"training from scratch.")
        return variables, uvars

    skip_encoder = cfg_get(config, "PRETRAIN_SKIP_ENCODER", None)
    if skip_encoder is None:   # auto: fresh encoder for non-deformable models
        skip_encoder = cfg_get(
            config, "ENCODER_TYPE", "deformable") != "deformable"

    if os.path.isdir(path):    # native checkpoint: transplant
        restored = load_checkpoint(path)
        model_c = restored["params"]["model"]
        updater_c = restored["params"]["updater"]
        frozen_c = restored.get("frozen", {})
        logger.show(head=f"Transplanting native checkpoint {path} "
                         f"(skip_encoder={skip_encoder}).")
    else:
        import torch
        sd = torch.load(path, map_location="cpu")
        if "model" in sd:
            sd = sd["model"]
        sd = remap_pretrained_dab(sd, num_classes=len(
            variables["params"]["transformer"]["decoder"]["class_embed_0"]
            ["bias"]))
        model_c, updater_c, frozen_c = convert_torch_state_dict(
            sd, use_dab=cfg_get(config, "USE_DAB", True))
        dropped = model_c.pop("_unconverted")
        logger.show(head=f"Pretrained loaded; {len(dropped)} torch keys "
                         f"unconverted (skip_encoder={skip_encoder}).")

    stats = {"loaded": 0, "shape_mismatch": 0, "encoder_skipped": 0}

    def count_leaves(tree):
        return sum(1 for _ in jax.tree_util.tree_leaves(tree))

    def merge(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            sub = path + (k,)
            if skip_encoder and sub[:2] == ("transformer", "encoder"):
                stats["encoder_skipped"] += count_leaves(v)
                continue
            if k in out and isinstance(out[k], dict):
                out[k] = merge(out[k], v, sub)
            elif k in out:
                if out[k].shape == v.shape:
                    out[k] = jnp.asarray(v, out[k].dtype)
                    stats["loaded"] += 1
                else:
                    stats["shape_mismatch"] += 1
            # keys absent from the target tree are dropped, like strict=False
        return out

    new_vars = dict(variables)
    new_vars["params"] = merge(variables["params"], model_c)
    new_vars["frozen"] = merge(variables["frozen"], frozen_c)
    new_uvars = dict(uvars)
    new_uvars["params"] = merge(uvars["params"], updater_c)
    logger.show(head=f"Pretrain merge: {stats['loaded']} tensors loaded, "
                     f"{stats['shape_mismatch']} shape-mismatched, "
                     f"{stats['encoder_skipped']} encoder leaves skipped.")
    return new_vars, new_uvars


def train(config: dict):
    logger = Logger(logdir=os.path.join(config["OUTPUTS_DIR"], "train"))
    logger.show(head="Configs:", log=config)
    if logger.enabled:
        dict_to_yaml(config, os.path.join(logger.logdir, "config.yaml"))
    set_seed(config["SEED"], rank=jax.process_index())

    # TOKEN_SHARD_AXIS enables 2-D (data x seq) training: encoder tokens
    # shard over MESH_SEQ_DEVICES chips per data replica; the model's
    # with_sharding_constraint resolves the axis via jax.set_mesh, so init
    # and every step run inside ``under_mesh()``.
    token_axis = cfg_get(config, "TOKEN_SHARD_AXIS", None)
    n_seq = int(cfg_get(config, "MESH_SEQ_DEVICES", 1) or 1)
    if token_axis and n_seq > 1:
        from ..parallel.mesh import make_mesh_2d
        n_data = cfg_get(config, "MESH_DEVICES", None) or \
            (len(jax.devices()) // n_seq)
        mesh = make_mesh_2d(n_data, n_seq, seq_axis=token_axis)
    else:
        mesh = make_mesh(cfg_get(config, "MESH_DEVICES", None))

    def under_mesh():
        import contextlib
        return jax.set_mesh(mesh) if token_axis and n_seq > 1 \
            else contextlib.nullcontext()

    model = build_model(config)
    updater = build_query_updater(config)
    with under_mesh():
        variables, uvars = init_model_params(config, model, updater,
                                             config["SEED"])
    variables, uvars = load_pretrained(config, variables, uvars, logger)

    dataset = build_dataset(config, split="train")

    # BATCH_SIZE is per-data-replica (like the reference's per-GPU batch=1,
    # README.md:104); each host loads BATCH_SIZE * local replica count clips.
    n_local = (mesh.shape["data"] if "data" in mesh.shape
               else mesh.devices.size) // jax.process_count()
    world = jax.process_count()
    local_config = dict(config)
    local_config["BATCH_SIZE"] = config["BATCH_SIZE"] * n_local
    dataloader = build_dataloader(dataset, local_config, shuffle=True,
                                  rank=jax.process_index(), world_size=world)

    criterion = build_criterion(config)
    optimizer = make_optimizer(config)
    state = init_train_state(variables["params"], uvars["params"], optimizer)
    labels = label_tree(state.params)
    frozen = {"frozen": variables["frozen"]}

    # --- optional teacher->student distillation (trainer.py) -----------------
    distill = None
    teacher_params = None
    d_path = cfg_get(config, "DISTILL_TEACHER", None)
    if d_path:
        teacher_dir = os.path.dirname(os.path.abspath(d_path))
        t_config = yaml_to_dict(os.path.join(teacher_dir, "train",
                                             "config.yaml"))
        assert t_config["HIDDEN_DIM"] == config["HIDDEN_DIM"], \
            "distillation teacher must share HIDDEN_DIM with the student"
        assert t_config["NUM_DET_QUERIES"] == config["NUM_DET_QUERIES"], \
            "distillation teacher must share NUM_DET_QUERIES"
        teacher_model = build_model(t_config)
        t_restored = load_checkpoint(d_path)
        assert "frozen" in t_restored, \
            "DISTILL_TEACHER must be a full (epoch) checkpoint with frozen " \
            "backbone stats"
        teacher_params = {"params": t_restored["params"]["model"],
                          "frozen": t_restored["frozen"]}
        teacher_params = replicate(mesh, teacher_params)
        distill = {"model": teacher_model, "weights": {
            "distill_memory": float(
                cfg_get(config, "DISTILL_WEIGHT_MEMORY", 1.0)),
            "distill_logit": float(
                cfg_get(config, "DISTILL_WEIGHT_LOGIT", 1.0)),
            "distill_box": float(
                cfg_get(config, "DISTILL_WEIGHT_BOX", 1.0)),
        }}
        logger.show(head=f"Distillation: teacher={d_path} "
                         f"({t_config.get('ENCODER_TYPE', 'deformable')} "
                         f"encoder), weights={distill['weights']}")

    state = replicate(mesh, state)
    frozen = replicate(mesh, frozen)

    accumulation = cfg_get(config, "ACCUMULATION_STEPS", 1)
    # loss-normalization world = number of DATA replicas (criterion.py:118-136
    # semantics; seq-parallel chips share one replica's loss)
    world_size = int(mesh.shape.get("data", mesh.devices.size))
    step_cache = {}

    def get_steps(no_grad):
        """Per-(no_grad_frames) compiled steps; cached across epochs."""
        if no_grad not in step_cache:
            cs = static_config(config, model, world_size=world_size)
            cs["no_grad_frames"] = 0 if no_grad is None else no_grad
            if accumulation == 1:
                step_cache[no_grad] = make_train_step(
                    model, updater, criterion, optimizer, cs, labels,
                    distill=distill)
            else:
                step_cache[no_grad] = make_accum_steps(
                    model, updater, criterion, optimizer, cs, labels,
                    accumulation, distill=distill)
        return step_cache[no_grad]

    states = {"start_epoch": 0, "global_iters": 0}
    if config.get("RESUME"):
        # Restore against a template built from the fresh TrainState so the
        # optax states come back as their NamedTuple pytrees — a
        # template-less Orbax restore yields raw nested dicts, which
        # optimizer.update cannot consume (the mid-train-resume bug: the
        # first optimizer step after resume raised
        # "'dict' object has no attribute 'mu'").
        template = {"params": jax.device_get(state.params),
                    "opt_state": jax.device_get(state.opt_state),
                    "states": {"start_epoch": jnp.asarray(0),
                               "global_iters": jnp.asarray(0)},
                    "frozen": jax.device_get(frozen["frozen"])}
        restored = load_checkpoint(config["RESUME"], template=template)
        state = TrainState(restored["params"], restored["opt_state"])
        state = replicate(mesh, state)
        if "states" in restored:
            states.update({k: int(v) for k, v in restored["states"].items()})
        if "frozen" in restored:
            frozen = replicate(mesh, {"frozen": restored["frozen"]})

    rng = jax.random.PRNGKey(config["SEED"])
    multi_checkpoint = bool(config.get("MULTI_CHECKPOINT", False))
    from ..utils.debug_dump import DebugDumper
    train_dumper = DebugDumper(
        os.path.join(config["OUTPUTS_DIR"], "visualize_train"),
        enabled=bool(config.get("VISUALIZE", False)))

    for epoch in range(states["start_epoch"], config["EPOCHS"]):
        dataloader.set_epoch(epoch)
        lrs = {k: jnp.asarray(v, jnp.float32)
               for k, v in group_lrs(config, epoch).items()}
        logger.show(head=f"[Epoch {epoch}] lrs="
                         f"{ {k: float(v) for k, v in lrs.items()} }")
        no_grad = no_grad_frames_for_epoch(config, epoch)
        steps = get_steps(no_grad)

        metric_log = MetricLog()
        epoch_t0 = time.time()
        grad_accum = None
        warmup = int(cfg_get(config, "WARMUP_ITERS", 0) or 0)
        for i, batch in enumerate(dataloader):
            it_t0 = time.time()
            if warmup and states["global_iters"] <= warmup:
                # LR is a runtime scalar, so per-iter warmup does not retrace
                w = warmup_scale(states["global_iters"], warmup)
                lrs = {k: jnp.asarray(float(v) * (w if k != "frozen" else 0.0),
                                      jnp.float32)
                       for k, v in group_lrs(config, epoch).items()}
            rng, step_rng = jax.random.split(rng)
            gt_dropped = int(batch.pop("gt_dropped", 0))
            if gt_dropped:
                metric_log.update("gt_dropped", gt_dropped)
                logger.show(head=f"[Epoch={epoch}, Iter={i}] WARNING:",
                            log=f"{gt_dropped} GT boxes truncated "
                                f"(MAX_GTS too small for this batch)")
            device_batch = shard_batch(mesh, {
                k: jnp.asarray(v) for k, v in batch.items()})
            with under_mesh():
                if accumulation == 1:
                    state, logs = steps(state, frozen, device_batch,
                                        step_rng, lrs, teacher_params)
                else:
                    # true gradient accumulation (train_engine.py:237-246)
                    grad_step, apply_step = steps
                    grad_accum, logs = grad_step(state.params, frozen,
                                                 device_batch, step_rng,
                                                 grad_accum, teacher_params)
                    if (i + 1) % accumulation == 0:
                        state = apply_step(state, grad_accum, lrs)
                        grad_accum = None
            logs = jax.device_get(logs)
            debug = logs.pop("debug", None)
            if debug is not None:
                # reference dumps decoder/updater internals during training
                # (deformable_decoder.py:97-136, query_updater.py:86-97)
                train_dumper.dump_frame(states["global_iters"],
                                        results=debug)
            for k, v in logs.items():
                metric_log.update(k, float(np.asarray(v)))
            metric_log.update("time per iter", time.time() - it_t0)
            if i % 100 == 0:
                metric_log.sync()
                spi = metric_log.metrics["time per iter"].avg
                logger.show(
                    head=f"[Epoch={epoch}, Iter={i}/{len(dataloader)}, "
                         f"{spi:.2f}s/iter]", log=metric_log)
                logger.metric_log(metric_log, states["global_iters"])
            if multi_checkpoint and i % 100 == 0 and logger.enabled:
                save_checkpoint(
                    os.path.join(config["OUTPUTS_DIR"],
                                 f"checkpoint_iter{i // 100}"),
                    params=jax.device_get(state.params))
            states["global_iters"] += 1

        states["start_epoch"] = epoch + 1
        logger.show(head=f"[Epoch {epoch}] total "
                         f"{int((time.time() - epoch_t0) // 60)} min",
                    log=metric_log)
        # checkpoint policy (train_engine.py:146-153)
        if (config["DATASET"] == "DanceTrack" or config["EPOCHS"] < 100
                or (epoch + 1) % 5 == 0):
            save_checkpoint(
                os.path.join(config["OUTPUTS_DIR"], f"checkpoint_{epoch}"),
                params=jax.device_get(state.params),
                opt_state=jax.device_get(state.opt_state),
                states=states,
                frozen=jax.device_get(frozen["frozen"]))
    return state
