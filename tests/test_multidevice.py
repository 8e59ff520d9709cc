"""Multi-device training numerics + cross-process metric sync.

VERDICT round-1 gap: no test asserted that the sharded train step reproduces
single-device numerics, and ``MetricLog.sync`` was untested.  Covers:

- the full train step (forward + criterion + in-graph Hungarian + grads +
  AdamW) on a 2-device data mesh == the same step on 1 device, same global
  batch (SURVEY §2.2 DP row; the reference's DDP gradient sync +
  criterion.py:122-126 GT-count all-reduce are XLA collectives here);
- ``MetricLog.sync`` totals across two real JAX processes
  (log/log.py:27-36 ``all_gather_object`` equivalent).

2-device mesh only: this 1-core box hits XLA:CPU's 40 s rendezvous abort
when more device threads contend (see tests/test_engines.py).
"""
import os
import subprocess
import sys
import textwrap

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu" or len(_jax.devices()) < 2,
    reason="needs the virtual CPU mesh; run via scripts/test_cpu.sh")

import jax
import jax.numpy as jnp
import numpy as np


def _setup(world_size: int, token_axis=None, h=64):
    import __graft_entry__ as ge
    from memotr_tpu.engine.trainer import (group_lrs, init_train_state,
                                           label_tree, make_optimizer,
                                           make_train_step, static_config)
    from memotr_tpu.models.criterion import build_criterion
    from memotr_tpu.models.memotr import build_model
    from memotr_tpu.models.query_updater import build_query_updater
    from memotr_tpu.structures.track_state import TrackState

    config = ge._tiny_config(track_slots=4, max_gts=4)
    config.update({"NUM_ENC_LAYERS": 1, "NUM_DEC_LAYERS": 2,
                   "NUM_DET_QUERIES": 20, "HIDDEN_DIM": 32, "FFN_DIM": 64,
                   "TOKEN_SHARD_AXIS": token_axis})
    model = build_model(config)
    updater = build_query_updater(config)
    rng = jax.random.PRNGKey(0)
    w = h
    st = TrackState.empty(1, 4, 32, 1, use_dab=True)
    variables = model.init(rng, jnp.zeros((1, h, w, 3)),
                           jnp.zeros((1, h, w), bool),
                           st.query_embed, st.ref_pts, st.mask)
    uvars = updater.init(rng, st.query_embed, st.ref_pts, st.logits,
                         st.boxes, st.output_embed, st.last_output,
                         st.long_memory, st.mask)
    criterion = build_criterion(config)
    optimizer = make_optimizer(config)
    state = init_train_state(variables["params"], uvars["params"], optimizer)
    labels = label_tree(state.params)
    frozen = {"frozen": variables["frozen"]}
    # world_size is a NORMALIZATION constant (criterion.py:118-136); keep it
    # fixed so 1- and 2-device runs compute the identical formula
    cs = static_config(config, model, world_size=2)
    step = make_train_step(model, updater, criterion, optimizer, cs, labels)
    lrs = {k: jnp.asarray(v, jnp.float32)
           for k, v in group_lrs(config, 0).items()}

    b, t, g = 2, 2, 4
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
    return state, frozen, batch, step, lrs


def _run(world_size: int, h=64):
    from memotr_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    state, frozen, batch, step, lrs = _setup(world_size, h=h)
    mesh = make_mesh(world_size)
    state = replicate(mesh, state)
    frozen = replicate(mesh, frozen)
    batch = shard_batch(mesh, batch)
    new_state, logs = step(state, frozen, batch, jax.random.PRNGKey(2), lrs)
    flat = jax.tree.leaves(new_state.params)
    return (jax.device_get(logs),
            np.asarray(jax.device_get(flat[0])),
            np.asarray(jax.device_get(flat[-1])))


def _run_2d_seq():
    """Train step on a (data=1, seq=2) mesh: encoder tokens sharded."""
    from memotr_tpu.parallel.mesh import make_mesh_2d, replicate, shard_batch

    mesh = make_mesh_2d(1, 2, seq_axis="seq")
    with jax.set_mesh(mesh):   # with_sharding_constraint needs the mesh
        # 128px -> 340 encoder tokens, divisible by the 2-way seq axis
        state, frozen, batch, step, lrs = _setup(2, token_axis="seq",
                                                 h=128)
        state = replicate(mesh, state)
        frozen = replicate(mesh, frozen)
        batch = shard_batch(mesh, batch)
        new_state, logs = step(state, frozen, batch, jax.random.PRNGKey(2),
                               lrs)
        flat = jax.tree.leaves(new_state.params)
        return (jax.device_get(logs),
                np.asarray(jax.device_get(flat[0])),
                np.asarray(jax.device_get(flat[-1])))


def test_seq_sharded_train_step_matches_single_device():
    """SP row of SURVEY §2.2: a (1 data x 2 seq) mesh with TOKEN_SHARD_AXIS
    must reproduce single-device training numerics."""
    logs1, p1a, p1b = _run(1, h=128)
    logs2, p2a, p2b = _run_2d_seq()
    np.testing.assert_allclose(logs1["total_loss"], logs2["total_loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(logs1["grad_norm"], logs2["grad_norm"],
                               rtol=1e-3)
    np.testing.assert_allclose(p1a, p2a, atol=1e-5)
    np.testing.assert_allclose(p1b, p2b, atol=1e-5)


def test_sharded_train_step_matches_single_device():
    logs1, p1a, p1b = _run(1)
    logs2, p2a, p2b = _run(2)
    np.testing.assert_allclose(logs1["total_loss"], logs2["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(logs1["grad_norm"], logs2["grad_norm"],
                               rtol=1e-4)
    assert logs1["n_gts"] == logs2["n_gts"] == 16  # 2 clips x 2 frames x 4
    np.testing.assert_allclose(p1a, p2a, atol=1e-6)
    np.testing.assert_allclose(p1b, p2b, atol=1e-6)


_SYNC_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes=2,
                               process_id=int(sys.argv[1]))
    from memotr_tpu.log.logger import MetricLog
    log = MetricLog()
    pid = jax.process_index()
    for v in ([1.0, 2.0] if pid == 0 else [3.0, 4.0, 5.0]):
        log.update("loss", v)
    log.sync()
    m = log.metrics["loss"]
    print(f"RESULT {{pid}} {{m.total_sum}} {{m.total_count}}", flush=True)
""")


def test_metric_log_sync_across_processes(tmp_path):
    """Two real JAX processes; after sync both report the global totals
    (sum=15, count=5) — the all_gather_object semantics of log/log.py:27-36."""
    port = 29731
    script = tmp_path / "sync_worker.py"
    script.write_text(_SYNC_WORKER.format(port=port))
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
    results = {}
    for out, _ in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, s, c = line.split()
                results[int(pid)] = (float(s), int(c))
    assert results == {0: (15.0, 5), 1: (15.0, 5)}, results
