"""Query-updater gating semantics (query_updater.py:82-152)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models.query_updater import QueryUpdater
from memotr_tpu.utils.misc import inverse_sigmoid

B, S, C, K = 1, 4, 16, 1


@pytest.fixture(scope="module")
def updater_and_params():
    upd = QueryUpdater(hidden_dim=C, ffn_dim=32, use_dab=True,
                       long_memory_lambda=0.01, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    args = _inputs(scores=[0.9, 0.2, 0.9, 0.9],
                   mask=[True, True, True, False])
    params = upd.init(rng, *args)
    return upd, params


def _inputs(scores, mask):
    logits = np.log(np.asarray(scores) / (1 - np.asarray(scores)))
    rngs = np.random.default_rng(0)
    return (
        jnp.asarray(rngs.normal(size=(B, S, C)), jnp.float32),   # query_embed
        jnp.asarray(rngs.normal(size=(B, S, 4)), jnp.float32),   # ref_pts
        jnp.asarray(logits, jnp.float32).reshape(B, S, K),       # logits
        jnp.asarray(rngs.uniform(0.2, 0.8, (B, S, 4)), jnp.float32),  # boxes
        jnp.asarray(rngs.normal(size=(B, S, C)), jnp.float32),   # output
        jnp.asarray(rngs.normal(size=(B, S, C)), jnp.float32),   # last_output
        jnp.asarray(rngs.normal(size=(B, S, C)), jnp.float32),   # long_memory
        jnp.asarray([mask]),                                      # slot mask
    )


def test_is_pos_gating(updater_and_params):
    upd, params = updater_and_params
    args = _inputs(scores=[0.9, 0.2, 0.9, 0.9],
                   mask=[True, True, True, False])
    out = upd.apply(params, *args)
    qe, rp, logits, boxes, oe, lo, lm, mask = args

    # slot 0 (score .9, live): everything updated
    np.testing.assert_allclose(np.asarray(out["ref_pts"][0, 0]),
                               np.asarray(inverse_sigmoid(boxes[0, 0])),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out["query_embed"][0, 0]),
                           np.asarray(qe[0, 0]))
    # long-memory EMA: 0.99*old + 0.01*output
    np.testing.assert_allclose(
        np.asarray(out["long_memory"][0, 0]),
        0.99 * np.asarray(lm[0, 0]) + 0.01 * np.asarray(oe[0, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["last_output"][0, 0]),
                               np.asarray(oe[0, 0]), atol=1e-6)

    # slot 1 (score .2 < 0.5): untouched
    for key, ref in [("ref_pts", rp), ("query_embed", qe),
                     ("long_memory", lm), ("last_output", lo)]:
        np.testing.assert_allclose(np.asarray(out[key][0, 1]),
                                   np.asarray(ref[0, 1]), atol=1e-6,
                                   err_msg=key)

    # slot 3 (dead): untouched even with high score
    np.testing.assert_allclose(np.asarray(out["query_embed"][0, 3]),
                               np.asarray(qe[0, 3]), atol=1e-6)


def test_dead_slots_excluded_from_memory_attention(updater_and_params):
    upd, params = updater_and_params
    # perturbing a DEAD slot's memory must not change live slots' outputs
    args1 = _inputs(scores=[0.9, 0.9, 0.9, 0.9],
                    mask=[True, True, True, False])
    args2 = list(args1)
    args2[6] = args1[6].at[0, 3].set(100.0)   # long_memory of dead slot
    args2[4] = args1[4].at[0, 3].set(-50.0)   # output_embed of dead slot
    out1 = upd.apply(params, *args1)
    out2 = upd.apply(params, *tuple(args2))
    np.testing.assert_allclose(np.asarray(out1["query_embed"][0, :3]),
                               np.asarray(out2["query_embed"][0, :3]),
                               atol=1e-5)


def test_ddetr_variant_updates_both_halves():
    upd = QueryUpdater(hidden_dim=C, ffn_dim=32, use_dab=False,
                       dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    args = list(_inputs(scores=[0.9, 0.2, 0.9, 0.9],
                        mask=[True, True, True, False]))
    rngs = np.random.default_rng(1)
    args[0] = jnp.asarray(rngs.normal(size=(B, S, 2 * C)), jnp.float32)
    params = upd.init(rng, *args)
    out = upd.apply(params, *args)
    assert out["query_embed"].shape == (B, S, 2 * C)
    # gated slot 1 keeps both halves
    np.testing.assert_allclose(np.asarray(out["query_embed"][0, 1]),
                               np.asarray(args[0][0, 1]), atol=1e-6)
    # updated slot 0 changes both halves
    assert not np.allclose(np.asarray(out["query_embed"][0, 0, :C]),
                           np.asarray(args[0][0, 0, :C]))
    assert not np.allclose(np.asarray(out["query_embed"][0, 0, C:]),
                           np.asarray(args[0][0, 0, C:]))
