import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from memotr_tpu.ops.hungarian import hungarian, hungarian_cost_padded


def _total_cost(cost, col4row):
    return sum(cost[i, j] for i, j in enumerate(col4row) if j >= 0)


def test_matches_scipy_square():
    rng = np.random.default_rng(0)
    for _ in range(20):
        cost = rng.normal(size=(16, 16)).astype(np.float32)
        ours = np.asarray(hungarian(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        # optimal value must match (assignments may differ on ties)
        np.testing.assert_allclose(
            _total_cost(cost, ours), cost[rows, cols].sum(), rtol=1e-5)
        assert len(set(ours.tolist())) == 16  # valid permutation


def test_matches_scipy_rectangular():
    rng = np.random.default_rng(1)
    for r, c in [(5, 30), (31, 300), (1, 7), (64, 64)]:
        cost = rng.normal(size=(r, c)).astype(np.float32) * 10
        ours = np.asarray(hungarian(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        np.testing.assert_allclose(
            _total_cost(cost, ours), cost[rows, cols].sum(), rtol=1e-5)
        assert len(set(ours.tolist())) == r


def test_batched_vmap():
    rng = np.random.default_rng(2)
    cost = rng.normal(size=(4, 12, 40)).astype(np.float32)
    ours = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(4):
        rows, cols = linear_sum_assignment(cost[b])
        np.testing.assert_allclose(
            _total_cost(cost[b], ours[b]), cost[b][rows, cols].sum(), rtol=1e-5)


def test_padded_rows_do_not_disturb():
    rng = np.random.default_rng(3)
    cost = rng.normal(size=(20, 50)).astype(np.float32)
    mask = np.zeros((20,), bool)
    mask[:7] = True
    ours = np.asarray(
        hungarian_cost_padded(jnp.asarray(cost), jnp.asarray(mask)))
    assert np.all(ours[7:] == -1)
    rows, cols = linear_sum_assignment(cost[:7])
    np.testing.assert_allclose(
        _total_cost(cost, ours), cost[rows, cols].sum(), rtol=1e-5)


def test_jit_compiles_once():
    f = jax.jit(hungarian)
    rng = np.random.default_rng(4)
    a = f(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
    b = f(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
    assert a.shape == b.shape == (8,)
