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


def test_padded_all_rows_masked():
    cost = np.ones((6, 10), np.float32)
    mask = np.zeros((6,), bool)
    ours = np.asarray(
        hungarian_cost_padded(jnp.asarray(cost), jnp.asarray(mask)))
    assert np.all(ours == -1)


def test_padded_infinite_cells_are_last_resort():
    """inf cells (callers' "forbidden" marker) must not be chosen while a
    finite-cost perfect matching exists, and must not destroy float32
    precision of the real costs (the old 1e15 cap risked both)."""
    rng = np.random.default_rng(5)
    cost = rng.normal(size=(8, 12)).astype(np.float32)
    forbid = rng.random((8, 12)) < 0.4
    # keep one guaranteed-finite column per row so a finite matching exists
    for i in range(8):
        forbid[i, i] = False
    cost_inf = np.where(forbid, np.inf, cost).astype(np.float32)
    mask = np.ones((8,), bool)
    ours = np.asarray(
        hungarian_cost_padded(jnp.asarray(cost_inf), jnp.asarray(mask)))
    assert not forbid[np.arange(8), ours].any(), "picked a forbidden cell"
    big = np.nanmax(np.where(forbid, -np.inf, cost)) + 1e4
    rows, cols = linear_sum_assignment(np.where(forbid, big, cost))
    np.testing.assert_allclose(
        _total_cost(cost, ours), cost[rows, cols].sum(), rtol=1e-5)


def test_padded_large_magnitude_costs():
    """Real cost magnitudes ~1e4 (focal+L1+GIoU weighted sums on bad inits)
    must survive the masked-cell cap without precision loss."""
    rng = np.random.default_rng(6)
    cost = (rng.normal(size=(16, 32)) * 1e4).astype(np.float32)
    cost[:, ::3] = np.inf          # a third of columns forbidden
    mask = np.ones((16,), bool)
    mask[10:] = False
    ours = np.asarray(
        hungarian_cost_padded(jnp.asarray(cost), jnp.asarray(mask)))
    assert np.all(ours[10:] == -1)
    assert np.all(np.isfinite(cost[np.arange(10), ours[:10]]))
    fin = np.where(np.isfinite(cost), cost, 0.0)
    big = fin.max() + (fin.max() - fin.min() + 1) * 17
    rows, cols = linear_sum_assignment(
        np.where(np.isfinite(cost[:10]), cost[:10], big))
    np.testing.assert_allclose(
        _total_cost(cost, ours), cost[:10][rows, cols].sum(), rtol=1e-5)


def test_padded_tied_costs_valid_permutation():
    cost = np.zeros((12, 12), np.float32)    # everything tied
    mask = np.ones((12,), bool)
    ours = np.asarray(
        hungarian_cost_padded(jnp.asarray(cost), jnp.asarray(mask)))
    assert len(set(ours.tolist())) == 12 and ours.min() >= 0


def test_jit_compiles_once():
    f = jax.jit(hungarian)
    rng = np.random.default_rng(4)
    a = f(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
    b = f(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
    assert a.shape == b.shape == (8,)
