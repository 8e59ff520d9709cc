"""Exact linear-sum-assignment, in-graph.

The reference hops the cost matrix to the CPU and calls
``scipy.optimize.linear_sum_assignment`` per batch item
(``/root/reference/models/matcher.py:122-131``) — a host sync every frame.
Here we solve the assignment on-device with the shortest-augmenting-path
(Jonker-Volgenant) algorithm, the same algorithm scipy implements, expressed
with ``lax.fori_loop``/``lax.while_loop`` so it lives inside the jitted (and
pjit-sharded) training step.  Matrices are small (<=128 GT rows x 300 query
columns), so the sequential outer loop is cheap relative to the model.

Convention: ``cost`` has shape (R, C) with R <= C (rows all get assigned).
Returns ``col4row``: for each row, the assigned column index.  Optimality is
verified against scipy in ``tests/test_hungarian.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _solve_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve one (R, C) assignment problem, R <= C.  Returns col4row (R,)."""
    r, c = cost.shape
    assert r <= c, "hungarian expects rows <= cols; transpose the cost"

    u0 = jnp.zeros((r,), cost.dtype)     # row potentials
    v0 = jnp.zeros((c,), cost.dtype)     # col potentials
    col4row0 = jnp.full((r,), -1, jnp.int32)
    row4col0 = jnp.full((c,), -1, jnp.int32)

    def augment_row(cur_row, carry):
        u, v, col4row, row4col = carry

        # --- Dijkstra over columns to find shortest augmenting path ---------
        def dijkstra_cond(state):
            _, _, _, _, sink, _, _ = state
            return sink < 0

        def dijkstra_body(state):
            i, min_val, sr, sc, sink, spc, path = state
            sr = sr.at[i].set(True)
            red = min_val + cost[i] - u[i] - v        # reduced path costs (C,)
            better = (red < spc) & ~sc
            path = jnp.where(better, i, path)
            spc = jnp.where(better, red, spc)
            masked = jnp.where(sc, _INF, spc)
            j = jnp.argmin(masked)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            hit_free = row4col[j] < 0
            sink = jnp.where(hit_free, j, sink)
            i = jnp.where(hit_free, i, row4col[j])
            return i, min_val, sr, sc, sink, spc, path

        init = (
            cur_row,
            jnp.array(0.0, cost.dtype),
            jnp.zeros((r,), jnp.bool_),
            jnp.zeros((c,), jnp.bool_),
            jnp.array(-1, jnp.int32),
            jnp.full((c,), _INF, cost.dtype),
            jnp.full((c,), -1, jnp.int32),
        )
        _, min_val, sr, sc, sink, spc, path = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init)

        # --- update dual potentials (scipy _lsap.c equivalent) --------------
        u = u.at[cur_row].add(min_val)
        others = sr & (jnp.arange(r) != cur_row)
        spc_at_assigned = spc[jnp.clip(col4row, 0, c - 1)]     # (R,)
        u = jnp.where(others, u + min_val - spc_at_assigned, u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment: flip matched edges back along the path ----------------
        def aug_cond(state):
            _, _, done, _ = state
            return ~done

        def aug_body(state):
            j, c4r, _, r4c = state
            i = path[j]
            r4c = r4c.at[j].set(i)
            j_next = c4r[i]
            c4r = c4r.at[i].set(j)
            return j_next, c4r, i == cur_row, r4c

        _, col4row, _, row4col = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, jnp.array(False), row4col))
        return u, v, col4row, row4col

    _, _, col4row, _ = jax.lax.fori_loop(
        0, r, augment_row, (u0, v0, col4row0, row4col0))
    return col4row


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched exact assignment.  cost: (..., R, C), R <= C (static).

    Returns col4row (..., R) int32.
    """
    flat = cost.reshape((-1,) + cost.shape[-2:])
    out = jax.vmap(_solve_single)(flat)
    return out.reshape(cost.shape[:-2] + (cost.shape[-2],))


def hungarian_cost_padded(cost: jnp.ndarray, row_mask: jnp.ndarray,
                          pad_cost: float = 0.0) -> jnp.ndarray:
    """Assignment with padded (invalid) rows.

    Invalid rows are replaced with a constant-cost row, which cannot change
    the optimal assignment restricted to valid rows (constant rows are
    interchangeable across leftover columns).  cost: (..., R, C);
    row_mask: (..., R) bool.  Returns col4row (..., R) with -1 for invalid
    rows.

    Non-finite cells (inf/nan used by callers as "forbidden") are capped at
    a COST-SCALED finite value: BIG = fmax + (span + 1) * (R + 1), where
    fmax/span come from the finite cells of each problem.  BIG exceeds any
    achievable finite-assignment delta, so forbidden cells stay last-resort,
    while staying ~R*span above the data — unlike a fixed 1e15, it cannot
    catastrophically absorb real costs in the float32 dual potentials.
    """
    r = cost.shape[-2]
    valid = row_mask[..., None] & jnp.isfinite(cost)
    fmax = jnp.max(jnp.where(valid, cost, -jnp.inf), axis=(-2, -1),
                   keepdims=True)
    fmin = jnp.min(jnp.where(valid, cost, jnp.inf), axis=(-2, -1),
                   keepdims=True)
    fmax = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
    fmin = jnp.where(jnp.isfinite(fmin), fmin, 0.0)
    big = fmax + (fmax - fmin + 1.0) * (r + 1)
    safe_cost = jnp.where(valid, cost, big)
    safe_cost = jnp.where(row_mask[..., None], safe_cost, pad_cost)
    col4row = hungarian(safe_cost)
    return jnp.where(row_mask, col4row, -1)
