"""Hungarian assignment on device — no per-step host sync.

The reference matcher ships every cost matrix to the CPU and runs
scipy.optimize.linear_sum_assignment per image per step
(/root/reference/alonet/detr/matcher.py:121-129) — a device->host sync in the
training hot loop. Here the Jonker-Volgenant successive-shortest-path
algorithm runs entirely in lax (fori/while loops + vectorized relaxation), so
matching stays on-chip, batches via vmap, and jits into the train step.

Cost matrices in DETR are tiny (100 x ~20), so the O(n^3) scalar loop is
negligible next to the transformer; the win is removing the sync.

``hungarian_scipy`` (pure_callback) is kept as a cross-check fallback.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_INF = 1e18


@partial(jax.jit, static_argnames=())
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the square linear assignment problem.

    cost: (n, n) float matrix. Returns ``row_for_col``: (n,) int32 where
    row_for_col[j] is the row assigned to column j (a permutation).
    Minimizes sum(cost[row_for_col[j], j]).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float64) if jax.config.jax_enable_x64 \
        else cost.astype(jnp.float32)

    # 1-indexed arrays with a virtual column 0 (e-maxx JV formulation)
    u0 = jnp.zeros(n + 1, cost.dtype)
    v0 = jnp.zeros(n + 1, cost.dtype)
    p0 = jnp.zeros(n + 1, jnp.int32)  # p[j] = row matched to col j (0 = free)

    col_ids = jnp.arange(n + 1, dtype=jnp.int32)

    def assign_row(i, carry):
        u, v, p = carry
        i1 = i + 1  # 1-indexed row

        minv = jnp.full(n + 1, _INF, cost.dtype)
        way = jnp.zeros(n + 1, jnp.int32)
        used = jnp.zeros(n + 1, jnp.bool_)
        p = p.at[0].set(i1)
        j0 = jnp.int32(0)

        def path_cond(state):
            u, v, p, minv, way, used, j0 = state
            return p[j0] != 0

        def path_body(state):
            u, v, p, minv, way, used, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            # vectorized relaxation over all unused columns 1..n
            cur = jnp.concatenate(
                [jnp.full((1,), _INF, cost.dtype), cost[i0 - 1]]) - u[i0] - v
            better = (cur < minv) & (~used) & (col_ids > 0)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used | (col_ids == 0), _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potential update: used cols shift potentials, unused shrink minv
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return (u, v, p, minv, way, used, j1)

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            path_cond, path_body, (u, v, p, minv, way, used, j0))

        # unwind augmenting path
        def unwind_cond(state):
            p, j0 = state
            return j0 != 0

        def unwind_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(unwind_cond, unwind_body, (p, j0))
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))
    return p[1:] - 1  # row_for_col, 0-indexed


def hungarian_rect(cost: jnp.ndarray, n_valid_cols) -> jnp.ndarray:
    """Rectangular assignment via square padding.

    cost: (n_rows, n_cols) with n_cols <= n_rows; columns >= n_valid_cols are
    padding. Pads to (n_rows, n_rows) with a large constant so padding columns
    never displace real ones, then solves square. Returns row_for_col
    (n_cols,) — entries for invalid columns are arbitrary and must be masked
    by the caller.
    """
    n_rows, n_cols = cost.shape
    valid = jnp.arange(n_cols) < n_valid_cols
    big = jnp.abs(cost).max() * 2.0 + 1.0
    cost = jnp.where(valid[None, :], cost, big)
    if n_cols < n_rows:
        pad = jnp.full((n_rows, n_rows - n_cols), big, cost.dtype)
        cost_sq = jnp.concatenate([cost, pad], axis=1)
    else:
        cost_sq = cost
    row_for_col = hungarian(cost_sq)
    return row_for_col[:n_cols]


batched_hungarian = jax.vmap(hungarian)


def batched_hungarian_rect(costs: jnp.ndarray, n_valid_cols: jnp.ndarray):
    """(B, n_rows, n_cols) costs + (B,) valid column counts -> (B, n_cols)."""
    return jax.vmap(hungarian_rect)(costs, n_valid_cols)


def hungarian_scipy(cost: np.ndarray):
    """Host fallback via scipy (pure_callback wrapper) — parity oracle."""
    from scipy.optimize import linear_sum_assignment

    def _solve(c):
        r, c_idx = linear_sum_assignment(c)
        out = np.zeros(c.shape[1], np.int32)
        out[c_idx] = r.astype(np.int32)
        return out

    return jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((cost.shape[1],), jnp.int32), cost,
        vmap_method="sequential")
