"""Exact linear sum assignment ON DEVICE (Jonker-Volgenant shortest
augmenting paths with dual potentials), as pure JAX control flow.

Why: the reference hits the host every train step for scipy's Hungarian
(`losses_implementation.py:19-29`), and host callbacks are not supported at
all on some TPU PJRT runtimes — so the assignment must run on device. K is
small (<= 28 instances), so the O(R^2 C) scalar-sequential algorithm costs
~1.6k tiny fused loop steps, vmapped across the batch.

Exactness: produces an optimal assignment (same total cost as scipy); tie
cases may pick a different optimal permutation, which downstream math is
invariant to (mIoU sums over matched pairs).

Rows beyond `n_rows` are padded with constant-zero cost rows: with C >= R
they absorb arbitrary leftover columns without disturbing the optimality of
the real rows' matching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e30)


def _solve_single(cost: jax.Array, n_rows: jax.Array) -> jax.Array:
    """cost: [R, C] f32 (R <= C); n_rows: scalar int32. Returns [R] int32."""
    R, C = cost.shape
    # zero-cost padding rows absorb unused columns
    row_ids = jnp.arange(R)
    cost = jnp.where((row_ids < n_rows)[:, None], cost, 0.0)

    # 1-based columns; index 0 is the virtual start column.
    u0 = jnp.zeros((R + 1,), jnp.float32)
    v0 = jnp.zeros((C + 1,), jnp.float32)
    p0 = jnp.zeros((C + 1,), jnp.int32)  # p[j] = row assigned to column j

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full((C + 1,), _INF)
        used = jnp.zeros((C + 1,), bool)
        way = jnp.zeros((C + 1,), jnp.int32)

        def cond(st):
            _, _, _, _, _, p, j0 = st
            return p[j0] != 0

        def body(st):
            u, v, minv, used, way, p, j0 = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]  # [C]
            better = (cur < minv[1:]) & ~used[1:]
            minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(better, j0, way[1:]))
            cand = jnp.where(used[1:], _INF, minv[1:])
            j1 = jnp.argmin(cand).astype(jnp.int32) + 1
            delta = cand[j1 - 1]
            # dual updates: used columns shift potentials, others shrink minv
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used, 0.0, delta)
            return u, v, minv, used, way, p, j1

        u, v, minv, used, way, p, j0 = lax.while_loop(
            cond, body, (u, v, minv, used, way, p, jnp.int32(0))
        )

        def back_cond(st):
            _, j0 = st
            return j0 != 0

        def back_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = lax.while_loop(back_cond, back_body, (p, j0))
        p = p.at[0].set(0)
        return u, v, p

    _, _, p = lax.fori_loop(1, R + 1, assign_row, (u0, v0, p0))
    # out[i] = column assigned to row i+1 (0 where the row was padding)
    col_of_row = jnp.zeros((R,), jnp.int32)
    cols = jnp.arange(1, C + 1, dtype=jnp.int32)
    col_of_row = col_of_row.at[p[1:] - 1].set(
        jnp.where(p[1:] > 0, cols - 1, 0), mode="drop"
    )
    return jnp.where(row_ids < n_rows, col_of_row, 0)


@functools.partial(jax.jit, static_argnames=())
def lsa_minimize_device(cost: jax.Array, n_rows: jax.Array) -> jax.Array:
    """Batched exact LSA: cost [B, R, C] f32, n_rows [B] int32 -> [B, R] int32.

    Same contract as `cpfn_tpu.native.lsa_minimize_batch`, on device.
    """
    return jax.vmap(_solve_single)(cost, n_rows)
