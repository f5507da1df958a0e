"""Shuffle-ensemble test-time averaging for the order-sensitive SPFN forwards.

The PointNet++ forward is point-order sensitive (FPS seeds at index 0; ball
query keeps the first K neighbours in scan order — ops/geometry.py), so one
forward's prediction is a single draw from the distribution over input
permutations; measured spread on the same records is large (hard matched-IoU
0.53 vs 0.39 between two orders, ROUND3_NOTES.md). Averaging soft outputs
over R independent permutations integrates that variance out.

Instance-membership slot indices are NOT stable across permutations, so each
run's W columns are first aligned to run 0's by exact maximum relaxed-IoU
assignment (the on-device JV solver, losses/lsa_device.py) before averaging.
Normals are averaged then re-normalized; type logits are averaged (a
geometric-mean ensemble in probability space).

The reference has no counterpart (one stored-order forward per cloud,
evaluation_globalSPFN.py:98 / evaluation_localSPFN.py:74); this is a
TPU-cheap quality lever enabled with --n_shuffles in the eval drivers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpfn_tpu.losses.lsa_device import lsa_minimize_device


def _align_one(W_ref: jax.Array, W: jax.Array) -> jax.Array:
    """[N, K] x [N, K] -> W with slots permuted to best match W_ref."""
    inter = W_ref.T @ W  # [K, K] soft intersection
    s_ref = jnp.sum(W_ref, axis=0)[:, None]
    s = jnp.sum(W, axis=0)[None, :]
    riou = inter / (s_ref + s - inter + 1e-9)
    k = W.shape[-1]
    assign = lsa_minimize_device(
        -riou[None], jnp.full((1,), k, jnp.int32)
    )[0]
    return W[:, assign]


def align_membership(W_ref: jax.Array, W: jax.Array) -> jax.Array:
    """Permute W's instance slots to maximize summed relaxed IoU vs W_ref.

    W_ref, W: [..., N, K] soft memberships; leading dims are vmapped (each
    batch/patch row aligned independently).
    """
    if W.ndim == 2:
        return _align_one(W_ref, W)
    lead = W.shape[:-2]
    flat = (-1,) + W.shape[-2:]
    out = jax.vmap(_align_one)(W_ref.reshape(flat), W.reshape(flat))
    return out.reshape(lead + W.shape[-2:])


@jax.jit
def average_run(acc, run):
    """Fold one ensemble member into the running sums.

    acc: dict with 'X','T','W' sums plus 'W0' (run-0 membership, the slot
    reference) — from `init_accumulator`. run: (X, T, W) in the COMMON
    (stored) point order. Returns the updated accumulator.
    """
    X, T, W = run
    W = align_membership(acc["W0"], W)
    return {
        "X": acc["X"] + X,
        "T": acc["T"] + T,
        "W": acc["W"] + W,
        "W0": acc["W0"],
    }


def init_accumulator(run):
    X, T, W = run
    # W0 must be a distinct buffer from W: the jitted average_run takes both
    # as parameters, and the runtime dedupes aliased argument buffers, which
    # desyncs the supplied-vs-expected buffer count.
    return {"X": X, "T": T, "W": W, "W0": jnp.copy(W)}


@jax.jit
def finish_average(acc, n: int):
    """Accumulated sums -> ensemble (X unit normals, T logits, W soft)."""
    X = acc["X"] / n
    X = X / (jnp.linalg.norm(X, axis=-1, keepdims=True) + 1e-12)
    return X, acc["T"] / n, acc["W"] / n


def ensemble_average(runs):
    """Convenience: list of (X, T, W) point-aligned runs -> averaged tuple."""
    acc = init_accumulator(runs[0])
    for run in runs[1:]:
        acc = average_run(acc, run)
    return finish_average(acc, len(runs))
