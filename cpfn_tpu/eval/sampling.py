"""Eval-time patch extraction from patch-selection heatmaps
(cf. `Utils/sampling_utils.py:4-19`).

Greedy: pick a random pool point (a low-res point flagged as belonging to a
small primitive), take its `num_points_patch` nearest high-res neighbors as a
patch, remove all pool points inside the patch radius, repeat until the pool
empties or `max_number_patches` is reached.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def sample_patches(
    gt_points_lr: np.ndarray,
    gt_points_hr: np.ndarray,
    pool_indices: np.ndarray,
    num_points_patch: int = 8192,
    max_number_patches: int = 32,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Returns [P, num_points_patch] int64 indices into the high-res cloud
    (P >= 1; caller guards the empty-pool case)."""
    rng = rng or np.random
    pool = np.asarray(pool_indices).copy()
    patches = []
    while len(patches) < max_number_patches and len(pool) > 0:
        i = pool[rng.choice(len(pool))]
        d_hr = np.linalg.norm(gt_points_lr[i][None, :] - gt_points_hr, axis=1)
        order = np.argpartition(d_hr, num_points_patch - 1)[:num_points_patch]
        order = order[np.argsort(d_hr[order])]
        patches.append(order)
        radius = d_hr[order[-1]]
        d_lr = np.linalg.norm(
            gt_points_lr[i][None, :] - gt_points_lr[pool], axis=1
        )
        pool = np.delete(pool, np.where(d_lr <= radius)[0])
    return np.stack(patches, axis=0).astype(np.int64)


@functools.partial(
    jax.jit,
    static_argnames=("num_points_patch", "max_number_patches", "deterministic"),
)
def sample_patches_device(
    points_lr,
    points_hr,
    pool_mask,
    key,
    num_points_patch: int = 8192,
    max_number_patches: int = 32,
    deterministic: bool = False,
):
    """Device-side greedy patch extraction (same algorithm as
    `sample_patches`, `Utils/sampling_utils.py:4-19`): pick a pool point,
    take its `num_points_patch` nearest high-res neighbors (sorted by
    distance, as the host path), remove pool points within the patch radius,
    repeat. Runs as one `lax.while_loop` inside jit so the whole cascade can
    be a single dispatch (no host round trip per cloud).

    points_lr: [n_lr, 3]; points_hr: [N, 3]; pool_mask: [n_lr] bool;
    key: PRNG key for the pool choice (`deterministic=True` picks the
    lowest-index pool point instead — used by tests to compare against the
    host path seeded the same way).
    Returns (patch_idx [max_number_patches, num_points_patch] int32,
    patch_valid [max_number_patches] bool, n_patches int32). Padding rows of
    patch_idx are zero.
    """
    import os

    import jax.numpy as jnp
    from jax import lax

    # trace-time knob (same pattern as CPFN_BQ_CHUNK): the k-NN selection per
    # extracted patch as top_k instead of a full N-point argsort. Identical
    # outputs; measured on hardware before becoming the default.
    use_topk = os.environ.get("CPFN_EXTRACT_TOPK", "") not in ("", "0")

    def cond(st):
        pool, out, valid, count, key = st
        return jnp.any(pool) & (count < max_number_patches)

    def body(st):
        pool, out, valid, count, key = st
        if deterministic:
            sel = jnp.argmax(pool)
        else:
            key, sub = jax.random.split(key)
            npool = jnp.sum(pool)
            j = jax.random.randint(sub, (), 0, jnp.maximum(npool, 1))
            csum = jnp.cumsum(pool.astype(jnp.int32))
            sel = jnp.argmax((csum == j + 1) & pool)
        seed = points_lr[sel]
        d_hr = jnp.linalg.norm(points_hr - seed[None, :], axis=1)
        if use_topk:
            # top_k of the negated distances = the k smallest, sorted
            # ascending, ties to the lower index — exactly what the stable
            # argsort prefix produces (pinned by test_sampling_topk_parity);
            # avoids fully sorting all N distances per extracted patch
            neg, order = lax.top_k(-d_hr, num_points_patch)
            order = order.astype(jnp.int32)
            radius = -neg[-1]
        else:
            order = jnp.argsort(d_hr)[:num_points_patch].astype(jnp.int32)
            radius = d_hr[order[-1]]
        d_lr = jnp.linalg.norm(points_lr - seed[None, :], axis=1)
        pool = pool & (d_lr > radius)
        out = lax.dynamic_update_index_in_dim(out, order, count, axis=0)
        valid = valid.at[count].set(True)
        return pool, out, valid, count + 1, key

    out0 = jnp.zeros((max_number_patches, num_points_patch), jnp.int32)
    valid0 = jnp.zeros((max_number_patches,), bool)
    pool0 = pool_mask.astype(bool)
    pool, out, valid, count, _ = lax.while_loop(
        cond, body, (pool0, out0, valid0, jnp.int32(0), key)
    )
    return out, valid, count
