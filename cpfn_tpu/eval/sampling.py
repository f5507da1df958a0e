"""Eval-time patch extraction from patch-selection heatmaps
(cf. `Utils/sampling_utils.py:4-19`).

Greedy: pick a random pool point (a low-res point flagged as belonging to a
small primitive), take its `num_points_patch` nearest high-res neighbors as a
patch, remove all pool points inside the patch radius, repeat until the pool
empties or `max_number_patches` is reached.
"""

from __future__ import annotations

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
