"""Convenience API: fit primitives to a single cloud.

The BASELINE's first benchmark config — "single-cloud primitive fit:
plane/sphere/cylinder/cone TLS on one low-res cloud" — as a one-call API:
given points, (optional) normals and an instance labeling, fit every
registered primitive family to every instance, pick each instance's type by
minimum mean residue (or use provided types), and export JSON records.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.losses.spfn_losses import DEFAULT_CLASSES, compute_parameters
from cpfn_tpu.metrics.spfn_metrics import creates_json


def fit_instances(
    points: np.ndarray,
    labels: np.ndarray,
    normals: np.ndarray | None = None,
    n_max_instances: int | None = None,
    classes: Sequence[str] = DEFAULT_CLASSES,
):
    """Fit all primitive families to each labeled instance of one cloud.

    points: [N, 3]; labels: [N] int in [-1, K); normals: [N, 3] (estimated
    from local planes if absent — cylinder/cone fits need them).
    Returns (parameters dict of [1, K, ...] arrays, type_ids [K],
    mean_residues [K]).
    """
    points = np.asarray(points, np.float32)
    labels = np.asarray(labels)
    K = n_max_instances or int(labels.max()) + 1
    W = jax.nn.one_hot(jnp.asarray(labels), K, dtype=jnp.float32)[None]
    P = jnp.asarray(points)[None]
    if normals is None:
        normals = estimate_normals(points)
    X = jnp.asarray(np.asarray(normals, np.float32))[None]
    params = compute_parameters(P, W, X, classes=classes)

    # residues of each family at each instance's own points
    from cpfn_tpu.losses.spfn_losses import compute_residue_loss

    # build per-instance point sets by padding with each instance's mean
    n_per = max(int(np.bincount(labels[labels >= 0], minlength=K).max()), 1)
    pts_inst = np.zeros((1, K, n_per, 3), np.float32)
    for k in range(K):
        sel = points[labels == k]
        if len(sel):
            reps = np.resize(sel, (n_per, 3))
            pts_inst[0, k] = reps
    identity = jnp.arange(K)[None]
    _, per_point = compute_residue_loss(
        params, identity, jnp.asarray(pts_inst), jnp.zeros((1, K), jnp.int32),
        classes=classes,
    )  # [1, K, n_per, T]
    mean_res = jnp.mean(per_point, axis=2)[0]  # [K, T]
    type_ids = jnp.argmin(mean_res, axis=1)
    return params, np.asarray(type_ids), np.asarray(
        jnp.min(mean_res, axis=1)
    )


def estimate_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Per-point normals from local PCA planes (smallest eigenvector of the
    k-NN covariance) — host-side helper for clouds without GT normals."""
    from cpfn_tpu.fitting.solvers import weighted_plane_fitting

    points = np.asarray(points, np.float32)
    N = points.shape[0]
    d2 = (
        np.sum(points**2, 1)[:, None]
        + np.sum(points**2, 1)[None, :]
        - 2 * points @ points.T
    )
    idx = np.argpartition(d2, k - 1, axis=1)[:, :k]  # [N, k]
    neigh = points[idx]  # [N, k, 3]
    n, _ = weighted_plane_fitting(
        jnp.asarray(neigh), jnp.ones((N, k), jnp.float32)
    )
    return np.asarray(n)


def fit_cloud_to_json(
    points: np.ndarray,
    labels: np.ndarray,
    normals: np.ndarray | None = None,
    classes: Sequence[str] = DEFAULT_CLASSES,
) -> list[dict]:
    """One-call cloud -> JSON primitive records.

    NOTE: creates_json follows the reference's hard-coded type order
    (0=plane, 1=sphere, 2=cylinder, 3=cone); the residue-argmin ids here are
    remapped into that order before export.
    """
    params, type_ids, _ = fit_instances(points, labels, normals, classes=classes)
    json_order = ["plane", "sphere", "cylinder", "cone"]
    remap = np.array([json_order.index(c) for c in classes])
    return creates_json(remap[type_ids], params)
