"""Plane fitter (cf. `SPFN/plane_fitter.py`).

Parameters: unit normal n and offset c, plane = {p : n.p = c}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.fitting import primitives
from cpfn_tpu.fitting.solvers import acos_safe, weighted_plane_fitting


def compute_parameters(P: jax.Array, W: jax.Array):
    """Weighted plane fit per instance.

    P: [B, N, 3] points; W: [B, N, K] per-instance weights.
    Returns (n [B, K, 3], c [B, K]).

    Unlike the reference (`plane_fitter.py:9-17`), no [B*K, N, 3] tiling: the
    solvers broadcast over a [B, K] leading batch.
    """
    B, N, _ = P.shape
    K = W.shape[-1]
    Wk = jnp.swapaxes(W, 1, 2)  # [B, K, N]
    Pk = jnp.broadcast_to(P[:, None], (B, K, N, 3))
    return weighted_plane_fitting(Pk, Wk)


def compute_residue_single(n, c, p):
    """Squared point-plane distance; broadcasts ([..., 3], [...], [..., 3])."""
    return (jnp.sum(p * n, axis=-1) - c) ** 2


def compute_parameter_loss(predicted_n, gt_n, matching_indices, angle_diff):
    """Unoriented normal deviation of matched instances.

    predicted_n: [B, K1, 3]; gt_n: [B, K2, 3]; matching_indices: [B, K2].
    Returns [B, K2]: acos|n.n_gt| if angle_diff else 1 - |n.n_gt|.
    """
    matched = jnp.take_along_axis(
        predicted_n, matching_indices[..., None], axis=1
    )
    dot_abs = jnp.abs(jnp.sum(matched * gt_n, axis=-1))
    return acos_safe(dot_abs) if angle_diff else 1.0 - dot_abs


def create_primitive_from_dict(d: dict) -> primitives.Plane:
    assert d["type"] == "plane"
    location = np.array(
        [d["location_x"], d["location_y"], d["location_z"]], dtype=float
    )
    axis = np.array([d["axis_x"], d["axis_y"], d["axis_z"]], dtype=float)
    return primitives.Plane(n=axis, c=float(np.dot(location, axis)))


def extract_parameter_data_as_dict(instances, n_max_instances: int) -> dict:
    n = np.zeros((n_max_instances, 3), dtype=float)
    for i, prim in enumerate(instances):
        if isinstance(prim, primitives.Plane):
            n[i] = prim.n
    return {"plane_n_gt": n}


def extract_predicted_parameters_as_json(plane_normal, plane_center, k) -> dict:
    plane = primitives.Plane(np.asarray(plane_normal), float(plane_center))
    return {
        "type": "plane",
        "center_x": float(plane.center[0]),
        "center_y": float(plane.center[1]),
        "center_z": float(plane.center[2]),
        "normal_x": float(plane.n[0]),
        "normal_y": float(plane.n[1]),
        "normal_z": float(plane.n[2]),
        "x_size": float(plane.x_range[1] - plane.x_range[0]),
        "y_size": float(plane.y_range[1] - plane.y_range[0]),
        "x_axis_x": float(plane.x_axis[0]),
        "x_axis_y": float(plane.x_axis[1]),
        "x_axis_z": float(plane.x_axis[2]),
        "y_axis_x": float(plane.y_axis[0]),
        "y_axis_y": float(plane.y_axis[1]),
        "y_axis_z": float(plane.y_axis[2]),
        "label": k,
    }
