"""Cone fitter (cf. `SPFN/cone_fitter.py`).

Parameters: apex, unit axis (oriented toward the points), half-angle in
[1e-3, pi/2 - 1e-3]. Apex solves the weighted LS system X a = <P, X>; the
axis is the plane-fit normal of the point normals, sign-flipped toward the
point cloud; the half-angle is the weighted mean angular offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.fitting import primitives
from cpfn_tpu.fitting.solvers import (
    acos_safe,
    guarded_matrix_solve_ls,
    weighted_plane_fitting,
)


def compute_parameters(
    P: jax.Array, W: jax.Array, X: jax.Array, div_eps: float = 1e-10
):
    """P: [B, N, 3]; W: [B, N, K]; X: [B, N, 3] unit normals.

    Returns (apex [B, K, 3], axis [B, K, 3], half_angle [B, K]).
    """
    B, N, _ = P.shape
    K = W.shape[-1]
    Wk = jnp.swapaxes(W, 1, 2)  # [B, K, N]
    Xk = jnp.broadcast_to(X[:, None], (B, K, N, 3))
    b = jnp.sum(P * X, axis=-1)  # [B, N]
    bk = jnp.broadcast_to(b[:, None, :, None], (B, K, N, 1))
    apex = guarded_matrix_solve_ls(Xk, bk, Wk)  # [B, K, 3]
    axis, _ = weighted_plane_fitting(Xk, Wk)  # [B, K, 3]

    # v[b, n, k, :] = normalize(P - apex)
    v = P[:, :, None, :] - apex[:, None, :, :]  # [B, N, K, 3]
    v = v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
    )
    v_dot_axis = jnp.sum(axis[:, None] * v, axis=-1)  # [B, N, K]
    # flip axis toward the points
    sgn = jnp.sign(jnp.sum(W * v_dot_axis, axis=1))  # [B, K]
    sgn = sgn + (sgn == 0.0).astype(sgn.dtype)
    axis = axis * sgn[..., None]
    tmp = W * acos_safe(jnp.abs(v_dot_axis))  # [B, N, K]
    W_sum = jnp.sum(W, axis=1)  # [B, K]
    half_angle = jnp.sum(tmp, axis=1) / (W_sum + div_eps)
    half_angle = jnp.clip(half_angle, 1e-3, np.pi / 2 - 1e-3)
    return apex, axis, half_angle


def compute_residue_single(apex, axis, half_angle, p):
    """sin^2(min(|alpha - theta|, pi/2)) * ||p - apex||^2; broadcasts."""
    v = p - apex
    v_norm = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    alpha = acos_safe(jnp.sum(v_norm * axis, axis=-1))
    return (
        jnp.sin(jnp.minimum(jnp.abs(alpha - half_angle), np.pi / 2)) ** 2
    ) * jnp.sum(v * v, axis=-1)


def compute_parameter_loss(predicted_axis, gt_axis, matching_indices, angle_diff):
    matched = jnp.take_along_axis(
        predicted_axis, matching_indices[..., None], axis=1
    )
    dot_abs = jnp.abs(jnp.sum(matched * gt_axis, axis=-1))
    return acos_safe(dot_abs) if angle_diff else 1.0 - dot_abs


def create_primitive_from_dict(d: dict) -> primitives.Cone:
    assert d["type"] == "cone"
    apex = np.array([d["apex_x"], d["apex_y"], d["apex_z"]], dtype=float)
    axis = np.array([d["axis_x"], d["axis_y"], d["axis_z"]], dtype=float)
    return primitives.Cone(
        apex=apex, axis=axis, half_angle=float(d["semi_angle"])
    )


def extract_parameter_data_as_dict(instances, n_max_instances: int) -> dict:
    axis_gt = np.zeros((n_max_instances, 3), dtype=float)
    for i, prim in enumerate(instances):
        if isinstance(prim, primitives.Cone):
            axis_gt[i] = prim.axis
    return {"cone_axis_gt": axis_gt}


def extract_predicted_parameters_as_json(
    cone_apex, cone_axis, cone_half_angle, k
) -> dict:
    cone = primitives.Cone(
        np.asarray(cone_apex),
        np.asarray(cone_axis),
        float(cone_half_angle),
        z_min=0.0,
        z_max=5.0,
    )
    return {
        "type": "cone",
        "apex_x": float(cone.apex[0]),
        "apex_y": float(cone.apex[1]),
        "apex_z": float(cone.apex[2]),
        "axis_x": float(cone.axis[0]),
        "axis_y": float(cone.axis[1]),
        "axis_z": float(cone.axis[2]),
        "angle": float(cone.half_angle * 2),
        "z_min": float(cone.z_min),
        "z_max": float(cone.z_max),
        "label": k,
    }
