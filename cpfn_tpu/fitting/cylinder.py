"""Cylinder fitter (cf. `SPFN/cylinder_fitter.py`).

Parameters: unit axis, a center on the axis, squared radius. The axis is the
weighted-TLS null direction of the point normals; points are projected into
the plane frame orthogonal to the axis and a 2D circle is fitted there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.fitting import primitives
from cpfn_tpu.fitting.solvers import (
    acos_safe,
    compute_consistent_plane_frame,
    sqrt_safe,
    weighted_sphere_fitting,
)
from cpfn_tpu.fitting.tls import solve_weighted_tls


def compute_parameters(P: jax.Array, W: jax.Array, X: jax.Array):
    """P: [B, N, 3] points; W: [B, N, K]; X: [B, N, 3] unit normals.

    Returns (axis [B, K, 3], center [B, K, 3], radius_sqr [B, K]).
    """
    B, N, _ = P.shape
    K = W.shape[-1]
    Wk = jnp.swapaxes(W, 1, 2)  # [B, K, N]
    Xk = jnp.broadcast_to(X[:, None], (B, K, N, 3))
    axis = solve_weighted_tls(Xk, Wk)  # [B, K, 3]
    x_axes, y_axes = compute_consistent_plane_frame(axis)
    # Project points into each instance's orthogonal frame: [B, K, N, 2]
    x_coord = jnp.einsum("bnd,bkd->bkn", P, x_axes, precision="highest")
    y_coord = jnp.einsum("bnd,bkd->bkn", P, y_axes, precision="highest")
    P_proj = jnp.stack([x_coord, y_coord], axis=-1)
    circle_center, radius_sqr = weighted_sphere_fitting(P_proj, Wk)
    center = (
        circle_center[..., 0:1] * x_axes + circle_center[..., 1:2] * y_axes
    )
    return axis, center, radius_sqr


def compute_residue_single(axis, center, radius_squared, p):
    """(dist_to_axis - r)^2 with guarded sqrts; broadcasts."""
    v = p - center
    v_sqr = jnp.sum(v * v, axis=-1)
    v_dot_n = jnp.sum(v * axis, axis=-1)
    return (sqrt_safe(v_sqr - v_dot_n**2) - sqrt_safe(radius_squared)) ** 2


def compute_parameter_loss(predicted_axis, gt_axis, matching_indices, angle_diff):
    matched = jnp.take_along_axis(
        predicted_axis, matching_indices[..., None], axis=1
    )
    dot_abs = jnp.abs(jnp.sum(matched * gt_axis, axis=-1))
    return acos_safe(dot_abs) if angle_diff else 1.0 - dot_abs


def create_primitive_from_dict(d: dict) -> primitives.Cylinder:
    assert d["type"] == "cylinder"
    location = np.array(
        [d["location_x"], d["location_y"], d["location_z"]], dtype=float
    )
    axis = np.array([d["axis_x"], d["axis_y"], d["axis_z"]], dtype=float)
    return primitives.Cylinder(
        center=location, radius=float(d["radius"]), axis=axis
    )


def extract_parameter_data_as_dict(instances, n_max_instances: int) -> dict:
    n = np.zeros((n_max_instances, 3), dtype=float)
    for i, prim in enumerate(instances):
        if isinstance(prim, primitives.Cylinder):
            n[i] = prim.axis
    return {"cylinder_axis_gt": n}


def extract_predicted_parameters_as_json(
    cylinder_center, cylinder_radius_squared, cylinder_axis, k
) -> dict:
    cyl = primitives.Cylinder(
        np.asarray(cylinder_center),
        float(np.sqrt(cylinder_radius_squared)),
        np.asarray(cylinder_axis),
        height=5,
    )
    return {
        "type": "cylinder",
        "center_x": float(cyl.center[0]),
        "center_y": float(cyl.center[1]),
        "center_z": float(cyl.center[2]),
        "radius": float(cyl.radius),
        "axis_x": float(cyl.axis[0]),
        "axis_y": float(cyl.axis[1]),
        "axis_z": float(cyl.axis[2]),
        "height": float(cyl.height),
        "label": k,
    }
