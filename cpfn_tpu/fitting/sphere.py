"""Sphere fitter (cf. `SPFN/sphere_fitter.py`).

Parameters: center and squared radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.fitting import primitives
from cpfn_tpu.fitting.solvers import sqrt_safe, weighted_sphere_fitting


def compute_parameters(P: jax.Array, W: jax.Array):
    """P: [B, N, 3]; W: [B, N, K]. Returns (center [B, K, 3], r_sqr [B, K])."""
    B, N, _ = P.shape
    K = W.shape[-1]
    Wk = jnp.swapaxes(W, 1, 2)
    Pk = jnp.broadcast_to(P[:, None], (B, K, N, 3))
    return weighted_sphere_fitting(Pk, Wk)


def compute_residue_single(center, radius_squared, p):
    """(||p - c|| - r)^2 with guarded sqrts; broadcasts."""
    dist = sqrt_safe(jnp.sum((p - center) ** 2, axis=-1))
    return (dist - sqrt_safe(radius_squared)) ** 2


def compute_parameter_loss(predicted, gt, matching_indices, angle_diff):
    """Spheres carry no axis: the parameter loss is identically zero."""
    del predicted, gt, angle_diff
    return jnp.zeros(matching_indices.shape, jnp.float32)


def create_primitive_from_dict(d: dict) -> primitives.Sphere:
    assert d["type"] == "sphere"
    location = np.array(
        [d["location_x"], d["location_y"], d["location_z"]], dtype=float
    )
    return primitives.Sphere(center=location, radius=float(d["radius"]))


def extract_parameter_data_as_dict(instances, n_max_instances: int) -> dict:
    return {}


def extract_predicted_parameters_as_json(
    sphere_center, sphere_radius_squared, k
) -> dict:
    sphere = primitives.Sphere(
        np.asarray(sphere_center), float(np.sqrt(sphere_radius_squared))
    )
    return {
        "type": "sphere",
        "center_x": float(sphere.center[0]),
        "center_y": float(sphere.center[1]),
        "center_z": float(sphere.center[2]),
        "radius": float(sphere.radius),
        "label": k,
    }
