"""SPFN training losses (cf. `SPFN/losses_implementation.py`).

Hungarian-matched RIoU segmentation loss, unoriented normal loss, per-point
type cross-entropy, per-type fitting residues at GT sample points, and axis
parameter losses — all as one jit-friendly function with static loss
multipliers (zero-multiplier terms are pruned at trace time, like the
reference's Python-level `if multiplier > 0` gating).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from cpfn_tpu.fitting import cone, cylinder, plane, sphere
from cpfn_tpu.fitting.solvers import acos_safe
from cpfn_tpu.losses.hungarian import hungarian_matching

DEFAULT_CLASSES = ("plane", "sphere", "cylinder", "cone")


def sequence_mask(lengths: jax.Array, maxlen: int) -> jax.Array:
    """mask[b, k] = k < lengths[b]."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def get_mask_gt(I_gt: jax.Array, n_max_instances: int) -> jax.Array:
    """Valid-instance mask from the max GT label (−1 rows don't count)."""
    n_instances = jnp.max(I_gt, axis=1) + 1
    return sequence_mask(n_instances, n_max_instances)


def compute_miou_loss(W, I_gt, matching_indices, div_eps: float = 1e-10):
    """Per-instance relaxed IoU loss after matching.

    W: [B, N, K]; I_gt: [B, N]; matching_indices: [B, K].
    Returns (1 - IoU [B, K], 1 - dot/N [B, K]) — the second is the
    'intersection' segmentation mode (`losses_implementation.py:77-89`).
    """
    n_points = W.shape[1]
    K = matching_indices.shape[-1]
    W_reordered = jnp.take_along_axis(
        W, matching_indices[:, None, :], axis=2
    )  # [B, N, K]
    W_gt = jax.nn.one_hot(I_gt, K, dtype=W.dtype)
    dot = jnp.sum(W_gt * W_reordered, axis=1)  # [B, K]
    denom = jnp.sum(W_gt, axis=1) + jnp.sum(W_reordered, axis=1) - dot
    miou = dot / (denom + div_eps)
    return 1.0 - miou, 1.0 - dot / n_points


def compute_normal_loss(normal, normal_gt, angle_diff: bool):
    """Mean unoriented normal deviation per cloud. [B, N, 3] -> [B]."""
    dot_abs = jnp.abs(jnp.sum(normal * normal_gt, axis=2))
    if angle_diff:
        return jnp.mean(acos_safe(dot_abs), axis=1)
    return jnp.mean(1.0 - dot_abs, axis=1)


def compute_per_point_type_loss(per_point_type, I_gt, T_gt, is_eval: bool):
    """Cross-entropy (train) or 0/1 error (eval) of per-point type predictions,
    averaged over non-background points.

    per_point_type: [B, N, Q] logits (train) or [B, N] labels (eval).
    I_gt: [B, N]; T_gt: [B, K].
    """
    per_point_type_gt = jnp.take_along_axis(
        T_gt, jnp.maximum(I_gt, 0), axis=1
    )  # [B, N]
    if is_eval:
        type_loss = 1.0 - (per_point_type == per_point_type_gt).astype(
            jnp.float32
        )
    else:
        logz = jax.nn.logsumexp(per_point_type, axis=-1)
        gt_logit = jnp.take_along_axis(
            per_point_type, per_point_type_gt[..., None], axis=-1
        )[..., 0]
        type_loss = logz - gt_logit
    fg = I_gt != -1
    type_loss = jnp.where(fg, type_loss, 0.0)
    return jnp.sum(type_loss, axis=1) / jnp.sum(fg.astype(jnp.float32), axis=1)


def compute_parameters(
    P, W, X, classes: Sequence[str] = DEFAULT_CLASSES
) -> dict:
    """Fit every primitive family to every instance column.

    P: [B, N, 3]; W: [B, N, K]; X: [B, N, 3] predicted unit normals.
    Returns the parameter dict keyed like the reference
    (`losses_implementation.py:255-278`).
    """
    parameters = {}
    for class_ in classes:
        if class_ == "plane":
            n, c = plane.compute_parameters(P, W)
            parameters["plane_normal"] = n
            parameters["plane_center"] = c
        elif class_ == "sphere":
            center, r2 = sphere.compute_parameters(P, W)
            parameters["sphere_center"] = center
            parameters["sphere_radius_squared"] = r2
        elif class_ == "cylinder":
            axis, center, r2 = cylinder.compute_parameters(P, W, X)
            parameters["cylinder_axis"] = axis
            parameters["cylinder_center"] = center
            parameters["cylinder_radius_squared"] = r2
        elif class_ == "cone":
            apex, axis, half_angle = cone.compute_parameters(P, W, X)
            parameters["cone_apex"] = apex
            parameters["cone_axis"] = axis
            parameters["cone_half_angle"] = half_angle
        else:
            raise NotImplementedError(class_)
    return parameters


def _gather_inst(param, matching_indices):
    """param [B, K1, ...] gathered at matching_indices [B, K2] -> [B, K2, ...]."""
    idx = matching_indices
    while idx.ndim < param.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(param, idx, axis=1)


def compute_residue_loss(
    parameters: dict,
    matching_indices,
    points_per_instance,
    T_gt,
    classes: Sequence[str] = DEFAULT_CLASSES,
):
    """Mean fitting residue of matched predictions at GT instance points.

    points_per_instance: [B, K, N', 3] GT surface samples per instance.
    Returns (residue_loss [B, K] — residue of the GT type — and the stacked
    per-point residues [B, K, N', T]).
    """
    per_point = []
    for class_ in classes:
        if class_ == "plane":
            r = plane.compute_residue_single(
                _gather_inst(parameters["plane_normal"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(parameters["plane_center"], matching_indices)[
                    :, :, None
                ],
                points_per_instance,
            )
        elif class_ == "sphere":
            r = sphere.compute_residue_single(
                _gather_inst(parameters["sphere_center"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(
                    parameters["sphere_radius_squared"], matching_indices
                )[:, :, None],
                points_per_instance,
            )
        elif class_ == "cylinder":
            r = cylinder.compute_residue_single(
                _gather_inst(parameters["cylinder_axis"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(parameters["cylinder_center"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(
                    parameters["cylinder_radius_squared"], matching_indices
                )[:, :, None],
                points_per_instance,
            )
        elif class_ == "cone":
            r = cone.compute_residue_single(
                _gather_inst(parameters["cone_apex"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(parameters["cone_axis"], matching_indices)[
                    :, :, None
                ],
                _gather_inst(parameters["cone_half_angle"], matching_indices)[
                    :, :, None
                ],
                points_per_instance,
            )
        else:
            raise NotImplementedError(class_)
        per_point.append(r)
    residue_per_point = jnp.stack(per_point, axis=3)  # [B, K, N', T]
    residue_by_type = jnp.mean(residue_per_point, axis=2)  # [B, K, T]
    residue_loss = jnp.take_along_axis(
        residue_by_type, T_gt[..., None], axis=2
    )[..., 0]
    return residue_loss, residue_per_point


def compute_parameter_loss(
    predicted_parameters: dict,
    gt_parameters: dict,
    matching_indices,
    T_gt,
    is_eval: bool = False,
    classes: Sequence[str] = DEFAULT_CLASSES,
):
    """Axis losses per class, selected by GT type. Returns [B, K]."""
    losses = []
    B, K = matching_indices.shape
    for class_ in classes:
        if class_ == "plane":
            pl = plane.compute_parameter_loss(
                predicted_parameters["plane_normal"],
                gt_parameters["plane_normal"],
                matching_indices,
                angle_diff=is_eval,
            )
        elif class_ == "sphere":
            pl = jnp.zeros((B, K), jnp.float32)
        elif class_ == "cylinder":
            pl = cylinder.compute_parameter_loss(
                predicted_parameters["cylinder_axis"],
                gt_parameters["cylinder_axis"],
                matching_indices,
                angle_diff=is_eval,
            )
        elif class_ == "cone":
            pl = cone.compute_parameter_loss(
                predicted_parameters["cone_axis"],
                gt_parameters["cone_axis"],
                matching_indices,
                angle_diff=is_eval,
            )
        else:
            raise NotImplementedError(class_)
        losses.append(pl)
    stacked = jnp.stack(losses, axis=2)  # [B, K, T]
    return jnp.take_along_axis(stacked, T_gt[..., None], axis=2)[..., 0]


def reduce_mean_masked_instance(loss, mask_gt):
    """Mean over valid instances; zero where a cloud has none. [B, K] -> [B]."""
    loss = jnp.where(mask_gt, loss, 0.0)
    denom = jnp.sum(mask_gt.astype(loss.dtype), axis=1)
    total = jnp.sum(loss, axis=1)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def compute_all_losses(
    P,
    W,
    I_gt,
    X,
    X_gt,
    T,
    T_gt,
    gt_parameters,
    points_per_instance,
    normal_loss_multiplier: float,
    type_loss_multiplier: float,
    miou_loss_multiplier: float,
    residue_loss_multiplier: float,
    parameter_loss_multiplier: float,
    total_loss_multiplier: float,
    is_eval: bool,
    mode_seg: str = "mIoU",
    classes: Sequence[str] = DEFAULT_CLASSES,
    matching_indices=None,
) -> dict:
    """Full SPFN loss (cf. `losses_implementation.py:675-720`).

    All multipliers are static Python floats: zero-multiplier terms never
    enter the compiled graph. Returns a dict with the total loss, each
    component, the matching, and (when fitted) the predicted axis parameters.
    """
    assert mode_seg in ("mIoU", "intersection")
    B, _, K = W.shape
    if matching_indices is None:
        matching_indices = hungarian_matching(W, I_gt)
    mask_gt = get_mask_gt(I_gt, K)
    zero_k = jnp.zeros((B, K), jnp.float32)
    zero_b = jnp.zeros((B,), jnp.float32)

    need_params = residue_loss_multiplier > 0 or parameter_loss_multiplier > 0
    predicted_parameters = (
        compute_parameters(P, W, X, classes=classes) if need_params else None
    )

    normal_loss = (
        compute_normal_loss(X, X_gt, angle_diff=is_eval)
        if normal_loss_multiplier > 0
        else zero_b
    )
    type_loss = (
        compute_per_point_type_loss(T, I_gt, T_gt, is_eval)
        if type_loss_multiplier > 0
        else zero_b
    )
    if miou_loss_multiplier > 0:
        miou_pair = compute_miou_loss(W, I_gt, matching_indices)
        miou_loss = miou_pair[0] if mode_seg == "mIoU" else miou_pair[1]
        avg_miou_loss = reduce_mean_masked_instance(miou_loss, mask_gt)
    else:
        miou_loss, avg_miou_loss = zero_k, zero_b
    if residue_loss_multiplier > 0:
        residue_loss, _ = compute_residue_loss(
            predicted_parameters,
            matching_indices,
            points_per_instance,
            T_gt,
            classes=classes,
        )
        avg_residue_loss = reduce_mean_masked_instance(residue_loss, mask_gt)
    else:
        residue_loss, avg_residue_loss = zero_k, zero_b
    if parameter_loss_multiplier > 0:
        parameter_loss = compute_parameter_loss(
            predicted_parameters,
            gt_parameters,
            matching_indices,
            T_gt,
            is_eval,
            classes=classes,
        )
        avg_parameter_loss = reduce_mean_masked_instance(
            parameter_loss, mask_gt
        )
    else:
        parameter_loss, avg_parameter_loss = zero_k, zero_b

    total_normal = jnp.mean(normal_loss)
    total_type = jnp.mean(type_loss)
    total_miou = jnp.mean(avg_miou_loss)
    total_residue = jnp.mean(avg_residue_loss)
    total_parameter = jnp.mean(avg_parameter_loss)
    total = jnp.float32(0.0)
    if normal_loss_multiplier > 0:
        total = total + normal_loss_multiplier * total_normal
    if type_loss_multiplier > 0:
        total = total + type_loss_multiplier * total_type
    if miou_loss_multiplier > 0:
        total = total + miou_loss_multiplier * total_miou
    if residue_loss_multiplier > 0:
        total = total + residue_loss_multiplier * total_residue
    if parameter_loss_multiplier > 0:
        total = total + parameter_loss_multiplier * total_parameter
    total = total * total_loss_multiplier

    out = {
        "total_loss": total,
        "normal_loss": total_normal,
        "type_loss": total_type,
        "miou_loss": total_miou,
        "residue_loss": total_residue,
        "parameter_loss": total_parameter,
        "matching_indices": matching_indices,
        "mask_gt": mask_gt,
    }
    if need_params:
        out["plane_normal"] = predicted_parameters.get("plane_normal")
        out["cylinder_axis"] = predicted_parameters.get("cylinder_axis")
        out["cone_axis"] = predicted_parameters.get("cone_axis")
    return out
