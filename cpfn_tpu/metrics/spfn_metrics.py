"""Evaluation metric suite (cf. `SPFN/metric_implementation.py`).

The 10 headline metrics: segmentation mIoU, per-instance type accuracy, mean
normal difference, axis difference, mean/std Sk-residual, Sk-coverage@eps and
P-coverage@eps (eps in {0.01, 0.02}).

Reference quirks preserved on purpose (they define parity):
- `compute_axis_difference` divides by the *unmasked* parameter-loss sum
  (`metric_implementation.py:189-193`).
- its type gate compares the un-reordered instance types against T_gt.
- `creates_json` hard-codes the type order plane/sphere/cylinder/cone
  regardless of the registered order (`metric_implementation.py:589-600`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from cpfn_tpu.fitting import cone, cylinder, plane, sphere
from cpfn_tpu.fitting.solvers import acos_safe, sqrt_safe
from cpfn_tpu.losses import spfn_losses
from cpfn_tpu.losses.hungarian import hungarian_matching_with_mask

DEFAULT_CLASSES = ("plane", "sphere", "cylinder", "cone")


def hard_W_encoding(W: jax.Array) -> jax.Array:
    """One-hot of the argmax membership column. [B, N, K] -> [B, N, K]."""
    K = W.shape[-1]
    return jax.nn.one_hot(jnp.argmax(W, axis=2), K, dtype=W.dtype)


def get_instance_type(T: jax.Array, W: jax.Array) -> jax.Array:
    """Instance type = argmax of membership-weighted per-point type scores.

    T: [B, N, Q]; W: [B, N, K]. Returns [B, K] int32.
    """
    scores = jnp.einsum("bnk,bnq->bkq", W, T, precision="highest")
    return jnp.argmax(scores, axis=2).astype(jnp.int32)


def get_residual_loss(
    parameters: dict,
    matching_indices: jax.Array,
    points_per_instance: jax.Array,
    T: jax.Array,
    classes: Sequence[str] = DEFAULT_CLASSES,
) -> jax.Array:
    """Per-point distance (sqrt of residue) of matched predictions, selected
    by the per-instance type T. Returns [B, K, N']."""
    _, per_point = spfn_losses.compute_residue_loss(
        parameters,
        matching_indices,
        points_per_instance,
        jnp.take_along_axis(T, matching_indices, axis=1),
        classes=classes,
    )  # [B, K, N', T]
    selected = jnp.take_along_axis(
        per_point, T[:, :, None, None], axis=3
    )[..., 0]
    return sqrt_safe(selected)


def compute_segmentation_iou(W, I_gt, matching_indices, mask):
    """Masked mean per-cloud IoU. Returns [B]."""
    miou = 1.0 - spfn_losses.compute_miou_loss(W, I_gt, matching_indices)[0]
    return jnp.sum(mask * miou, axis=1) / jnp.sum(mask, axis=1)


def compute_type_accuracy(T, T_gt, matching_indices, mask):
    """T: [B, K] instance types. Returns [B]."""
    T_reordered = jnp.take_along_axis(T, matching_indices, axis=1)
    correct = (T_reordered == T_gt).astype(mask.dtype)
    return jnp.sum(mask * correct, axis=1) / jnp.sum(mask, axis=1)


def compute_normal_difference(X, X_gt):
    return jnp.mean(acos_safe(jnp.abs(jnp.sum(X * X_gt, axis=2))), axis=1)


def compute_axis_difference(
    predicted_parameters,
    gt_parameters,
    matching_indices,
    T,
    T_gt,
    mask,
    classes: Sequence[str] = DEFAULT_CLASSES,
    div_eps: float = 1e-10,
):
    mask = mask * (T == T_gt).astype(mask.dtype)
    parameter_loss = spfn_losses.compute_parameter_loss(
        predicted_parameters,
        gt_parameters,
        matching_indices,
        T_gt,
        is_eval=True,
        classes=classes,
    )
    return jnp.sum(mask * parameter_loss, axis=1) / jnp.maximum(
        jnp.sum(parameter_loss, axis=1), div_eps
    )


def compute_meanstd_Sk_residual(residue_loss, mask):
    """residue_loss: [B, K, N'] per-point distances. Returns (mean, std) [B]."""
    mean_res = jnp.sum(mask * jnp.mean(residue_loss, axis=2), axis=1) / jnp.sum(
        mask, axis=1
    )
    std = jnp.std(residue_loss, axis=2, ddof=1)  # unbiased, as torch.std
    std_res = jnp.sum(mask * std, axis=1) / jnp.sum(mask, axis=1)
    return mean_res, std_res


def compute_Sk_coverage(residue_loss, epsilon, mask):
    frac = jnp.mean((residue_loss < epsilon).astype(mask.dtype), axis=2)
    return jnp.sum(mask * frac, axis=1) / jnp.sum(mask, axis=1)


def compute_P_coverage(
    P,
    T,
    matching_indices,
    predicted_parameters,
    epsilon,
    classes: Sequence[str] = DEFAULT_CLASSES,
):
    """Fraction of input points within epsilon of *some* predicted primitive."""
    B, N, _ = P.shape
    K = T.shape[1]
    P_tiled = jnp.broadcast_to(P[:, None], (B, K, N, 3))
    res = get_residual_loss(
        predicted_parameters,
        matching_indices,
        P_tiled,
        jnp.take_along_axis(T, matching_indices, axis=1),
        classes=classes,
    )  # [B, K, N]
    best = jnp.min(res, axis=1)
    return jnp.mean((best < epsilon).astype(jnp.float32), axis=1)


def _pad_axis(x, axis, count):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, count)
    return jnp.pad(x, pad)


def compute_all_metrics(
    P,
    X,
    X_gt,
    W,
    I_gt,
    T,
    T_gt,
    points_per_instance,
    gt_parameters,
    list_epsilon=(0.01, 0.02),
    classes: Sequence[str] = DEFAULT_CLASSES,
):
    """Orchestrates the 10 metrics (cf. `metric_implementation.py:485-514`).

    P/X/X_gt: [B, N, 3]; W: [B, N, K_pred]; I_gt: [B, N]; T: [B, N, Q] scores;
    T_gt: [B, K_gt]; points_per_instance: [B, K_gt, N', 3].
    K_pred/K_gt mismatches are reconciled by zero-padding (static shapes).

    Returns a dict of per-cloud metric vectors plus the hardened W, predicted
    parameters, and instance types.
    """
    W = hard_W_encoding(W)
    T_inst = get_instance_type(T, W)
    diff = T_inst.shape[1] - T_gt.shape[1]
    gt_parameters = dict(gt_parameters)
    if diff > 0:
        T_gt = _pad_axis(T_gt, 1, diff)
        for key in ("plane_normal", "cylinder_axis", "cone_axis"):
            gt_parameters[key] = _pad_axis(gt_parameters[key], 1, diff)
        points_per_instance = _pad_axis(points_per_instance, 1, diff)
    elif diff < 0:
        W = _pad_axis(W, 2, -diff)
        T_inst = _pad_axis(T_inst, 1, -diff)
    matching_indices, mask = hungarian_matching_with_mask(W, I_gt)
    mask = mask.astype(jnp.float32)
    mIoU = compute_segmentation_iou(W, I_gt, matching_indices, mask)
    type_accuracy = compute_type_accuracy(T_inst, T_gt, matching_indices, mask)
    normal_difference = compute_normal_difference(X, X_gt)
    predicted_parameters = spfn_losses.compute_parameters(
        P, W, X, classes=classes
    )
    axis_difference = compute_axis_difference(
        predicted_parameters,
        gt_parameters,
        matching_indices,
        T_inst,
        T_gt,
        mask,
        classes=classes,
    )
    residue_loss = get_residual_loss(
        predicted_parameters,
        matching_indices,
        points_per_instance,
        T_gt,
        classes=classes,
    )
    mean_residual, std_residual = compute_meanstd_Sk_residual(
        residue_loss, mask
    )
    sk_coverage = [
        compute_Sk_coverage(residue_loss, eps, mask) for eps in list_epsilon
    ]
    p_coverage = [
        compute_P_coverage(
            P, T_inst, matching_indices, predicted_parameters, eps,
            classes=classes,
        )
        for eps in list_epsilon
    ]
    return {
        "mIoU": mIoU,
        "type_accuracy": type_accuracy,
        "normal_difference": normal_difference,
        "axis_difference": axis_difference,
        "mean_residual": mean_residual,
        "std_residual": std_residual,
        "Sk_coverage": sk_coverage,
        "P_coverage": p_coverage,
        "W": W,
        "predicted_parameters": predicted_parameters,
        "T": T_inst,
    }


def creates_json(T, predicted_parameters) -> list[dict]:
    """Export predicted parameters of cloud 0 as JSON records.

    T: [K] instance type ids. NOTE: follows the reference's hard-coded order
    0=plane, 1=sphere, 2=cylinder, 3=cone — which disagrees with the shipped
    configs' registration order (sphere first); see factory.py docstring.
    """
    import numpy as np

    pp = {k: np.asarray(v) for k, v in predicted_parameters.items()}
    out = []
    for i, type_id in enumerate(np.asarray(T).tolist()):
        if type_id == 0:
            rec = plane.extract_predicted_parameters_as_json(
                pp["plane_normal"][0, i], pp["plane_center"][0, i], i
            )
        elif type_id == 1:
            rec = sphere.extract_predicted_parameters_as_json(
                pp["sphere_center"][0, i],
                pp["sphere_radius_squared"][0, i],
                i,
            )
        elif type_id == 2:
            rec = cylinder.extract_predicted_parameters_as_json(
                pp["cylinder_center"][0, i],
                pp["cylinder_radius_squared"][0, i],
                pp["cylinder_axis"][0, i],
                i,
            )
        else:
            rec = cone.extract_predicted_parameters_as_json(
                pp["cone_apex"][0, i],
                pp["cone_axis"][0, i],
                pp["cone_half_angle"][0, i],
                i,
            )
        out.append(rec)
    return out
