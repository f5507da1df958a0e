from cpfn_tpu.metrics.spfn_metrics import (
    hard_W_encoding,
    get_instance_type,
    get_residual_loss,
    compute_segmentation_iou,
    compute_type_accuracy,
    compute_normal_difference,
    compute_axis_difference,
    compute_meanstd_Sk_residual,
    compute_Sk_coverage,
    compute_P_coverage,
    compute_all_metrics,
    creates_json,
)

__all__ = [
    "hard_W_encoding",
    "get_instance_type",
    "get_residual_loss",
    "compute_segmentation_iou",
    "compute_type_accuracy",
    "compute_normal_difference",
    "compute_axis_difference",
    "compute_meanstd_Sk_residual",
    "compute_Sk_coverage",
    "compute_P_coverage",
    "compute_all_metrics",
    "creates_json",
]
