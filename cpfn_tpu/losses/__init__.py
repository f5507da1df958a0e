from cpfn_tpu.losses.hungarian import (
    hungarian_matching,
    hungarian_matching_with_mask,
    riou_matching_cost,
)
from cpfn_tpu.losses.spfn_losses import (
    compute_all_losses,
    compute_miou_loss,
    compute_normal_loss,
    compute_parameter_loss,
    compute_parameters,
    compute_per_point_type_loss,
    compute_residue_loss,
    get_mask_gt,
    reduce_mean_masked_instance,
    sequence_mask,
)

__all__ = [
    "hungarian_matching",
    "hungarian_matching_with_mask",
    "riou_matching_cost",
    "compute_all_losses",
    "compute_miou_loss",
    "compute_normal_loss",
    "compute_parameter_loss",
    "compute_parameters",
    "compute_per_point_type_loss",
    "compute_residue_loss",
    "get_mask_gt",
    "reduce_mean_masked_instance",
    "sequence_mask",
]
