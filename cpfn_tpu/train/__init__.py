from cpfn_tpu.train.schedules import (
    staircase_learning_rate,
    batch_norm_momentum,
)
from cpfn_tpu.train.steps import (
    SPFNTrainConfig,
    make_spfn_train_step,
    make_spfn_eval_step,
    make_patch_selection_train_step,
    init_optimizer,
)

__all__ = [
    "staircase_learning_rate",
    "batch_norm_momentum",
    "SPFNTrainConfig",
    "make_spfn_train_step",
    "make_spfn_eval_step",
    "make_patch_selection_train_step",
    "init_optimizer",
]
