from cpfn_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from cpfn_tpu.utils.logging import MetricsLogger
from cpfn_tpu.utils.profiling import PhaseTimer, maybe_profile

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "MetricsLogger",
    "PhaseTimer",
    "maybe_profile",
]
