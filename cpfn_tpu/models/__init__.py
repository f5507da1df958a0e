from cpfn_tpu.models.spfn import (
    SPFNModel,
    GlobalSPFN,
    LocalSPFN,
    PatchSelectionNet,
)

__all__ = ["SPFNModel", "GlobalSPFN", "LocalSPFN", "PatchSelectionNet"]
