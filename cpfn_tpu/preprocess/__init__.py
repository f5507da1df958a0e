from cpfn_tpu.preprocess.lowres import subsample_lowres_file
from cpfn_tpu.preprocess.patch_sampling import sample_patch_indices_file
from cpfn_tpu.preprocess.patch_creation import create_patches_file

__all__ = [
    "subsample_lowres_file",
    "sample_patch_indices_file",
    "create_patches_file",
]
