from cpfn_tpu.eval.sampling import sample_patches
from cpfn_tpu.eval.cascade import CascadeRunner, ModelBundle

__all__ = ["sample_patches", "CascadeRunner", "ModelBundle"]
