from cpfn_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_sharded_spfn_train_step,
    make_cloud_parallel_cascade,
    make_cloud_parallel_packed,
    make_patch_parallel_forward,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_sharded_spfn_train_step",
    "make_cloud_parallel_cascade",
    "make_cloud_parallel_packed",
    "make_patch_parallel_forward",
]
