from cpfn_tpu.nn import layers
from cpfn_tpu.nn.pointnet2 import (
    PointNet2Config,
    init_pointnet2,
    apply_pointnet2,
)

__all__ = ["layers", "PointNet2Config", "init_pointnet2", "apply_pointnet2"]
