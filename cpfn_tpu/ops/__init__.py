from cpfn_tpu.ops.geometry import (
    pairwise_sqr_dist,
    gather_points,
    group_points,
    farthest_point_sample,
    ball_query,
    three_nn,
    three_interpolate,
)

__all__ = [
    "pairwise_sqr_dist",
    "gather_points",
    "group_points",
    "farthest_point_sample",
    "ball_query",
    "three_nn",
    "three_interpolate",
]
