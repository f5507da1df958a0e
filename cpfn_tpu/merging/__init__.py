from cpfn_tpu.merging.fusion import (
    similarity_soft,
    run_heuristic_solver,
    get_point_final,
    fuse_cascade,
)

__all__ = [
    "similarity_soft",
    "run_heuristic_solver",
    "get_point_final",
    "fuse_cascade",
]
