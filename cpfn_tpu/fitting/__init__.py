from cpfn_tpu.fitting.tls import solve_weighted_tls
from cpfn_tpu.fitting.solvers import (
    weighted_plane_fitting,
    weighted_sphere_fitting,
    guarded_matrix_solve_ls,
    compute_consistent_plane_frame,
    acos_safe,
    sqrt_safe,
)
from cpfn_tpu.fitting import plane, sphere, cylinder, cone
from cpfn_tpu.fitting.factory import (
    register_primitives,
    primitive_name_to_id,
    get_n_registered_primitives,
    get_registered_primitives,
    create_primitive_from_dict,
)

__all__ = [
    "solve_weighted_tls",
    "weighted_plane_fitting",
    "weighted_sphere_fitting",
    "guarded_matrix_solve_ls",
    "compute_consistent_plane_frame",
    "acos_safe",
    "sqrt_safe",
    "plane",
    "sphere",
    "cylinder",
    "cone",
    "register_primitives",
    "primitive_name_to_id",
    "get_n_registered_primitives",
    "get_registered_primitives",
    "create_primitive_from_dict",
]
