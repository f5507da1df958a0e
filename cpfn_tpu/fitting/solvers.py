"""Shared differentiable geometry solvers for the primitive fitters.

Re-implements the math of `SPFN/geometry_utils.py` (consistent plane frames,
weighted plane/sphere fitting, the condition-guarded least-squares solve) in
batched JAX with arbitrary leading batch dimensions — the reference reshapes
everything to [B*K, N, ...]; here [B, K, N, ...] flows through einsums
directly. All epsilon/guard conventions are preserved verbatim: they gate
training stability (sqrt_eps=1e-10, ls_l2_regularizer=1e-8, condition cap 1e5,
division_eps=1e-10, acos clamp 1e-6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpfn_tpu.fitting.tls import solve_weighted_tls

DIVISION_EPS = 1e-10


def sqrt_safe(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.abs(x) + 1e-10)


def acos_safe(x: jax.Array) -> jax.Array:
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6))


def compute_consistent_plane_frame(
    normal: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Pick in-plane axes (x, y) for unit normals.

    normal: [..., 3]. Returns (x_axes, y_axes), each [..., 3].

    As `SPFN/geometry_utils.py:8-27`: cross the normal with the 3 canonical
    axes, keep the candidate with the largest norm, normalize (eps 1e-12),
    x = y × n.
    """
    cands = jnp.eye(3, dtype=normal.dtype)
    # y_cand[..., q, :] = normal × e_q
    y_cands = jnp.cross(normal[..., None, :], cands)
    norms = jnp.linalg.norm(y_cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    y = jnp.take_along_axis(y_cands, best[..., None, None].repeat(3, -1), -2)[
        ..., 0, :
    ]
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    x = jnp.cross(y, normal)
    return x, y


def weighted_plane_fitting(
    P: jax.Array, W: jax.Array, division_eps: float = DIVISION_EPS
) -> tuple[jax.Array, jax.Array]:
    """Weighted plane fit: mean-center then TLS normal.

    P: [..., N, 3], W: [..., N]. Returns (n [..., 3], c [...]) with the plane
    {p : n.p = c}. Mirrors `SPFN/geometry_utils.py:74-84`.
    """
    W_sum = jnp.sum(W, axis=-1, keepdims=True)  # [..., 1]
    WP = jnp.einsum("...n,...ni->...i", W, P, precision="highest")
    mean = WP / jnp.maximum(W_sum, division_eps)
    A = P - mean[..., None, :]
    n = solve_weighted_tls(A, W)
    c = jnp.sum(n * mean, axis=-1)
    return n, c


def guarded_matrix_solve_ls(
    A: jax.Array,
    b: jax.Array,
    W: jax.Array,
    condition_number_cap: float = 1e5,
    sqrt_eps: float = 1e-10,
    ls_l2_regularizer: float = 1e-8,
) -> jax.Array:
    """Weighted least squares min ||sqrt(W)(Ax - b)||^2 with a condition guard.

    A: [..., N, D], b: [..., N, 1], W: [..., N]. Returns x: [..., D].

    Mirrors `SPFN/geometry_utils.py:121-142`: scale rows by sqrt(clamp(W)),
    estimate cond(A^T A) (gradient-stopped; via eigvalsh — A^T A is symmetric
    PSD so its singular values are |eigenvalues|), zero out badly conditioned
    batch entries, add a 1e-8 ridge, and solve the DxD normal equations.
    """
    D = A.shape[-1]
    sqrt_W = jnp.sqrt(jnp.maximum(W, sqrt_eps))[..., None]
    A = A * sqrt_W
    b = b * sqrt_W
    AtA = jnp.einsum("...nd,...ne->...de", A, A, precision="highest")
    s = jnp.abs(jax.lax.stop_gradient(jnp.linalg.eigvalsh(AtA)))
    s_min = jnp.min(s, axis=-1)
    s_max = jnp.max(s, axis=-1)
    mask = (s_max < condition_number_cap * s_min).astype(A.dtype)
    eye = jnp.eye(D, dtype=A.dtype)
    AtA = AtA * mask[..., None, None] + ls_l2_regularizer * eye
    Atb = jnp.einsum(
        "...nd,...ne->...de", A * mask[..., None, None], b, precision="highest"
    )
    x = jnp.linalg.solve(AtA, Atb)
    return x[..., 0]


def weighted_sphere_fitting(
    P: jax.Array, W: jax.Array, division_eps: float = DIVISION_EPS
) -> tuple[jax.Array, jax.Array]:
    """Weighted sphere fit (linear least squares for the center).

    P: [..., N, D], W: [..., N]. Returns (center [..., D], r_sqr [...]).
    Mirrors `SPFN/geometry_utils.py:209-223`.
    """
    W_sum = jnp.sum(W, axis=-1)  # [...]
    P_sqr = jnp.sum(P * P, axis=-1)  # [..., N]
    WP_sqr_sum = jnp.sum(W * P_sqr, axis=-1)  # [...]
    b = (
        (WP_sqr_sum / jnp.maximum(W_sum, division_eps))[..., None] - P_sqr
    )[..., None]  # [..., N, 1]
    WP_sum = jnp.einsum("...n,...nd->...d", W, P, precision="highest")
    A = 2.0 * (
        (WP_sum / jnp.maximum(W_sum, division_eps)[..., None])[..., None, :]
        - P
    )  # [..., N, D]
    center = guarded_matrix_solve_ls(A, b, W)
    diff_sqr = jnp.sum((P - center[..., None, :]) ** 2, axis=-1)  # [..., N]
    r_sqr = jnp.sum(W * diff_sqr, axis=-1) / jnp.maximum(W_sum, division_eps)
    return center, r_sqr
