"""Differentiable weighted total-least-squares via batched symmetric eigh.

Replaces the reference's `SPFN/differentiable_tls.py`: there, the TLS
direction is the last right-singular vector of the 3x3 moment matrix
M = sum_n w_n a_n a_n^T, computed with `torch.svd` plus a hand-written
backward that propagates gradients only through the selected column of V
using the guarded K-matrix K[i,j] = 1/(s_i^2 - s_j^2) (|.| floored at 1e-10),
ignoring grad_s / grad_u (`differentiable_tls.py:45-53,123-143`).

TPU-native design: M is symmetric, so we use `jnp.linalg.eigh` (batched small
eigh lowers well on TPU, unlike general SVD) and reconstruct the SVD
convention (singular values = |eigenvalues|, descending; U = V * sign(eigs)).
The custom VJP implements the same guarded K-matrix gradient, so training
dynamics match the reference's battle-tested behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GUARD_MIN_ABS = 1e-10


def _guard_one_over(x: jax.Array, min_abs: float = _GUARD_MIN_ABS) -> jax.Array:
    """1/x with |x| floored at `min_abs`, keeping the reference's sign rule.

    The reference floors the upper triangle (incl. diagonal) at +min_abs and
    the lower triangle at -min_abs before inverting, then zeroes the diagonal
    via the +I/-I trick (`differentiable_tls.py:8-17`). Net effect on entry
    (i, j): sign follows the triangle, magnitude capped at 1/min_abs, and the
    diagonal ends up ~-min_abs (numerically zero). We reproduce exactly.
    """
    p = x.shape[-1]
    eye = jnp.eye(p, dtype=x.dtype)
    upper = jnp.triu(jnp.maximum(x, min_abs))
    lower = jnp.tril(jnp.minimum(x, -min_abs))
    m = upper + lower + eye
    return 1.0 / m - eye


def _svd_k_matrix(s: jax.Array) -> jax.Array:
    """K[..., i, j] = guarded 1/(s_i^2 - s_j^2); ~0 on the diagonal."""
    s2 = s * s
    return _guard_one_over(s2[..., :, None] - s2[..., None, :])


def _sym_svd(M: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SVD of a symmetric matrix via eigh, in torch.svd convention.

    Returns (u, s, v) with s descending, M = u @ diag(s) @ v^T,
    u = v * sign(eigenvalue).
    """
    lam, vec = jnp.linalg.eigh(M)  # ascending eigenvalues
    order = jnp.argsort(-jnp.abs(lam), axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    vec = jnp.take_along_axis(vec, order[..., None, :], axis=-1)
    s = jnp.abs(lam)
    sgn = jnp.where(lam < 0, -1.0, 1.0).astype(M.dtype)
    u = vec * sgn[..., None, :]
    return u, s, vec


@jax.custom_vjp
def svd_smallest_v(M: jax.Array) -> jax.Array:
    """Right-singular vector of the smallest singular value of symmetric M.

    M: [..., P, P] symmetric. Returns [..., P] (sign is arbitrary, as for any
    eigenvector).
    """
    _, _, v = _sym_svd(M)
    return v[..., :, -1]


def _svd_smallest_v_fwd(M):
    u, s, v = _sym_svd(M)
    return v[..., :, -1], (u, s, v)


def _svd_smallest_v_bwd(res, grad_out):
    u, s, v = res
    grad_v = jnp.zeros_like(v).at[..., :, -1].set(grad_out)
    vt = jnp.swapaxes(v, -1, -2)
    K = _svd_k_matrix(s)
    inner = jnp.swapaxes(K, -1, -2) * jnp.matmul(
        vt, grad_v, precision="highest"
    )
    inner = (inner + jnp.swapaxes(inner, -1, -2)) / 2
    core = 2.0 * s[..., :, None] * inner  # = 2 diag(s) @ inner
    grad_M = jnp.matmul(
        u, jnp.matmul(core, vt, precision="highest"), precision="highest"
    )
    return (grad_M,)


svd_smallest_v.defvjp(_svd_smallest_v_fwd, _svd_smallest_v_bwd)


def solve_weighted_tls(A: jax.Array, W: jax.Array) -> jax.Array:
    """argmin_x x^T A^T diag(W) A x subject to ||x|| = 1.

    Args:
      A: [..., N, D]
      W: [..., N]
    Returns:
      [..., D] unit vector (up to sign).

    Mirrors `differentiable_tls.py:200-209`, but builds the DxD moment matrix
    with one einsum (no [..., N, D, D] outer-product materialization) and
    forces full f32 accumulation — on TPU the default matmul precision is
    reduced, which is not acceptable for a near-null-space solve.
    """
    M = jnp.einsum(
        "...ni,...nj,...n->...ij", A, A, W, precision="highest"
    )
    return svd_smallest_v(M)
