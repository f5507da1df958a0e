"""The greedy cross-scale merge as a jitted on-device loop.

The reference runs this in numba on the host (`merging_utils.py:17-47`),
forcing a device->host->device round trip per cloud. The loop is sequential
(one merge per iteration) but every iteration is dense linear algebra over
the [C, C] similarity / [C, P+1] patch-membership state, so it maps cleanly
onto a `lax.while_loop`: argmax over alive pairs -> union the two segments ->
recompute pair validity with one [C,P+1]x[P+1,C] matmul. Iteration count =
number of merges (tens in practice, bounded by C).

Semantics identical to `native.heuristic_merge_solver` (tested), including
the reference's replacement-label aliasing for empty primitives: labels of
below-threshold diagonals map to C + (k mod K_l) for patch columns and
C + K_l + (k - P*K_l) for global columns, reproducing np.unique's merging of
same-valued replacements across patches. Output ids live in [0, C + K_l + K_g)
and are NOT compacted — downstream `get_point_final` + column compaction
handle that (empty clusters carry zero mass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb_patches", "max_label_per_object", "max_label_per_patch",
        "threshold",
    ),
)
def heuristic_merge_device(
    similarity: jax.Array,
    nb_patches: int,
    max_label_per_object: int,
    max_label_per_patch: int,
    threshold: float = 0.0,
) -> jax.Array:
    """similarity: [C, C] with C = nb_patches*K_l + K_g. Returns [C] int32
    cluster ids in [0, C + K_l + K_g)."""
    C = similarity.shape[0]
    K_l, K_g = max_label_per_patch, max_label_per_object
    P = nb_patches
    Pp = P + 1
    sim = similarity.astype(jnp.float32)
    ii = lax.broadcasted_iota(jnp.int32, (C, C), 0)
    jj = lax.broadcasted_iota(jnp.int32, (C, C), 1)
    alive0 = (sim > threshold) & (ii < jj)

    k_iota = jnp.arange(C, dtype=jnp.int32)
    patch_id = jnp.where(k_iota < P * K_l, k_iota // K_l, P)
    patch_vec0 = jax.nn.one_hot(patch_id, Pp, dtype=jnp.float32)
    seg0 = k_iota

    def cond(st):
        seg, patch_vec, alive = st
        return jnp.any(alive)

    def body(st):
        seg, patch_vec, alive = st
        masked = jnp.where(alive, sim, -jnp.inf)
        flat = jnp.argmax(masked.reshape(-1)).astype(jnp.int32)
        a = flat // C
        b = flat % C
        seg = jnp.where(seg == seg[b], seg[a], seg)
        merged_vec = jnp.sum(
            jnp.where((seg == seg[a])[:, None], patch_vec, 0.0), axis=0
        )
        patch_vec = jnp.where(
            (seg == seg[a])[:, None], merged_vec[None, :], patch_vec
        )
        inter = jnp.einsum(
            "cp,dp->cd", patch_vec, patch_vec,
            preferred_element_type=jnp.float32,
        )
        alive = alive & (inter == 0.0)
        return seg, patch_vec, alive

    seg, _, _ = lax.while_loop(cond, body, (seg0, patch_vec0, alive0))

    diag = jnp.diagonal(sim)
    replacement = jnp.where(
        k_iota < P * K_l,
        C + (k_iota % K_l),
        C + K_l + (k_iota - P * K_l),
    )
    return jnp.where(diag < threshold, replacement, seg).astype(jnp.int32)
