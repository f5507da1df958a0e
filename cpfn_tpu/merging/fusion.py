"""Cross-scale instance fusion: merge per-patch LocalSPFN segmentations with
the GlobalSPFN segmentation into one labeling of the full high-res cloud.

Re-designs `Utils/merging_utils.py` + the fusion block of
`evaluation_localSPFN.py:94-139` for TPU: the point x primitive membership
matrix and its co-occurrence Gram matrix are built on device (one scatter +
one MXU matmul instead of a Python loop over patches), while the greedy
agglomeration — inherently sequential — runs in the C++ host library
(`cpfn_tpu.native.heuristic_merge_solver`, NumPy fallback).

Column layout of the membership matrix: patch p's K_local columns occupy
[p*K_local, (p+1)*K_local), the global K_global columns come last.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu import native


@functools.partial(jax.jit, static_argnames=("n_global_points",))
def _membership_matrix(
    spfn_labels: jax.Array,
    predicted_labels: jax.Array,
    point_indices: jax.Array,
    n_global_points: int,
):
    """[N, P*K_l + K_g] membership matrix (scatter-add; patch blocks are
    disjoint in columns and patch indices are unique within a patch, so add
    and assign coincide — the reference uses both interchangeably)."""
    P, n, K_l = predicted_labels.shape
    N = n_global_points
    patch_block = jnp.zeros((N, P, K_l), predicted_labels.dtype)
    patch_block = patch_block.at[
        point_indices, jnp.arange(P)[:, None]
    ].add(predicted_labels)
    return jnp.concatenate(
        [patch_block.reshape(N, P * K_l), spfn_labels], axis=1
    )


def similarity_soft(
    spfn_labels: jax.Array,
    predicted_labels: jax.Array,
    point_indices: jax.Array,
) -> jax.Array:
    """Primitive-pair co-occurrence M^T M (cf. `merging_utils.py:6-15`).

    spfn_labels: [N, K_g] global membership (one-hot or soft).
    predicted_labels: [P, n, K_l] per-patch soft membership.
    point_indices: [P, n] int indices into the high-res cloud.
    Returns [C, C] with C = P*K_l + K_g.
    """
    M = _membership_matrix(
        spfn_labels, predicted_labels, point_indices, spfn_labels.shape[0]
    )
    return jnp.einsum("nc,nd->cd", M, M, preferred_element_type=jnp.float32)


def run_heuristic_solver(
    similarity_matrix: np.ndarray,
    nb_patches: int,
    max_label_per_object: int,
    max_label_per_patch: int,
    threshold: float = 0,
) -> np.ndarray:
    """Greedy merge on the host; returns int64 cluster ids [C]."""
    return native.heuristic_merge_solver(
        np.asarray(similarity_matrix, np.float64),
        nb_patches,
        max_label_per_object,
        max_label_per_patch,
        threshold,
    )


@functools.partial(jax.jit, static_argnames=("out_width",))
def _compact_columns(fused, n_clusters, out_width: int):
    """Keep (in stable order) the columns that are real clusters with total
    point-mass > 1 (evaluation_localSPFN.py:137-139), compacted into a fixed
    `out_width` so downstream graphs never recompile. Columns beyond the
    valid count are zero."""
    C = fused.shape[1]
    col_sum = jnp.sum(fused, axis=0)
    valid = (jnp.arange(C) < n_clusters) & (col_sum > 1)
    order = jnp.argsort(~valid, stable=True)
    out = jnp.take(fused, order[:out_width], axis=1)
    n_valid = jnp.sum(valid)
    keep = jnp.arange(out_width) < n_valid
    return out * keep[None, :].astype(fused.dtype), n_valid


def get_point_final(
    point2primitive: jax.Array, labels: jax.Array, n_clusters: int
) -> jax.Array:
    """Fused per-point cluster scores (cf. `merging_utils.py:49-53`).

    point2primitive: [N, C]; labels: [C] cluster ids; n_clusters static.
    Each cluster column is the count-normalized sum of its member primitives'
    membership columns.
    """
    one_hot = jax.nn.one_hot(labels, n_clusters, dtype=point2primitive.dtype)
    one_hot = one_hot / (jnp.sum(one_hot, axis=0, keepdims=True) + 1e-10)
    return jnp.matmul(
        point2primitive, one_hot, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("n_global_points",))
def _fusion_inputs(
    spfn_labels, patch_W, patch_indices, n_global_points
):
    """Device-side pieces that don't depend on the solver output: the
    similarity Gram matrix and the assignment membership matrix with global
    columns zeroed on patch-covered points (evaluation_localSPFN.py:103-109).
    """
    P, n, K_l = patch_W.shape
    M = _membership_matrix(
        spfn_labels, patch_W, patch_indices, n_global_points
    )
    similarity = jnp.einsum("nc,nd->cd", M, M, preferred_element_type=jnp.float32)
    covered = jnp.sum(M[:, : P * K_l], axis=1) > 0
    point2primitive = M.at[:, P * K_l :].multiply(
        (~covered)[:, None].astype(M.dtype)
    )
    return similarity, point2primitive


# ---------------------------------------------------------------------------
# Fast fusion path (patch-major membership).
#
# TPU scatter cost is dominated by partial-lane update rows: scattering
# [P, n, K_l] updates into the point-major [N, P, K_l] layout writes 21-wide
# slices at varying lane offsets (~40 ms at the north-star shape), while the
# patch-major [P, N, K_l] layout scatters full minor rows (~7 ms). Every
# consumer of the membership matrix is a contraction over points, so the
# similarity blocks and the fused projection become plain MXU matmuls over
# the patch-major tensor, and the point-major matrix is never materialized.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_global_points",))
def _patch_membership(patch_W, patch_indices, n_global_points):
    """[P, N, K_l] patch-major membership (zeros off-patch)."""
    P = patch_W.shape[0]
    Mp = jnp.zeros(
        (P, n_global_points, patch_W.shape[2]), patch_W.dtype
    )
    return Mp.at[jnp.arange(P)[:, None], patch_indices].set(
        patch_W, unique_indices=True
    )


@jax.jit
def _similarity_from_membership(Mp, G):
    """Full [C, C] similarity (C = P*K_l + K_g) plus the covered mask,
    numerically identical to M^T M over the point-major matrix."""
    P, N, K_l = Mp.shape
    K_g = G.shape[1]
    pp = jnp.einsum(
        "pni,qnj->piqj", Mp, Mp, preferred_element_type=jnp.float32
    ).reshape(P * K_l, P * K_l)
    pg = jnp.einsum(
        "pni,ng->pig", Mp, G, preferred_element_type=jnp.float32
    ).reshape(P * K_l, K_g)
    gg = jnp.einsum("ng,nh->gh", G, G, preferred_element_type=jnp.float32)
    C = P * K_l + K_g
    S = jnp.zeros((C, C), jnp.float32)
    S = S.at[: P * K_l, : P * K_l].set(pp)
    S = S.at[: P * K_l, P * K_l :].set(pg)
    S = S.at[P * K_l :, : P * K_l].set(pg.T)
    S = S.at[P * K_l :, P * K_l :].set(gg)
    covered = jnp.any(jnp.sum(Mp, axis=2) > 0, axis=0)
    return S, covered


@functools.partial(jax.jit, static_argnames=("out_width", "n_ids"))
def _cluster_projection(labels, m_col, n_ids: int, out_width: int):
    """[C, out_width] projection matrix O with get_point_final's
    count-normalization folded in, plus the surviving-cluster count.

    Columns are compacted exactly as `_compact_columns` orders them: clusters
    valid iff fused column mass > 1, kept in stable cluster-id order, zeroed
    beyond `out_width`. m_col[col] = total point-mass of membership column
    `col` (with global columns pre-zeroed on covered points).
    """
    C = labels.shape[0]
    one_hot = jax.nn.one_hot(labels, n_ids, dtype=jnp.float32)  # [C, n_ids]
    counts = jnp.sum(one_hot, axis=0)
    mass = (m_col @ one_hot) / (counts + 1e-10)  # fused column sums
    valid = mass > 1
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1  # stable compact position
    n_valid = jnp.sum(valid.astype(jnp.int32))
    target = jnp.where(valid & (pos < out_width), pos, out_width)
    # cluster id -> compacted output column (out_width = drop slot)
    cluster_to_out = jax.nn.one_hot(target, out_width + 1, dtype=jnp.float32)
    cluster_to_out = cluster_to_out[:, :out_width] / (counts[:, None] + 1e-10)
    O = one_hot @ cluster_to_out  # [C, out_width]
    return O, n_valid


@jax.jit
def _fused_from_membership(Mp, G, covered, O):
    """fused [N, out_width] = (point-major membership with covered-point
    global columns zeroed) @ O, without materializing the point-major
    matrix."""
    P, N, K_l = Mp.shape
    K_g = G.shape[1]
    O_patch = O[: P * K_l].reshape(P, K_l, -1)
    O_glob = O[P * K_l :]
    fused = jnp.einsum(
        "pni,piw->nw", Mp, O_patch, preferred_element_type=jnp.float32
    )
    G_masked = G * (~covered)[:, None].astype(G.dtype)
    return fused + jnp.matmul(
        G_masked, O_glob, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("n_types",))
def _fuse_normals_types_flat(
    patch_X, patch_T, patch_indices, spfn_normals, spfn_type, n_types,
    patch_mask=None,
):
    """`_fuse_normals_types` with the three scatters packed into ONE flat
    full-minor-row scatter-add (identical outputs)."""
    N = spfn_normals.shape[0]
    P, n, _ = patch_X.shape
    if patch_mask is None:
        patch_mask = jnp.ones((P,), patch_X.dtype)
    m = patch_mask[:, None, None]
    packed = jnp.concatenate(
        [patch_X * m, patch_T * m, jnp.broadcast_to(m, (P, n, 1))], axis=2
    ).reshape(P * n, 3 + n_types + 1)
    acc = jnp.zeros((N, 3 + n_types + 1), packed.dtype).at[
        patch_indices.reshape(-1)
    ].add(packed)
    X_global, num, den = acc[:, :3], acc[:, 3:-1], acc[:, -1]
    empty = jnp.all(X_global == 0, axis=1)
    X_global = jnp.where(empty[:, None], spfn_normals, X_global)
    X_global = X_global / jnp.maximum(
        jnp.linalg.norm(X_global, axis=1, keepdims=True), 1e-12
    )
    T_global = num / jnp.maximum(den, 1.0)[:, None]
    T_global = jnp.where(empty[:, None], spfn_type, T_global)
    return X_global, T_global


def fuse_cascade_fast(
    patch_W, patch_X, patch_T, patch_indices, spfn_labels, spfn_normals,
    spfn_type, n_max_global_instances: int, n_max_local_instances: int,
    out_width: int, patch_mask=None, threshold: float = 0.0,
):
    """On-device cascade fusion via the patch-major membership layout;
    numerically equivalent to `fuse_cascade(..., merge_impl='device')` (same
    contractions, different operand order) at a fraction of the scatter cost.
    Returns (fused [N, out_width], X [N, 3], T [N, Q], n_valid scalar).
    All inputs jax arrays; patch axis may be padded (mask zeroes padding).
    """
    from cpfn_tpu.merging.device_merge import heuristic_merge_device

    N, K_g = spfn_labels.shape
    P = patch_W.shape[0]
    K_l = n_max_local_instances
    if patch_mask is not None:
        patch_W = patch_W * patch_mask[:, None, None]
    Mp = _patch_membership(patch_W, patch_indices, N)
    S, covered = _similarity_from_membership(Mp, spfn_labels)
    labels = heuristic_merge_device(
        S, P, n_max_global_instances, K_l, threshold
    )
    n_ids = S.shape[0] + K_l + K_g
    m_col = jnp.concatenate([
        jnp.sum(Mp, axis=1).reshape(-1),
        jnp.sum(spfn_labels * (~covered)[:, None].astype(spfn_labels.dtype),
                axis=0),
    ])
    O, n_valid = _cluster_projection(
        labels, m_col, n_ids, max(out_width, K_g)
    )
    fused = _fused_from_membership(Mp, spfn_labels, covered, O)
    X_f, T_f = _fuse_normals_types_flat(
        patch_X, patch_T, patch_indices, spfn_normals, spfn_type,
        spfn_type.shape[1], patch_mask,
    )
    return fused, X_f, T_f, n_valid


@functools.partial(jax.jit, static_argnames=("n_types",))
def _fuse_normals_types(
    patch_X, patch_T, patch_indices, spfn_normals, spfn_type, n_types,
    patch_mask=None,
):
    """Scatter-add patch normals/types onto the cloud; fall back to the
    global predictions on uncovered points (evaluation_localSPFN.py:112-130).
    `patch_mask` [P] zeroes the contribution of padding patches so the patch
    axis can stay at a fixed (compile-friendly) width.
    """
    N = spfn_normals.shape[0]
    P, n, _ = patch_X.shape
    if patch_mask is None:
        patch_mask = jnp.ones((P,), patch_X.dtype)
    m = patch_mask[:, None, None]
    flat_idx = patch_indices.reshape(-1)
    X_global = jnp.zeros_like(spfn_normals).at[flat_idx].add(
        (patch_X * m).reshape(-1, 3)
    )
    empty = jnp.all(X_global == 0, axis=1)
    X_global = jnp.where(empty[:, None], spfn_normals, X_global)
    X_global = X_global / jnp.maximum(
        jnp.linalg.norm(X_global, axis=1, keepdims=True), 1e-12
    )
    num = jnp.zeros((N, n_types), patch_T.dtype).at[flat_idx].add(
        (patch_T * m).reshape(-1, n_types)
    )
    den = jnp.zeros((N,), patch_T.dtype).at[flat_idx].add(
        jnp.broadcast_to(m, (P, n, 1)).reshape(-1)
    )
    T_global = num / jnp.maximum(den, 1.0)[:, None]
    T_global = jnp.where(empty[:, None], spfn_type, T_global)
    return X_global, T_global


def fuse_cascade(
    patch_W: np.ndarray,
    patch_X: np.ndarray,
    patch_T: np.ndarray,
    patch_indices: np.ndarray,
    spfn_labels: np.ndarray,
    spfn_normals: np.ndarray,
    spfn_type: np.ndarray,
    n_max_global_instances: int,
    n_max_local_instances: int,
    threshold: float = 0,
    patch_mask: np.ndarray | None = None,
    out_width: int | None = None,
    merge_impl: str = "device",
    return_counts: bool = False,
):
    """Full cascade fusion for one cloud.

    patch_W/X/T: [P, n, K_l] / [P, n, 3] / [P, n, Q] LocalSPFN outputs
    (softmax W, unit X). patch_indices: [P, n]. spfn_labels: [N, K_g]
    hard global segmentation; spfn_normals [N, 3]; spfn_type [N, Q].
    P may be 0 (global-only fallback). `patch_mask` [P] marks valid patches
    when the patch axis is padded to a fixed width (invalid patches must also
    carry patch_indices that are in range; their contributions are zeroed).

    Returns (W_fusion [N, K_out], X_global [N, 3], T_global [N, Q]) as device
    arrays: fused membership after dropping clusters supported by <= 1
    point-mass and re-padding to K_g columns (evaluation_localSPFN.py:131-139).

    With `out_width` set, the surviving clusters are compacted on device into
    a fixed K_out = max(out_width, K_g) columns (extra clusters beyond K_out
    are dropped — pick a width with slack); with out_width=None the dynamic
    reference behavior is kept (requires a host transfer of the fused matrix,
    fine for small clouds/tests).

    With `return_counts=True` a fourth value is returned: the number of
    surviving clusters BEFORE compaction (a device scalar; compare against
    K_out to count silently dropped clusters — eval drivers log this).
    """
    N, K_g = spfn_labels.shape
    P = patch_W.shape[0]
    if P == 0 or (patch_mask is not None and not np.any(patch_mask)):
        # one-hot of argmax, as the reference's global-only branch
        spfn_labels = jnp.asarray(spfn_labels, jnp.float32)
        width = max(out_width or K_g, K_g)
        W_fusion = jax.nn.one_hot(
            jnp.argmax(spfn_labels, axis=1), width, dtype=jnp.float32
        )
        out = W_fusion, jnp.asarray(spfn_normals), jnp.asarray(spfn_type)
        return (*out, jnp.int32(K_g)) if return_counts else out

    patch_W = jnp.asarray(patch_W, jnp.float32)
    if patch_mask is not None:
        patch_W = patch_W * jnp.asarray(patch_mask, jnp.float32)[:, None, None]
    similarity, point2primitive = _fusion_inputs(
        jnp.asarray(spfn_labels, jnp.float32),
        patch_W,
        jnp.asarray(patch_indices, jnp.int32),
        N,
    )
    K_l = n_max_local_instances
    if merge_impl == "device" and out_width is not None:
        # fully on-device path: no host sync anywhere in the cascade
        from cpfn_tpu.merging.device_merge import heuristic_merge_device

        labels = heuristic_merge_device(
            similarity, P, n_max_global_instances, K_l, threshold
        )
        n_ids = similarity.shape[0] + K_l + K_g
        fused = get_point_final(point2primitive, labels, n_ids)
        width = max(out_width, K_g)
        # replacement/empty clusters carry zero mass; the >1 filter drops them
        fused, n_valid = _compact_columns(fused, jnp.int32(n_ids), width)
        X_global, T_global = _fuse_normals_types(
            jnp.asarray(patch_X, jnp.float32),
            jnp.asarray(patch_T, jnp.float32),
            jnp.asarray(patch_indices, jnp.int32),
            jnp.asarray(spfn_normals, jnp.float32),
            jnp.asarray(spfn_type, jnp.float32),
            spfn_type.shape[1],
            None if patch_mask is None else jnp.asarray(patch_mask, jnp.float32),
        )
        if return_counts:
            return fused, X_global, T_global, n_valid
        return fused, X_global, T_global
    labels = run_heuristic_solver(
        np.asarray(similarity),
        P,
        n_max_global_instances,
        n_max_local_instances,
        threshold,
    )
    C = labels.shape[0]
    fused = get_point_final(
        point2primitive, jnp.asarray(labels, jnp.int32), C
    )
    n_clusters = int(labels.max()) + 1
    n_valid = jnp.int32(n_clusters)
    if out_width is not None:
        width = max(out_width, K_g)
        fused, n_valid = _compact_columns(fused, jnp.int32(n_clusters), width)
    else:
        fused_np = np.asarray(fused)[:, :n_clusters]
        fused_np = fused_np[:, fused_np.sum(axis=0) > 1]
        n_valid = jnp.int32(fused_np.shape[1])
        if fused_np.shape[1] < K_g:
            fused_np = np.concatenate(
                [fused_np, np.zeros((N, K_g - fused_np.shape[1]), fused_np.dtype)],
                axis=1,
            )
        fused = jnp.asarray(fused_np)
    X_global, T_global = _fuse_normals_types(
        jnp.asarray(patch_X, jnp.float32),
        jnp.asarray(patch_T, jnp.float32),
        jnp.asarray(patch_indices, jnp.int32),
        jnp.asarray(spfn_normals, jnp.float32),
        jnp.asarray(spfn_type, jnp.float32),
        spfn_type.shape[1],
        None if patch_mask is None else jnp.asarray(patch_mask, jnp.float32),
    )
    if return_counts:
        return fused, X_global, T_global, n_valid
    return fused, X_global, T_global
