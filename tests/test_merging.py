"""Cross-scale fusion: similarity construction, greedy solver (C++ vs NumPy
fallback agreement), and behavioral tests of the full fusion."""

import jax.numpy as jnp
import numpy as np

from cpfn_tpu import native
from cpfn_tpu.merging import (
    fuse_cascade,
    get_point_final,
    run_heuristic_solver,
    similarity_soft,
)


def _brute_similarity(spfn_labels, patch_W, patch_idx):
    N, K_g = spfn_labels.shape
    P, n, K_l = patch_W.shape
    M = np.zeros((N, P * K_l + K_g))
    for b in range(P):
        M[patch_idx[b], b * K_l : (b + 1) * K_l] += patch_W[b]
    M[:, P * K_l :] = spfn_labels
    return M.T @ M, M


def test_similarity_soft_matches_bruteforce(rng):
    N, K_g, P, n, K_l = 64, 5, 3, 16, 4
    spfn = rng.rand(N, K_g).astype(np.float32)
    W = rng.rand(P, n, K_l).astype(np.float32)
    idx = np.stack([rng.choice(N, n, replace=False) for _ in range(P)])
    got = np.asarray(
        similarity_soft(jnp.array(spfn), jnp.array(W), jnp.array(idx))
    )
    want, _ = _brute_similarity(spfn, W, idx)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_solver_cpp_matches_numpy(rng):
    for _ in range(5):
        P, K_l, K_g = 3, 4, 5
        C = P * K_l + K_g
        A = rng.rand(C, C)
        sim = (A + A.T) / 2
        sim[rng.rand(C, C) < 0.6] = 0.0
        sim = (sim + sim.T) / 2
        got_cpp = native.heuristic_merge_solver(sim, P, K_g, K_l, 0.0)
        got_np = native._merge_solver_numpy(sim, P, K_g, K_l, 0.0)
        np.testing.assert_array_equal(got_cpp, got_np)


def test_solver_merges_cooccurring_primitives():
    # primitive 0 (patch 0) and the global primitive share points -> merge;
    # primitive in patch 1 is independent -> own cluster
    P, K_l, K_g = 2, 2, 2
    C = P * K_l + K_g  # 6 columns: [p0k0 p0k1 p1k0 p1k1 g0 g1]
    sim = np.zeros((C, C))
    np.fill_diagonal(sim, 5.0)
    sim[0, 4] = sim[4, 0] = 3.0  # p0k0 overlaps g0
    sim[2, 5] = sim[5, 2] = 2.0  # p1k0 overlaps g1
    labels = run_heuristic_solver(sim, P, K_g, K_l, 0)
    assert labels[0] == labels[4]
    assert labels[2] == labels[5]
    assert labels[0] != labels[2]
    # all six primitives had nonzero diagonal -> no replacement labels
    assert labels.min() >= 0


def test_solver_patch_constraint():
    # two primitives of the SAME patch must not merge even with similarity
    P, K_l, K_g = 1, 2, 1
    C = P * K_l + K_g
    sim = np.zeros((C, C))
    np.fill_diagonal(sim, 5.0)
    sim[0, 1] = sim[1, 0] = 4.0  # same patch!
    # route both through the global primitive: 0-2 merges first (higher), then
    # 1-2 would connect 1 to 0's segment -> patch overlap -> dropped
    sim[0, 2] = sim[2, 0] = 4.5
    sim[1, 2] = sim[2, 1] = 4.4
    labels = run_heuristic_solver(sim, P, K_g, K_l, 0)
    assert labels[0] == labels[2]
    assert labels[1] != labels[0]


def test_get_point_final_normalization(rng):
    N, C = 32, 6
    p2p = rng.rand(N, C).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    out = np.asarray(get_point_final(jnp.array(p2p), jnp.array(labels), 3))
    want = np.zeros((N, 3))
    for c in range(3):
        cols = np.where(labels == c)[0]
        want[:, c] = p2p[:, cols].sum(1) / len(cols)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_fuse_cascade_no_patches(rng):
    N, K_g, Q = 50, 4, 4
    spfn_labels = np.eye(K_g, dtype=np.float32)[rng.randint(0, K_g, N)]
    normals = rng.randn(N, 3).astype(np.float32)
    types = rng.rand(N, Q).astype(np.float32)
    W, X, T = fuse_cascade(
        np.zeros((0, 8, 3), np.float32),
        np.zeros((0, 8, 3), np.float32),
        np.zeros((0, 8, Q), np.float32),
        np.zeros((0, 8), np.int64),
        spfn_labels, normals, types, K_g, 3,
    )
    np.testing.assert_array_equal(W, spfn_labels)
    np.testing.assert_array_equal(X, normals)


def test_fuse_cascade_patch_overrides_global(rng):
    """Points covered by a confident patch should take the patch's clustering;
    uncovered points keep the global labels/normals."""
    N, K_g, K_l, Q, n = 40, 3, 2, 4, 10
    glob_assign = np.zeros(N, int)
    glob_assign[20:] = 1
    spfn_labels = np.eye(K_g, dtype=np.float32)[glob_assign]
    normals = np.tile(np.array([1.0, 0, 0], np.float32), (N, 1))
    types = np.tile(np.eye(Q, dtype=np.float32)[0], (N, 1))
    # one patch covering points 0..9, splitting them into two local prims
    idx = np.arange(n)[None]
    pw = np.zeros((1, n, K_l), np.float32)
    pw[0, :5, 0] = 1.0
    pw[0, 5:, 1] = 1.0
    px = np.tile(np.array([0, 1.0, 0], np.float32), (1, n, 1))
    pt = np.tile(np.eye(Q, dtype=np.float32)[1], (1, n, 1))
    W, X, T = fuse_cascade(
        pw, px, pt, idx, spfn_labels, normals, types, K_g, K_l
    )
    assert W.shape == (N, K_g)
    W, X, T = np.asarray(W), np.asarray(X), np.asarray(T)
    hard = np.argmax(W, axis=1)
    # covered points split into 2 clusters, both distinct from the cluster of
    # uncovered global-instance-1 points
    assert len(set(hard[:5])) == 1 and len(set(hard[5:10])) == 1
    assert hard[0] != hard[5]
    assert hard[0] != hard[25] and hard[5] != hard[25]
    # normals: covered points take patch normal, uncovered keep global
    np.testing.assert_allclose(X[:10], [[0, 1, 0]] * 10, atol=1e-6)
    np.testing.assert_allclose(X[10:], [[1, 0, 0]] * 30, atol=1e-6)
    np.testing.assert_allclose(T[:10, 1], 1.0)
    np.testing.assert_allclose(T[10:, 0], 1.0)


def test_device_merge_matches_host(rng):
    """Partition equivalence of the on-device greedy merge vs the C++/NumPy
    solver on random similarity matrices."""
    from cpfn_tpu.merging.device_merge import heuristic_merge_device

    for trial in range(6):
        P, K_l, K_g = 3, 4, 5
        C = P * K_l + K_g
        A = rng.rand(C, C)
        sim = (A + A.T) / 2
        sim[rng.rand(C, C) < 0.5] = 0.0
        sim = (sim + sim.T) / 2
        host = native.heuristic_merge_solver(sim, P, K_g, K_l, 0.0)
        dev = np.asarray(
            heuristic_merge_device(jnp.asarray(sim), P, K_g, K_l, 0.0)
        )
        # same partition: co-membership must agree pairwise
        co_h = host[:, None] == host[None, :]
        co_d = dev[:, None] == dev[None, :]
        np.testing.assert_array_equal(co_h, co_d)


def test_fuse_cascade_device_merge_matches_host(rng):
    N, K_g, K_l, Q, n, P = 60, 4, 3, 4, 12, 2
    spfn_labels = np.eye(K_g, dtype=np.float32)[rng.randint(0, K_g, N)]
    normals = rng.randn(N, 3).astype(np.float32)
    types = rng.rand(N, Q).astype(np.float32)
    idx = np.stack([rng.choice(N, n, replace=False) for _ in range(P)])
    pw = rng.rand(P, n, K_l).astype(np.float32)
    pw = pw / pw.sum(-1, keepdims=True)
    px = rng.randn(P, n, 3).astype(np.float32)
    pt = rng.rand(P, n, Q).astype(np.float32)
    out_h = fuse_cascade(
        pw, px, pt, idx, spfn_labels, normals, types, K_g, K_l,
        out_width=K_g + K_l, merge_impl="host",
    )
    out_d = fuse_cascade(
        pw, px, pt, idx, spfn_labels, normals, types, K_g, K_l,
        out_width=K_g + K_l, merge_impl="device",
    )
    for a, b in zip(out_h, out_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fuse_cascade_reports_cluster_count(rng):
    """return_counts surfaces the surviving-cluster count so eval drivers can
    detect silent fixed-width truncation; with the default K_g+K_l slack on a
    realistic overlap pattern nothing is dropped."""
    N, K_g, K_l, Q, n, P = 120, 4, 3, 4, 16, 3
    spfn_labels = np.eye(K_g, dtype=np.float32)[rng.randint(0, K_g, N)]
    normals = rng.randn(N, 3).astype(np.float32)
    types = rng.rand(N, Q).astype(np.float32)
    idx = np.stack([rng.choice(N, n, replace=False) for _ in range(P)])
    pw = rng.rand(P, n, K_l).astype(np.float32)
    pw /= pw.sum(axis=2, keepdims=True)
    W, X, T, n_valid = fuse_cascade(
        pw, rng.randn(P, n, 3).astype(np.float32),
        rng.rand(P, n, Q).astype(np.float32), idx,
        spfn_labels, normals, types, K_g, K_l,
        out_width=K_g + K_l, merge_impl="device", return_counts=True,
    )
    n_valid = int(n_valid)
    assert 0 < n_valid
    # nothing silently dropped at the default slack width
    assert n_valid <= K_g + K_l
    # the same count is consistent with the compacted output's nonzero columns
    ncols = int(np.sum(np.asarray(W).sum(axis=0) > 0))
    assert ncols == n_valid


def test_fuse_cascade_fast_matches_device_path(rng):
    """The patch-major fast fusion is numerically equivalent to the
    point-major device path (same contractions, different operand order)."""
    import jax.numpy as jnp
    from cpfn_tpu.merging.fusion import fuse_cascade_fast

    N, K_g, K_l, Q, n, P = 150, 4, 3, 4, 16, 4
    spfn_labels = np.eye(K_g, dtype=np.float32)[rng.randint(0, K_g, N)]
    normals = rng.randn(N, 3).astype(np.float32)
    types = rng.rand(N, Q).astype(np.float32)
    idx = np.stack([rng.choice(N, n, replace=False) for _ in range(P)])
    pw = rng.rand(P, n, K_l).astype(np.float32)
    pw /= pw.sum(axis=2, keepdims=True)
    px = rng.randn(P, n, 3).astype(np.float32)
    pt = rng.rand(P, n, Q).astype(np.float32)
    mask = np.array([1, 1, 1, 0], np.float32)  # one padding patch
    width = K_g + K_l
    W0, X0, T0, nv0 = fuse_cascade(
        pw, px, pt, idx, spfn_labels, normals, types, K_g, K_l,
        patch_mask=mask, out_width=width, merge_impl="device",
        return_counts=True,
    )
    W1, X1, T1, nv1 = fuse_cascade_fast(
        jnp.asarray(pw), jnp.asarray(px), jnp.asarray(pt),
        jnp.asarray(idx, jnp.int32), jnp.asarray(spfn_labels),
        jnp.asarray(normals), jnp.asarray(types), K_g, K_l,
        out_width=width, patch_mask=jnp.asarray(mask),
    )
    assert int(nv0) == int(nv1)
    np.testing.assert_allclose(np.asarray(W0), np.asarray(W1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(X0), np.asarray(X1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T0), np.asarray(T1), atol=1e-5)


def test_fuse_cascade_invariant_to_coherent_row_permutation(rng):
    """Permuting each patch's index row together with its per-point
    predictions leaves the fused output unchanged — the invariant behind the
    eval-time point-order shuffle (the network consumes shuffled orders; the
    permuted index rows keep scatter targets aligned)."""
    N, K_g, P, n, K_l, Q = 128, 6, 4, 32, 5, 4
    spfn = rng.rand(N, K_g).astype(np.float32)
    spfn_n = rng.randn(N, 3).astype(np.float32)
    spfn_t = rng.rand(N, Q).astype(np.float32)
    W = rng.rand(P, n, K_l).astype(np.float32)
    X = rng.randn(P, n, 3).astype(np.float32)
    T = rng.rand(P, n, Q).astype(np.float32)
    idx = np.stack([rng.choice(N, n, replace=False) for _ in range(P)])

    base = fuse_cascade(
        jnp.array(W), jnp.array(X), jnp.array(T), jnp.array(idx),
        spfn, spfn_n, spfn_t, K_g, K_l, out_width=K_g + K_l,
    )
    perms = np.stack([rng.permutation(n) for _ in range(P)])
    take = lambda a: np.take_along_axis(
        a, perms[..., None] if a.ndim == 3 else perms, axis=1
    )
    got = fuse_cascade(
        jnp.array(take(W)), jnp.array(take(X)), jnp.array(take(T)),
        jnp.array(take(idx)), spfn, spfn_n, spfn_t, K_g, K_l,
        out_width=K_g + K_l,
    )
    for a, b in zip(base, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
