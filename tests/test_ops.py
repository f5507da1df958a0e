"""Parity tests for the geometry op layer against NumPy brute-force models of
the reference CUDA kernels' semantics (sampling_gpu.cu, ball_query_gpu.cu,
interpolate_gpu.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu import ops


def _np_fps(points, m):
    """NumPy model of the CUDA FPS kernel: start at 0, skip ||p||^2<=1e-3."""
    B, N, _ = points.shape
    out = np.zeros((B, m), np.int32)
    for b in range(B):
        valid = np.sum(points[b] ** 2, -1) > 1e-3
        dist = np.full(N, 1e10)
        last = 0
        for j in range(1, m):
            d = np.sum((points[b] - points[b, last]) ** 2, -1)
            dist = np.where(valid, np.minimum(dist, d), dist)
            last = int(np.argmax(np.where(valid, dist, -1.0)))
            out[b, j] = last
    return out


def _np_ball_query(points, queries, radius, K):
    """NumPy model of query_ball_point_kernel (first K hits, scan order)."""
    B, S, _ = queries.shape
    N = points.shape[1]
    out = np.zeros((B, S, K), np.int32)
    for b in range(B):
        for s in range(S):
            d2 = np.sum((points[b] - queries[b, s]) ** 2, -1)
            hits = np.where(d2 < radius**2)[0][:K]
            if len(hits) == 0:
                continue
            out[b, s, :] = hits[0]
            out[b, s, : len(hits)] = hits
    return out


def test_pairwise_sqr_dist(rng):
    src = rng.randn(2, 17, 3).astype(np.float32)
    dst = rng.randn(2, 11, 3).astype(np.float32)
    got = np.asarray(ops.pairwise_sqr_dist(jnp.array(src), jnp.array(dst)))
    want = np.sum((src[:, :, None] - dst[:, None]) ** 2, -1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gather_points(rng):
    pts = rng.randn(2, 9, 4).astype(np.float32)
    idx = rng.randint(0, 9, (2, 5, 3)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.array(pts), jnp.array(idx)))
    assert got.shape == (2, 5, 3, 4)
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def test_fps_matches_reference_semantics(rng):
    pts = rng.randn(3, 64, 3).astype(np.float32)
    # plant a near-origin point that must be skipped
    pts[0, 5] = np.array([1e-3, 0, 0])
    got = np.asarray(ops.farthest_point_sample(jnp.array(pts), 16))
    want = _np_fps(pts, 16)
    np.testing.assert_array_equal(got, want)
    assert not np.any(got[0] == 5)


def test_fps_selects_distinct_points(rng):
    pts = rng.randn(2, 128, 3).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.array(pts), 32))
    for b in range(2):
        assert len(np.unique(idx[b])) == 32


def test_ball_query_matches_reference_semantics(rng):
    pts = rng.randn(2, 64, 3).astype(np.float32)
    qidx = np.asarray(ops.farthest_point_sample(jnp.array(pts), 8))
    queries = np.stack([pts[b][qidx[b]] for b in range(2)])
    for radius, K in [(0.5, 4), (1.0, 8), (0.2, 16)]:
        got = np.asarray(
            ops.ball_query(jnp.array(pts), jnp.array(queries), radius, K)
        )
        want = _np_ball_query(pts, queries, radius, K)
        np.testing.assert_array_equal(got, want)


def test_three_nn(rng):
    pts = rng.randn(2, 32, 3).astype(np.float32)
    q = rng.randn(2, 50, 3).astype(np.float32)
    dists, idx = ops.three_nn(jnp.array(q), jnp.array(pts))
    dists, idx = np.asarray(dists), np.asarray(idx)
    d2 = np.sum((q[:, :, None] - pts[:, None]) ** 2, -1)
    order = np.argsort(d2, axis=-1)[..., :3]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(
        dists, np.sqrt(np.take_along_axis(d2, order, -1)), atol=1e-3
    )


def test_three_interpolate_forward_and_grad(rng):
    feats = rng.randn(2, 16, 8).astype(np.float32)
    idx = rng.randint(0, 16, (2, 10, 3)).astype(np.int32)
    w = rng.rand(2, 10, 3).astype(np.float32)
    out = np.asarray(
        ops.three_interpolate(jnp.array(feats), jnp.array(idx), jnp.array(w))
    )
    want = np.einsum("bskc,bsk->bsc", feats[np.arange(2)[:, None, None], idx], w)
    np.testing.assert_allclose(out, want, atol=1e-5)

    # backward wrt feats is a scatter-add of w * grad_out
    def f(feats_):
        return jnp.sum(
            ops.three_interpolate(feats_, jnp.array(idx), jnp.array(w)) ** 2
        )

    g = np.asarray(jax.grad(f)(jnp.array(feats)))
    gw = np.zeros_like(feats)
    for b in range(2):
        for s in range(10):
            for k in range(3):
                gw[b, idx[b, s, k]] += 2 * want[b, s] * w[b, s, k]
    np.testing.assert_allclose(g, gw, atol=1e-4)


def test_interpolation_weights():
    d = jnp.array([[[1.0, 2.0, 4.0]]])
    w = np.asarray(ops.geometry.interpolation_weights(d))
    recip = 1.0 / (np.array([1.0, 2.0, 4.0]) + 1e-8)
    np.testing.assert_allclose(w[0, 0], recip / recip.sum(), rtol=1e-6)
