"""Point-cloud geometry ops as XLA-native programs (channels-last layout).

These replace the reference's CUDA kernel layer
(`/root/reference/PointNet2/pointnet2_ops/cuda_ops/src/*.cu`) and its torch
autograd wrappers (`.../modules/geometry_utils.py`). Design notes:

- Layout is **[B, N, C]** (channels last) throughout — TPU/MXU friendly —
  rather than the reference's [B, C, N].
- All index-producing ops (FPS, ball query, 3-NN) are non-differentiable by
  construction (integer outputs); gathers and the weighted interpolation are
  plain `take_along_axis`/einsum so XLA autodiff supplies the scatter-add
  backward passes that the reference hand-writes in CUDA
  (`sampling_gpu.cu`, `interpolate_gpu.cu`, `group_points_gpu.cu`).
- Semantics preserved from the reference *fast* (CUDA) paths, which are what
  the shipped models trained on:
  * FPS starts at index 0 and skips points with ||p||^2 <= 1e-3
    (`sampling_gpu.cu:76,90-91`).
  * ball_query returns the first-K in-radius points in scan order, padding
    short lists with the first hit (`ball_query_gpu.cu:27-41`).
  * three_nn returns sqrt of squared distances (`geometry_utils.py:182-184`),
    ties broken toward the lower index.

A Pallas kernel path for the hot ops lives in `cpfn_tpu.ops.pallas_kernels`
and is dispatched via the ``impl`` argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_FPS_SKIP_NEAR_ORIGIN_SQR = 1e-3  # matches CUDA kernel's `mag <= 1e-3` skip
_FPS_INIT_DIST = 1e10


def pairwise_sqr_dist(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Squared euclidean distance between each pair of points.

    Args:
      src: [B, N, C]
      dst: [B, M, C]
    Returns:
      [B, N, M] squared distances, clamped to >= 0 (the expansion
      ||a||^2 + ||b||^2 - 2<a,b> can go slightly negative in f32).
    """
    # Route the inner product through the MXU; the norms ride along on the VPU.
    dot = jnp.einsum(
        "bnc,bmc->bnm", src, dst, preferred_element_type=jnp.float32
    )
    d2 = (
        jnp.sum(src * src, axis=-1)[:, :, None]
        + jnp.sum(dst * dst, axis=-1)[:, None, :]
        - 2.0 * dot
    )
    return jnp.maximum(d2, 0.0)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: out[b, ..., c] = points[b, idx[b, ...], c].

    Args:
      points: [B, N, C]
      idx: [B, *index_dims] int32
    Returns:
      [B, *index_dims, C]

    Replaces the reference's `select_point_subset` (geometry_utils.py:26-44)
    and the `gather_points`/`group_points` CUDA kernels; the backward pass is
    XLA's scatter-add, matching the CUDA `*_grad` kernels' atomicAdd.
    """
    B, N, C = points.shape
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[:, :, None], axis=1)
    return out.reshape(*idx.shape, C)


# `group_points` in the reference gathers [B,C,N] x [B,S,K] -> [B,C,S,K];
# with channels-last it is literally the same gather.
group_points = gather_points


def _tpu_backend() -> bool:
    try:
        # An active `jax.default_device(...)` context overrides the platform
        # the computation will actually run on (e.g. a CPU-mesh dryrun inside
        # a process whose ambient backend is a TPU) — honor it first.
        d = jax.config.jax_default_device
        if d is not None:
            return getattr(d, "platform", None) in ("tpu", "axon")
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=("num_samples", "impl"))
def farthest_point_sample(
    points: jax.Array, num_samples: int, *, impl: str = "auto"
) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      points: [B, N, 3]
      num_samples: number of indices to select (static).
    Returns:
      [B, num_samples] int32 indices.

    Semantics follow the reference CUDA kernel (`sampling_gpu.cu:63-211`):
    selection always starts at index 0; points with ||p||^2 <= 1e-3 are
    never selected and never update the running min-distance; the running
    min-distance buffer is initialised to 1e10.
    """
    if impl == "auto":
        impl = "pallas" if _tpu_backend() else "xla"
    if impl == "pallas":
        from cpfn_tpu.ops import pallas_kernels

        return pallas_kernels.farthest_point_sample_pallas(points, num_samples)
    B, N, _ = points.shape
    valid = jnp.sum(points * points, axis=-1) > _FPS_SKIP_NEAR_ORIGIN_SQR
    neg_inf = jnp.float32(-1.0)

    def body(j, carry):
        min_d2, idxs, last = carry
        last_p = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d2 = jnp.sum((points - last_p) ** 2, axis=-1)
        min_d2 = jnp.where(valid, jnp.minimum(min_d2, d2), min_d2)
        nxt = jnp.argmax(jnp.where(valid, min_d2, neg_inf), axis=1)
        idxs = idxs.at[:, j].set(nxt.astype(jnp.int32))
        return min_d2, idxs, nxt.astype(jnp.int32)

    idxs0 = jnp.zeros((B, num_samples), jnp.int32)  # slot 0 stays index 0
    init = (
        jnp.full((B, N), _FPS_INIT_DIST, jnp.float32),
        idxs0,
        jnp.zeros((B,), jnp.int32),
    )
    _, idxs, _ = lax.fori_loop(1, num_samples, body, init)
    return idxs


@functools.partial(
    jax.jit, static_argnames=("radius", "num_samples", "impl")
)
def ball_query(
    points: jax.Array,
    queries: jax.Array,
    radius: float,
    num_samples: int,
    *,
    impl: str = "auto",
) -> jax.Array:
    """First-K-within-radius neighbor indices, in point-index scan order.

    Args:
      points: [B, N, 3] all points.
      queries: [B, S, 3] ball centers.
      radius: ball radius (strict `d^2 < r^2` compare, as the CUDA kernel).
      num_samples: K, max neighbors per ball (static).
    Returns:
      [B, S, K] int32 indices. If fewer than K points fall in a ball the
      remaining slots repeat the first hit (`ball_query_gpu.cu:33-41`). A ball
      with zero hits yields index 0 (the CUDA kernel leaves garbage there; in
      the pipeline every query point is itself a member of `points`, so the
      case never occurs).

    Three implementations: the `xla` path expresses first-K-in-scan-order as
    the K smallest values of `where(hit, index, N)` (one `top_k` per query);
    the `scan` path ranks hits with a cumulative sum and binary-searches the
    (sorted) rank vector for each output slot — K log N gathers instead of a
    top_k sort, the fastest path on TPU for batched query stacks; the
    `pallas` path streams the points in chunks with early exit once every
    ball is full (`pallas_kernels.ball_query_pallas`).
    """
    if impl == "auto":
        # Pallas streaming kernel wins on TPU for batched query stacks; the
        # scan path ties it at single-batch 100k-point shapes but loses badly
        # when B*S is large (binary-search gathers dominate), so it stays
        # opt-in. (Measured: 32x512q/8192pts scan 300ms vs pallas 49ms;
        # 1x512q/100k scan 21.6ms vs pallas 20.8ms.)
        impl = "pallas" if (_tpu_backend() and num_samples <= 128) else "xla"
    if impl == "pallas":
        from cpfn_tpu.ops import pallas_kernels

        return pallas_kernels.ball_query_pallas(
            points, queries, radius, num_samples
        )
    if impl == "scan":
        B, N, _ = points.shape
        d2 = pairwise_sqr_dist(queries, points)  # [B, S, N]
        hit = d2 < jnp.float32(radius) ** 2
        rank = jnp.cumsum(hit.astype(jnp.int32), axis=-1)  # [B, S, N]
        count = rank[..., -1:]  # [B, S, 1]
        # slot k holds the first n with rank == k+1 (rank is non-decreasing:
        # leftmost rank >= k+1 IS the (k+1)-th hit) — vectorized binary search
        target = jnp.arange(1, num_samples + 1, dtype=jnp.int32)
        lo = jnp.zeros(rank.shape[:2] + (num_samples,), jnp.int32)
        hi = jnp.full_like(lo, N)
        for _ in range(max(1, (N - 1).bit_length())):
            mid = (lo + hi) // 2
            r = jnp.take_along_axis(rank, jnp.minimum(mid, N - 1), axis=-1)
            ge = r >= target
            lo = jnp.where(ge, lo, mid + 1)
            hi = jnp.where(ge, mid, hi)
        idx = hi  # == N where the ball had < k hits
        first = idx[..., :1]
        idx = jnp.where(target[None, None] <= count, idx, first)
        return jnp.where(idx == N, 0, idx)  # zero-hit fallback
    B, N, _ = points.shape
    d2 = pairwise_sqr_dist(queries, points)  # [B, S, N]
    hit = d2 < jnp.float32(radius) ** 2
    k_iota = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    key = jnp.where(hit, k_iota, N)
    # top_k of the negated key = K smallest keys = first K hits in scan order.
    neg_vals, _ = lax.top_k(-key, num_samples)
    idx = -neg_vals  # ascending; == N where the ball had < K hits
    first = idx[..., :1]
    idx = jnp.where(idx == N, first, idx)
    return jnp.where(idx == N, 0, idx)  # zero-hit fallback (see docstring)


@functools.partial(jax.jit, static_argnames=("impl",))
def three_nn(
    queries: jax.Array, points: jax.Array, *, impl: str = "xla"
) -> tuple[jax.Array, jax.Array]:
    """Three nearest neighbors of each query among `points`.

    Args:
      queries: [B, S, 3]
      points: [B, N, 3]
    Returns:
      (dists, idx): [B, S, 3] euclidean distances (sqrt, as the reference fast
      path, geometry_utils.py:182-184) and int32 indices, nearest first; ties
      broken toward the lower index (`interpolate_gpu.cu:33-49`).
    """
    del impl
    d2 = pairwise_sqr_dist(queries, points)  # [B, S, N]
    # Three iterated min+argmin passes instead of a top_k sort: ~3 streaming
    # passes over [B, S, N] on the VPU (top_k over a 100k axis costs an order
    # of magnitude more). argmin takes the first minimum, matching the CUDA
    # kernel's strict-< running-3-best tie-break.
    dists, idxs = [], []
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    n_iota = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    for _ in range(3):
        d = jnp.min(d2, axis=-1)
        i = jnp.argmin(d2, axis=-1)
        dists.append(d)
        idxs.append(i)
        d2 = jnp.where(n_iota == i[..., None], big, d2)
    d2_3 = jnp.stack(dists, axis=-1)
    idx = jnp.stack(idxs, axis=-1)
    return jnp.sqrt(jnp.maximum(d2_3, 0.0)), idx.astype(jnp.int32)


def three_interpolate(
    feats: jax.Array, idx: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted sum of three neighbor features.

    Args:
      feats: [B, N, C]
      idx: [B, S, 3] int32
      weights: [B, S, 3]
    Returns:
      [B, S, C] = sum_k weights[b,s,k] * feats[b, idx[b,s,k], :]

    Differentiable in `feats` and `weights`; the backward wrt `feats` is the
    scatter-add the reference writes by hand (`interpolate_gpu.cu:112-154`).
    """
    gathered = gather_points(feats, idx)  # [B, S, 3, C]
    return jnp.einsum(
        "bskc,bsk->bsc", gathered, weights, preferred_element_type=jnp.float32
    )


def interpolation_weights(dists: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-distance interpolation weights, normalized over the 3 neighbors.

    Matches `pointset_feature_propagation.py:40-42`: w_k = (1/(d_k+eps)) / sum.
    """
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
