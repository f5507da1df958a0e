"""Pallas TPU kernels for the hot point-cloud index ops.

Farthest point sampling is inherently sequential in the number of samples m:
the XLA `fori_loop` path dispatches ~m tiny device ops with a serial
dependency chain (latency-bound: ~25us/step). This kernel runs the whole
loop inside one Pallas program with the point coordinates and the running
min-distance state resident in VMEM ([N] points use ~2MB at N=100k), so each
iteration is a single VPU sweep.

Semantics match the CUDA kernel (`sampling_gpu.cu:63-211`) and the XLA path
in `geometry.farthest_point_sample`: start at index 0, skip points with
||p||^2 <= 1e-3, running-min initialised to 1e10, ties resolved to the
lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, dist_ref, *, num_samples, n_pad):
    """One batch item per grid step. Refs:
    x/y/z_ref: [1, R, 128] padded coordinates (pad points at the origin are
    auto-skipped by the near-origin rule).
    out_ref: [1, m] int32 selected indices.
    dist_ref: [R, 128] f32 scratch (running min squared distance).
    """
    R = x_ref.shape[1]
    b = pl.program_id(0)
    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    # invalid (near-origin / padding) entries are encoded ONCE in the
    # running-distance buffer as -1: every real distance is >= 0, so
    # min(-1, d) keeps them at -1 forever and the two per-iteration
    # validity `where` sweeps the original kernel paid (update mask +
    # argmax mask) disappear — outputs are bit-identical
    valid = (x * x + y * y + z * z) > 1e-3
    dist_ref[:] = jnp.where(valid, 1e10, -1.0).astype(jnp.float32)
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
        + lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    )
    out_ref[b, 0] = 0

    def body(j, last):
        # coordinates of the last selected point via masked reductions
        # (dynamic scalar indexing into VMEM does not lower on the TC core)
        sel = flat_iota == last
        px = jnp.sum(jnp.where(sel, x, 0.0))
        py = jnp.sum(jnp.where(sel, y, 0.0))
        pz = jnp.sum(jnp.where(sel, z, 0.0))
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        new_dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = new_dist
        m = jnp.max(new_dist)
        # first index achieving the max (lowest flat index)
        nxt = jnp.min(jnp.where(new_dist == m, flat_iota, n_pad))
        out_ref[b, j] = nxt
        return nxt

    lax.fori_loop(1, num_samples, body, jnp.int32(0))


# Default points-per-inner-step (see ball_query_pallas). Round-4 sweep on
# the v5e (tools/bq_sweep.py, artifacts_r4/perf_r3/bq_sweep.json): per-trip
# latency dominates, so wider is monotonically faster — with the
# Hillis-Steele rank scan (which removed the W x W ranking-matmul VMEM cap)
# W=8192 measures 12.3 ms vs 48.6 at the old 1024 default on the local-SA1
# shape (32x8192x512) and 6.4 vs 20.3 ms on the global (1x100k x512).
# Calls clamp the chunk to the padded point count, so small-N call sites
# (SA2/SA3) never pay pure-padding trips.
_BQ_CHUNK = 8192


def _ball_query_kernel(
    x_ref, y_ref, z_ref, q_ref, out_ref, count_ref, buf_ref,
    *, radius_sqr, num_samples, n_points,
):
    """Grid: (B, S // 128). Per step: one 128-query tile against all points.

    Streaming first-K-within-radius selection: walk the points in W-wide
    chunks in index order; per chunk, one MXU matmul gives the 128xW
    distance tile, a second (triangular-ones) matmul ranks the in-radius hits
    within the chunk, and a K-step min-merge folds each hit into its output
    slot (slot s takes the min point index among hits with running slot
    position >= s — exact because slot positions are contiguous per chunk).
    Early exits once every query's buffer holds K hits, and skips the merge
    for chunks that bring no hits to unfilled queries.

    The chunk width W trades the O(W^2) ranking matmul per chunk (total
    O(N*W) per tile) against while-loop trip count and early-exit
    granularity; it comes in via the block shape (see `ball_query_pallas`).

    x/y/z_ref: [1, C, W] padded point coordinate planes.
    q_ref: [1, 128, 3] query tile. out_ref: [1, 128, K] int32.
    count_ref: [128, 128] i32 scratch (col 0 = hits-so-far per query).
    buf_ref: [128, K] i32 scratch (selected indices, BIG = empty).
    """
    C = x_ref.shape[1]
    W = x_ref.shape[2]
    K = num_samples
    BIG = jnp.int32(2**30)
    q = q_ref[0]  # [128, 3]
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # [128, 1]
    buf_ref[:] = jnp.full((128, K), BIG, jnp.int32)
    count_ref[:] = jnp.zeros((128, 128), jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lane_q = lax.broadcasted_iota(jnp.int32, (128, W), 1)
    slot_iota = lax.broadcasted_iota(jnp.int32, (128, K), 1)

    def _rank_scan(hit_i):
        # inclusive prefix sum along lanes via log2(W) rolled adds (a
        # Hillis-Steele scan): O(W log W) VPU work and no W x W operand —
        # the earlier triangular-ones MXU matmul was O(W^2) and its tri
        # matrix capped the chunk width at 2048 f32 in VMEM.
        r = hit_i
        off = 1
        while off < W:
            r = r + jnp.where(lane_q >= off, pltpu.roll(r, off, axis=1), 0)
            off *= 2
        return r

    def cond(c):
        return (c < C) & (jnp.min(count_ref[:, 0]) < K)

    def body(c):
        px = x_ref[0, pl.ds(c, 1), :]  # [1, W]
        py = y_ref[0, pl.ds(c, 1), :]
        pz = z_ref[0, pl.ds(c, 1), :]
        p = jnp.concatenate([px, py, pz], axis=0)  # [3, W]
        dot = jnp.dot(q, p, preferred_element_type=jnp.float32)  # [128, W]
        pn = px * px + py * py + pz * pz  # [1, W]
        d2 = qn + pn - 2.0 * dot
        flat = c * W + lane  # [1, W] global point index
        hit = (d2 < radius_sqr) & (flat < n_points)
        rank = _rank_scan(hit.astype(jnp.int32))  # [128, W]
        nhits = rank[:, W - 1][:, None]  # [128, 1]
        count = count_ref[:, 0][:, None]  # [128, 1]
        # any new hits for queries that still have open slots?
        useful = jnp.max(jnp.where(count < K, nhits, 0)) > 0

        @pl.when(useful)
        def _():
            slotpos = jnp.where(hit, count + rank - 1, BIG)  # [128, W]
            masked_flat = jnp.where(hit, flat, BIG)
            new_cols = [
                jnp.min(
                    jnp.where(slotpos >= s, masked_flat, BIG),
                    axis=1, keepdims=True,
                )
                for s in range(K)
            ]
            cand_all = jnp.concatenate(new_cols, axis=1)  # [128, K]
            cand_all = jnp.where(slot_iota >= count, cand_all, BIG)
            buf_ref[:] = jnp.minimum(buf_ref[:], cand_all)

        count_ref[:] = count_ref[:] + nhits
        return c + 1

    lax.while_loop(cond, body, jnp.int32(0))
    buf = buf_ref[:]
    first = buf[:, :1]
    buf = jnp.where(buf == BIG, first, buf)
    out_ref[0] = jnp.where(buf == BIG, 0, buf)


@functools.partial(
    jax.jit, static_argnames=("radius", "num_samples", "chunk")
)
def ball_query_pallas(
    points: jax.Array,
    queries: jax.Array,
    radius: float,
    num_samples: int,
    chunk: int | None = None,
) -> jax.Array:
    """[B, N, 3] x [B, S, 3] -> [B, S, K] int32, CUDA ball-query semantics
    (first K in-radius points in scan order, short lists padded with the
    first hit). S is padded to a multiple of 128 internally; K <= 128.

    `chunk` is the streaming width W (multiple of 128): per query tile the
    ranking matmul costs O(N*W) total, so smaller W cuts MXU work linearly
    at the price of more while-loop trips; None = CPFN_BQ_CHUNK env (read at
    trace time; set per process) or 1024."""
    if chunk is None:
        import os

        chunk = int(os.environ.get("CPFN_BQ_CHUNK", str(_BQ_CHUNK)))
    assert chunk % 128 == 0 and chunk > 0
    B, N, _ = points.shape
    # wider-than-N chunks would only add padding work: clamp to padded N
    chunk = min(chunk, -(-N // 128) * 128)
    S = queries.shape[1]
    assert num_samples <= 128
    # Sort queries by distance to the scan origin (points[:, 0]) so each
    # 128-query tile is spatially coherent: in pipelines the points arrive
    # sorted by distance from a seed, so a coherent tile's balls all fill in
    # the same chunk neighborhood and the kernel's early exit engages tile by
    # tile instead of waiting on the farthest query. A pure permutation —
    # bit-identical outputs after the unsort.
    d0 = jnp.sum((queries - points[:, :1]) ** 2, axis=-1)  # [B, S]
    order = jnp.argsort(d0, axis=1)
    inv_order = jnp.argsort(order, axis=1)
    queries = jnp.take_along_axis(queries, order[..., None], axis=1)
    n_pad = -(-N // chunk) * chunk
    C = n_pad // chunk
    coords = jnp.moveaxis(points, -1, 1)
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - N)))
    planes = coords.reshape(B, 3, C, chunk)
    x, y, z = planes[:, 0], planes[:, 1], planes[:, 2]
    s_pad = -(-S // 128) * 128
    if s_pad != S:
        queries = jnp.pad(queries, ((0, 0), (0, s_pad - S), (0, 0)))
    kernel = functools.partial(
        _ball_query_kernel,
        radius_sqr=float(radius) ** 2,
        num_samples=num_samples,
        n_points=N,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, s_pad // 128),
        in_specs=[
            pl.BlockSpec((1, C, chunk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, chunk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, chunk), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, num_samples), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, num_samples), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.VMEM((128, num_samples), jnp.int32),
        ],
        # the Hillis-Steele rank scan keeps a few [128, W] i32 temporaries
        # live; at W >= 4096 that exceeds the default 16MB scoped-VMEM cap
        # (measured 18.2MB at W=4096) while fitting the chip's VMEM easily
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, y, z, queries)
    return jnp.take_along_axis(out[:, :S], inv_order[..., None], axis=1)


def _fps_batched_kernel(
    x_ref, y_ref, z_ref, out_ref, dist_ref, *, num_samples, n_pad
):
    """All batch items in ONE program, vectorized over the batch axis.

    The grid=(B,) kernel runs B sequential programs of m serial steps each
    (B*m dependent VPU sweeps); here every iteration updates all batches at
    once, so the serial chain is m steps regardless of B.

    Everything stays 2-D — (B, n_pad) planes, (B, 1) per-batch scalars —
    because Mosaic supports lane-axis keepdims reductions and minor-dim
    broadcasts but NOT rank-changing reshapes like (B,) -> (B, 1, 1).
    The selected index lands in out_ref via a masked column write (the
    (B, num_samples) where-op is negligible next to the (B, n_pad) sweep).
    Refs: x/y/z [B, n_pad]; out_ref [B, num_samples] i32 VMEM;
    dist_ref [B, n_pad] f32 scratch.
    """
    B, N = x_ref.shape
    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]
    # invalid entries live in the distance buffer as -1 (see _fps_kernel):
    # min(-1, d) = -1 for every real d >= 0, so the per-iteration validity
    # `where` sweeps vanish with bit-identical outputs
    valid = (x * x + y * y + z * z) > 1e-3
    dist_ref[...] = jnp.where(valid, 1e10, -1.0).astype(jnp.float32)
    point_iota = lax.broadcasted_iota(jnp.int32, (B, N), 1)
    col_iota = lax.broadcasted_iota(jnp.int32, (B, num_samples), 1)
    out_ref[...] = jnp.zeros((B, num_samples), jnp.int32)

    def body(j, last):
        sel = point_iota == last
        px = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        new_dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = new_dist
        m = jnp.max(new_dist, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(new_dist == m, point_iota, n_pad),
            axis=1, keepdims=True,
        ).astype(jnp.int32)
        out_ref[...] = jnp.where(col_iota == j, nxt, out_ref[...])
        return nxt

    lax.fori_loop(1, num_samples, body, jnp.zeros((B, 1), jnp.int32))


# beyond this many points the batched kernel's VMEM residency (4 f32 planes)
# would not fit; fall back to the one-batch-per-program kernel
_FPS_BATCHED_MAX_POINTS = 2_000_000


@functools.lru_cache(maxsize=None)
def _fps_custom_vmap(num_samples: int):
    """custom_vmap wrapper: flatten vmap batch dims into the kernel's own
    batch axis instead of letting jax prepend a Pallas grid dimension.

    TPU grid iterations are SEQUENTIAL, and FPS is a `num_samples`-step
    serial chain per program — so default-vmapping the kernel over a
    group axis of G multiplies the serial chain to G*m steps. The packed
    serving path vmaps whole cascade graphs over the cloud group
    (tools/bucket_diag.py measured its vmapped width-8 phase 2 SLOWER per
    patch-slot than one 32-wide stack for exactly this reason). Flattened
    into the batched kernel, every group size shares one m-step chain."""

    @jax.custom_batching.custom_vmap
    def f(points):
        return _fps_dispatch(points, num_samples)

    @f.def_vmap
    def _rule(axis_size, in_batched, points):
        del axis_size
        if not in_batched[0]:
            return f(points), False
        V, B, N, C = points.shape
        out = f(points.reshape(V * B, N, C))
        return out.reshape(V, B, num_samples), True

    return f


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample_pallas(
    points: jax.Array, num_samples: int
) -> jax.Array:
    """[B, N, 3] -> [B, num_samples] int32. See module docstring."""
    return _fps_custom_vmap(num_samples)(points)


def _fps_dispatch(points: jax.Array, num_samples: int) -> jax.Array:
    B, N, _ = points.shape
    if B > 1 and B * N <= _FPS_BATCHED_MAX_POINTS:
        import os

        # round-5 latency rework, opt-in until the hardware sweep
        # (tools/fps_variants_time.py) decides the default; bit-identical
        if os.environ.get("CPFN_FPS_STACKED", "") not in ("", "0"):
            # Mosaic lowers fori_loop only at unroll=1 or a full unroll of
            # the trip count; clamp anything else to 1 instead of failing
            # at compile (measured: partial unrolls raise NotImplementedError
            # in mosaic/lowering.py on hardware, 2026-08-21)
            unroll = int(os.environ.get("CPFN_FPS_UNROLL", "1"))
            if unroll not in (1, num_samples - 1):
                unroll = 1
            return _farthest_point_sample_pallas_stacked(
                points, num_samples, unroll=unroll,
            )
        return _farthest_point_sample_pallas_batched(points, num_samples)
    n_pad = -(-N // _LANES) * _LANES
    R = n_pad // _LANES
    coords = jnp.moveaxis(points, -1, 1)  # [B, 3, N]
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - N)))
    planes = coords.reshape(B, 3, R, _LANES)
    x, y, z = planes[:, 0], planes[:, 1], planes[:, 2]
    kernel = functools.partial(
        _fps_kernel, num_samples=num_samples, n_pad=n_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # whole-array SMEM output: the grid is a sequential loop on TPU, each
        # step writes its own row (scalar stores require SMEM)
        out_specs=pl.BlockSpec((B, num_samples), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, _LANES), jnp.float32)],
    )(x, y, z)
    return out


@functools.partial(jax.jit, static_argnames=("num_samples",))
def _farthest_point_sample_pallas_batched(
    points: jax.Array, num_samples: int
) -> jax.Array:
    B, N, _ = points.shape
    n_pad = -(-N // _LANES) * _LANES
    coords = jnp.moveaxis(points, -1, 1)
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - N)))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    kernel = functools.partial(
        _fps_batched_kernel, num_samples=num_samples, n_pad=n_pad
    )
    spec = pl.BlockSpec((B, n_pad), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((B, num_samples), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, n_pad), jnp.float32)],
        # the custom_vmap flattening routes grouped GLOBAL clouds here
        # (e.g. a packed group of 8 x 100k points): 4 [B, n_pad] f32 planes
        # exceed the 16MB default scoped-VMEM cap at ~500k+ points
        # (measured 21.2MB at 8 x 100k) while fitting the chip's VMEM
        # easily — same raise as the ball-query kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(x, y, z)
    return out


def _fps_batched_kernel_stacked(
    xyz_ref, out_ref, dist_ref, *, num_samples, n_pad, n_batch, unroll
):
    """Latency-rework variant of `_fps_batched_kernel` (round 5).

    The sequential FPS chain is ~27us/iteration on the v5e — far above the
    ~1us the VPU needs for the [B, N] elementwise volume, i.e. per-op
    overhead inside the Mosaic loop body dominates. Two reworks:

      1. Coordinates live in ONE [3B, N] plane (x rows, then y rows, then z
         rows). The selected point's coordinates come out of a single
         masked-sum lane reduction over [3B, N] instead of three separate
         [B, N] reductions, and the squared distance is two static-slice
         adds (`dsq[:B] + dsq[B:2B] + dsq[2B:3B]`) — sublane blocks of B
         rows are 8-aligned for all production batch sizes.
      2. `lax.fori_loop(..., unroll=k)` amortizes loop bookkeeping across
         k picks (the serial dependency is unchanged; only the loop
         carries fewer trips).

    Outputs are bit-identical to `_fps_batched_kernel` (same reduction
    orders per element; validity encoded in the distance buffer the same
    way). Refs: xyz [3B, n_pad]; out [B, num_samples] i32; dist [B, n_pad].
    """
    B = n_batch
    N = xyz_ref.shape[1]
    xyz = xyz_ref[...]
    x = xyz[:B]
    y = xyz[B : 2 * B]
    z = xyz[2 * B :]
    valid = (x * x + y * y + z * z) > 1e-3
    dist_ref[...] = jnp.where(valid, 1e10, -1.0).astype(jnp.float32)
    iota3 = lax.broadcasted_iota(jnp.int32, (3 * B, N), 1)
    point_iota = lax.broadcasted_iota(jnp.int32, (B, N), 1)
    col_iota = lax.broadcasted_iota(jnp.int32, (B, num_samples), 1)
    out_ref[...] = jnp.zeros((B, num_samples), jnp.int32)

    def body(j, last3):
        sel3 = iota3 == last3
        coords3 = jnp.sum(
            jnp.where(sel3, xyz, 0.0), axis=1, keepdims=True
        )  # [3B, 1]
        diff = xyz - coords3
        dsq = diff * diff
        d = dsq[:B] + dsq[B : 2 * B] + dsq[2 * B :]
        new_dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = new_dist
        m = jnp.max(new_dist, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(new_dist == m, point_iota, n_pad),
            axis=1, keepdims=True,
        ).astype(jnp.int32)
        out_ref[...] = jnp.where(col_iota == j, nxt, out_ref[...])
        return jnp.concatenate([nxt, nxt, nxt], axis=0)

    lax.fori_loop(
        1, num_samples, body, jnp.zeros((3 * B, 1), jnp.int32),
        unroll=unroll,
    )


@functools.partial(
    jax.jit, static_argnames=("num_samples", "unroll")
)
def _farthest_point_sample_pallas_stacked(
    points: jax.Array, num_samples: int, unroll: int = 1
) -> jax.Array:
    """[B, N, 3] -> [B, num_samples] int32 via the stacked-plane batched
    kernel; bit-identical to `_farthest_point_sample_pallas_batched`.

    On hardware, Mosaic's scan lowering accepts only unroll=1 or a full
    unroll of the trip count (num_samples - 1) — the env dispatch in
    `farthest_point_sample_pallas` clamps accordingly; partial unrolls
    stay exercisable in interpret mode (tests/test_pallas_interpret.py
    calls the kernel via `__wrapped__`).
    """
    B, N, _ = points.shape
    n_pad = -(-N // _LANES) * _LANES
    coords = jnp.moveaxis(points, -1, 1)  # [B, 3, N]
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - N)))
    # [3B, n_pad] with x rows first, then y rows, then z rows
    xyz = jnp.concatenate(
        [coords[:, 0], coords[:, 1], coords[:, 2]], axis=0
    )
    kernel = functools.partial(
        _fps_batched_kernel_stacked,
        num_samples=num_samples, n_pad=n_pad, n_batch=B, unroll=unroll,
    )
    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec((3 * B, n_pad), lambda: (0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((B, num_samples), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(xyz)
    return out


def _fps_seeded_kernel(
    x_ref, y_ref, z_ref, init_ref, out_ref, dist_ref, *,
    num_samples, n_pad, n_points
):
    """Seeded-init FPS for the preprocessing subsample
    (`preprocess/lowres.py`): the running min-distance buffer starts from a
    caller-provided plane (1e6 everywhere, 0 at the per-label seed points —
    the reference's global-FPS re-init, `preprocessing_sampling_lowres.py:
    20-26`) and the first pick is the argmax of that init, not index 0.
    Distances are squared where the host/XLA paths use euclidean; argmax is
    invariant under the monotone map, so selections agree up to f32
    near-ties (same caveat as `lowres._device_fps_fn`). No near-origin skip:
    validity is positional (real point vs lane padding).
    Refs: x/y/z/init [1, R, 128] VMEM; out [1, m] i32 SMEM;
    dist [R, 128] f32 scratch.
    """
    R = x_ref.shape[1]
    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    flat_iota = (
        lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
        + lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    )
    # positional padding is encoded once in the distance buffer as -1
    # (init values are >= 0 and min(-1, d) = -1 for d >= 0), dropping the
    # per-iteration validity `where` — see _fps_kernel
    valid = flat_iota < n_points
    dist_ref[:] = jnp.where(valid, init_ref[0], -1.0)
    masked0 = dist_ref[:]
    m0 = jnp.max(masked0)
    first = jnp.min(jnp.where(masked0 == m0, flat_iota, n_pad))
    out_ref[0, 0] = first

    def body(j, last):
        sel = flat_iota == last
        px = jnp.sum(jnp.where(sel, x, 0.0))
        py = jnp.sum(jnp.where(sel, y, 0.0))
        pz = jnp.sum(jnp.where(sel, z, 0.0))
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        new_dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = new_dist
        m = jnp.max(new_dist)
        nxt = jnp.min(jnp.where(new_dist == m, flat_iota, n_pad))
        out_ref[0, j] = nxt
        return nxt

    lax.fori_loop(1, num_samples, body, first)


def farthest_point_sample_seeded_pallas(
    points: jax.Array, init_mind: jax.Array, num_samples: int
) -> jax.Array:
    """[N, 3] points + [N] f32 initial min-distances -> [num_samples] i32.

    The whole `num_samples`-step sequential chain runs in one program with
    the coordinate planes and distance state VMEM-resident — the XLA
    fori_loop equivalent in `lowres._device_fps_fn` dispatches the same
    chain as ~m dependent device ops (~0.75 s at 100k->8192 over the
    tunneled runtime vs ~0.1 s here).
    """
    N, _ = points.shape
    n_pad = -(-N // _LANES) * _LANES
    R = n_pad // _LANES
    coords = jnp.moveaxis(points, -1, 0)  # [3, N]
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, n_pad - N)))
        init_mind = jnp.pad(
            init_mind, (0, n_pad - N), constant_values=-1.0
        )
    planes = coords.reshape(3, 1, R, _LANES)
    init = init_mind.astype(jnp.float32).reshape(1, R, _LANES)
    kernel = functools.partial(
        _fps_seeded_kernel,
        num_samples=num_samples, n_pad=n_pad, n_points=N,
    )
    spec = pl.BlockSpec((1, R, _LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec((1, num_samples), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, _LANES), jnp.float32)],
    )(planes[0], planes[1], planes[2], init)
    return out[0]
