"""Pallas kernels in interpret mode on the CPU mesh: catches kernel-logic
regressions in the default (CPU) suite, complementing the on-hardware runs in
test_pallas_tpu.py. Small shapes only — interpret mode executes the kernel
loop in Python."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpfn_tpu import ops


def _interpret_fps_batched(points, num_samples):
    # run the PRODUCTION wrapper with interpret=True patched in, so the test
    # exercises exactly the layouts/specs the hardware path uses
    from cpfn_tpu.ops import pallas_kernels

    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pallas_kernels.pl.pallas_call = call_interpret
        return pallas_kernels._farthest_point_sample_pallas_batched.__wrapped__(
            points, num_samples
        )
    finally:
        pallas_kernels.pl.pallas_call = old_call


def test_fps_batched_kernel_interpret(rng):
    P = jnp.asarray(rng.randn(3, 300, 3), jnp.float32)
    got = _interpret_fps_batched(P, 32)
    ref = ops.farthest_point_sample(P, 32, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_batched_kernel_near_origin_interpret(rng):
    """The CUDA near-origin rule (||p||^2 <= 1e-3 points are never selected
    and never update the running distance) is now encoded as a -1 distance
    at init rather than per-iteration mask sweeps; random test data almost
    never produces such points, so pin them explicitly: exact-origin
    points, just-inside points (1e-3 boundary is <=), and just-outside
    points, scattered through the batch."""
    P = rng.randn(3, 300, 3).astype(np.float32)
    P[0, 5] = 0.0                                  # exact origin
    P[0, 250] = [0.018, 0.018, 0.0]                # |p|^2 = 6.5e-4 <= 1e-3
    P[1, 0] = 0.0                                  # the forced first pick!
    P[2, 100:110] = 1e-4                           # a run of near-origin
    P[2, 110] = [0.032, 0.0, 0.0]                  # 1.02e-3 > 1e-3: valid
    P = jnp.asarray(P)
    got = _interpret_fps_batched(P, 32)
    ref = ops.farthest_point_sample(P, 32, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # invalid points never appear after the forced index-0 start
    got_np = np.asarray(got)
    assert not np.isin(got_np[0, 1:], [5, 250]).any()
    assert not np.isin(got_np[2, 1:], np.arange(100, 110)).any()


def test_ball_query_kernel_interpret(rng):
    from cpfn_tpu.ops import pallas_kernels

    # patch the chunk width down so the tiny cloud spans several chunks and
    # the streaming merge/early-exit logic is exercised
    old = pallas_kernels._BQ_CHUNK
    pallas_kernels._BQ_CHUNK = 128
    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pl.pallas_call = call_interpret
        pallas_kernels.pl.pallas_call = call_interpret
        P = jnp.asarray(rng.randn(2, 400, 3) * 0.5, jnp.float32)
        q = P[:, :130]
        got = pallas_kernels.ball_query_pallas.__wrapped__(P, q, 0.4, 8)
    finally:
        pallas_kernels._BQ_CHUNK = old
        pl.pallas_call = old_call
        pallas_kernels.pl.pallas_call = old_call
    ref = ops.ball_query(P, q, 0.4, 8, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_kernel_vmap_interpret(rng):
    """The packed serving path vmaps whole cascade graphs (and thus the
    Pallas kernels) over a cloud-group axis. jax batches pallas_call by
    prepending a grid dimension, which shifts `pl.program_id` numbering —
    this pins that the production wrappers stay exact under vmap."""
    from cpfn_tpu.ops import pallas_kernels

    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pallas_kernels.pl.pallas_call = call_interpret
        P = jnp.asarray(rng.randn(3, 2, 300, 3), jnp.float32)
        got = jax.vmap(
            lambda p: pallas_kernels._farthest_point_sample_pallas_batched
            .__wrapped__(p, 32)
        )(P)
        # the grid=(B,) single-program variant (the 100k global-cloud path;
        # indexes its SMEM output by pl.program_id, the part vmap's
        # grid-prepend batching could plausibly break)
        P1 = jnp.asarray(rng.randn(3, 1, 300, 3), jnp.float32)
        got1 = jax.vmap(
            lambda p: pallas_kernels.farthest_point_sample_pallas(p, 32)
        )(P1)
    finally:
        pallas_kernels.pl.pallas_call = old_call
    ref = jax.vmap(
        lambda p: ops.farthest_point_sample(p, 32, impl="xla")
    )(P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    ref1 = jax.vmap(
        lambda p: ops.farthest_point_sample(p, 32, impl="xla")
    )(P1)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref1))


def test_ball_query_kernel_vmap_interpret(rng):
    """Same vmap guarantee for the streaming ball-query kernel."""
    from cpfn_tpu.ops import pallas_kernels

    old = pallas_kernels._BQ_CHUNK
    pallas_kernels._BQ_CHUNK = 128
    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pl.pallas_call = call_interpret
        pallas_kernels.pl.pallas_call = call_interpret
        P = jnp.asarray(rng.randn(2, 2, 400, 3) * 0.5, jnp.float32)
        q = P[:, :, :130]
        got = jax.vmap(
            lambda p, qq: pallas_kernels.ball_query_pallas.__wrapped__(
                p, qq, 0.4, 8
            )
        )(P, q)
    finally:
        pallas_kernels._BQ_CHUNK = old
        pl.pallas_call = old_call
        pallas_kernels.pl.pallas_call = old_call
    ref = jax.vmap(
        lambda p, qq: ops.ball_query(p, qq, 0.4, 8, impl="xla")
    )(P, q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lowres_seeded_fps_interpret_matches_xla(rng):
    """The preprocessing device-FPS graph (`lowres._device_fps_fn`) must
    select the same subsample whether its global phase runs as the XLA
    fori_loop or the seeded Pallas kernel (squared-distance space; argmax is
    invariant under the monotone map at this fixture's seed)."""
    from cpfn_tpu.ops import pallas_kernels
    from cpfn_tpu.preprocess import lowres

    pts = rng.randn(500, 3).astype(np.float32)
    labels = rng.randint(0, 5, 500).astype(np.int32)
    n_unique = len(np.unique(labels))

    lowres._device_fps_fn.cache_clear()
    fx = lowres._device_fps_fn(500, 64, 28, impl="xla")
    sx, rx = fx(
        jnp.asarray(pts), jnp.asarray(labels),
        jnp.int32(3), jnp.int32(n_unique),
    )

    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pallas_kernels.pl.pallas_call = call_interpret
        fp = lowres._device_fps_fn(500, 64, 28, impl="pallas")
        sp, rp = fp(
            jnp.asarray(pts), jnp.asarray(labels),
            jnp.int32(3), jnp.int32(n_unique),
        )
    finally:
        pallas_kernels.pl.pallas_call = old_call
        lowres._device_fps_fn.cache_clear()

    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
    # every label survives the subsample (the CLI's own invariant)
    idx = np.concatenate([np.asarray(sp)[:n_unique], np.asarray(rp)])
    assert len(np.unique(labels[idx])) == n_unique


def test_ball_query_kernel_interpret_explicit_chunks(rng):
    """The chunk width is a tuning knob (CPFN_BQ_CHUNK / `chunk` arg); any
    width must produce identical indices, including when N is not a chunk
    multiple (pad lanes masked by `flat < n_points`)."""
    from cpfn_tpu.ops import pallas_kernels

    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pl.pallas_call = call_interpret
        pallas_kernels.pl.pallas_call = call_interpret
        P = jnp.asarray(rng.randn(2, 700, 3) * 0.5, jnp.float32)
        q = P[:, :130]
        got = {
            c: pallas_kernels.ball_query_pallas.__wrapped__(
                P, q, 0.4, 8, chunk=c
            )
            for c in (128, 256, 512)
        }
    finally:
        pl.pallas_call = old_call
        pallas_kernels.pl.pallas_call = old_call
    ref = ops.ball_query(P, q, 0.4, 8, impl="xla")
    for c, g in got.items():
        np.testing.assert_array_equal(np.asarray(g), np.asarray(ref),
                                      err_msg=f"chunk={c}")


def _interpret_fps_stacked(points, num_samples, unroll=4):
    from cpfn_tpu.ops import pallas_kernels

    old_call = pl.pallas_call
    try:
        def call_interpret(*a, **k):
            k["interpret"] = True
            return old_call(*a, **k)

        pallas_kernels.pl.pallas_call = call_interpret
        return pallas_kernels._farthest_point_sample_pallas_stacked.__wrapped__(
            points, num_samples, unroll
        )
    finally:
        pallas_kernels.pl.pallas_call = old_call


def test_fps_stacked_kernel_interpret(rng):
    """The round-5 stacked-plane latency rework must be bit-identical to the
    XLA path (and hence to the original batched kernel) — including at an
    unroll that does not divide the trip count."""
    P = jnp.asarray(rng.randn(3, 300, 3), jnp.float32)
    ref = ops.farthest_point_sample(P, 32, impl="xla")
    for unroll in (1, 4):
        got = _interpret_fps_stacked(P, 32, unroll)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_stacked_kernel_near_origin_interpret(rng):
    P = rng.randn(3, 300, 3).astype(np.float32)
    P[0, 5] = 0.0
    P[0, 250] = [0.018, 0.018, 0.0]
    P[1, 0] = 0.0
    P[2, 100:110] = 1e-4
    P[2, 110] = [0.032, 0.0, 0.0]
    P = jnp.asarray(P)
    got = _interpret_fps_stacked(P, 32)
    ref = ops.farthest_point_sample(P, 32, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
