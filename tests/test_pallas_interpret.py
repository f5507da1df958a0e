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
    from cpfn_tpu.ops.pallas_kernels import _LANES, _fps_batched_kernel

    B, N, _ = points.shape
    n_pad = -(-N // _LANES) * _LANES
    R = n_pad // _LANES
    coords = jnp.moveaxis(points, -1, 1)
    if n_pad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad - N)))
    planes = coords.reshape(B, 3, R, _LANES)
    kernel = functools.partial(
        _fps_batched_kernel, num_samples=num_samples, n_pad=n_pad
    )
    spec = pl.BlockSpec((B, R, _LANES), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((num_samples, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_samples, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, R, _LANES), jnp.float32)],
        interpret=True,
    )(planes[:, 0], planes[:, 1], planes[:, 2])
    return out.T


def test_fps_batched_kernel_interpret(rng):
    P = jnp.asarray(rng.randn(3, 300, 3), jnp.float32)
    got = _interpret_fps_batched(P, 32)
    ref = ops.farthest_point_sample(P, 32, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


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
