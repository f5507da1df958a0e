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
    valid = (x * x + y * y + z * z) > 1e-3
    dist_ref[:] = jnp.full((R, _LANES), 1e10, jnp.float32)
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
        new_dist = jnp.where(valid, jnp.minimum(dist_ref[:], d), dist_ref[:])
        dist_ref[:] = new_dist
        masked = jnp.where(valid, new_dist, -1.0)
        m = jnp.max(masked)
        # first index achieving the max (lowest flat index)
        nxt = jnp.min(jnp.where(masked == m, flat_iota, n_pad))
        out_ref[b, j] = nxt
        return nxt

    lax.fori_loop(1, num_samples, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample_pallas(
    points: jax.Array, num_samples: int
) -> jax.Array:
    """[B, N, 3] -> [B, num_samples] int32. See module docstring."""
    B, N, _ = points.shape
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
