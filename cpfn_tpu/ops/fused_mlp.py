"""Fused eval-mode MLP-chain Pallas kernels for the PointNet++ hot path.

Roofline verdict for the LocalSPFN forward (utils/roofline.py): bytes-bound
at ~7 FLOP/byte vs the ~120 FLOP/byte v5e crossover. The traffic is the
per-layer materialization of the grouped pair tensors — SA1 alone writes+
reads three [B, S, K, C] activations (C=64..128) to HBM, ~7 GB of the
~17 GB graph total, where the *inputs* (relative positions, 3 channels) are
only ~25 MB. These kernels keep the channel-expanded intermediates in VMEM:

  fused_mlp_maxpool   [B, S*K, Cin] -> linear+BN(eval)+ReLU chain -> max
                      over each center's K contiguous rows -> [B, S, Cout]
                      (the SA blocks' grouped MLP + pool,
                      reference pointset_abstraction.py:62-77)
  fused_mlp_pointwise [B, N, Cin] -> chain -> [B, N, Cout]
                      (the FP blocks' per-point MLP,
                      reference pointset_feature_propagation.py:38-47)

Eval-only: BN running statistics are folded into the linear weights
(`fold_bn_eval`), so train-mode batch statistics keep the XLA path. The
gather/grouping stays in XLA (only 3..131-channel tensors touch HBM).

Mosaic safety rules follow the existing kernels (PERF.md): refs stay 2-D
inside the kernel ([1, R, C] blocks indexed to [R, C]), static-size slices,
list+concatenate instead of strided writes, no rank-changing reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5

# VMEM budget for one tile's activation chain (bytes); the real budget is
# ~16 MB/core, leave headroom for weights and double-buffering
_TILE_BYTES = 6 * 1024 * 1024


def fold_bn_eval(mlp_params: dict, mlp_state: dict, eps: float = BN_EPS):
    """Fold eval-mode BN into the linear layers of one `_mlp_init` stack:
    y = (xW + b - mean) * rsqrt(var+eps) * scale + bias
      = x (W*inv) + ((b - mean) * inv + bias),  inv = rsqrt(var+eps)*scale.
    Returns [(w [Ci,Co], b [Co]), ...] in f32."""
    out = []
    for conv, bn, bn_state in zip(
        mlp_params["convs"], mlp_params["bns"], mlp_state["bns"]
    ):
        inv = jax.lax.rsqrt(bn_state["var"] + eps) * bn["scale"]
        w = conv["w"] * inv[None, :]
        b = (conv["b"] - bn_state["mean"]) * inv + bn["bias"]
        out.append((w, b))
    return out


def _chain(h, wb_refs, compute_dtype):
    """Apply the folded linear+ReLU chain to h [R, C] inside the kernel."""
    n_layers = len(wb_refs) // 2
    for i in range(n_layers):
        w = wb_refs[2 * i][...]
        b = wb_refs[2 * i + 1][...]  # [1, Co]
        if compute_dtype is not None:
            hd, wd = h.astype(compute_dtype), w.astype(compute_dtype)
        else:
            hd, wd = h, w
        h = (
            jnp.dot(hd, wd, preferred_element_type=jnp.float32) + b
        )
        h = jnp.maximum(h, 0.0)
    return h


def _pool_kernel(x_ref, *wb_and_out, group_size, tile_s, compute_dtype):
    wb_refs, out_ref = wb_and_out[:-1], wb_and_out[-1]
    h = _chain(x_ref[0], wb_refs, compute_dtype)  # [tile_s*K, Cout]
    cols = [
        jnp.max(h[s * group_size : (s + 1) * group_size], axis=0,
                keepdims=True)
        for s in range(tile_s)
    ]
    out_ref[0] = jnp.concatenate(cols, axis=0).astype(out_ref.dtype)


def _pointwise_kernel(x_ref, *wb_and_out, compute_dtype):
    wb_refs, out_ref = wb_and_out[:-1], wb_and_out[-1]
    out_ref[0] = _chain(x_ref[0], wb_refs, compute_dtype).astype(out_ref.dtype)


def _tile_rows(cin: int, widths, group_size: int) -> int:
    """Largest power-of-two center tile whose activation chain fits VMEM."""
    per_row = 4 * (cin + sum(widths))
    rows = max(_TILE_BYTES // per_row, group_size)
    tile_s = max(rows // group_size, 1)
    # power-of-two for clean grid divisions
    p = 1
    while p * 2 <= tile_s:
        p *= 2
    return p


def _wb_specs(folded):
    specs, args = [], []
    for w, b in folded:
        specs.append(pl.BlockSpec(w.shape, lambda *_: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(w)
        specs.append(pl.BlockSpec((1, b.shape[0]), lambda *_: (0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(b.reshape(1, -1))
    return specs, args


@functools.partial(
    jax.jit, static_argnames=("group_size", "compute_dtype", "out_dtype")
)
def fused_mlp_maxpool(
    x: jax.Array, folded, group_size: int, compute_dtype=None, out_dtype=None
) -> jax.Array:
    """x: [B, S*K, Cin] with each center's K rows contiguous (s-major);
    folded: list of (w, b) from `fold_bn_eval`. Returns [B, S, Cout]
    (f32, or `out_dtype` for the bf16 activation pipeline — the chain still
    accumulates in f32 and only the HBM store is low-precision)."""
    B, R, cin = x.shape
    K = group_size
    S = R // K
    widths = [w.shape[1] for w, _ in folded]
    tile_s = min(_tile_rows(cin, widths, K), S)
    while S % tile_s:
        tile_s //= 2
    grid = (B, S // tile_s)
    kernel = functools.partial(
        _pool_kernel, group_size=K, tile_s=tile_s,
        compute_dtype=jnp.dtype(compute_dtype) if compute_dtype else None,
    )
    wb_specs, wb_args = _wb_specs(folded)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_s * K, cin), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec((1, tile_s, widths[-1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, S, widths[-1]), jnp.dtype(out_dtype) if out_dtype else jnp.float32
        ),
    )(x, *wb_args)
    return out


@functools.partial(jax.jit, static_argnames=("compute_dtype", "out_dtype"))
def fused_mlp_pointwise(
    x: jax.Array, folded, compute_dtype=None, out_dtype=None
) -> jax.Array:
    """x: [B, N, Cin] -> [B, N, Cout] through the folded chain (f32 out, or
    `out_dtype` for the bf16 activation pipeline)."""
    B, N, cin = x.shape
    widths = [w.shape[1] for w, _ in folded]
    tile_n = min(_tile_rows(cin, widths, 1), N)
    n_pad = -(-N // tile_n) * tile_n
    if n_pad != N:  # e.g. the 100k-pt global cloud: pad rows, slice back
        x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
    grid = (B, n_pad // tile_n)
    kernel = functools.partial(
        _pointwise_kernel,
        compute_dtype=jnp.dtype(compute_dtype) if compute_dtype else None,
    )
    wb_specs, wb_args = _wb_specs(folded)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, cin), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec((1, tile_n, widths[-1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_pad, widths[-1]),
            jnp.dtype(out_dtype) if out_dtype else jnp.float32,
        ),
    )(x, *wb_args)
    return out[:, :N]
