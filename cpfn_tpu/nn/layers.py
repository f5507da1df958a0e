"""Minimal functional layer kit: pointwise linear (1x1 conv), batch norm with
an externally scheduled momentum, dropout.

Pure functions over explicit pytrees — no module framework. This keeps the
BN-momentum schedule (`Utils/training_utils.py:9-22`: momentum decayed by
global step, updated module-wide) a plain scalar argument instead of mutable
module state, and makes sharding the parameter tree trivial.

Initialization matches torch Conv defaults (kaiming_uniform(a=sqrt(5)) ==
U(±1/sqrt(fan_in)) for weights, U(±1/sqrt(fan_in)) for bias) so training
dynamics are comparable to the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm default


def linear_init(key: jax.Array, cin: int, cout: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(cin))
    return {
        "w": jax.random.uniform(kw, (cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), dtype, -bound, bound),
    }


def linear_apply(
    params, x: jax.Array, compute_dtype=None, out_dtype=None
) -> jax.Array:
    """x: [..., cin] -> [..., cout]. The pointwise (1x1) convolution.

    With compute_dtype=bfloat16 the matmul inputs are cast down (params stay
    f32) and the MXU accumulates in f32 — the standard TPU mixed-precision
    recipe. NOTE: the TPU MXU truncates f32 matmul inputs to bf16 by default
    anyway (jax default_matmul_precision), so the cast alone changes neither
    numerics nor speed there; the real bytes-bound lever is `out_dtype`,
    which keeps the ACTIVATION in low precision between ops and halves the
    HBM traffic of every [B, S, K, C] / [B, N, C] intermediate.
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = (
        jnp.einsum(
            "...i,io->...o", x, w, preferred_element_type=jnp.float32,
        )
        + params["b"]
    )
    return y.astype(out_dtype) if out_dtype is not None else y


def bn_init(c: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def bn_apply(
    params,
    state,
    x: jax.Array,
    *,
    train: bool,
    momentum,
    eps: float = BN_EPS,
    axis_name: str | None = None,
    out_dtype=None,
):
    """Batch norm over all axes but the last (channel) axis.

    torch semantics: normalize with biased batch statistics in train mode,
    with running statistics in eval mode; running stats updated as
    new = (1 - momentum) * old + momentum * batch, where the *variance*
    update uses the unbiased batch variance. `momentum` may be a traced
    scalar (the schedule changes it every step without recompilation).

    If `axis_name` is set, batch statistics are all-reduced across that mesh
    axis (sync BN for data-parallel training).

    In eval mode with `out_dtype` set, the running-stat normalization is
    folded into a per-channel affine computed in f32 and applied in
    out_dtype — the bf16 activation pipeline (statistics always stay f32).
    """
    if not train and out_dtype is not None:
        inv = jax.lax.rsqrt(state["var"] + eps) * params["scale"]
        shift = params["bias"] - state["mean"] * inv
        y = x.astype(out_dtype) * inv.astype(out_dtype) + shift.astype(
            out_dtype
        )
        return y, state
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=reduce_axes)
        mean2 = jnp.mean(x * x, axis=reduce_axes)
        count = x.size // x.shape[-1]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
            count = count * jax.lax.psum(1, axis_name)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        bessel = count / max(count - 1, 1)
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * var * bessel,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    return (x - mean) * inv + params["bias"], new_state


def dropout(key: jax.Array | None, x: jax.Array, rate: float, *, train: bool):
    """Inverted dropout; identity when not training.

    NOTE: the reference calls `F.dropout(x, p=0.5)` without `training=`
    (`pn2_network.py:63`), which keeps dropout active even in eval — an
    upstream bug we deliberately do not reproduce.
    """
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
