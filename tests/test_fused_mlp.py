"""Fused eval-mode MLP kernels (ops/fused_mlp.py) vs the XLA path, in
interpret mode on CPU (kernel-logic parity; Mosaic-lowering parity runs on
hardware via tests/test_pallas_tpu.py)."""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cpfn_tpu.nn import PointNet2Config, apply_pointnet2, init_pointnet2  # noqa: E402
from cpfn_tpu.nn.pointnet2 import _mlp_apply, _mlp_init  # noqa: E402
from cpfn_tpu.ops import fused_mlp  # noqa: E402


def _interpret(fn):
    """Run `fn` with fused_mlp's pallas_call patched to interpret mode."""

    @functools.wraps(fn)
    def wrapper(*a, **k):
        orig = fused_mlp.pl.pallas_call

        def call_interpret(*ca, **ck):
            ck["interpret"] = True
            return orig(*ca, **ck)

        fused_mlp.pl.pallas_call = call_interpret
        try:
            return fn(*a, **k)
        finally:
            fused_mlp.pl.pallas_call = orig

    return wrapper


def _random_bn_state(rng, state):
    """Non-trivial running stats so the folding math is actually exercised."""
    return {
        "bns": [
            {
                "mean": jnp.asarray(rng.randn(s["mean"].shape[0]) * 0.3,
                                    jnp.float32),
                "var": jnp.asarray(
                    0.5 + rng.rand(s["var"].shape[0]), jnp.float32
                ),
            }
            for s in state["bns"]
        ]
    }


@_interpret
def test_maxpool_matches_xla_path(rng):
    B, S, K, C = 2, 8, 4, 5
    params, state = _mlp_init(jax.random.PRNGKey(0), C, (16, 32))
    state = _random_bn_state(rng, state)
    x = jnp.asarray(rng.randn(B, S, K, C), jnp.float32)

    ref, _ = _mlp_apply(params, state, x, train=False, momentum=0.5)
    ref = jnp.max(ref, axis=2)

    got = fused_mlp.fused_mlp_maxpool(
        x.reshape(B, S * K, C), fused_mlp.fold_bn_eval(params, state), K
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@_interpret
def test_pointwise_matches_xla_path(rng):
    B, N, C = 2, 16, 7
    params, state = _mlp_init(jax.random.PRNGKey(1), C, (8, 8, 16))
    state = _random_bn_state(rng, state)
    x = jnp.asarray(rng.randn(B, N, C), jnp.float32)

    ref, _ = _mlp_apply(params, state, x, train=False, momentum=0.5)
    got = fused_mlp.fused_mlp_pointwise(
        x, fused_mlp.fold_bn_eval(params, state)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@_interpret
def test_full_forward_parity(rng):
    """apply_pointnet2 with fused_eval_mlp on vs off (eval mode)."""
    tiny = dict(
        sa1_points=8, sa2_points=4, sa1_samples=4, sa2_samples=4,
        sa1_mlp=(8, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
        fp1_mlp=(16, 16), fp2_mlp=(16, 8), fp3_mlp=(8, 8), fc_dim=8,
    )
    cfg = PointNet2Config(output_sizes=(3, 4, 5), **tiny)
    cfg_fused = PointNet2Config(
        output_sizes=(3, 4, 5), fused_eval_mlp=True, **tiny
    )
    params, state = init_pointnet2(jax.random.PRNGKey(2), cfg)
    pts = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)

    ref, _ = apply_pointnet2(params, state, cfg, pts, train=False)
    got, got_state = apply_pointnet2(
        params, state, cfg_fused, pts, train=False
    )
    for a, b in zip(ref["heads"], got["heads"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["global_feat"]), np.asarray(ref["global_feat"]),
        atol=1e-4,
    )
    # eval mode: state untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(got_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@_interpret
def test_maxpool_bf16_close(rng):
    B, S, K, C = 2, 4, 4, 5
    params, state = _mlp_init(jax.random.PRNGKey(3), C, (16, 16))
    state = _random_bn_state(rng, state)
    x = jnp.asarray(rng.randn(B, S, K, C), jnp.float32)
    f32 = fused_mlp.fused_mlp_maxpool(
        x.reshape(B, S * K, C), fused_mlp.fold_bn_eval(params, state), K
    )
    bf16 = fused_mlp.fused_mlp_maxpool(
        x.reshape(B, S * K, C), fused_mlp.fold_bn_eval(params, state), K,
        compute_dtype="bfloat16",
    )
    assert bf16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=0.05)
