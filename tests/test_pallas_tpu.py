"""Pallas kernel tests — require a real TPU backend, skipped on the CPU CI
mesh (the kernels are validated against the XLA paths here; the XLA paths are
themselves validated against NumPy models of the CUDA kernels in
test_ops.py)."""

import os

import pytest

# tests/conftest.py forces JAX_PLATFORMS=cpu; these tests only make sense when
# explicitly run with CPFN_TEST_PLATFORM=axon (or =tpu) on TPU hardware.
import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU backend (run with CPFN_TEST_PLATFORM=axon)",
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def test_fps_pallas_matches_xla(rng):
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import farthest_point_sample_pallas

    for B, N, m in [(1, 5000, 128), (4, 8192, 512)]:
        P = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
        a = np.asarray(ops.farthest_point_sample(P, m, impl="xla"))
        b = np.asarray(farthest_point_sample_pallas(P, m))
        np.testing.assert_array_equal(a, b)


def test_fps_pallas_production_shapes(rng):
    """The two shapes the cascade actually runs: the 100k-pt global cloud
    (single-program kernel, near the VMEM residency bound) and the 32x8192
    LocalSPFN patch stack (batched kernel)."""
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import farthest_point_sample_pallas

    for B, N, m in [(1, 100_000, 512), (32, 8192, 512)]:
        P = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
        a = np.asarray(ops.farthest_point_sample(P, m, impl="xla"))
        b = np.asarray(farthest_point_sample_pallas(P, m))
        np.testing.assert_array_equal(a, b)


def test_ball_query_pallas_matches_xla(rng):
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import ball_query_pallas

    for B, N, S, r, K in [(1, 5000, 256, 0.3, 32), (2, 8192, 512, 0.2, 64)]:
        P = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
        idx = ops.farthest_point_sample(P, S)
        Q = ops.gather_points(P, idx)
        a = np.asarray(ops.ball_query(P, Q, r, K, impl="xla"))
        b = np.asarray(ball_query_pallas(P, Q, r, K))
        np.testing.assert_array_equal(a, b)


def test_ball_query_pallas_chunk_widths_on_tpu(rng):
    """Chunk width is a perf knob only: every W must lower through Mosaic
    and return identical indices at the LocalSPFN SA1 shape."""
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import ball_query_pallas

    B, N, S, r, K = 4, 8192, 512, 0.2, 64
    P = jnp.asarray(rng.randn(B, N, 3) * 0.5, jnp.float32)
    idx = ops.farthest_point_sample(P, S)
    Q = ops.gather_points(P, idx)
    a = np.asarray(ops.ball_query(P, Q, r, K, impl="xla"))
    for chunk in (256, 512, 2048, 4096, 8192):
        b = np.asarray(ball_query_pallas(P, Q, r, K, chunk=chunk))
        np.testing.assert_array_equal(a, b, err_msg=f"chunk={chunk}")


def test_fps_pallas_vmap_matches_xla(rng):
    """The packed serving path vmaps whole cascade graphs over a cloud
    group, so the Pallas kernels must lower and stay exact under a leading
    vmap batch dimension (jax batches pallas_call by prepending to the
    grid) — pinned here against the vmapped XLA path on hardware."""
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import farthest_point_sample_pallas

    P = jnp.asarray(rng.randn(3, 4, 2048, 3), jnp.float32)
    a = np.asarray(jax.vmap(
        lambda p: ops.farthest_point_sample(p, 128, impl="xla")
    )(P))
    b = np.asarray(jax.vmap(
        lambda p: farthest_point_sample_pallas(p, 128)
    )(P))
    np.testing.assert_array_equal(a, b)


def test_ball_query_pallas_vmap_matches_xla(rng):
    """Same vmap-lowering guarantee for the streaming ball-query kernel
    (the other Pallas op inside the packed path's vmapped graphs)."""
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import ball_query_pallas

    B, N, S, r, K = 2, 2048, 256, 0.3, 32
    P = jnp.asarray(rng.randn(3, B, N, 3) * 0.5, jnp.float32)
    idx = jax.vmap(lambda p: ops.farthest_point_sample(p, S))(P)
    Q = jax.vmap(ops.gather_points)(P, idx)
    a = np.asarray(jax.vmap(
        lambda p, q: ops.ball_query(p, q, r, K, impl="xla")
    )(P, Q))
    b = np.asarray(jax.vmap(
        lambda p, q: ball_query_pallas(p, q, r, K)
    )(P, Q))
    np.testing.assert_array_equal(a, b)


def test_fused_mlp_matches_xla_on_tpu(rng):
    """Mosaic-lowering parity for the fused eval MLP kernels at the real SA1
    shape (interpret-mode logic parity lives in test_fused_mlp.py)."""
    from cpfn_tpu.nn.pointnet2 import _mlp_apply, _mlp_init
    from cpfn_tpu.ops.fused_mlp import (
        fold_bn_eval,
        fused_mlp_maxpool,
        fused_mlp_pointwise,
    )

    B, S, K, C = 8, 512, 64, 3
    params, state = _mlp_init(jax.random.PRNGKey(0), C, (64, 64, 128))
    x = jnp.asarray(rng.randn(B, S, K, C), jnp.float32)
    ref, _ = _mlp_apply(params, state, x, train=False, momentum=0.5)
    ref = jnp.max(ref, axis=2)
    got = fused_mlp_maxpool(
        x.reshape(B, S * K, C), fold_bn_eval(params, state), K
    )
    # XLA and Mosaic lower f32 dots to different MXU bf16-pass schedules, so
    # the two correct paths differ at the ~4e-3 level on O(1) activations
    # (measured on v5e: 0.5% of elements past 1e-3, max abs 3.4e-3) — same
    # tolerance as the full-forward parity test below.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-3, rtol=1e-3
    )

    params, state = _mlp_init(jax.random.PRNGKey(1), 131, (256, 256))
    xp = jnp.asarray(rng.randn(2, 8192, 131), jnp.float32)
    refp, _ = _mlp_apply(params, state, xp, train=False, momentum=0.5)
    gotp = fused_mlp_pointwise(xp, fold_bn_eval(params, state))
    np.testing.assert_allclose(
        np.asarray(gotp), np.asarray(refp), atol=5e-3, rtol=1e-3
    )


def test_fused_forward_parity_on_tpu(rng):
    """Full LocalSPFN-config forward, fused vs XLA path, on hardware."""
    from cpfn_tpu.nn import PointNet2Config, apply_pointnet2, init_pointnet2

    cfg = PointNet2Config(output_sizes=(3, 4, 21))
    cfg_fused = PointNet2Config(output_sizes=(3, 4, 21), fused_eval_mlp=True)
    params, state = init_pointnet2(jax.random.PRNGKey(2), cfg)
    pts = jnp.asarray(rng.randn(4, 8192, 3), jnp.float32)
    ref, _ = apply_pointnet2(params, state, cfg, pts, train=False)
    got, _ = apply_pointnet2(params, state, cfg_fused, pts, train=False)
    for a, b in zip(ref["heads"], got["heads"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3, rtol=1e-3
        )


def test_lowres_seeded_fps_pallas_on_tpu(rng):
    """Mosaic lowering + selection parity of the preprocessing seeded-FPS
    kernel at a production-like shape (the interpret-mode twin runs in the
    CPU suite). Near-tie f32 divergence between the euclidean XLA chain and
    the squared-space kernel is possible in principle; at these seeds the
    selections agree exactly."""
    from cpfn_tpu.preprocess import lowres

    pts = rng.randn(20_000, 3).astype(np.float32)
    labels = rng.randint(0, 12, 20_000).astype(np.int32)
    n_unique = len(np.unique(labels))
    lowres._device_fps_fn.cache_clear()
    fx = lowres._device_fps_fn(20_000, 512, 28, impl="xla")
    sx, rx = fx(jnp.asarray(pts), jnp.asarray(labels),
                jnp.int32(7), jnp.int32(n_unique))
    fp = lowres._device_fps_fn(20_000, 512, 28, impl="pallas")
    sp, rp = fp(jnp.asarray(pts), jnp.asarray(labels),
                jnp.int32(7), jnp.int32(n_unique))
    lowres._device_fps_fn.cache_clear()
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))


def test_fps_stacked_pallas_matches_xla(rng):
    """Round-5 stacked-plane FPS rework: bit-parity on hardware at the
    cascade shapes. Mosaic's scan lowering supports only unroll=1 or a
    full unroll of the trip count (NotImplementedError otherwise,
    verified on hardware 2026-08-21), so only the lowerable u1 variant
    is exercised here; interpret-mode parity for the unroll logic lives
    in test_ops.py."""
    from cpfn_tpu import ops
    from cpfn_tpu.ops.pallas_kernels import (
        _farthest_point_sample_pallas_stacked,
    )

    for B, N, m in [(4, 8192, 512), (32, 8192, 512)]:
        P = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
        a = np.asarray(ops.farthest_point_sample(P, m, impl="xla"))
        for unroll in (1,):
            b = np.asarray(_farthest_point_sample_pallas_stacked(P, m, unroll))
            np.testing.assert_array_equal(a, b)
