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
