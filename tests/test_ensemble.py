"""Shuffle-ensemble averaging (eval/ensemble.py): slot alignment + averaging.

The ensemble averages soft outputs over input permutations; since instance
slots are not stable across permutations, each run is aligned to run 0 by
maximum relaxed-IoU exact assignment before averaging. These tests pin the
alignment (recovers a known column permutation), the degenerate cases (R=1
and identical runs change nothing), and the leading-dims (per-patch) path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cpfn_tpu.eval.ensemble import (
    align_membership,
    ensemble_average,
)


pytestmark = pytest.mark.slow  # compile-heavy integration; default suite: pytest -m "not slow"

def _soft_membership(rng, n, k):
    """A peaked random soft membership [n, k] (rows ~ one-hot + noise)."""
    labels = rng.randint(0, k, size=n)
    W = np.full((n, k), 0.02, np.float32)
    W[np.arange(n), labels] = 1.0
    W += 0.05 * rng.rand(n, k).astype(np.float32)
    return W / W.sum(1, keepdims=True)


def test_align_recovers_column_permutation():
    rng = np.random.RandomState(0)
    W0 = _soft_membership(rng, 257, 7)
    perm = rng.permutation(7)
    W1 = W0[:, perm]
    aligned = np.asarray(align_membership(jnp.asarray(W0), jnp.asarray(W1)))
    np.testing.assert_allclose(aligned, W0, atol=1e-6)


def test_align_leading_dims_per_row_independent():
    rng = np.random.RandomState(1)
    m, n, k = 4, 129, 5
    W0 = np.stack([_soft_membership(rng, n, k) for _ in range(m)])
    perms = [rng.permutation(k) for _ in range(m)]
    W1 = np.stack([W0[i][:, perms[i]] for i in range(m)])
    aligned = np.asarray(align_membership(jnp.asarray(W0), jnp.asarray(W1)))
    np.testing.assert_allclose(aligned, W0, atol=1e-6)


def test_identical_runs_average_to_single_run():
    rng = np.random.RandomState(2)
    n, k = 301, 6
    W = jnp.asarray(_soft_membership(rng, n, k))
    X = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    X = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    T = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    run = (X, T, W)
    Xe, Te, We = ensemble_average([run, run, run])
    np.testing.assert_allclose(np.asarray(Xe), np.asarray(X), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Te), np.asarray(T), atol=1e-5)
    np.testing.assert_allclose(np.asarray(We), np.asarray(W), atol=1e-5)


def test_slot_permuted_run_averages_to_reference():
    """Run 1 is run 0 with permuted slots: after alignment the average must
    equal run 0 (the permutation is pure bookkeeping, not disagreement)."""
    rng = np.random.RandomState(3)
    n, k = 200, 8
    W0 = _soft_membership(rng, n, k)
    X = rng.randn(n, 3).astype(np.float32)
    X /= np.linalg.norm(X, axis=-1, keepdims=True)
    T = rng.randn(n, 4).astype(np.float32)
    perm = rng.permutation(k)
    runs = [
        (jnp.asarray(X), jnp.asarray(T), jnp.asarray(W0)),
        (jnp.asarray(X), jnp.asarray(T), jnp.asarray(W0[:, perm])),
    ]
    Xe, Te, We = ensemble_average(runs)
    np.testing.assert_allclose(np.asarray(We), W0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Xe), X, atol=1e-5)


def test_disagreeing_runs_softens_membership():
    """Genuine disagreement on a point splits its averaged membership."""
    n, k = 64, 3
    W0 = np.zeros((n, k), np.float32)
    W0[:, 0] = 1.0
    W1 = W0.copy()
    W1[:8, 0] = 0.0
    W1[:8, 1] = 1.0  # run 1 reassigns the first 8 points
    X = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    T = np.zeros((n, 4), np.float32)
    _, _, We = ensemble_average(
        [(jnp.asarray(X), jnp.asarray(T), jnp.asarray(W0)),
         (jnp.asarray(X), jnp.asarray(T), jnp.asarray(W1))]
    )
    We = np.asarray(We)
    np.testing.assert_allclose(We[:8, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(We[:8, 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(We[8:, 0], 1.0, atol=1e-6)
