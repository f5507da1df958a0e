"""Metric-suite tests: parity vs the torch reference on seeded inputs, plus
shape/jit sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu import metrics
from tests.reference_torch import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def _problem(rng, B=3, N=256, K=8, Q=4, Np=64, K_gt=None):
    K_gt = K_gt or K
    P = rng.randn(B, N, 3).astype(np.float32)
    W = rng.rand(B, N, K).astype(np.float32)
    X = rng.randn(B, N, 3).astype(np.float32)
    X /= np.linalg.norm(X, axis=2, keepdims=True)
    X_gt = rng.randn(B, N, 3).astype(np.float32)
    X_gt /= np.linalg.norm(X_gt, axis=2, keepdims=True)
    T = rng.rand(B, N, Q).astype(np.float32)
    I_gt = rng.randint(0, min(K, K_gt), (B, N)).astype(np.int64)
    T_gt = rng.randint(0, Q, (B, K_gt)).astype(np.int64)
    pts = rng.randn(B, K_gt, Np, 3).astype(np.float32)
    gtp = {
        "plane_normal": rng.randn(B, K_gt, 3).astype(np.float32),
        "cylinder_axis": rng.randn(B, K_gt, 3).astype(np.float32),
        "cone_axis": rng.randn(B, K_gt, 3).astype(np.float32),
    }
    return P, W, X, X_gt, T, I_gt, T_gt, pts, gtp


def test_hard_w_and_instance_type(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _problem(rng)
    hw = np.asarray(metrics.hard_W_encoding(jnp.array(W)))
    assert set(np.unique(hw)) <= {0.0, 1.0}
    np.testing.assert_array_equal(np.argmax(hw, 2), np.argmax(W, 2))
    ti = np.asarray(metrics.get_instance_type(jnp.array(T), jnp.array(hw)))
    assert ti.shape == (3, 8)


@needs_ref
def test_compute_all_metrics_parity(rng):
    torch = REF.torch
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _problem(rng)
    # torch reference path
    ref = REF.metric_implementation.compute_all_metrics(
        torch.from_numpy(P).float(),
        torch.from_numpy(X).float(),
        torch.from_numpy(X_gt).float(),
        torch.from_numpy(W).float(),
        torch.from_numpy(I_gt).long(),
        torch.from_numpy(T).float(),
        torch.from_numpy(T_gt).long(),
        torch.from_numpy(pts).float(),
        {k: torch.from_numpy(v).float() for k, v in gtp.items()},
    )
    (mIoU_r, type_r, norm_r, axis_r, meanres_r, stdres_r, skcov_r, pcov_r,
     W_r, pp_r, T_r) = ref
    got = metrics.compute_all_metrics(
        jnp.array(P), jnp.array(X), jnp.array(X_gt), jnp.array(W),
        jnp.array(I_gt), jnp.array(T), jnp.array(T_gt), jnp.array(pts),
        {k: jnp.array(v) for k, v in gtp.items()},
    )
    # the hungarian solutions may differ among ties; mIoU value must agree
    np.testing.assert_allclose(
        np.asarray(got["mIoU"]), mIoU_r.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["normal_difference"]), norm_r.numpy(), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got["W"]), W_r.numpy())
    np.testing.assert_array_equal(np.asarray(got["T"]), T_r.numpy())
    # matching-dependent metrics: verify with the reference matching injected
    match_r, mask_r = REF.metric_implementation.hungarian_matching(
        W_r, torch.from_numpy(I_gt).long()
    )
    got_match = np.asarray(
        __import__("cpfn_tpu.losses", fromlist=["hungarian_matching"])
        .hungarian_matching(jnp.array(np.asarray(got["W"])), jnp.array(I_gt))
    )
    if np.array_equal(got_match, match_r.numpy()):
        np.testing.assert_allclose(
            np.asarray(got["type_accuracy"]), type_r.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["mean_residual"]), meanres_r.numpy(),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(got["std_residual"]), stdres_r.numpy(),
            rtol=1e-3, atol=1e-3,
        )
        for a, b in zip(got["Sk_coverage"], skcov_r):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4)
    for a, b in zip(got["P_coverage"], pcov_r):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got["axis_difference"]), axis_r.numpy(), atol=2e-3
    )


def test_k_padding_paths(rng):
    # K_pred > K_gt and K_pred < K_gt both must work
    for K, K_gt in [(10, 6), (6, 10)]:
        P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _problem(
            rng, K=K, K_gt=K_gt
        )
        got = metrics.compute_all_metrics(
            jnp.array(P), jnp.array(X), jnp.array(X_gt), jnp.array(W),
            jnp.array(I_gt), jnp.array(T), jnp.array(T_gt), jnp.array(pts),
            {k: jnp.array(v) for k, v in gtp.items()},
        )
        assert np.all(np.isfinite(np.asarray(got["mIoU"])))


def test_creates_json(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _problem(rng, B=1)
    got = metrics.compute_all_metrics(
        jnp.array(P), jnp.array(X), jnp.array(X_gt), jnp.array(W),
        jnp.array(I_gt), jnp.array(T), jnp.array(T_gt), jnp.array(pts),
        {k: jnp.array(v) for k, v in gtp.items()},
    )
    records = metrics.creates_json(np.asarray(got["T"])[0], got["predicted_parameters"])
    assert len(records) == 8
    assert all("type" in r and "label" in r for r in records)
