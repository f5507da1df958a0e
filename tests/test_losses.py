"""Losses: parity vs the torch reference and structural sanity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu import losses
from tests.reference_torch import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def _rand_problem(rng, B=4, N=256, K=8, Q=4, Np=64, softmax=True):
    P = rng.randn(B, N, 3).astype(np.float32)
    W = rng.rand(B, N, K).astype(np.float32)
    if softmax:
        W = np.exp(W) / np.exp(W).sum(-1, keepdims=True)
    X = rng.randn(B, N, 3).astype(np.float32)
    X /= np.linalg.norm(X, axis=2, keepdims=True)
    X_gt = rng.randn(B, N, 3).astype(np.float32)
    X_gt /= np.linalg.norm(X_gt, axis=2, keepdims=True)
    T = rng.randn(B, N, Q).astype(np.float32)
    I_gt = rng.randint(-1, K, (B, N)).astype(np.int64)
    # ensure labels have no gaps: remap each row
    for b in range(B):
        vals = np.unique(I_gt[b][I_gt[b] >= 0])
        remap = {v: i for i, v in enumerate(vals)}
        I_gt[b] = np.array([remap.get(v, -1) for v in I_gt[b]])
    T_gt = rng.randint(0, Q, (B, K)).astype(np.int64)
    pts_inst = rng.randn(B, K, Np, 3).astype(np.float32)
    gt_params = {
        "plane_normal": rng.randn(B, K, 3).astype(np.float32),
        "cylinder_axis": rng.randn(B, K, 3).astype(np.float32),
        "cone_axis": rng.randn(B, K, 3).astype(np.float32),
    }
    return P, W, X, X_gt, T, I_gt, T_gt, pts_inst, gt_params


def test_hungarian_profit_is_optimal(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    match = np.asarray(
        losses.hungarian_matching(jnp.array(W), jnp.array(I_gt))
    )
    iou, n_gt = losses.riou_matching_cost(jnp.array(W), jnp.array(I_gt))
    iou, n_gt = np.asarray(iou), np.asarray(n_gt)
    from scipy.optimize import linear_sum_assignment

    for b in range(W.shape[0]):
        r = n_gt[b]
        rows, cols = linear_sum_assignment(-iou[b, :r])
        want = iou[b, :r][rows, cols].sum()
        got = iou[b, :r][np.arange(r), match[b, :r]].sum()
        assert abs(got - want) < 1e-5
        # assignment must be injective over the meaningful rows
        assert len(np.unique(match[b, :r])) == r


def test_hungarian_device_matches_host(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    md = np.asarray(losses.hungarian_matching(jnp.array(W), jnp.array(I_gt), impl="device"))
    mh = np.asarray(losses.hungarian_matching(jnp.array(W), jnp.array(I_gt), impl="host"))
    iou, n_gt = losses.riou_matching_cost(jnp.array(W), jnp.array(I_gt))
    iou, n_gt = np.asarray(iou), np.asarray(n_gt)
    for b in range(W.shape[0]):
        r = n_gt[b]
        pd = iou[b, :r][np.arange(r), md[b, :r]].sum()
        ph = iou[b, :r][np.arange(r), mh[b, :r]].sum()
        assert abs(pd - ph) < 1e-4


def test_hungarian_inside_jit(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)

    @jax.jit
    def f(W, I_gt):
        return losses.hungarian_matching(W, I_gt)

    m1 = np.asarray(f(jnp.array(W), jnp.array(I_gt)))
    m2 = np.asarray(losses.hungarian_matching(jnp.array(W), jnp.array(I_gt)))
    np.testing.assert_array_equal(m1, m2)


@needs_ref
def test_miou_loss_parity(rng):
    torch = REF.torch
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    Wt = torch.from_numpy(W).float()
    It = torch.from_numpy(I_gt).long()
    match_ref = REF.losses_implementation.hungarian_matching(Wt, It)
    loss_ref, inter_ref = REF.losses_implementation.compute_miou_loss(
        Wt, It, match_ref
    )
    got, got_inter = losses.compute_miou_loss(
        jnp.array(W), jnp.array(I_gt), jnp.array(match_ref.numpy(), jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(got), loss_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_inter), inter_ref.numpy(), atol=1e-5
    )


@needs_ref
def test_normal_and_type_loss_parity(rng):
    torch = REF.torch
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    for angle_diff in (False, True):
        want = REF.losses_implementation.compute_normal_loss(
            torch.from_numpy(X).float(),
            torch.from_numpy(X_gt).float(),
            angle_diff,
        ).numpy()
        got = np.asarray(
            losses.compute_normal_loss(jnp.array(X), jnp.array(X_gt), angle_diff)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
    want = REF.losses_implementation.compute_per_point_type_loss(
        torch.from_numpy(T).float(),
        torch.from_numpy(I_gt).long(),
        torch.from_numpy(T_gt).long(),
        False,
    ).numpy()
    got = np.asarray(
        losses.compute_per_point_type_loss(
            jnp.array(T), jnp.array(I_gt), jnp.array(T_gt), False
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_ref
def test_residue_and_parameter_loss_parity(rng):
    torch = REF.torch
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    Wt = torch.from_numpy(W).float()
    It = torch.from_numpy(I_gt).long()
    match_ref = REF.losses_implementation.hungarian_matching(Wt, It)
    params_ref = REF.losses_implementation.compute_parameters(
        torch.from_numpy(P).float(), Wt, torch.from_numpy(X).float()
    )
    res_ref, _ = REF.losses_implementation.compute_residue_loss(
        params_ref, match_ref,
        torch.from_numpy(pts).float(), torch.from_numpy(T_gt).long(),
    )
    params = losses.compute_parameters(jnp.array(P), jnp.array(W), jnp.array(X))
    match = jnp.array(match_ref.numpy(), jnp.int32)
    res, _ = losses.compute_residue_loss(params, match, jnp.array(pts), jnp.array(T_gt))
    np.testing.assert_allclose(np.asarray(res), res_ref.numpy(), rtol=1e-3, atol=1e-3)

    gtp_t = {k: torch.from_numpy(v).float() for k, v in gtp.items()}
    pl_ref = REF.losses_implementation.compute_parameter_loss(
        params_ref, gtp_t, match_ref, torch.from_numpy(T_gt).long(), False
    ).numpy()
    gtp_j = {k: jnp.array(v) for k, v in gtp.items()}
    pl = np.asarray(
        losses.compute_parameter_loss(params, gtp_j, match, jnp.array(T_gt), False)
    )
    np.testing.assert_allclose(pl, pl_ref, atol=2e-3)


@needs_ref
def test_compute_all_losses_parity(rng):
    torch = REF.torch
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng)
    Wt = torch.from_numpy(W).float()
    It = torch.from_numpy(I_gt).long()
    match_ref = REF.losses_implementation.hungarian_matching(Wt, It)
    gtp_t = {k: torch.from_numpy(v).float() for k, v in gtp.items()}
    ref = REF.losses_implementation.compute_all_losses(
        torch.from_numpy(P).float(), Wt, It,
        torch.from_numpy(X).float(), torch.from_numpy(X_gt).float(),
        torch.from_numpy(T).float(), torch.from_numpy(T_gt).long(),
        gtp_t, torch.from_numpy(pts).float(),
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, False,
    )
    gtp_j = {k: jnp.array(v) for k, v in gtp.items()}
    got = losses.compute_all_losses(
        jnp.array(P), jnp.array(W), jnp.array(I_gt), jnp.array(X),
        jnp.array(X_gt), jnp.array(T), jnp.array(T_gt), gtp_j, jnp.array(pts),
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, False,
        matching_indices=jnp.array(match_ref.numpy(), jnp.int32),
    )
    names = ["total_loss", "normal_loss", "type_loss", "miou_loss",
             "residue_loss", "parameter_loss"]
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            float(got[name]), float(ref[i]), rtol=2e-3, atol=2e-3
        ), name


def test_all_losses_jit_and_grad(rng):
    P, W, X, X_gt, T, I_gt, T_gt, pts, gtp = _rand_problem(rng, B=2, N=128, K=6)
    gtp_j = {k: jnp.array(v) for k, v in gtp.items()}

    @jax.jit
    def loss_fn(W, X, T):
        out = losses.compute_all_losses(
            jnp.array(P), W, jnp.array(I_gt), X, jnp.array(X_gt), T,
            jnp.array(T_gt), gtp_j, jnp.array(pts),
            1.0, 1.0, 1.0, 1.0, 1.0, 1.0, False,
        )
        return out["total_loss"]

    g = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.array(W), jnp.array(X), jnp.array(T)
    )
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
