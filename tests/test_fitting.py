"""Fitting-core tests: geometric recovery on synthetic primitives, gradient
checks for the custom TLS VJP, and numerical parity against the PyTorch
reference (the reference's own torch-vs-TF validation pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu.fitting import (
    cone,
    cylinder,
    plane,
    primitives,
    solvers,
    sphere,
    tls,
)
from tests.reference_torch import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def _sign_align(a, b):
    """min(|a-b|, |a+b|) elementwise — eigenvector sign ambiguity."""
    return np.minimum(np.abs(a - b), np.abs(a + b))


# ---------------------------------------------------------------- geometric

def test_tls_plane_recovery(rng):
    n_true = np.array([0.3, -0.5, 0.81])
    n_true /= np.linalg.norm(n_true)
    pl = primitives.Plane(n_true, 0.7, rng=rng)
    pts, _ = pl.sample_points(256, rng=rng)
    W = np.ones((1, 256), np.float32)
    n, c = solvers.weighted_plane_fitting(
        jnp.array(pts[None].astype(np.float32)), jnp.array(W)
    )
    n, c = np.asarray(n)[0], np.asarray(c)[0]
    assert _sign_align(n, n_true).max() < 1e-3
    assert abs(abs(c) - 0.7) < 1e-3


def test_sphere_recovery(rng):
    sp = primitives.Sphere([0.2, -0.1, 0.4], 0.8)
    pts, _ = sp.sample_points(512, rng=rng)
    c, r2 = solvers.weighted_sphere_fitting(
        jnp.array(pts[None].astype(np.float32)),
        jnp.ones((1, 512), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(c)[0], sp.center, atol=1e-3)
    np.testing.assert_allclose(np.sqrt(np.asarray(r2)[0]), 0.8, atol=1e-3)


def test_cylinder_recovery(rng):
    axis = np.array([0.0, 0.6, 0.8])
    cyl = primitives.Cylinder([0.1, 0.2, 0.0], 0.5, axis, height=2.0, rng=rng)
    pts, normals = cyl.sample_points(1024, rng=rng)
    P = jnp.array(pts[None].astype(np.float32))
    X = jnp.array(normals[None].astype(np.float32))
    W = jnp.ones((1, 1024, 1), jnp.float32)
    ax, center, r2 = cylinder.compute_parameters(P, W, X)
    assert _sign_align(np.asarray(ax)[0, 0], axis).max() < 1e-2
    np.testing.assert_allclose(np.sqrt(np.asarray(r2)[0, 0]), 0.5, atol=1e-2)
    # center lies on the true axis line
    d = np.asarray(center)[0, 0] - cyl.center
    d_perp = d - np.dot(d, axis) * axis
    assert np.linalg.norm(d_perp) < 2e-2


def test_cone_recovery(rng):
    axis = np.array([0.0, 0.0, 1.0])
    cn = primitives.Cone([0.0, 0.0, 0.0], axis, 0.4, z_min=0.2, z_max=1.2)
    pts, normals = cn.sample_points(2048, rng=rng)
    P = jnp.array(pts[None].astype(np.float32))
    X = jnp.array(normals[None].astype(np.float32))
    W = jnp.ones((1, 2048, 1), jnp.float32)
    apex, ax, half = cone.compute_parameters(P, W, X)
    np.testing.assert_allclose(np.asarray(apex)[0, 0], cn.apex, atol=2e-2)
    assert np.abs(np.asarray(ax)[0, 0] - axis).max() < 2e-2  # oriented
    np.testing.assert_allclose(np.asarray(half)[0, 0], 0.4, atol=2e-2)


def test_residues_zero_on_surface(rng):
    pl = primitives.Plane(np.array([0, 0, 1.0]), 0.5, rng=rng)
    pts, _ = pl.sample_points(64, rng=rng)
    r = plane.compute_residue_single(
        jnp.array([0.0, 0, 1]), jnp.float32(0.5), jnp.array(pts, jnp.float32)
    )
    assert np.abs(np.asarray(r)).max() < 1e-8

    sp = primitives.Sphere([0.0, 0, 0], 1.0)
    pts, _ = sp.sample_points(64, rng=rng)
    r = sphere.compute_residue_single(
        jnp.zeros(3), jnp.float32(1.0), jnp.array(pts, jnp.float32)
    )
    assert np.abs(np.asarray(r)).max() < 1e-4


# ----------------------------------------------------------------- gradient

def test_svd_smallest_v_gradcheck(rng):
    """Finite-difference check of the custom K-matrix VJP (the analogue of the
    reference's torch.autograd.gradcheck, differentiable_tls.py:162-176)."""
    M = rng.randn(4, 5, 5)
    M = (M + np.swapaxes(M, 1, 2)) / 2

    ct = rng.randn(4, 5).astype(np.float32)

    def scalar(M_):
        # sign-invariant functional: eigh's sign convention is not continuous
        # in M, so probe through a quadratic form
        return jnp.sum(jnp.sum(tls.svd_smallest_v(M_) * ct, axis=-1) ** 2)

    g = np.asarray(jax.grad(scalar)(jnp.array(M, jnp.float32)))
    eps = 1e-3
    # probe a sample of symmetric perturbation directions
    for _ in range(10):
        D = rng.randn(4, 5, 5)
        D = (D + np.swapaxes(D, 1, 2)) / 2
        fp = float(scalar(jnp.array(M + eps * D, jnp.float32)))
        fm = float(scalar(jnp.array(M - eps * D, jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        an = float(np.sum(g * D))
        assert abs(fd - an) < 5e-2 * max(1.0, abs(fd)), (fd, an)


def test_solve_weighted_tls_grad_flows(rng):
    A = jnp.array(rng.randn(2, 32, 3).astype(np.float32))
    W = jnp.array(rng.rand(2, 32).astype(np.float32))

    def f(w):
        return jnp.sum(tls.solve_weighted_tls(A, w) ** 2)

    g = jax.grad(f)(W)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------- torch parity

@needs_ref
def test_tls_parity(rng):
    torch = REF.torch
    A = rng.randn(20, 100, 3)
    W = rng.rand(20, 100)
    want = (
        REF.differentiable_tls.solve_weighted_tls(
            torch.from_numpy(A).float(), torch.from_numpy(W).float()
        )
        .detach()
        .numpy()
    )
    got = np.asarray(
        tls.solve_weighted_tls(
            jnp.array(A, jnp.float32), jnp.array(W, jnp.float32)
        )
    )
    assert _sign_align(got, want).max() < 1e-4


@needs_ref
def test_tls_grad_parity(rng):
    torch = REF.torch
    M = rng.randn(16, 3, 3)
    M = (M + np.swapaxes(M, 1, 2)) / 2
    Mt = torch.from_numpy(M).float().requires_grad_(True)
    out = REF.differentiable_tls.Custom_svd_v_colum.apply(Mt, -1)
    out_np = out.detach().numpy()
    got_out = np.asarray(tls.svd_smallest_v(jnp.array(M, jnp.float32)))
    sign = np.sign(np.sum(got_out * out_np, axis=-1, keepdims=True))
    # cotangent chosen to respect each impl's sign choice
    ct = rng.randn(16, 3).astype(np.float32)
    out.backward(torch.from_numpy(ct * sign))
    want_grad = Mt.grad.numpy()
    _, vjp = jax.vjp(tls.svd_smallest_v, jnp.array(M, jnp.float32))
    got_grad = np.asarray(vjp(jnp.array(ct))[0])
    np.testing.assert_allclose(got_grad, want_grad, atol=2e-4)


@needs_ref
def test_plane_fitting_parity(rng):
    torch = REF.torch
    P = rng.randn(10, 64, 3)
    W = rng.rand(10, 64)
    n_ref, c_ref = REF.geometry_utils.weighted_plane_fitting(
        torch.from_numpy(P).float(), torch.from_numpy(W).float()
    )
    n, c = solvers.weighted_plane_fitting(
        jnp.array(P, jnp.float32), jnp.array(W, jnp.float32)
    )
    assert _sign_align(np.asarray(n), n_ref.numpy()).max() < 1e-4
    assert _sign_align(np.asarray(c), c_ref.numpy()).max() < 1e-4


@needs_ref
def test_guarded_ls_parity(rng):
    torch = REF.torch
    A = rng.randn(10, 64, 3)
    b = rng.randn(10, 64, 1)
    W = rng.rand(10, 64)
    want = REF.geometry_utils.guarded_matrix_solve_ls(
        torch.from_numpy(A).float(),
        torch.from_numpy(b).float(),
        torch.from_numpy(W).float(),
    ).numpy()
    got = np.asarray(
        solvers.guarded_matrix_solve_ls(
            jnp.array(A, jnp.float32),
            jnp.array(b, jnp.float32),
            jnp.array(W, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


@needs_ref
def test_sphere_fitting_parity(rng):
    torch = REF.torch
    P = rng.randn(10, 64, 3)
    W = rng.rand(10, 64)
    c_ref, r2_ref = REF.geometry_utils.weighted_sphere_fitting(
        torch.from_numpy(P).float(), torch.from_numpy(W).float()
    )
    c, r2 = solvers.weighted_sphere_fitting(
        jnp.array(P, jnp.float32), jnp.array(W, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(r2), r2_ref.numpy(), atol=2e-4)


@needs_ref
@pytest.mark.parametrize("which", ["plane", "sphere", "cylinder", "cone"])
def test_fitter_parity(rng, which):
    torch = REF.torch
    B, N, K = 4, 128, 6
    P = rng.randn(B, N, 3)
    W = rng.rand(B, N, K)
    X = rng.randn(B, N, 3)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    Pt = torch.from_numpy(P).float()
    Wt = torch.from_numpy(W).float()
    Xt = torch.from_numpy(X).float()
    Pj = jnp.array(P, jnp.float32)
    Wj = jnp.array(W, jnp.float32)
    Xj = jnp.array(X, jnp.float32)
    if which == "plane":
        n_ref, c_ref = REF.plane_fitter.compute_parameters(Pt, Wt)
        n, c = plane.compute_parameters(Pj, Wj)
        assert _sign_align(np.asarray(n), n_ref.numpy()).max() < 5e-4
        assert _sign_align(np.asarray(c), c_ref.numpy()).max() < 5e-4
    elif which == "sphere":
        c_ref, r2_ref = REF.sphere_fitter.compute_parameters(Pt, Wt)
        c, r2 = sphere.compute_parameters(Pj, Wj)
        np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(r2), r2_ref.numpy(), atol=5e-4)
    elif which == "cylinder":
        a_ref, c_ref, r2_ref = REF.cylinder_fitter.compute_parameters(Pt, Wt, Xt)
        a, c, r2 = cylinder.compute_parameters(Pj, Wj, Xj)
        assert _sign_align(np.asarray(a), a_ref.numpy()).max() < 5e-4
        # center/radius depend on the plane frame which depends on axis sign;
        # compare the axis-invariant quantities instead
        np.testing.assert_allclose(np.asarray(r2), r2_ref.numpy(), atol=2e-3)
        # residues on random probe points must agree
        p = rng.randn(B, 16, K, 3).astype(np.float32)
        res_ref = REF.cylinder_fitter.compute_residue_single(
            a_ref[:, None], c_ref[:, None], r2_ref[:, None],
            torch.from_numpy(p),
        ).numpy()
        res = np.asarray(
            cylinder.compute_residue_single(
                a[:, None], c[:, None], r2[:, None], jnp.array(p)
            )
        )
        np.testing.assert_allclose(res, res_ref, atol=5e-3)
    else:
        ap_ref, ax_ref, ha_ref = REF.cone_fitter.compute_parameters(Pt, Wt, Xt)
        ap, ax, ha = cone.compute_parameters(Pj, Wj, Xj)
        np.testing.assert_allclose(np.asarray(ap), ap_ref.numpy(), atol=2e-3)
        assert _sign_align(np.asarray(ax), ax_ref.numpy()).max() < 1e-3
        np.testing.assert_allclose(np.asarray(ha), ha_ref.numpy(), atol=1e-3)


@needs_ref
def test_consistent_plane_frame_parity(rng):
    torch = REF.torch
    normal = rng.randn(50, 3)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    x_ref, y_ref = REF.geometry_utils.compute_consistent_plane_frame(
        torch.from_numpy(normal).float()
    )
    x, y = solvers.compute_consistent_plane_frame(jnp.array(normal, jnp.float32))
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)


def test_fit_cloud_api(rng):
    """Single-cloud fitting API: types recovered by residue argmin on a
    synthetic 3-instance scene."""
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.fitting.api import fit_cloud_to_json, fit_instances

    factory.register_primitives(["plane", "sphere", "cylinder", "cone"])
    pl = primitives.Plane(np.array([0, 0, 1.0]), 0.3, rng=rng)
    sp = primitives.Sphere([0.5, 0.5, -0.2], 0.4)
    cyl = primitives.Cylinder([-0.5, 0, 0], 0.3, np.array([1.0, 0, 0]),
                              height=1.0, rng=rng)
    pts, nrm, lab = [], [], []
    for i, prim in enumerate([pl, sp, cyl]):
        p, n = prim.sample_points(300, rng=rng)
        pts.append(p); nrm.append(n); lab.append(np.full(300, i))
    P = np.concatenate(pts).astype(np.float32)
    X = np.concatenate(nrm).astype(np.float32)
    L = np.concatenate(lab)
    _, type_ids, residues = fit_instances(P, L, X)
    names = ["plane", "sphere", "cylinder", "cone"]
    assert [names[t] for t in type_ids] == ["plane", "sphere", "cylinder"]
    assert residues.max() < 1e-3
    records = fit_cloud_to_json(P, L, X)
    assert [r["type"] for r in records] == ["plane", "sphere", "cylinder"]
    # estimated normals (no GT) must still give usable fits for the plane
    _, type_ids2, _ = fit_instances(P, L, None)
    assert names[type_ids2[0]] == "plane"
