"""End-to-end cascade-fusion parity against the reference's own eval path.

Runs the reference's actual fusion code — `Utils/merging_utils.py:6-53`
(similarity_soft / heuristic_merging / run_heuristic_solver / get_point_final,
executed from the reference's own source under a numba-identity stub) plus a
line-faithful transliteration of the fusion block of
`evaluation_localSPFN.py:94-151` (torch, CPU) — on the same inputs as the
repo's `fuse_cascade`, and asserts identical fused hard labels and matching
mIoU. This is the pipeline-level evidence for Seg-IoU parity that the
component tests (test_merging, test_metrics, test_network_parity) don't
establish on their own.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu import metrics
from cpfn_tpu.merging import fuse_cascade
from cpfn_tpu.merging.fusion import fuse_cascade_fast
from tests.reference_torch import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def _make_cascade_inputs(rng, N=512, K_g=6, P=4, n=128, K_l=5, Q=4):
    """One cloud's worth of cascade-eval inputs, shaped like the reference's
    Dataset_TestLocalSPFN output (`dataloaders.py:207-326`): overlapping
    NN-style patches, soft LocalSPFN outputs, hard one-hot global labels."""
    I_gt_global = rng.randint(0, K_g, N).astype(np.int64)
    spfn_labels = np.eye(K_g, dtype=np.float32)[rng.randint(0, K_g, N)]
    spfn_normals = rng.randn(N, 3).astype(np.float32)
    spfn_normals /= np.linalg.norm(spfn_normals, axis=1, keepdims=True)
    spfn_type = rng.rand(N, Q).astype(np.float32)
    spfn_type /= spfn_type.sum(axis=1, keepdims=True)
    # unique indices within a patch, overlap across patches allowed
    patch_indices = np.stack(
        [rng.choice(N, n, replace=False) for _ in range(P)]
    ).astype(np.int64)
    W = rng.rand(P, n, K_l).astype(np.float32) * 4
    patch_W = np.exp(W) / np.exp(W).sum(-1, keepdims=True)
    patch_X = rng.randn(P, n, 3).astype(np.float32)
    patch_X /= np.linalg.norm(patch_X, axis=2, keepdims=True)
    T = rng.rand(P, n, Q).astype(np.float32)
    patch_T = np.exp(T) / np.exp(T).sum(-1, keepdims=True)
    return dict(
        I_gt_global=I_gt_global, spfn_labels=spfn_labels,
        spfn_normals=spfn_normals, spfn_type=spfn_type,
        patch_indices=patch_indices, patch_W=patch_W, patch_X=patch_X,
        patch_T=patch_T, K_g=K_g, K_l=K_l, P=P, Q=Q, N=N,
    )


def _reference_fusion(inp):
    """The reference cascade fusion, `evaluation_localSPFN.py:94-151`:
    merging_utils calls are the reference's own functions; the surrounding
    tensor plumbing follows the eval script line by line."""
    torch = REF.torch
    mu = REF.merging_utils
    mi = REF.metric_implementation
    P, K_l, K_g, Q, N = (
        inp["P"], inp["K_l"], inp["K_g"], inp["Q"], inp["N"]
    )
    W_fusion = torch.from_numpy(inp["patch_W"])
    X = torch.from_numpy(inp["patch_X"])
    T = torch.from_numpy(inp["patch_T"])
    patch_indices = torch.from_numpy(inp["patch_indices"])
    spfn_labels = torch.from_numpy(inp["spfn_labels"])
    spfn_normals = torch.from_numpy(inp["spfn_normals"])
    spfn_type = torch.from_numpy(inp["spfn_type"])
    I_gt_global = torch.from_numpy(inp["I_gt_global"])

    # evaluation_localSPFN.py:100-110
    similarity = mu.similarity_soft(spfn_labels, W_fusion, patch_indices)
    labels_fusion = mu.run_heuristic_solver(
        similarity.cpu().numpy(), P, K_g, K_l
    )
    point2primitive = torch.zeros([N, P * K_l + K_g]).float()
    for b in range(P):
        point2primitive[
            patch_indices[b], b * K_l : (b + 1) * K_l
        ] = W_fusion[b]
    point2primitive[:, P * K_l :] = spfn_labels
    flag = torch.sum(point2primitive[:, : P * K_l], dim=1) > 0
    point2primitive[flag, P * K_l :] = 0
    W_fusion = mu.get_point_final(
        point2primitive, torch.from_numpy(labels_fusion)
    )

    # normals + types, evaluation_localSPFN.py:112-130
    pi = patch_indices.contiguous()
    X_global = torch.zeros([N, 3]).scatter_add_(
        0, pi.view(-1).unsqueeze(1).expand(-1, 3), X.reshape(-1, 3)
    )
    empty = torch.all(X_global == 0, axis=1)
    X_global[empty] = spfn_normals[empty]
    X_global = torch.nn.functional.normalize(X_global, p=2, dim=1, eps=1e-12)
    pi_q = pi.view(-1).unsqueeze(1).expand(-1, Q)
    num = torch.zeros([N, Q]).scatter_add(0, pi_q, T.reshape(-1, Q))
    den = torch.zeros([N, Q]).scatter_add(
        0, pi_q, torch.ones_like(pi_q).float()
    )
    T_global = num / den.clamp(min=1)
    T_global[empty] = spfn_type[empty]

    # cluster drop + re-pad, evaluation_localSPFN.py:142-144
    W_fusion = W_fusion[:, torch.sum(W_fusion, dim=0) > 1]
    if W_fusion.shape[1] < K_g:
        W_fusion = torch.cat(
            (W_fusion, torch.zeros([W_fusion.shape[0], K_g - W_fusion.shape[1]])),
            dim=1,
        )

    # hard encoding + matching + mIoU, evaluation_localSPFN.py:146-151
    W_hard = mi.hard_W_encoding(W_fusion.unsqueeze(0))
    matching, mask = mi.hungarian_matching(W_hard, I_gt_global.unsqueeze(0))
    miou = mi.compute_segmentation_iou(
        W_hard, I_gt_global.unsqueeze(0), matching, mask.float()
    )
    return dict(
        labels_fusion=labels_fusion,
        W_fusion=W_fusion.numpy(),
        W_hard=W_hard.squeeze(0).numpy(),
        X_global=X_global.numpy(),
        T_global=T_global.numpy(),
        miou=float(miou),
    )


def _repo_miou(W_fused, I_gt_global):
    from cpfn_tpu.losses.hungarian import hungarian_matching_with_mask

    W_hard = metrics.hard_W_encoding(jnp.asarray(W_fused)[None])
    matching, mask = hungarian_matching_with_mask(
        W_hard, jnp.asarray(I_gt_global)[None]
    )
    miou = metrics.compute_segmentation_iou(
        W_hard, jnp.asarray(I_gt_global)[None], matching,
        mask.astype(jnp.float32),
    )
    return np.asarray(W_hard)[0], float(np.asarray(miou).reshape(()))


@needs_ref
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuse_cascade_matches_reference_eval_path(seed):
    rng = np.random.RandomState(seed)
    inp = _make_cascade_inputs(rng)
    ref = _reference_fusion(inp)

    got_W, got_X, got_T = fuse_cascade(
        inp["patch_W"], inp["patch_X"], inp["patch_T"], inp["patch_indices"],
        inp["spfn_labels"], inp["spfn_normals"], inp["spfn_type"],
        n_max_global_instances=inp["K_g"],
        n_max_local_instances=inp["K_l"],
        out_width=None, merge_impl="host",
    )
    got_W = np.asarray(got_W)

    # identical surviving-cluster columns (same solver labels, same ordering)
    assert got_W.shape == ref["W_fusion"].shape
    np.testing.assert_allclose(got_W, ref["W_fusion"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_X), ref["X_global"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_T), ref["T_global"], atol=1e-5)

    # identical fused hard labels on every point
    hard_ref = np.argmax(ref["W_hard"], axis=1)
    got_hard_W, got_miou = _repo_miou(got_W, inp["I_gt_global"])
    np.testing.assert_array_equal(np.argmax(got_hard_W, axis=1), hard_ref)

    # matching mIoU through both metric stacks
    assert abs(got_miou - ref["miou"]) < 1e-5


@needs_ref
@pytest.mark.parametrize("seed", [0, 3])
def test_device_paths_match_reference_hard_labels(seed):
    """The fully on-device merge (`merge_impl='device'`) and the patch-major
    fast path must reproduce the reference's fused hard labels too (their
    columns are compacted to a fixed width, so compare hard labels + mIoU
    rather than raw column layouts)."""
    rng = np.random.RandomState(seed)
    inp = _make_cascade_inputs(rng)
    ref = _reference_fusion(inp)
    hard_ref = np.argmax(ref["W_hard"], axis=1)
    width = inp["P"] * inp["K_l"] + inp["K_g"]

    dev_W, dev_X, dev_T = fuse_cascade(
        inp["patch_W"], inp["patch_X"], inp["patch_T"], inp["patch_indices"],
        inp["spfn_labels"], inp["spfn_normals"], inp["spfn_type"],
        n_max_global_instances=inp["K_g"],
        n_max_local_instances=inp["K_l"],
        out_width=width, merge_impl="device",
    )
    # fixed-width compaction keeps surviving clusters in stable order, so
    # argmax column ids coincide with the reference's dynamic layout
    np.testing.assert_array_equal(
        np.argmax(np.asarray(dev_W), axis=1), hard_ref
    )
    _, dev_miou = _repo_miou(
        np.asarray(dev_W)[:, : max(inp["K_g"], int(hard_ref.max()) + 1)],
        inp["I_gt_global"],
    )

    fast_W, fast_X, fast_T, n_valid = fuse_cascade_fast(
        jnp.asarray(inp["patch_W"]), jnp.asarray(inp["patch_X"]),
        jnp.asarray(inp["patch_T"]), jnp.asarray(inp["patch_indices"]),
        jnp.asarray(inp["spfn_labels"]), jnp.asarray(inp["spfn_normals"]),
        jnp.asarray(inp["spfn_type"]),
        n_max_global_instances=inp["K_g"],
        n_max_local_instances=inp["K_l"], out_width=width,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(fast_W), axis=1), hard_ref
    )
    np.testing.assert_allclose(np.asarray(fast_X), ref["X_global"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast_T), ref["T_global"], atol=1e-5)
    assert abs(dev_miou - ref["miou"]) < 1e-5
