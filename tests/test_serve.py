"""The GT-free serving CLI (cpfn_tpu/serve.py): raw clouds -> fused
segmentation artifacts through the single-dispatch cascade. The reference
has no such entry point (its eval drivers all require labeled records)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cpfn_tpu import serve  # noqa: E402
from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene  # noqa: E402
from cpfn_tpu.models import (  # noqa: E402
    GlobalSPFN,
    LocalSPFN,
    PatchSelectionNet,
)


pytestmark = pytest.mark.slow  # compile-heavy integration; default suite: pytest -m "not slow"
TINY = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
    fp1_mlp=(16, 16), fp2_mlp=(16, 16), fp3_mlp=(16, 16), fc_dim=16,
)
N_HR, N_LR, N_PATCH, MAX_P, K_G, K_L = 512, 128, 128, 4, 6, 5


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_ckpts")
    key = jax.random.PRNGKey(0)
    GlobalSPFN(key, n_max_instances=K_G, **TINY).save(str(d / "globalspfn"))
    PatchSelectionNet(key, **TINY).save(str(d / "patchselec_0.05"))
    LocalSPFN(key, n_max_instances=K_L, **TINY).save(str(d / "localspfn_0.05"))
    return str(d)


def _write_clouds(tmp_path, rng):
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=2, max_instances=3,
        n_gt_points_per_instance=32,
    )
    in_dir = tmp_path / "clouds"
    in_dir.mkdir()
    # .npy exact size, plus a SMALLER .xyz cloud (exercises padding)
    s1 = make_synthetic_scene(rng, scene_cfg)
    np.save(in_dir / "a.npy", s1["noisy_points"].astype(np.float32))
    s2 = make_synthetic_scene(rng, scene_cfg)
    np.savetxt(in_dir / "b.xyz", s2["noisy_points"][: N_HR - 37])
    # a cloud LARGER than the serving shape (exercises the crop path)
    s3 = make_synthetic_scene(rng, scene_cfg)
    big = np.concatenate(
        [s3["noisy_points"], s3["noisy_points"][:50]], 0
    ).astype(np.float32)
    np.save(in_dir / "c.npy", big)
    return str(in_dir)


def _common_args(ckpt_dir, in_dir, out_dir):
    return [
        "--checkpoint_dir", ckpt_dir, "--input", in_dir,
        "--output_folder", out_dir,
        "--n_points_highres", str(N_HR), "--n_points_lowres", str(N_LR),
        "--num_points_patch", str(N_PATCH), "--max_patches", str(MAX_P),
        "--n_max_global_instances", str(K_G),
        "--n_max_local_instances", str(K_L),
        "--lowres", "random",
        "--model_overrides", json.dumps({k: list(v) if isinstance(v, tuple)
                                         else v for k, v in TINY.items()}),
    ]


def test_serve_writes_artifacts(tmp_path, rng, ckpt_dir):
    in_dir = _write_clouds(tmp_path, rng)
    out_dir = str(tmp_path / "out")
    serve.main(_common_args(ckpt_dir, in_dir, out_dir) + ["--fit_json"])

    for stem, n in (("a", N_HR), ("b", N_HR - 37)):
        seg = np.load(os.path.join(out_dir, f"{stem}_seg.npy"))
        assert seg.shape == (n,) and seg.dtype.kind == "i"
        normals = np.load(os.path.join(out_dir, f"{stem}_normals.npy"))
        assert normals.shape == (n, 3)
        norms = np.linalg.norm(normals, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        types = np.load(os.path.join(out_dir, f"{stem}_type.npy"))
        assert types.shape == (n,) and set(np.unique(types)) <= set(range(4))
        with open(os.path.join(out_dir, f"{stem}_primitives.json")) as f:
            recs = json.load(f)
        assert recs and all("type" in r for r in recs)

    # cropped cloud: outputs cover N_HR subsampled rows + an index mapping
    seg_c = np.load(os.path.join(out_dir, "c_seg.npy"))
    assert seg_c.shape == (N_HR,)
    idx_c = np.load(os.path.join(out_dir, "c_indices.npy"))
    assert idx_c.shape == (N_HR,)
    assert len(np.unique(idx_c)) == N_HR and idx_c.max() < N_HR + 50
    assert np.all(np.diff(idx_c) > 0)


def test_serve_packed_matches_default(tmp_path, rng, ckpt_dir):
    """--packed (group-vmapped two-phase cascade) writes byte-identical
    artifacts to the single-dispatch default — the serving key derivation
    and the fused outputs are pinned equal (tests/test_cascade_packed.py
    covers the runner; this pins the CLI wiring)."""
    in_dir = _write_clouds(tmp_path, rng)
    out_ref = str(tmp_path / "out_ref")
    out_packed = str(tmp_path / "out_packed")
    serve.main(_common_args(ckpt_dir, in_dir, out_ref))
    serve.main(
        _common_args(ckpt_dir, in_dir, out_packed)
        + ["--packed", "--pack_group", "2", "--pack_width", "2"]
    )
    for stem in ("a", "b", "c"):
        for suffix in ("seg", "type"):
            ref = np.load(os.path.join(out_ref, f"{stem}_{suffix}.npy"))
            got = np.load(os.path.join(out_packed, f"{stem}_{suffix}.npy"))
            np.testing.assert_array_equal(ref, got, err_msg=f"{stem}_{suffix}")
        ref_n = np.load(os.path.join(out_ref, f"{stem}_normals.npy"))
        got_n = np.load(os.path.join(out_packed, f"{stem}_normals.npy"))
        np.testing.assert_allclose(ref_n, got_n, atol=1e-6)


def test_serve_cloud_parallel_matches_artifact_schema(tmp_path, rng, ckpt_dir):
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    in_dir = _write_clouds(tmp_path, rng)
    out_dir = str(tmp_path / "out_par")
    serve.main(
        _common_args(ckpt_dir, in_dir, out_dir) + ["--cloud_parallel"]
    )
    seg = np.load(os.path.join(out_dir, "a_seg.npy"))
    assert seg.shape == (N_HR,)


def test_serve_packed_cloud_parallel_matches_packed(tmp_path, rng, ckpt_dir):
    """--packed --cloud_parallel (the composed throughput mode: packed group
    axis sharded over the mesh) writes byte-identical artifacts to plain
    --packed — sharding is a placement change, not a math change."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    in_dir = _write_clouds(tmp_path, rng)
    out_ref = str(tmp_path / "out_packed_ref")
    out_mesh = str(tmp_path / "out_packed_mesh")
    n_dev = len(jax.devices())
    # same group in both runs so the key stream and group padding match
    group = str(n_dev)
    serve.main(
        _common_args(ckpt_dir, in_dir, out_ref)
        + ["--packed", "--pack_group", group, "--pack_width", "2"]
    )
    serve.main(
        _common_args(ckpt_dir, in_dir, out_mesh)
        + ["--packed", "--cloud_parallel",
           "--pack_group", group, "--pack_width", "2"]
    )
    for stem in ("a", "b", "c"):
        for suffix in ("seg", "type"):
            ref = np.load(os.path.join(out_ref, f"{stem}_{suffix}.npy"))
            got = np.load(os.path.join(out_mesh, f"{stem}_{suffix}.npy"))
            np.testing.assert_array_equal(
                ref, got, err_msg=f"{stem}_{suffix}"
            )
        ref_n = np.load(os.path.join(out_ref, f"{stem}_normals.npy"))
        got_n = np.load(os.path.join(out_mesh, f"{stem}_normals.npy"))
        np.testing.assert_allclose(ref_n, got_n, atol=1e-6)
