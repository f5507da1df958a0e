"""Full cascaded inference on a small synthetic high-res cloud (tiny models,
untrained weights): every stage must run, shapes must line up, and the fused
output must beat garbage (metrics finite, normals unit, patches valid)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene
from cpfn_tpu.eval import CascadeRunner, ModelBundle
from cpfn_tpu.fitting import factory
from cpfn_tpu.metrics import compute_all_metrics
from cpfn_tpu.nn import PointNet2Config, init_pointnet2

pytestmark = pytest.mark.slow  # multi-graph integration (compile-heavy); default suite
# stays <3 min: pytest -m "not slow"


TINY = dict(
    sa1_points=32, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
    fp1_mlp=(16, 16), fp2_mlp=(16, 16), fp3_mlp=(16, 16), fc_dim=16,
)
N_HR, N_LR, N_PATCH, MAX_PATCHES = 2048, 256, 256, 4
K_G, K_L, Q = 8, 5, 4


def _bundle(key, output_sizes):
    cfg = PointNet2Config(output_sizes=output_sizes, **TINY)
    params, state = init_pointnet2(key, cfg)
    return ModelBundle(cfg, params, state)


def _runner():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    return CascadeRunner(
        _bundle(keys[0], (3, Q, K_G)),
        _bundle(keys[1], (2,)),
        _bundle(keys[2], (3, Q, K_L)),
        n_max_global_instances=K_G,
        n_max_local_instances=K_L,
        num_points_patch=N_PATCH,
        max_patches=MAX_PATCHES,
    )


def test_cascade_runs_and_fuses(rng):
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"]
    P_lr = P_hr[rng.choice(N_HR, N_LR, replace=False)]
    runner = _runner()
    out = runner.run_cloud(P_hr, P_lr, rng=rng)
    assert out["W"].shape[0] == N_HR and out["W"].shape[1] >= K_G
    assert out["X"].shape == (N_HR, 3)
    np.testing.assert_allclose(
        np.linalg.norm(out["X"], axis=1), 1.0, atol=1e-4
    )
    assert out["T"].shape == (N_HR, Q)
    if out["n_patches"] > 0:
        assert out["patch_indices"].shape[1] == N_PATCH
        assert out["patch_indices"].max() < N_HR

    # fused outputs must feed the metric suite
    m = compute_all_metrics(
        jnp.asarray(P_hr)[None],
        jnp.asarray(out["X"])[None],
        jnp.asarray(scene["normal_gt"])[None],
        jnp.asarray(out["W"][:, :K_G])[None],
        jnp.asarray(scene["I_gt"])[None],
        jnp.asarray(out["T"])[None],
        jnp.asarray(scene["T_gt"])[None],
        jnp.asarray(scene["P_gt"])[None],
        {
            "plane_normal": jnp.asarray(scene["plane_n_gt"])[None],
            "cylinder_axis": jnp.asarray(scene["cylinder_axis_gt"])[None],
            "cone_axis": jnp.asarray(scene["cone_axis_gt"])[None],
        },
    )
    for k in ("mIoU", "type_accuracy", "normal_difference"):
        assert np.all(np.isfinite(np.asarray(m[k]))), k
    assert 0.0 <= float(m["mIoU"][0]) <= 1.0


def test_cascade_gt_oracle_pool(rng):
    """GT-oracle patch selection (scale>=1 mode): hand the runner the pool."""
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=3, max_instances=4,
        n_gt_points_per_instance=64,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"]
    lr_idx = rng.choice(N_HR, N_LR, replace=False)
    P_lr = P_hr[lr_idx]
    # pool = low-res points of the smallest instance
    counts = np.bincount(scene["I_gt"])
    small = int(np.argmin(counts[: counts.nonzero()[0].max() + 1]))
    pool = np.where(scene["I_gt"][lr_idx] == small)[0]
    runner = _runner()
    out = runner.run_cloud(P_hr, P_lr, pool_indices=pool, rng=rng)
    if len(pool) > 0:
        assert out["n_patches"] >= 1
        # patches should cover the small instance's low-res seeds
        covered = np.unique(out["patch_indices"])
        seed_hr = lr_idx[pool]
        assert np.isin(seed_hr, covered).mean() > 0.5


def test_cascade_with_patch_parallel_mesh(rng):
    """Cascade with the patch axis sharded over the 8-device CPU mesh must
    match the single-device cascade."""
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    from cpfn_tpu.parallel import make_mesh

    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"]
    lr_idx = rng.choice(N_HR, N_LR, replace=False)
    P_lr = P_hr[lr_idx]
    pool = np.arange(16)  # fixed pool for determinism

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    bundles = [
        _bundle(keys[0], (3, Q, K_G)),
        _bundle(keys[1], (2,)),
        _bundle(keys[2], (3, Q, K_L)),
    ]
    kw = dict(
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=N_PATCH, max_patches=8,
    )
    single = CascadeRunner(*bundles, **kw)
    meshed = CascadeRunner(*bundles, mesh=make_mesh(), **kw)
    out_s = single.run_cloud(P_hr, P_lr, pool_indices=pool,
                             rng=np.random.RandomState(3))
    out_m = meshed.run_cloud(P_hr, P_lr, pool_indices=pool,
                             rng=np.random.RandomState(3))
    assert out_s["n_patches"] == out_m["n_patches"]
    np.testing.assert_allclose(
        np.asarray(out_s["W"]), np.asarray(out_m["W"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_s["X"]), np.asarray(out_m["X"]), atol=1e-4
    )


def test_cascade_all_device_single_dispatch(rng):
    """run_cloud_device: the single-dispatch cascade produces the same fused
    output as the host-orchestrated path given the same patches, and the
    ps-pool mode runs end to end."""
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"]
    lr_idx = rng.choice(N_HR, N_LR, replace=False)
    P_lr = P_hr[lr_idx]
    # GT-oracle pool: low-res points on the smallest instance
    counts = np.bincount(scene["I_gt"])
    small = np.argmin(counts[: counts.nonzero()[0].max() + 1])
    pool_mask = scene["I_gt"][lr_idx] == small

    runner = _runner()
    out = runner.run_cloud_device(P_hr, P_lr, pool_mask=pool_mask)
    n_patches = int(out["n_patches"])
    assert n_patches > 0
    assert np.all(np.isfinite(np.asarray(out["W"])))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["X"]), axis=1), 1.0, atol=1e-4
    )
    # same patches through the host-orchestrated phase2 -> same fused labels
    from cpfn_tpu.merging import fuse_cascade

    idx = np.asarray(out["patch_indices"])
    mask = np.asarray(out["patch_valid"]).astype(np.float32)
    lm = runner.local_model
    patches = runner._normalize_patches(jnp.asarray(P_hr, jnp.float32),
                                        jnp.asarray(idx, jnp.int32))
    X_p, T_p, W_p = runner._local_fwd(lm.params, lm.state, patches)
    W_ref, X_ref, T_ref = fuse_cascade(
        W_p, X_p, T_p, idx, np.asarray(out["global_W"]),
        np.asarray(out["global_X"]), np.asarray(out["global_T"]),
        K_G, K_L, patch_mask=mask, out_width=runner.out_width,
        merge_impl="device",
    )
    np.testing.assert_allclose(
        np.asarray(out["W"]), np.asarray(W_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["X"]), np.asarray(X_ref), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out["hard"]), np.argmax(np.asarray(W_ref), axis=1))

    # the patch-selection-pool production mode runs end to end
    out_ps = runner.run_cloud_device(P_hr, P_lr)
    assert np.all(np.isfinite(np.asarray(out_ps["W"])))

    # pipelined driver yields one result per cloud
    clouds = [(P_hr, P_lr, pool_mask)] * 3
    results = list(runner.run_clouds_device(clouds, lag=2))
    assert len(results) == 3


def test_cascade_single_dispatch_shuffle_ensemble(rng):
    """n_shuffles > 1: the in-graph shuffle ensemble (eval/ensemble.py)
    produces valid fused outputs through the single-dispatch cascade, on
    both the oracle-pool and the patch-selection production paths."""
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"]
    lr_idx = rng.choice(N_HR, N_LR, replace=False)
    P_lr = P_hr[lr_idx]
    counts = np.bincount(scene["I_gt"])
    small = np.argmin(counts[: counts.nonzero()[0].max() + 1])
    pool_mask = scene["I_gt"][lr_idx] == small

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    runner = CascadeRunner(
        _bundle(keys[0], (3, Q, K_G)),
        _bundle(keys[1], (2,)),
        _bundle(keys[2], (3, Q, K_L)),
        n_max_global_instances=K_G,
        n_max_local_instances=K_L,
        num_points_patch=N_PATCH,
        max_patches=MAX_PATCHES,
        n_shuffles=3,
    )
    out = runner.run_cloud_device(P_hr, P_lr, pool_mask=pool_mask)
    assert int(out["n_patches"]) > 0
    W = np.asarray(out["W"])
    assert np.all(np.isfinite(W))
    # averaged soft memberships still behave like memberships
    assert W.min() >= -1e-6 and W.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["X"]), axis=1), 1.0, atol=1e-4
    )
    assert np.asarray(out["hard"]).shape == (N_HR,)
    # production (patch-selection pool) path under the ensemble
    out_ps = runner.run_cloud_device(P_hr, P_lr)
    assert np.all(np.isfinite(np.asarray(out_ps["W"])))
