"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel train
step equivalence and patch-parallel inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_batch
from cpfn_tpu.fitting import factory
from cpfn_tpu.nn import PointNet2Config, init_pointnet2
from cpfn_tpu.parallel import (
    make_mesh,
    make_patch_parallel_forward,
    make_sharded_spfn_train_step,
    replicate,
    shard_batch,
)
from cpfn_tpu.train import SPFNTrainConfig, init_optimizer

TINY_MODEL = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
    fp1_mlp=(16, 16), fp2_mlp=(16, 16), fp3_mlp=(16, 16), fc_dim=16,
)
SCENE = SyntheticSceneConfig(
    n_points=128, n_max_instances=5, min_instances=2, max_instances=3,
    n_gt_points_per_instance=32, include_small_primitive=False,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device backend"
)


def test_data_parallel_train_step(rng):
    factory.register_primitives(list(SCENE.classes))
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model_cfg = PointNet2Config(
        output_sizes=(3, 4, SCENE.n_max_instances), **TINY_MODEL
    )
    train_cfg = SPFNTrainConfig(batch_size=n_dev, classes=SCENE.classes)
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step = make_sharded_spfn_train_step(
        model_cfg, train_cfg, mesh, optimizer=opt
    )
    batch = make_synthetic_batch(rng, n_dev, SCENE)
    params = replicate(params, mesh)
    state = replicate(state, mesh)
    opt_state = replicate(opt_state, mesh)
    b = shard_batch({k: jnp.array(v) for k, v in batch.items()}, mesh)
    for i in range(3):
        params, state, opt_state, metrics = step(
            params, state, opt_state, b,
            replicate(jnp.int32(i), mesh),
            replicate(jax.random.PRNGKey(i), mesh),
        )
    assert np.isfinite(float(metrics["total_loss"]))
    # params must remain replicated and finite
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_patch_parallel_forward_matches_single_device(rng):
    n_dev = len(jax.devices())
    mesh = make_mesh()
    model_cfg = PointNet2Config(output_sizes=(3, 4, 5), **TINY_MODEL)
    params, state = init_pointnet2(jax.random.PRNGKey(1), model_cfg)
    fwd = make_patch_parallel_forward(model_cfg, mesh)
    patches = jnp.array(rng.randn(n_dev * 2, 64, 3), jnp.float32)
    glob = jnp.zeros((n_dev * 2, model_cfg.glob_feature_dim), jnp.float32)
    loc = jnp.zeros((n_dev * 2, model_cfg.loc_feature_dim), jnp.float32)
    X, T, W = fwd(
        replicate(params, mesh), replicate(state, mesh),
        shard_batch(patches, mesh), shard_batch(glob, mesh),
        shard_batch(loc, mesh),
    )
    # single-device reference
    from cpfn_tpu.nn import apply_pointnet2
    from cpfn_tpu.nn.pointnet2 import spfn_postprocess

    out, _ = apply_pointnet2(params, state, model_cfg, patches, train=False)
    X1, T1, W1 = spfn_postprocess(out)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(W), np.asarray(W1), atol=1e-5)


def test_cloud_parallel_cascade_matches_single_device(rng):
    """A [B]-cloud batch sharded over the mesh must reproduce the
    single-device single-dispatch cascade per cloud."""
    from cpfn_tpu.data import make_synthetic_scene
    from cpfn_tpu.eval import CascadeRunner, ModelBundle
    from cpfn_tpu.parallel import make_cloud_parallel_cascade

    factory.register_primitives(list(SCENE.classes))
    n_dev = len(jax.devices())
    mesh = make_mesh()
    N_HR, N_LR, N_PATCH, MAX_P, K_G, K_L = 512, 128, 128, 4, 6, 5

    def bundle(key, sizes):
        cfg = PointNet2Config(output_sizes=sizes, **TINY_MODEL)
        params, state = init_pointnet2(key, cfg)
        return ModelBundle(cfg, params, state)

    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    runner = CascadeRunner(
        bundle(keys[0], (3, 4, K_G)), bundle(keys[1], (2,)),
        bundle(keys[2], (3, 4, K_L)),
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=N_PATCH, max_patches=MAX_P,
    )
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=2, max_instances=3,
        n_gt_points_per_instance=32,
    )
    P_hr, P_lr, pool = [], [], []
    for i in range(n_dev):
        s = make_synthetic_scene(rng, scene_cfg)
        P_hr.append(s["noisy_points"])
        lr_idx = rng.choice(N_HR, N_LR, replace=False)
        P_lr.append(s["noisy_points"][lr_idx])
        pool.append(s["I_gt"][lr_idx] == 0)  # arbitrary non-empty pool
    P_hr = jnp.asarray(np.stack(P_hr), jnp.float32)
    P_lr = jnp.asarray(np.stack(P_lr), jnp.float32)
    pool = jnp.asarray(np.stack(pool))
    ks = jax.random.split(jax.random.PRNGKey(9), n_dev)

    fn = make_cloud_parallel_cascade(runner, mesh)
    got = fn(P_hr, P_lr, pool, keys=ks)
    for i in range(n_dev):
        ref = runner.run_cloud_device(P_hr[i], P_lr[i], pool[i], key=ks[i])
        np.testing.assert_array_equal(
            np.asarray(got["hard"][i]), np.asarray(ref["hard"])
        )
        np.testing.assert_allclose(
            np.asarray(got["W"][i]), np.asarray(ref["W"]), atol=1e-5
        )
        assert int(got["n_patches"][i]) == int(ref["n_patches"])

    # patch-selection-network path shards the same way
    got_ps = fn(P_hr, P_lr, None, keys=ks)
    for i in range(n_dev):
        ref = runner.run_cloud_device(P_hr[i], P_lr[i], None, key=ks[i])
        np.testing.assert_array_equal(
            np.asarray(got_ps["hard"][i]), np.asarray(ref["hard"])
        )
