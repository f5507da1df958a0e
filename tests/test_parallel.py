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
