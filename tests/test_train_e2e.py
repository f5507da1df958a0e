"""End-to-end slice: synthetic scenes -> jitted SPFN train step -> loss drops.
Also HDF5 round-trip of the synthetic writer through the TraceParts reader."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpfn_tpu.data import (
    SyntheticSceneConfig,
    make_synthetic_batch,
    make_synthetic_scene,
    write_scene_hdf5,
)
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.fitting import factory
from cpfn_tpu.nn import PointNet2Config, init_pointnet2
from cpfn_tpu.train import (
    SPFNTrainConfig,
    init_optimizer,
    make_spfn_train_step,
    make_patch_selection_train_step,
)
from cpfn_tpu.train.schedules import batch_norm_momentum, staircase_learning_rate

pytestmark = pytest.mark.slow  # multi-graph integration (compile-heavy); default suite
# stays <3 min: pytest -m "not slow"


TINY_MODEL = dict(
    sa1_points=32, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(32, 32), sa3_mlp=(32, 64),
    fp1_mlp=(32, 32), fp2_mlp=(32, 32), fp3_mlp=(32, 32, 32), fc_dim=32,
)
SCENE = SyntheticSceneConfig(
    n_points=256, n_max_instances=6, min_instances=2, max_instances=4,
    n_gt_points_per_instance=64, include_small_primitive=False,
)


def test_schedules():
    lr = staircase_learning_rate(1e-3, 16, 200000, 0.7)
    assert abs(float(lr(0)) - 1e-3) < 1e-8
    assert abs(float(lr(200000 // 16 + 1)) - 7e-4) < 1e-8
    bn = batch_norm_momentum(16, 200000)
    assert abs(float(bn(0)) - 0.5) < 1e-7
    assert abs(float(bn(200000 // 16 + 1)) - 0.25) < 1e-7
    # clip at 0.01
    assert abs(float(bn(10**9)) - 0.01) < 1e-7


def test_spfn_train_loss_decreases(rng):
    factory.register_primitives(list(SCENE.classes))
    model_cfg = PointNet2Config(
        output_sizes=(3, 4, SCENE.n_max_instances), **TINY_MODEL
    )
    train_cfg = SPFNTrainConfig(batch_size=4, classes=SCENE.classes)
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_spfn_train_step(model_cfg, train_cfg, optimizer=opt))

    batch = make_synthetic_batch(rng, 4, SCENE)
    batch = {k: jnp.array(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, state, opt_state, metrics = step_fn(
            params, state, opt_state, batch, jnp.int32(i), sub
        )
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.95, losses


def test_patch_selection_train_step(rng):
    # dropout off: the tiny test network has too little capacity to beat
    # p=0.5 dropout noise in a few dozen steps
    model_cfg = PointNet2Config(
        output_sizes=(2,), dropout_rate=0.0, **TINY_MODEL
    )
    train_cfg = SPFNTrainConfig(batch_size=4)
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step_fn = jax.jit(
        make_patch_selection_train_step(model_cfg, train_cfg, optimizer=opt)
    )
    P = jnp.array(rng.randn(4, 128, 3), jnp.float32)
    # learnable signal: label = x > 0
    labels = (np.asarray(P)[..., 0] > 0).astype(np.int64)
    batch = {"P": P, "labels": jnp.array(labels)}
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(100):
        key, sub = jax.random.split(key)
        params, state, opt_state, m = step_fn(
            params, state, opt_state, batch, jnp.int32(i), sub
        )
        losses.append(float(m["total_loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.92, losses


def test_hdf5_roundtrip(rng, tmp_path):
    factory.register_primitives(list(SCENE.classes))
    scene = make_synthetic_scene(rng, SCENE)
    path = os.path.join(tmp_path, "cloud.h5")
    write_scene_hdf5(path, scene)
    rec = read_spfn_hdf5(path, SCENE.n_max_instances, noisy=False, shuffle=False)
    assert rec is not None
    np.testing.assert_allclose(rec["P"], scene["P"], atol=1e-6)
    np.testing.assert_array_equal(rec["I_gt"], scene["I_gt"])
    np.testing.assert_array_equal(rec["T_gt"], scene["T_gt"])
    np.testing.assert_allclose(
        rec["plane_n_gt"], scene["plane_n_gt"], atol=1e-6
    )
    np.testing.assert_allclose(
        rec["cylinder_axis_gt"], scene["cylinder_axis_gt"], atol=1e-6
    )


def test_batch_iterator(rng, tmp_path):
    from cpfn_tpu.data import GlobalSPFNDataset, batch_iterator

    factory.register_primitives(list(SCENE.classes))
    files = []
    for i in range(5):
        scene = make_synthetic_scene(rng, SCENE)
        path = os.path.join(tmp_path, f"c{i}.h5")
        write_scene_hdf5(path, scene)
        files.append(path)
    ds = GlobalSPFNDataset(
        files, SCENE.n_max_instances, noisy=True, n_points=256, preload=True
    )
    batches = list(
        batch_iterator(ds, 2, rng=np.random.RandomState(0), shuffle=True)
    )
    assert len(batches) == 2
    assert batches[0]["P"].shape == (2, 256, 3)
    assert batches[0]["T_gt"].shape == (2, SCENE.n_max_instances)
    # degenerate inputs must yield nothing, not crash: an empty validation
    # split makes the trainer compute bs = min(batch_size, 0) = 0 (the
    # round-4 v9e90 crash — range(0, n, 0) at the epoch-10 validation)
    assert list(batch_iterator(ds, 0)) == []
    assert list(batch_iterator([], 2)) == []


def test_train_step_determinism(rng):
    """Two runs of the same jitted train step from identical state must agree
    bitwise — XLA's deterministic scatters replace the reference's atomicAdd
    nondeterminism (SURVEY.md §5 'race detection')."""
    factory.register_primitives(list(SCENE.classes))
    model_cfg = PointNet2Config(
        output_sizes=(3, 4, SCENE.n_max_instances), **TINY_MODEL
    )
    train_cfg = SPFNTrainConfig(batch_size=2, classes=SCENE.classes)
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_spfn_train_step(model_cfg, train_cfg, optimizer=opt))
    batch = {k: jnp.array(v) for k, v in make_synthetic_batch(rng, 2, SCENE).items()}

    outs = []
    for _ in range(2):
        p, s, o, m = step_fn(
            params, state, opt_state, batch, jnp.int32(0), jax.random.PRNGKey(7)
        )
        outs.append((p, m))
    a = jax.tree_util.tree_leaves(outs[0][0])
    b = jax.tree_util.tree_leaves(outs[1][0])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(outs[0][1]["total_loss"]) == float(outs[1][1]["total_loss"])


def test_device_dataset_staging_alignment():
    """--device_dataset staging must call __getitem__ ONCE per record and take
    every key from the same returned dict: datasets with a stochastic
    __getitem__ (TrainLocalSPFNDataset re-permutes points per call) would
    otherwise get a different permutation per key, silently decorrelating P
    from I_gt/normal_gt (the round-2 local-training bug)."""
    import numpy as np

    from cpfn_tpu.train.train_spfn import _BATCH_KEYS

    class StochasticDS:
        def __init__(self, n):
            self.n = n
            self.rng = np.random.RandomState(0)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            perm = self.rng.permutation(16)
            base = np.arange(16, dtype=np.float32) + 100 * i
            rec = {
                "P": np.stack([base[perm]] * 3, axis=1),
                "normal_gt": np.stack([base[perm]] * 3, axis=1),
                "I_gt": base[perm].astype(np.int64),
                "P_gt": np.zeros((4, 8, 3), np.float32),
                "T_gt": np.zeros((4,), np.int64),
                "plane_n_gt": np.zeros((4, 3), np.float32),
                "cylinder_axis_gt": np.zeros((4, 3), np.float32),
                "cone_axis_gt": np.zeros((4, 3), np.float32),
            }
            return rec

    # reproduce the (fixed) staging: one __getitem__ per record
    ds = StochasticDS(5)
    out = None
    for i in range(len(ds)):
        rec = ds[i]
        if out is None:
            out = {
                k: np.empty((len(ds),) + rec[k].shape, rec[k].dtype)
                for k in _BATCH_KEYS
            }
        for k in _BATCH_KEYS:
            out[k][i] = rec[k]
    for i in range(len(ds)):
        np.testing.assert_array_equal(out["P"][:, :, 0][i], out["I_gt"][i])
        np.testing.assert_array_equal(out["P"][i], out["normal_gt"][i])


def test_shard_slice_rotation():
    """_shard_slice cycles a corpus larger than the staging budget: shards
    taken at skip 0, n, 2n... cover every record before repeating."""
    from cpfn_tpu.train.train_spfn import _shard_slice

    files = [f"r{i}" for i in range(10)]
    assert _shard_slice(files, 0, -1) == files
    assert _shard_slice(files, 0, 4) == ["r0", "r1", "r2", "r3"]
    assert _shard_slice(files, 4, 4) == ["r4", "r5", "r6", "r7"]
    # wraps past the end and past the corpus size
    assert _shard_slice(files, 8, 4) == ["r8", "r9", "r0", "r1"]
    assert _shard_slice(files, 12, 3) == ["r2", "r3", "r4"]
    covered = set()
    for seg in range(3):
        covered.update(_shard_slice(files, 4 * seg, 4))
    assert covered == set(files)
    assert _shard_slice([], 5, 3) == []


def test_permute_batch_points_alignment():
    """The in-graph point-order augmentation permutes P, normal_gt and I_gt
    with the SAME per-record permutation (the round-2 staging bug class:
    decorrelated per-point arrays) and leaves per-instance arrays alone."""
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.train.train_spfn import permute_batch_points

    B, N = 3, 16
    rng = np.random.RandomState(0)
    P = rng.randn(B, N, 3).astype(np.float32)
    # encode point identity into the companion arrays
    normal = np.stack([P[..., 0] * 2, P[..., 1] * 2, P[..., 2] * 2], axis=-1)
    I_gt = np.argsort(P[..., 0], axis=1).argsort(axis=1).astype(np.int64)
    T_gt = np.arange(B * 4).reshape(B, 4)
    batch = {
        "P": jnp.asarray(P), "normal_gt": jnp.asarray(normal),
        "I_gt": jnp.asarray(I_gt), "T_gt": jnp.asarray(T_gt),
    }
    out = jax.jit(permute_batch_points)(batch, jax.random.PRNGKey(3))
    P2 = np.asarray(out["P"])
    # every record actually permuted (overwhelmingly likely for N=16)
    assert not np.allclose(P2, P)
    # alignment: companion arrays moved with their points
    np.testing.assert_allclose(np.asarray(out["normal_gt"]), P2 * 2, rtol=1e-6)
    rank = np.argsort(np.argsort(P2[..., 0], axis=1), axis=1)
    np.testing.assert_array_equal(np.asarray(out["I_gt"]), rank)
    # per-instance arrays untouched
    np.testing.assert_array_equal(np.asarray(out["T_gt"]), T_gt)
    # permutation property: same multiset of points per record
    for b in range(B):
        assert np.allclose(np.sort(P2[b], axis=0), np.sort(P[b], axis=0))
