"""Packed serving path (round 4): group-vmapped phase 1 + phase 2.

`run_clouds_packed` batches phase 1 over a group of clouds in one vmapped
dispatch and runs one vmapped width-`width` phase-2 dispatch for the whole
group (overflow clouds re-run individually at a wider bucket). Correctness
rests on the same two properties as the bucketed path (width invariance +
identical per-cloud key derivation) plus group-padding invariance, all
pinned here against the single-dispatch graph on tiny CPU shapes.
"""

import numpy as np
import pytest

import jax

from cpfn_tpu.eval.cascade import CascadeRunner, ModelBundle
from cpfn_tpu.nn import PointNet2Config, init_pointnet2

pytestmark = pytest.mark.slow  # multi-graph integration (compile-heavy); default suite
# stays <3 min: pytest -m "not slow"


TINY = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(8, 8), sa2_mlp=(8, 8), sa3_mlp=(8, 16),
    fp1_mlp=(8, 8), fp2_mlp=(8, 8), fp3_mlp=(8, 8), fc_dim=8,
)
N_HR, N_LR, NPP, MAXP = 512, 64, 64, 8
K_G, K_L, Q = 5, 4, 4


@pytest.fixture(scope="module")
def runner():
    def bundle(key, sizes):
        cfg = PointNet2Config(output_sizes=sizes, **TINY)
        params, state = init_pointnet2(key, cfg)
        return ModelBundle(cfg, params, state)

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    return CascadeRunner(
        bundle(keys[0], (3, Q, K_G)),
        bundle(keys[1], (2,)),
        bundle(keys[2], (3, Q, K_L)),
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=NPP, max_patches=MAXP,
    )


def _cloud(seed, pool_kind="few"):
    rng = np.random.RandomState(seed)
    P_hr = rng.randn(N_HR, 3).astype(np.float32)
    lr = rng.choice(N_HR, N_LR, replace=False)
    if pool_kind == "few":
        pool = np.zeros(N_LR, bool)
        pool[rng.choice(N_LR, 6, replace=False)] = True
    elif pool_kind == "dense":  # saturates extraction -> overflow at w=4
        pool = np.ones(N_LR, bool)
    elif pool_kind == "empty":  # global-only fallback branch
        pool = np.zeros(N_LR, bool)
    else:
        pool = None  # patch-selection network
    return P_hr, P_hr[lr], pool


def _assert_cloud_match(r, g):
    assert int(r["n_patches"]) == int(g["n_patches"])
    np.testing.assert_allclose(
        np.asarray(r["hard"]), np.asarray(g["hard"]), err_msg="hard"
    )
    np.testing.assert_allclose(
        np.asarray(r["W"]), np.asarray(g["W"]), atol=1e-5, err_msg="W"
    )
    np.testing.assert_allclose(
        np.asarray(r["X"]), np.asarray(g["X"]), atol=1e-5, err_msg="X"
    )
    np.testing.assert_allclose(
        np.asarray(r["T"]), np.asarray(g["T"]), atol=1e-5, err_msg="T"
    )


def test_packed_matches_single_dispatch(runner):
    """5 clouds (incl. a dense-pool overflow and an empty-pool fallback),
    group=2 with a short tail group: packed == single-dispatch stream."""
    clouds = [
        _cloud(1), _cloud(2, "dense"), _cloud(3), _cloud(4, "empty"),
        _cloud(5),
    ]
    key = jax.random.PRNGKey(3)
    ref = list(runner.run_clouds_device(clouds, key=key))
    got = list(
        runner.run_clouds_packed(
            clouds, key=key, group=2, width=4, buckets=(4, 8)
        )
    )
    assert len(ref) == len(got) == 5
    # the scenario under test: at least one overflow + one empty pool
    assert any(int(r["n_patches"]) > 4 for r in ref)
    assert any(int(r["n_patches"]) == 0 for r in ref)
    for r, g in zip(ref, got):
        _assert_cloud_match(r, g)


def test_packed_group_padding_invariance(runner):
    """3 clouds at group=4 (one padded group) vs group=1 (no padding):
    identical streams — padded rows never leak into results."""
    clouds = [_cloud(s) for s in (6, 7, 8)]
    key = jax.random.PRNGKey(11)
    ref = list(
        runner.run_clouds_packed(
            clouds, key=key, group=1, width=4, buckets=(4, 8)
        )
    )
    got = list(
        runner.run_clouds_packed(
            clouds, key=key, group=4, width=4, buckets=(4, 8)
        )
    )
    assert len(ref) == len(got) == 3
    for r, g in zip(ref, got):
        _assert_cloud_match(r, g)
        assert r["bucket_width"] == g["bucket_width"]


def test_packed_cloud_parallel_mesh(runner):
    """make_cloud_parallel_packed on the virtual 8-device CPU mesh: the
    group axis shards over the mesh (GSPMD, zero collectives) and the
    result stream matches the unsharded packed path cloud-for-cloud —
    includes an overflow (dense pool) and an empty-pool fallback cloud so
    both per-cloud follow-up branches run against sharded staged arrays."""
    from cpfn_tpu.parallel import make_cloud_parallel_packed, make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    clouds = [
        _cloud(21), _cloud(22, "dense"), _cloud(23, "empty"), _cloud(24),
        _cloud(25), _cloud(26), _cloud(27), _cloud(28), _cloud(29),
        _cloud(30),
    ]
    key = jax.random.PRNGKey(17)
    ref = list(
        runner.run_clouds_packed(
            clouds, key=key, group=8, width=4, buckets=(4, 8)
        )
    )
    run = make_cloud_parallel_packed(runner, mesh, width=4, buckets=(4, 8))
    got = list(run(clouds, group=8, key=key))
    assert len(ref) == len(got) == 10
    assert any(int(r["n_patches"]) > 4 for r in ref)  # overflow branch
    assert any(int(r["n_patches"]) == 0 for r in ref)  # fallback branch
    for r, g in zip(ref, got):
        _assert_cloud_match(r, g)

    with pytest.raises(ValueError):
        run(clouds, group=3)


def test_packed_ps_pool_path(runner):
    """pool_mask=None routes through the vmapped patch-selection phase-1
    graph and matches the single-dispatch patch-selection graph."""
    clouds = [_cloud(9, None), _cloud(10, None), _cloud(12, None)]
    key = jax.random.PRNGKey(5)
    ref = list(runner.run_clouds_device(clouds, key=key))
    got = list(
        runner.run_clouds_packed(
            clouds, key=key, group=2, width=4, buckets=(4, 8)
        )
    )
    assert len(ref) == len(got) == 3
    for r, g in zip(ref, got):
        _assert_cloud_match(r, g)


def test_precompile_packed_then_run(runner):
    """The lean driver-mode warmup (precompile_packed) must compile every
    graph the packed loop reaches — running the stream right after it must
    produce single-dispatch-identical results for few/dense(overflow)/empty
    pools and the PS-pool path (no mid-stream graph surprises)."""
    key = jax.random.PRNGKey(3)
    runner.precompile_packed(_cloud(1), group=2, width=4, buckets=(4, 8))
    runner.precompile_packed(
        _cloud(1, "ps"), group=2, width=4, buckets=(4, 8)
    )
    oracle = [_cloud(1), _cloud(2, "dense"), _cloud(4, "empty")]
    ps = [_cloud(6, "ps"), _cloud(7, "ps")]
    for clouds in (oracle, ps):  # pool kinds don't mix within one stream
        ref = list(runner.run_clouds_device(clouds, key=key))
        got = list(
            runner.run_clouds_packed(
                clouds, key=key, group=2, width=4, buckets=(4, 8)
            )
        )
        for r, g in zip(ref, got):
            _assert_cloud_match(r, g)
