"""Bucketed two-phase cascade (round 4): padded-width invariance + parity.

The bucketed serving path dispatches the fused phase-2 graph at the smallest
bucket width that fits the cloud's patch count instead of always paying the
full `max_patches` LocalSPFN stack. Its correctness rests on two properties
pinned here on tiny shapes (CPU mesh-free):

1. width invariance: phase 2 at width W with k real patches (k <= W) gives
   the same fused outputs as phase 2 at full width with the same patches
   zero-padded — padding rows are masked everywhere downstream.
2. end-to-end parity: run_clouds_bucketed == run_clouds_device outputs for
   the same clouds and key (both paths derive per-cloud keys identically).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


def _cloud(seed):
    rng = np.random.RandomState(seed)
    P_hr = rng.randn(N_HR, 3).astype(np.float32)
    lr = rng.choice(N_HR, N_LR, replace=False)
    pool = np.zeros(N_LR, bool)
    pool[rng.choice(N_LR, 6, replace=False)] = True
    return P_hr, P_hr[lr], pool


def test_phase2_width_invariance(runner):
    """Same real patches, width 4 vs zero-padded width 8: identical fusion."""
    P_hr, P_lr, pool = _cloud(0)
    staged = runner._phase1_device(
        runner.global_model.params, runner.global_model.state,
        jnp.asarray(P_hr), jnp.asarray(P_lr), jnp.asarray(pool),
        jax.random.PRNGKey(7),
    )
    count = int(staged["count"])
    assert 0 < count <= 4, count  # the scenario under test
    lm = runner.local_model
    args = (lm.params, lm.state, jnp.asarray(P_hr))
    tail = (staged["W_hard"], staged["X_g"], staged["T_g"])
    narrow = runner._phase2_device(
        *args, staged["idx"][:4], staged["mask"][:4], *tail
    )
    wide = runner._phase2_device(
        *args, staged["idx"], staged["mask"], *tail
    )
    for a, b, name in zip(narrow, wide, ("W", "X", "T", "n_valid")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_bucketed_matches_single_dispatch(runner):
    """End-to-end: bucketed pipeline == single-dispatch graph per cloud."""
    clouds = [_cloud(s) for s in (1, 2)]
    key = jax.random.PRNGKey(3)
    ref = list(runner.run_clouds_device(clouds, key=key))
    got = list(runner.run_clouds_bucketed(clouds, key=key, buckets=(4, 8)))
    assert len(ref) == len(got) == 2
    for r, g in zip(ref, got):
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


def test_bucketed_grouped_fetch_parity(runner):
    """group=2 over 5 clouds (two full groups + remainder): the batched
    patch-count fetch path yields the same stream as group=1."""
    clouds = [_cloud(s) for s in range(5, 10)]
    key = jax.random.PRNGKey(11)
    ref = list(
        runner.run_clouds_bucketed(clouds, key=key, buckets=(4, 8), group=1)
    )
    got = list(
        runner.run_clouds_bucketed(clouds, key=key, buckets=(4, 8), group=2)
    )
    assert len(ref) == len(got) == 5
    for r, g in zip(ref, got):
        assert int(r["n_patches"]) == int(g["n_patches"])
        assert r["bucket_width"] == g["bucket_width"]
        np.testing.assert_allclose(
            np.asarray(r["hard"]), np.asarray(g["hard"]), err_msg="hard"
        )


def test_bucketed_ps_pool_path(runner):
    """pool_mask=None routes through the patch-selection phase-1 graph."""
    P_hr, P_lr, _ = _cloud(4)
    outs = list(
        runner.run_clouds_bucketed([(P_hr, P_lr, None)], buckets=(4, 8))
    )
    assert len(outs) == 1
    assert outs[0]["W"].shape == (N_HR, K_G + K_L)
    assert outs[0]["hard"].shape == (N_HR,)
