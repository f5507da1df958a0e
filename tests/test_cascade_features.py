"""Feature-injected LocalSPFN through the serving paths (round 5, v11).

The reference wires glob/loc feature injection (`pn2_network.py:22-27`,
per-patch feature broadcast `dataloaders.py:275-281`) but ships LocalSPFN
feature-free. cpfn_tpu trains it (v11); these tests pin that the cascade's
three device serving paths thread the features identically:

  1. single-dispatch == bucketed == packed, bit-for-bit, with a
     feature-enabled local model (incl. the empty-pool fallback and the
     packed overflow re-run);
  2. the features actually reach the local network (zeroing the injected
     feature rows changes outputs);
  3. a feature-free runner's graphs are untouched by the new plumbing
     (covered by the existing suites, which all stay green).
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


def _bundle(key, sizes, **extra):
    cfg = PointNet2Config(output_sizes=sizes, **TINY, **extra)
    params, state = init_pointnet2(key, cfg)
    return ModelBundle(cfg, params, state)


@pytest.fixture(scope="module")
def runner():
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    return CascadeRunner(
        _bundle(keys[0], (3, Q, K_G)),
        _bundle(keys[1], (2,)),
        _bundle(
            keys[2], (3, Q, K_L),
            use_glob_features=True, use_loc_features=True,
        ),
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
    elif pool_kind == "dense":
        pool = np.ones(N_LR, bool)
    else:  # empty
        pool = np.zeros(N_LR, bool)
    return P_hr, P_hr[lr], pool


def _match(a, b):
    assert int(a["n_patches"]) == int(b["n_patches"])
    np.testing.assert_allclose(np.asarray(a["hard"]), np.asarray(b["hard"]))
    np.testing.assert_allclose(
        np.asarray(a["W"]), np.asarray(b["W"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["X"]), np.asarray(b["X"]), atol=1e-5
    )


def test_feature_paths_agree(runner):
    clouds = [_cloud(1), _cloud(2, "dense"), _cloud(3, "empty"), _cloud(4)]
    ref = list(runner.run_clouds_device(clouds, key=jax.random.PRNGKey(7)))
    buck = list(runner.run_clouds_bucketed(
        clouds, key=jax.random.PRNGKey(7), buckets=(4, 8), group=2
    ))
    # width 4 forces the dense cloud through the packed overflow re-run
    pack = list(runner.run_clouds_packed(
        clouds, key=jax.random.PRNGKey(7), group=2, width=4, buckets=(4, 8)
    ))
    for r, b, p in zip(ref, buck, pack):
        _match(r, b)
        _match(r, p)


def test_features_reach_local_network(runner):
    """Zeroing fp1's injected-feature kernel rows changes the cascade
    output — i.e. the glob/loc features genuinely flow into LocalSPFN."""
    cloud = _cloud(11)
    out = next(iter(runner.run_clouds_device(
        [cloud], key=jax.random.PRNGKey(3)
    )))

    lm = runner.local_model
    n_copy = lm.cfg.sa2_mlp[-1] + lm.cfg.sa3_mlp[-1]
    fp1 = dict(lm.params["fp1"])
    convs = list(fp1["convs"])
    w = np.asarray(convs[0]["w"]).copy()
    assert w.shape[0] > n_copy  # feature rows exist
    w[n_copy:] = 0.0
    convs[0] = {"w": jnp.asarray(w), "b": convs[0]["b"]}
    fp1["convs"] = convs
    zeroed = dict(lm.params)
    zeroed["fp1"] = fp1

    r2 = CascadeRunner(
        runner.global_model, runner.patchselec_model,
        ModelBundle(lm.cfg, zeroed, lm.state),
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=NPP, max_patches=MAXP,
    )
    out0 = next(iter(r2.run_clouds_device(
        [cloud], key=jax.random.PRNGKey(3)
    )))
    assert not np.allclose(np.asarray(out["W"]), np.asarray(out0["W"]))
