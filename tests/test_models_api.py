"""High-level models API."""

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.models import GlobalSPFN, LocalSPFN, PatchSelectionNet

TINY = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(16, 16), sa3_mlp=(16, 32),
    fp1_mlp=(16, 16), fp2_mlp=(16, 16), fp3_mlp=(16, 16), fc_dim=16,
)


def test_model_factories_and_predict(rng, tmp_path):
    key = jax.random.PRNGKey(0)
    g = GlobalSPFN(key, n_max_instances=6, **TINY)
    P = jnp.array(rng.randn(2, 64, 3), jnp.float32)
    X, T, W = g.predict(P)
    assert X.shape == (2, 64, 3) and T.shape == (2, 64, 4)
    assert W.shape == (2, 64, 6)
    np.testing.assert_allclose(np.asarray(W).sum(-1), 1.0, atol=1e-5)

    l = LocalSPFN(key, n_max_instances=5, use_features=True, **TINY)
    out = l(
        P, glob_features=jnp.zeros((2, l.cfg.glob_feature_dim)),
        loc_features=jnp.zeros((2, l.cfg.loc_feature_dim)),
    )
    assert out["heads"][2].shape == (2, 64, 5)

    ps = PatchSelectionNet(key, **TINY)
    assert ps(P)["heads"][0].shape == (2, 64, 2)

    # save/load round trip
    d = str(tmp_path / "m")
    g.save(d, step=1)
    g2 = GlobalSPFN(jax.random.PRNGKey(9), n_max_instances=6, **TINY).load(d)
    X2, _, _ = g2.predict(P)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X2), atol=1e-6)
