"""PointNet++ backbone: shape, state, and head-config tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.nn import PointNet2Config, apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess

TINY = dict(
    sa1_points=32, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=(16, 16), sa2_mlp=(32, 32), sa3_mlp=(32, 64),
    fp1_mlp=(32, 32), fp2_mlp=(32, 32), fp3_mlp=(32, 32, 32), fc_dim=32,
)


def test_forward_shapes_spfn(rng):
    cfg = PointNet2Config(output_sizes=(3, 4, 7), **TINY)
    key = jax.random.PRNGKey(0)
    params, state = init_pointnet2(key, cfg)
    P = jnp.array(rng.randn(2, 128, 3), jnp.float32)
    out, new_state = apply_pointnet2(
        params, state, cfg, P, train=True, rng=key, bn_momentum=0.5
    )
    assert [h.shape for h in out["heads"]] == [
        (2, 128, 3), (2, 128, 4), (2, 128, 7),
    ]
    assert out["global_feat"].shape == (2, 64)
    assert out["point_feat"].shape == (2, 128, 32)
    X, T, W = spfn_postprocess(out)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(X), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(W).sum(-1), 1.0, atol=1e-5)
    # train mode must update BN state
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state, new_state
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_eval_deterministic(rng):
    cfg = PointNet2Config(output_sizes=(2,), **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(1), cfg)
    P = jnp.array(rng.randn(2, 64, 3), jnp.float32)
    out1, st1 = apply_pointnet2(params, state, cfg, P, train=False)
    out2, st2 = apply_pointnet2(params, state, cfg, P, train=False)
    np.testing.assert_array_equal(
        np.asarray(out1["heads"][0]), np.asarray(out2["heads"][0])
    )
    # eval mode must NOT update BN state
    same = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), state, st1
    )
    assert all(jax.tree_util.tree_leaves(same))


def test_injected_features(rng):
    cfg = PointNet2Config(
        output_sizes=(3, 4, 5), use_glob_features=True, use_loc_features=True,
        **TINY,
    )
    params, state = init_pointnet2(jax.random.PRNGKey(2), cfg)
    P = jnp.array(rng.randn(2, 64, 3), jnp.float32)
    glob = jnp.array(rng.randn(2, cfg.glob_feature_dim), jnp.float32)
    loc = jnp.array(rng.randn(2, cfg.loc_feature_dim), jnp.float32)
    out, _ = apply_pointnet2(
        params, state, cfg, P, glob_features=glob, loc_features=loc,
        train=False,
    )
    assert out["global_feat"].shape == (
        2, cfg.sa3_mlp[-1] + cfg.glob_feature_dim + cfg.loc_feature_dim,
    )


def test_features_extractor_mode(rng):
    cfg = PointNet2Config(output_sizes=(2,), features_extractor=True, **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(3), cfg)
    P = jnp.array(rng.randn(1, 64, 3), jnp.float32)
    out, _ = apply_pointnet2(params, state, cfg, P, train=False)
    assert out["heads"] == []
    assert out["point_feat"].shape == (1, 64, 32)


def test_grad_flows_through_network(rng):
    cfg = PointNet2Config(output_sizes=(3,), **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(4), cfg)
    P = jnp.array(rng.randn(2, 64, 3), jnp.float32)

    def loss(params):
        out, _ = apply_pointnet2(
            params, state, cfg, P, train=True,
            rng=jax.random.PRNGKey(5), bn_momentum=0.5,
        )
        return jnp.sum(out["heads"][0] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # at least the head weights must receive nonzero gradient
    assert float(jnp.max(jnp.abs(g["heads"][0]["w"]))) > 0


def test_bf16_compute_close_to_f32(rng):
    import dataclasses

    cfg = PointNet2Config(output_sizes=(3, 4, 7), **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    P = jnp.array(rng.randn(2, 128, 3), jnp.float32)
    out32, _ = apply_pointnet2(params, state, cfg, P, train=False)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out16, _ = apply_pointnet2(params, state, cfg16, P, train=False)
    # bf16 matmuls with f32 accumulation: small relative deviation
    a, b = np.asarray(out32["heads"][0]), np.asarray(out16["heads"][0])
    assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(a).max())


def test_bf16_activation_pipeline_active_in_eval(rng):
    """The eval bf16 pipeline must genuinely run low-precision activations —
    outputs measurably differ from f32 (on CPU the f32 matmul path is true
    f32, so identical outputs would mean the flag is a no-op, the round-4
    finding against the cast-inputs-only implementation) — while every
    boundary output stays f32-typed."""
    import dataclasses

    cfg = PointNet2Config(output_sizes=(3, 4, 7), **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    P = jnp.array(rng.randn(2, 128, 3), jnp.float32)
    out32, _ = apply_pointnet2(params, state, cfg, P, train=False)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out16, _ = apply_pointnet2(params, state, cfg16, P, train=False)
    for k in ("global_feat", "point_feat"):
        assert out16[k].dtype == jnp.float32, k
    assert all(h.dtype == jnp.float32 for h in out16["heads"])
    assert float(jnp.max(jnp.abs(out32["heads"][2] - out16["heads"][2]))) > 0

    # training keeps f32 activations and f32 BN statistics (only matmul
    # inputs are tagged bf16), so state updates track the f32 path closely
    _, st32 = apply_pointnet2(
        params, state, cfg, P, train=True, rng=jax.random.PRNGKey(1)
    )
    _, st16 = apply_pointnet2(
        params, state, cfg16, P, train=True, rng=jax.random.PRNGKey(1)
    )
    m32 = st32["sa1"]["bns"][0]["mean"]
    m16 = st16["sa1"]["bns"][0]["mean"]
    assert m32.dtype == m16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(m32), np.asarray(m16), rtol=0.05, atol=0.02
    )


def test_input_features_beyond_xyz(rng):
    """dim_input > dim_pos: extra per-point channels flow through SA1 grouping
    and the FP3 skip connection (reference pn2_network.py:41-45,58)."""
    cfg = PointNet2Config(output_sizes=(2,), dim_input=6, dim_pos=3, **TINY)
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    P = jnp.array(rng.randn(2, 64, 6), jnp.float32)
    out, _ = apply_pointnet2(params, state, cfg, P, train=False)
    assert out["heads"][0].shape == (2, 64, 2)
    # the extra channels must influence the output
    P2 = P.at[..., 3:].add(1.0)
    out2, _ = apply_pointnet2(params, state, cfg, P2, train=False)
    assert float(jnp.max(jnp.abs(out["heads"][0] - out2["heads"][0]))) > 1e-6


def test_bn_eval_mode_freezes_statistics(rng):
    """bn_eval_mode: train=True forward normalizes with running stats (same
    outputs as eval mode when dropout is off) and never updates BN state —
    the frozen-BN transfer fine-tune mode."""
    import dataclasses

    cfg = PointNet2Config(
        output_sizes=(2,), dropout_rate=0.0, bn_eval_mode=True, **TINY
    )
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    P = jnp.array(rng.randn(2, 128, 3), jnp.float32)
    out_tr, st_tr = apply_pointnet2(
        params, state, cfg, P, train=True, rng=jax.random.PRNGKey(1)
    )
    out_ev, _ = apply_pointnet2(params, state, cfg, P, train=False)
    np.testing.assert_allclose(
        np.asarray(out_tr["heads"][0]), np.asarray(out_ev["heads"][0]),
        rtol=1e-6, atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_tr), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: without bn_eval_mode the same call DOES update BN state
    cfg2 = dataclasses.replace(cfg, bn_eval_mode=False)
    _, st2 = apply_pointnet2(
        params, state, cfg2, P, train=True, rng=jax.random.PRNGKey(1)
    )
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(st2), jax.tree_util.tree_leaves(state)
        )
    )
    assert changed
