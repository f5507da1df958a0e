"""Unit tests for the preprocessing building blocks (beyond the pipeline
integration test): host FPS semantics, patch sampling invariants, meta
rescaling round trip."""

import numpy as np

from cpfn_tpu import native
from cpfn_tpu.eval.sampling import sample_patches
from cpfn_tpu.fitting import factory
from cpfn_tpu.preprocess.patch_creation import _rescale_meta
from cpfn_tpu.preprocess.patch_sampling import (
    get_small_primitives,
    sample_round_robin,
)


def test_fps_host_semantics(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    out = native.fps_host(pts, 32)
    # distinct points, argmax-of-min-dist greedy: the first selected point is
    # index 0 when no seeds zero anything (all dists 1e6 -> argmax = 0)
    assert out[0] == 0
    assert len(np.unique(out)) == 32
    # with seeds, no seed point may be re-selected early (min-dist zeroed)
    seeds = np.array([3, 7, 11], np.int32)
    out2 = native.fps_host(pts, 32, seed_idx=seeds)
    assert not set(seeds.tolist()) & set(out2[:5].tolist())


def test_fps_per_label_covers_all_labels(rng):
    pts = rng.randn(300, 3).astype(np.float32)
    labels = rng.randint(0, 7, 300).astype(np.int32)
    out = native.fps_per_label_host(pts, labels, start=5)
    assert len(out) == 7
    assert set(labels[out].tolist()) == set(range(7))


def test_get_small_primitives():
    labels = np.array([0] * 90 + [1] * 8 + [2] * 2)
    small = get_small_primitives(labels, max_nb_points=10)
    assert set(small.tolist()) == {1, 2}


def test_sample_round_robin_covers_labels(rng):
    n_lr, n_hr = 100, 1000
    pts_lr = rng.randn(n_lr, 3)
    pts_hr = rng.randn(n_hr, 3)
    pool = np.arange(40)
    pool_labels = np.repeat(np.arange(4), 10)
    patches = sample_round_robin(
        pts_lr, pts_hr, pool, pool_labels,
        num_points_patch=64, max_number_patches=8, rng=rng,
    )
    assert patches.shape[1] == 64
    assert patches.max() < n_hr
    # each patch is sorted by distance to its seed: distances nondecreasing
    # cannot be checked without the seed, but indices must be unique per patch
    for row in patches:
        assert len(np.unique(row)) == 64


def test_sample_patches_removes_pool_neighbors(rng):
    pts_lr = rng.randn(50, 3)
    pts_hr = np.concatenate([pts_lr, rng.randn(500, 3)])
    pool = np.arange(50)
    patches = sample_patches(
        pts_lr, pts_hr, pool, num_points_patch=32, max_number_patches=50,
        rng=rng,
    )
    # every patch contains its own seed (distance 0 -> first index)
    assert all(p[0] < 50 for p in patches)


def test_rescale_meta_roundtrip():
    factory.register_primitives(["sphere", "plane", "cylinder", "cone"])
    mean = np.array([1.0, -2.0, 0.5])
    norm = 2.0
    meta = {
        "type": "cylinder",
        "location_x": "3.0", "location_y": "0.0", "location_z": "0.5",
        "axis_x": "0.0", "axis_y": "0.0", "axis_z": "1.0",
        "radius": "1.0",
    }
    out = _rescale_meta(meta, mean, norm)
    prim = factory.create_primitive_from_dict(out)
    np.testing.assert_allclose(prim.center, ([3, 0, 0.5] - mean) / norm)
    assert prim.radius == 0.5
    cone = _rescale_meta(
        {"type": "cone", "apex_x": "1.0", "apex_y": "0.0", "apex_z": "0.0",
         "axis_x": "0", "axis_y": "0", "axis_z": "1", "semi_angle": "0.3"},
        mean, norm,
    )
    prim = factory.create_primitive_from_dict(cone)
    np.testing.assert_allclose(prim.apex, ([1, 0, 0] - mean) / norm)
    assert prim.half_angle == 0.3


def test_sampling_topk_parity(rng, monkeypatch):
    """CPFN_EXTRACT_TOPK swaps the per-patch kNN selection from a stable
    argsort prefix to lax.top_k on negated distances — outputs must be
    IDENTICAL, including tie behavior (both resolve equal distances to the
    lower index). Crafted duplicate points force exact distance ties."""
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.eval.sampling import sample_patches_device

    n_hr, n_lr, npp = 1500, 200, 256
    pts_hr = rng.randn(n_hr, 3).astype(np.float32)
    # exact ties: duplicate runs of points at several radii from everywhere
    pts_hr[200:230] = pts_hr[100:130]
    pts_hr[700:704] = pts_hr[0]
    pts_lr = pts_hr[rng.choice(n_hr, n_lr, replace=False)]
    pool = rng.rand(n_lr) < 0.3
    key = jax.random.PRNGKey(3)

    def run():
        # fresh jit so the trace re-reads the env knob
        fn = jax.jit(
            sample_patches_device.__wrapped__,
            static_argnames=(
                "num_points_patch", "max_number_patches", "deterministic"
            ),
        )
        return fn(
            jnp.asarray(pts_lr), jnp.asarray(pts_hr), jnp.asarray(pool),
            key, num_points_patch=npp, max_number_patches=4,
        )

    monkeypatch.delenv("CPFN_EXTRACT_TOPK", raising=False)
    idx_a, valid_a, count_a = run()
    monkeypatch.setenv("CPFN_EXTRACT_TOPK", "1")
    idx_b, valid_b, count_b = run()
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(valid_a), np.asarray(valid_b))
    assert int(count_a) == int(count_b)
