"""Per-stage wall ledger of the cascade's device graphs (round 5).

bucket_diag gives phase-level times; this splits phase 2 into its component
graphs so the next kernel target is named by measurement, not guess:

  - global forward (1 x 100k), patch extraction, local forward at w8/w32
  - fuse_cascade_fast total at w8/w32, and its five sub-graphs at w32
    (patch-major membership scatter, similarity Gram, device greedy merge,
    cluster projection + fused contraction, normals/types scatter)
  - phase2_device total at w8/w32 (post fast-fusion switch; compare against
    bucket_diag's point-major 43.95/120.23 ms rows)
  - FPS + ball-query at the two SA1 shapes (the named next bottleneck)
  - cascade_single for reference

Each row is a separately-jitted graph timed with forced host
materialization (the axon tunnel does not block on block_until_ready), so
rows include one dispatch each (~0.06 ms, bucket_diag.per_dispatch_ms).

Run on the chip (exclusive claim): python tools/phase_ledger.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(fn, reps=8):
    fn()  # warm (compile)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(np.asarray(out).ravel()[:1])
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene
    from cpfn_tpu.eval import CascadeRunner, ModelBundle
    from cpfn_tpu.eval.sampling import sample_patches_device
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.merging.device_merge import heuristic_merge_device
    from cpfn_tpu.merging import fusion
    from cpfn_tpu.nn import PointNet2Config, init_pointnet2, apply_pointnet2
    from cpfn_tpu.nn.pointnet2 import spfn_postprocess
    from cpfn_tpu.ops import ball_query, farthest_point_sample
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    N_HR = int(os.environ.get("CPFN_LEDGER_NHR", "100000"))
    N_LR = int(os.environ.get("CPFN_LEDGER_NLR", "8192"))
    NPP = int(os.environ.get("CPFN_LEDGER_NPP", "8192"))
    MAXP, K_G, K_L, Q = 32, 28, 21, 4
    rng = np.random.RandomState(0)
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=10,
        max_instances=16, n_gt_points_per_instance=512, n_small_primitives=8,
    )
    factory.register_primitives(list(scene_cfg.classes))
    scene = make_synthetic_scene(rng, scene_cfg)
    P_hr = scene["noisy_points"][:N_HR]
    lr_idx = rng.choice(len(P_hr), N_LR, replace=False)
    labels_lr = scene["I_gt"][lr_idx]
    counts = np.bincount(scene["I_gt"])
    small = np.where(counts < 0.05 * len(P_hr))[0]
    pool = np.isin(labels_lr, small)

    def bundle(key, sizes):
        cfg = PointNet2Config(output_sizes=sizes)
        params, state = init_pointnet2(key, cfg)
        return ModelBundle(cfg, params, state)

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    runner = CascadeRunner(
        bundle(keys[0], (3, Q, K_G)), bundle(keys[1], (2,)),
        bundle(keys[2], (3, Q, K_L)),
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=NPP, max_patches=MAXP,
    )
    gm, lm = runner.global_model, runner.local_model
    P_hr_j = jnp.asarray(P_hr, jnp.float32)
    P_lr_j = jnp.asarray(P_hr[lr_idx], jnp.float32)
    pool_j = jnp.asarray(pool, bool)
    key = jax.random.PRNGKey(0)

    res = {}

    def prog(name):
        print(f"[phase_ledger] {name}...", file=sys.stderr, flush=True)

    # ---- phase-1 components -------------------------------------------------
    @jax.jit
    def g_fwd(P):
        out, _ = apply_pointnet2(
            gm.params, gm.state, gm.cfg, P[None], train=False
        )
        return spfn_postprocess(out)

    prog("global_fwd_100k")
    res["global_fwd_100k_ms"] = round(_t(lambda: g_fwd(P_hr_j)[2]), 2)

    extract = jax.jit(
        lambda k: sample_patches_device(
            P_lr_j, P_hr_j, pool_j, k,
            num_points_patch=NPP, max_number_patches=MAXP,
        )
    )
    prog("patch_extraction")
    res["patch_extraction_ms"] = round(_t(lambda: extract(key)[0]), 2)

    # top_k kNN-selection variant (CPFN_EXTRACT_TOPK, identical outputs —
    # tests/test_preprocess.py::test_sampling_topk_parity); fresh jit so the
    # trace re-reads the env knob
    os.environ["CPFN_EXTRACT_TOPK"] = "1"
    extract_tk = jax.jit(
        lambda k: sample_patches_device.__wrapped__(
            P_lr_j, P_hr_j, pool_j, k,
            num_points_patch=NPP, max_number_patches=MAXP,
        )
    )
    prog("patch_extraction_topk")
    res["patch_extraction_topk_ms"] = round(_t(lambda: extract_tk(key)[0]), 2)
    del os.environ["CPFN_EXTRACT_TOPK"]

    # ---- staged phase-1 outputs for phase-2 pieces --------------------------
    staged = runner._phase1_device(
        gm.params, gm.state, P_hr_j, P_lr_j, pool_j, key
    )
    res["n_real_patches"] = int(staged["count"])

    @jax.jit
    def local_fwd(P_hr, idx):
        patches = runner._normalize_patches(P_hr, idx)
        out, _ = apply_pointnet2(
            lm.params, lm.state, lm.cfg, patches, train=False
        )
        return spfn_postprocess(out)

    for w in (8, 32):
        prog(f"local_fwd_w{w}")
        res[f"local_fwd_w{w}_ms"] = round(
            _t(lambda w=w: local_fwd(P_hr_j, staged["idx"][:w])[2]), 2
        )

    # real local outputs at full width for the fusion pieces
    X_p, T_p, W_p = local_fwd(P_hr_j, staged["idx"])

    # ---- fusion total + sub-graphs ------------------------------------------
    fuse = jax.jit(
        lambda W_p, X_p, T_p, idx, W_hard, X_g, T_g, mask:
        fusion.fuse_cascade_fast(
            W_p, X_p, T_p, idx, W_hard, X_g, T_g, K_G, K_L,
            out_width=runner.out_width, patch_mask=mask,
        )
    )
    for w in (8, 32):
        prog(f"fusion_fast_w{w}")
        res[f"fusion_fast_w{w}_ms"] = round(
            _t(lambda w=w: fuse(
                W_p[:w], X_p[:w], T_p[:w], staged["idx"][:w],
                staged["W_hard"], staged["X_g"], staged["T_g"],
                staged["mask"][:w],
            )[0]), 2
        )

    # sub-graphs at w32
    W_pm = W_p * staged["mask"][:, None, None]
    prog("fusion_membership")
    memb = jax.jit(
        lambda W, idx: fusion._patch_membership(W, idx, N_HR)
    )
    res["fusion_membership_ms"] = round(
        _t(lambda: memb(W_pm, staged["idx"])), 2
    )
    Mp = memb(W_pm, staged["idx"])

    prog("fusion_similarity")
    res["fusion_similarity_ms"] = round(
        _t(lambda: fusion._similarity_from_membership(
            Mp, staged["W_hard"])[0]), 2
    )
    S, covered = fusion._similarity_from_membership(Mp, staged["W_hard"])

    prog("fusion_merge_loop")
    merge = jax.jit(
        lambda S: heuristic_merge_device(S, MAXP, K_G, K_L, 0.0)
    )
    res["fusion_merge_loop_ms"] = round(_t(lambda: merge(S)), 2)
    labels = merge(S)

    n_ids = S.shape[0] + K_L + K_G
    m_col = jnp.concatenate([
        jnp.sum(Mp, axis=1).reshape(-1),
        jnp.sum(staged["W_hard"] * (~covered)[:, None].astype(jnp.float32),
                axis=0),
    ])
    out_w = max(runner.out_width, K_G)
    prog("fusion_projection")
    res["fusion_projection_ms"] = round(
        _t(lambda: fusion._cluster_projection(labels, m_col, n_ids, out_w)[0]),
        2,
    )
    O, _ = fusion._cluster_projection(labels, m_col, n_ids, out_w)

    prog("fusion_contraction")
    res["fusion_contraction_ms"] = round(
        _t(lambda: fusion._fused_from_membership(
            Mp, staged["W_hard"], covered, O)), 2
    )

    prog("fusion_normals_types")
    res["fusion_normals_types_ms"] = round(
        _t(lambda: fusion._fuse_normals_types_flat(
            X_p, T_p, staged["idx"], staged["X_g"], staged["T_g"], Q,
            staged["mask"])[0]), 2
    )

    # ---- phase-2 totals (post fast-fusion switch) ---------------------------
    for w in (8, 32):
        prog(f"phase2_w{w}")
        res[f"phase2_w{w}_ms"] = round(
            _t(lambda w=w: runner._phase2_device(
                lm.params, lm.state, P_hr_j,
                staged["idx"][:w], staged["mask"][:w],
                staged["W_hard"], staged["X_g"], staged["T_g"],
            )[0]), 2
        )

    # ---- single-dispatch reference ------------------------------------------
    prog("cascade_single")
    res["cascade_single_ms"] = round(
        _t(lambda: runner._cascade_device(
            lm.params, lm.state, gm.params, gm.state,
            P_hr_j, P_lr_j, pool_j, key,
        )["hard"]), 2
    )

    # ---- index-op rows (the named next bottleneck) --------------------------
    patches32 = runner._normalize_patches(P_hr_j, staged["idx"])
    centers32 = jax.jit(
        lambda P: jnp.take_along_axis(
            P, farthest_point_sample(P, 512, impl="auto")[..., None],
            axis=1)
    )
    prog("fps_32x8192")
    res["fps_32x8192_ms"] = round(
        _t(lambda: farthest_point_sample(patches32, 512, impl="auto")), 2
    )
    prog("bq_32x8192")
    c32 = centers32(patches32)
    res["bq_32x8192_ms"] = round(
        _t(lambda: ball_query(patches32, c32, 0.2, 64, impl="auto")), 2
    )
    prog("fps_1x100k")
    norm_hr = runner._normalize_cloud(P_hr_j)[None]
    res["fps_1x100k_ms"] = round(
        _t(lambda: farthest_point_sample(norm_hr, 512, impl="auto")), 2
    )
    prog("bq_1x100k")
    c1 = centers32(norm_hr)
    res["bq_1x100k_ms"] = round(
        _t(lambda: ball_query(norm_hr, c1, 0.2, 64, impl="auto")), 2
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
