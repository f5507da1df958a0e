"""Per-stage wall-time ledger of the PACKED serving loop (round-5).

bucket_diag (staged device inputs) says the packed compute is
77 + 136 ms per group of 4 (= 53 ms/cloud), yet the end-to-end bench
measures ~180 ms/cloud even after the host-side group stacking fix. This
tool replays the exact run_clouds_packed structure on the bench workload
UNPIPELINED, timing every blocking boundary separately:

    stack     host np.stack of the group operands
    upload    device_put + forced materialization of the staged operands
    phase1    vmapped phase-1 dispatch + count materialization
    phase2    vmapped phase-2 dispatch + hard materialization
    overflow  per-cloud re-runs for counts > width (incl. their fetches)

plus the same groups run through the REAL pipelined generator for the
net number. The difference between (sum of stages) and the pipelined
wall shows how much overlap the loop achieves; the stage ledger shows
where the 130 ms/cloud of non-compute time lives.

Run on the chip (exclusive claim): python tools/packed_diag.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GROUP = int(os.environ.get("PACK_GROUP", "4"))
WIDTH = int(os.environ.get("PACK_WIDTH", "8"))
N_CLOUDS = 12


def main():
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene
    from cpfn_tpu.eval import CascadeRunner, ModelBundle
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.nn import PointNet2Config, init_pointnet2
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    N_HR, N_LR, NPP, MAXP, K_G, K_L, Q = 100_000, 8192, 8192, 32, 28, 21, 4
    rng = np.random.RandomState(0)
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=K_G, min_instances=10,
        max_instances=16, n_gt_points_per_instance=512, n_small_primitives=8,
    )
    factory.register_primitives(list(scene_cfg.classes))
    clouds = []
    for _ in range(N_CLOUDS):
        scene = make_synthetic_scene(rng, scene_cfg)
        P_hr = scene["noisy_points"][:N_HR]
        lr_idx = rng.choice(len(P_hr), N_LR, replace=False)
        labels_lr = scene["I_gt"][lr_idx]
        counts = np.bincount(scene["I_gt"])
        small = np.where(counts < 0.05 * len(P_hr))[0]
        pool = np.isin(labels_lr, small)
        clouds.append((P_hr, P_hr[lr_idx], pool))

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
    gp, gs, lp, ls = gm.params, gm.state, lm.params, lm.state

    # ---- warmup: compile every graph the ledger touches
    print("[packed_diag] warmup...", file=sys.stderr, flush=True)
    runner.precompile_buckets(clouds[0], (8, 16, 32))
    for _ in runner.run_clouds_packed(
        clouds[:GROUP], group=GROUP, width=WIDTH, buckets=(8, 16, 32)
    ):
        pass

    # ---- unpipelined ledger
    key = jax.random.PRNGKey(0)
    subs = []
    for _ in range(N_CLOUDS):
        key, sub = jax.random.split(key)
        subs.append(sub)
    ledger = {
        "stack_ms": 0.0, "upload_ms": 0.0, "phase1_ms": 0.0,
        "phase2_ms": 0.0, "overflow_ms": 0.0, "n_overflow": 0,
    }
    groups = [
        list(zip(clouds[i : i + GROUP], subs[i : i + GROUP]))
        for i in range(0, N_CLOUDS, GROUP)
    ]
    t_total0 = time.time()
    counts_seen = []
    for batch in groups:
        t0 = time.time()
        full = batch + [batch[0]] * (GROUP - len(batch))
        P_hr = np.stack([np.asarray(c[0][0], np.float32) for c in full])
        P_lr = np.stack([np.asarray(c[0][1], np.float32) for c in full])
        pool = np.stack([np.asarray(c[0][2], bool) for c in full])
        t1 = time.time()
        ledger["stack_ms"] += (t1 - t0) * 1e3
        P_hr_j = jax.device_put(P_hr)
        P_lr_j = jax.device_put(P_lr)
        pool_j = jax.device_put(pool)
        keys_j = jnp.stack([c[1] for c in full])
        # force the uploads to complete (tunnel block_until_ready is not a
        # barrier; a 1-element read is)
        np.asarray(P_hr_j.ravel()[:1])
        np.asarray(P_lr_j.ravel()[:1])
        np.asarray(pool_j.ravel()[:1])
        t2 = time.time()
        ledger["upload_ms"] += (t2 - t1) * 1e3
        staged = runner._phase1_batch(gp, gs, P_hr_j, P_lr_j, pool_j, keys_j)
        counts = np.asarray(staged["count"]).astype(int).tolist()
        counts_seen += counts[: len(batch)]
        t3 = time.time()
        ledger["phase1_ms"] += (t3 - t2) * 1e3
        out = runner._phase2_packed(
            lp, ls, P_hr_j, staged["idx"], staged["mask"],
            staged["W_hard"], staged["X_g"], staged["T_g"],
            staged["count"], WIDTH,
        )
        hard_np = np.asarray(out[4])
        t4 = time.time()
        ledger["phase2_ms"] += (t4 - t3) * 1e3
        # overflow re-runs exactly as drain() does
        for i, c in enumerate(counts[: len(batch)]):
            if c > WIDTH:
                ledger["n_overflow"] += 1
                w2 = 16 if c <= 16 else 32
                o = runner._phase2_device(
                    lp, ls, P_hr_j[i], staged["idx"][i, :w2],
                    staged["mask"][i, :w2], staged["W_hard"][i],
                    staged["X_g"][i], staged["T_g"][i],
                )
                np.asarray(jnp.argmax(o[0], axis=1).astype(jnp.int32))
        t5 = time.time()
        ledger["overflow_ms"] += (t5 - t4) * 1e3
    ledger = {k: round(v, 1) for k, v in ledger.items()}
    ledger["unpipelined_total_ms"] = round((time.time() - t_total0) * 1e3, 1)
    ledger["counts"] = counts_seen

    # ---- the real pipelined generator, same clouds
    t0 = time.time()
    for out in runner.run_clouds_packed(
        clouds, group=GROUP, width=WIDTH, buckets=(8, 16, 32)
    ):
        np.asarray(out["hard"])
    ledger["pipelined_total_ms"] = round((time.time() - t0) * 1e3, 1)
    ledger["pipelined_clouds_per_s"] = round(
        N_CLOUDS / (ledger["pipelined_total_ms"] / 1e3), 2
    )

    # ---- single-dispatch reference on the same clouds
    t0 = time.time()
    for out in runner.run_clouds_device(clouds, lag=3):
        np.asarray(out["hard"])
    ledger["single_total_ms"] = round((time.time() - t0) * 1e3, 1)
    ledger["single_clouds_per_s"] = round(
        N_CLOUDS / (ledger["single_total_ms"] / 1e3), 2
    )
    print(json.dumps(ledger))


if __name__ == "__main__":
    main()
