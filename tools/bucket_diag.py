"""Where does the bucketed cascade's time go? (round-4 diagnostic)

The grouped-fetch fix removed the per-cloud count-read RTT, yet the bucketed
path still measures ~5.3 vs 9.44 clouds/s single-dispatch. Remaining
suspects, each measured here on the chip with forced materialization:

  a) phase-1 execution time (global fwd + selection + extraction)
  b) phase-2 execution time at widths 8 / 16 / 32
  c) the single-dispatch cascade graph, for reference
  d) count fetch after phase-1 is already materialized (pure RTT)
  e) raw dispatch overhead: k tiny dependent device ops, timed end to end

If (a)+(b@8) << per-cloud wall, per-dispatch/tunnel overhead (e) is the
binder and the bucketed path needs fewer dispatches, not faster graphs.

Run on the chip (exclusive claim): python tools/bucket_diag.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(fn, reps=8):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(np.asarray(out).ravel()[:1]) if not isinstance(out, (int, float)) else out
    return (time.time() - t0) / reps * 1e3


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
        print(f"[bucket_diag] timing {name}...", file=sys.stderr,
              flush=True)

    def phase1():
        s = runner._phase1_device(
            gm.params, gm.state, P_hr_j, P_lr_j, pool_j, key
        )
        np.asarray(s["count"])
        return 0

    prog("phase1")
    res["phase1_ms"] = round(_t(phase1), 2)

    staged = runner._phase1_device(
        gm.params, gm.state, P_hr_j, P_lr_j, pool_j, key
    )
    n_real = int(staged["count"])

    for w in (8, 16, 32):
        def phase2():
            out = runner._phase2_device(
                lm.params, lm.state, P_hr_j,
                staged["idx"][:w], staged["mask"][:w],
                staged["W_hard"], staged["X_g"], staged["T_g"],
            )
            np.asarray(out[0].ravel()[:1])
            return 0

        prog(f"phase2_w{w}")
        res[f"phase2_w{w}_ms"] = round(_t(phase2), 2)

    def cascade():
        out = runner._cascade_device(
            lm.params, lm.state, gm.params, gm.state,
            P_hr_j, P_lr_j, pool_j, key,
        )
        np.asarray(out["hard"].ravel()[:1])
        return 0

    prog("cascade_single")
    res["cascade_single_ms"] = round(_t(cascade), 2)

    np.asarray(staged["count"])  # ensure materialized server-side
    prog("count_fetch")
    res["count_fetch_ms"] = round(_t(lambda: int(staged["count"])), 2)

    # raw dependent-dispatch chain: k tiny ops, each a separate jit call
    tiny = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    tiny(x0)

    def chain(k):
        def run():
            x = x0
            for _ in range(k):
                x = tiny(x)
            np.asarray(x.ravel()[:1])
            return 0
        return run

    prog("dispatch_chain")
    res["dispatch_chain_1_ms"] = round(_t(chain(1)), 2)
    res["dispatch_chain_8_ms"] = round(_t(chain(8)), 2)
    res["per_dispatch_ms"] = round(
        (res["dispatch_chain_8_ms"] - res["dispatch_chain_1_ms"]) / 7, 2
    )
    res["n_real_patches"] = n_real

    # packed path stage times (round 4): phase 1 vmapped over a group of 4
    # clouds, phase 2 vmapped at width 8 — the per-CLOUD cost of each packed
    # dispatch is the group time / 4
    G, W = 4, 8
    P_hr_g = jnp.stack([P_hr_j] * G)
    P_lr_g = jnp.stack([P_lr_j] * G)
    pool_g = jnp.stack([pool_j] * G)
    keys_g = jax.random.split(jax.random.PRNGKey(1), G)

    def phase1_packed():
        s = runner._phase1_batch(
            gm.params, gm.state, P_hr_g, P_lr_g, pool_g, keys_g
        )
        np.asarray(s["count"])
        return 0

    prog("phase1_packed")
    res[f"phase1_packed_g{G}_ms"] = round(_t(phase1_packed, reps=4), 2)

    staged_g = runner._phase1_batch(
        gm.params, gm.state, P_hr_g, P_lr_g, pool_g, keys_g
    )

    def phase2_packed():
        out = runner._phase2_packed(
            lm.params, lm.state, P_hr_g,
            staged_g["idx"], staged_g["mask"],
            staged_g["W_hard"], staged_g["X_g"], staged_g["T_g"],
            staged_g["count"], W,
        )
        np.asarray(out[4].ravel()[:1])
        return 0

    prog("phase2_packed")
    res[f"phase2_packed_g{G}w{W}_ms"] = round(_t(phase2_packed, reps=4), 2)
    res["packed_per_cloud_ms"] = round(
        (res[f"phase1_packed_g{G}_ms"] + res[f"phase2_packed_g{G}w{W}_ms"])
        / G, 2,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
