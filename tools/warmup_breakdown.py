"""Per-graph compile-time breakdown of the bench graph set (VERDICT r3 #5).

The round-3 bench warmup cost 1193.6 s vs round-2's 192.4 s with no per-graph
attribution. This tool times trace+lower and XLA-compile separately for every
graph the bench/serving path can dispatch, so the cold-start floor is
explainable per graph instead of one opaque warmup number.

Graphs measured (same shapes as bench.py: 100k-pt clouds, 32x8192 patches):
  global_fwd          pipelined front half (CascadeRunner._global_fwd)
  ps_fwd              patch-selection forward
  phase2_device       fused device back half (local fwd + merge + fusion)
  cascade_device      single-dispatch cascade, explicit pool (oracle/bench)
  cascade_device_ps   single-dispatch cascade + patch-selection (trained)

By default the persistent compilation cache is DISABLED so the numbers are
true cold-compile costs (the cache's effect is measured separately by the
bench's back-to-back run pair). Set CPFN_WB_CACHE=1 to measure with the
cache enabled (second runs should then collapse to the deserialize cost).

Prints ONE JSON object to stdout; progress goes to stderr.
"""

import json
import os
import sys
import time

# repo-root bootstrap: run as `python tools/warmup_breakdown.py`, which puts
# tools/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_HR = 100_000
N_LR = 8192
N_PATCH = 8192
MAX_PATCHES = 32
K_G, K_L, Q = 28, 21, 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("CPFN_WB_CACHE", "") not in ("", "0"):
        from cpfn_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        log("persistent compilation cache: ENABLED")
    else:
        log("persistent compilation cache: disabled (cold-compile numbers)")

    from cpfn_tpu.eval import CascadeRunner, ModelBundle
    from cpfn_tpu.nn import PointNet2Config, init_pointnet2

    log(f"devices: {jax.devices()}")

    def bundle(key, sizes):
        cfg = PointNet2Config(output_sizes=sizes)
        params, state = init_pointnet2(key, cfg)
        return ModelBundle(cfg, params, state)

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    gm = bundle(keys[0], (3, Q, K_G))
    pm = bundle(keys[1], (2,))
    lm = bundle(keys[2], (3, Q, K_L))
    runner = CascadeRunner(
        gm, pm, lm,
        n_max_global_instances=K_G, n_max_local_instances=K_L,
        num_points_patch=N_PATCH, max_patches=MAX_PATCHES,
    )

    f32 = jnp.float32
    P_hr = jax.ShapeDtypeStruct((N_HR, 3), f32)
    P_lr = jax.ShapeDtypeStruct((N_LR, 3), f32)
    pool = jax.ShapeDtypeStruct((N_LR,), jnp.bool_)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    idx = jax.ShapeDtypeStruct((MAX_PATCHES, N_PATCH), jnp.int32)
    mask = jax.ShapeDtypeStruct((MAX_PATCHES,), f32)
    W_hard = jax.ShapeDtypeStruct((N_HR, K_G), f32)
    X_g = jax.ShapeDtypeStruct((N_HR, 3), f32)
    T_g = jax.ShapeDtypeStruct((N_HR, Q), f32)

    graphs = {
        "global_fwd": (
            runner._global_fwd, (gm.params, gm.state, P_hr, key)
        ),
        "ps_fwd": (
            runner._ps_fwd, (pm.params, pm.state, P_lr, key)
        ),
        "phase2_device": (
            runner._phase2_device,
            (lm.params, lm.state, P_hr, idx, mask, W_hard, X_g, T_g),
        ),
        "cascade_device": (
            runner._cascade_device,
            (lm.params, lm.state, gm.params, gm.state, P_hr, P_lr, pool, key),
        ),
        "cascade_device_ps": (
            runner._cascade_device_ps,
            (lm.params, lm.state, gm.params, gm.state, pm.params, pm.state,
             P_hr, P_lr, key),
        ),
    }

    rows = {}
    for name, (fn, args) in graphs.items():
        t0 = time.time()
        lowered = fn.lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        row = {"lower_s": round(t_lower, 2), "compile_s": round(t_compile, 2)}
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if ca and "flops" in ca:
                row["gflops"] = round(float(ca["flops"]) / 1e9, 1)
        except Exception:
            pass
        rows[name] = row
        log(f"{name}: lower {t_lower:.1f}s compile {t_compile:.1f}s")

    total = {
        "lower_s": round(sum(r["lower_s"] for r in rows.values()), 2),
        "compile_s": round(sum(r["compile_s"] for r in rows.values()), 2),
    }
    print(json.dumps({"graphs": rows, "total": total,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
