"""MFU / roofline accounting for the hot graphs (PERF.md evidence).

For each graph: XLA's own cost analysis (FLOPs + bytes accessed from the
compiled executable), measured wall time, achieved FLOP/s and GB/s, percent
of peak, and a bytes-bound vs compute-bound verdict from the roofline
crossover (arithmetic intensity vs peak_flops/peak_bw).

Peaks default to TPU v5e single chip: 197 TFLOP/s bf16 / 98.5 TFLOP/s f32
(MXU native bf16 x bf16 -> f32; f32 matmul at half rate), 819 GB/s HBM.
Override with --peak-tflops / --peak-gbs for other targets. CPU runs work
(cost analysis is backend-independent) but the % figures are meaningless
there.

Graphs covered:
  local_fwd   LocalSPFN inference forward, 32 x 8192 patches (the cascade's
              dominant phase per PERF.md)
  global_fwd  GlobalSPFN inference forward on one 100k-pt cloud
  train_step  GlobalSPFN train step, batch 16 (fwd+bwd+losses+Adam)

Usage: python -m cpfn_tpu.utils.roofline [--graphs local_fwd,train_step]
       [--bf16] [--repeats 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def _cost(compiled):
    """(flops, bytes_accessed) from the compiled executable's cost analysis;
    falls back to NaN when a backend omits a key."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan"))), float(
            ca.get("bytes accessed", float("nan"))
        )
    except Exception:
        return float("nan"), float("nan")


def _materialize(out):
    # block_until_ready is NOT a true barrier on the tunneled axon runtime;
    # a host materialization of one element is (utils/profiling.py rule)
    import jax

    leaf = next(
        x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")
    )
    np.asarray(leaf.ravel()[:1])


def _time_jitted(fn_jitted, args, repeats):
    _materialize(fn_jitted(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn_jitted(*args)
    _materialize(out)
    return (time.perf_counter() - t0) / repeats


def _report(name, flops, nbytes, secs, peak_tflops, peak_gbs):
    achieved_tflops = flops / secs / 1e12
    achieved_gbs = nbytes / secs / 1e9
    intensity = flops / nbytes if nbytes else float("nan")
    # roofline crossover: below peak_flops/peak_bw FLOP/byte the graph cannot
    # reach compute peak no matter how well it schedules
    crossover = peak_tflops * 1e12 / (peak_gbs * 1e9)
    bound = "bytes-bound" if intensity < crossover else "compute-bound"
    row = {
        "graph": name,
        "ms": round(secs * 1e3, 3),
        "gflops": round(flops / 1e9, 2),
        "bytes_gb": round(nbytes / 1e9, 3),
        "achieved_tflops": round(achieved_tflops, 3),
        "mfu_pct": round(100 * achieved_tflops / peak_tflops, 2),
        "achieved_gbs": round(achieved_gbs, 1),
        "hbm_pct": round(100 * achieved_gbs / peak_gbs, 2),
        "intensity_flop_per_byte": round(intensity, 2),
        "crossover_flop_per_byte": round(crossover, 1),
        "verdict": bound,
    }
    print(json.dumps(row))
    return row


def _build_graphs(which, bf16, fused=False):
    import jax
    import jax.numpy as jnp

    from cpfn_tpu.fitting import factory
    from cpfn_tpu.nn import PointNet2Config, apply_pointnet2, init_pointnet2
    from cpfn_tpu.nn.pointnet2 import spfn_postprocess

    classes = ("sphere", "plane", "cylinder", "cone")
    factory.register_primitives(list(classes))
    dtype = "bfloat16" if bf16 else None
    rng = np.random.RandomState(0)
    out = {}

    if "local_fwd" in which:
        cfg = PointNet2Config(output_sizes=(3, 4, 21), compute_dtype=dtype,
                              fused_eval_mlp=fused)
        params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)

        def local_fwd(params, state, pts):
            o, _ = apply_pointnet2(params, state, cfg, pts, train=False)
            return spfn_postprocess(o)

        pts = jnp.asarray(rng.randn(32, 8192, 3), jnp.float32)
        out["local_fwd"] = (local_fwd, (params, state, pts))

    if "local_sa1" in which or "local_enc" in which:
        # truncated LocalSPFN forwards: marginal cost per phase comes from
        # differences (dec = local_fwd - local_enc, sa2+sa3 = enc - sa1) —
        # localizes the bytes-bound traffic before any kernel work
        from cpfn_tpu.nn.pointnet2 import _group_all, _set_abstraction

        cfg = PointNet2Config(output_sizes=(3, 4, 21), compute_dtype=dtype)
        params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
        pts = jnp.asarray(rng.randn(32, 8192, 3), jnp.float32)
        cdt = jnp.dtype(dtype) if dtype else None
        kw = dict(train=False, momentum=0.5, compute_dtype=cdt)

        def sa1(params, state, pos):
            return _set_abstraction(
                params["sa1"], state["sa1"], pos, None,
                num_points=cfg.sa1_points, radius=cfg.sa1_radius,
                num_samples=cfg.sa1_samples, fps_impl=cfg.fps_impl, **kw,
            )[:2]

        def enc(params, state, pos):
            l1_pos, l1_feats = sa1(params, state, pos)
            l2_pos, l2_feats, _ = _set_abstraction(
                params["sa2"], state["sa2"], l1_pos, l1_feats,
                num_points=cfg.sa2_points, radius=cfg.sa2_radius,
                num_samples=cfg.sa2_samples, fps_impl=cfg.fps_impl, **kw,
            )
            l3_feats, _ = _group_all(
                params["sa3"], state["sa3"], l2_pos, l2_feats, **kw
            )
            return l2_pos, l2_feats, l3_feats

        if "local_sa1" in which:
            out["local_sa1"] = (sa1, (params, state, pts))
        if "local_enc" in which:
            out["local_enc"] = (enc, (params, state, pts))

    if "global_fwd" in which:
        cfg = PointNet2Config(output_sizes=(3, 4, 28), compute_dtype=dtype,
                              fused_eval_mlp=fused)
        params, state = init_pointnet2(jax.random.PRNGKey(1), cfg)

        def global_fwd(params, state, pts):
            o, _ = apply_pointnet2(params, state, cfg, pts, train=False)
            return spfn_postprocess(o)

        pts = jnp.asarray(rng.randn(1, 100_000, 3), jnp.float32)
        out["global_fwd"] = (global_fwd, (params, state, pts))

    if "train_step" in which:
        from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_batch
        from cpfn_tpu.train import (
            SPFNTrainConfig,
            init_optimizer,
            make_spfn_train_step,
        )

        cfg = PointNet2Config(output_sizes=(3, 4, 28), compute_dtype=dtype)
        train_cfg = SPFNTrainConfig(batch_size=16, classes=classes)
        params, state = init_pointnet2(jax.random.PRNGKey(2), cfg)
        opt = init_optimizer(train_cfg)
        opt_state = opt.init(params)
        step = make_spfn_train_step(cfg, train_cfg, optimizer=opt)
        scene = SyntheticSceneConfig(
            n_points=8192, n_max_instances=28, min_instances=6,
            max_instances=12, n_gt_points_per_instance=512,
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in make_synthetic_batch(rng, 16, scene).items()
        }
        out["train_step"] = (
            step,
            (params, state, opt_state, batch, jnp.int32(0),
             jax.random.PRNGKey(0)),
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--graphs", default="local_fwd,local_sa1,local_enc,global_fwd,train_step",
        help="comma-separated subset of local_fwd,local_sa1,local_enc,"
             "global_fwd,train_step",
    )
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="fused eval MLP Pallas kernels (ops/fused_mlp.py) "
                        "in the forward graphs")
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--peak-tflops", type=float, default=None,
                   help="peak TFLOP/s (default: v5e bf16 197, f32 98.5)")
    p.add_argument("--peak-gbs", type=float, default=V5E_PEAK_HBM_GBS)
    args = p.parse_args(argv)

    import jax

    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    peak_tflops = args.peak_tflops or (
        V5E_PEAK_BF16_TFLOPS if args.bf16 else V5E_PEAK_BF16_TFLOPS / 2
    )
    which = [g.strip() for g in args.graphs.split(",") if g.strip()]
    rows = []
    for name, (fn, fargs) in _build_graphs(which, args.bf16, args.fused).items():
        jitted = jax.jit(fn)
        compiled = jitted.lower(*fargs).compile()
        flops, nbytes = _cost(compiled)
        secs = _time_jitted(jitted, fargs, args.repeats)
        rows.append(
            _report(name, flops, nbytes, secs, peak_tflops, args.peak_gbs)
        )
    return rows


if __name__ == "__main__":
    main()
