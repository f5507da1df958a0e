"""Production serving CLI: raw point clouds in, fused segmentations out.

The reference has no GT-free entry point — all four eval drivers require
labeled HDF5 records (`evaluation_localSPFN.py:69-165`). This CLI runs the
full cascaded CPFN inference (GlobalSPFN on the high-res cloud, patch
selection, LocalSPFN patch stack, cross-scale fusion — the single-dispatch
device graph bench.py times) on unlabeled inputs and writes per-cloud
artifacts: hard instance labels, fused normals, per-point type ids, and
optionally the reference-format fitted-primitive JSON
(`metric_implementation.creates_json`, `SPFN/metric_implementation.py:589`).

  python -m cpfn_tpu.serve --checkpoint_dir data_synth2/checkpoints_bench_r3 \
      --input scans/ --output_folder out/ --fit_json

Inputs: .h5 (TraceParts layout, `noisy_points` or `gt_points`), .npy
([N, 3] float), or .xyz/.txt (whitespace rows). Clouds are padded/cropped
to --n_points_highres so every cloud reuses one compiled graph.

With >1 visible device and --cloud_parallel, clouds shard over the mesh via
`parallel.make_cloud_parallel_cascade` (one full cascade per chip — the
v5e-8 serving shape). Adding --packed composes the two throughput modes:
the packed group axis shards over the mesh
(`parallel.make_cloud_parallel_packed`), so each chip runs its share of
every group-vmapped phase-1/phase-2 dispatch with zero collectives.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def read_cloud(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            key = "noisy_points" if "noisy_points" in f else "gt_points"
            return np.asarray(f[key][:], np.float32)
    if ext == ".npy":
        return np.asarray(np.load(path), np.float32)
    return np.loadtxt(path, dtype=np.float32)[:, :3]


def pad_to(points: np.ndarray, n: int, rng: np.random.RandomState):
    """Fixed-shape batching: crop (uniform subset) or pad (resampled points)
    to exactly `n` points. Returns (padded [n,3], n_valid, sel_indices):
    outputs rows [:n_valid] correspond to input rows sel_indices (identity
    for the pad case, the subset for the crop case)."""
    m = len(points)
    if m > n:
        sel = np.sort(rng.choice(m, n, replace=False))
        return points[sel], n, sel
    if m == n:
        return points, m, np.arange(m)
    extra = points[rng.choice(m, n - m, replace=True)]
    return np.concatenate([points, extra], 0), m, np.arange(m)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True,
                   help="dir with globalspfn/, patchselec_<scale>/, "
                        "localspfn_<scale>/ checkpoints")
    p.add_argument("--input", required=True,
                   help="a cloud file or a directory of .h5/.npy/.xyz files")
    p.add_argument("--output_folder", required=True)
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--n_points_highres", type=int, default=100_000)
    p.add_argument("--n_points_lowres", type=int, default=8192)
    p.add_argument("--num_points_patch", type=int, default=8192)
    p.add_argument("--max_patches", type=int, default=32)
    p.add_argument("--n_max_global_instances", type=int, default=28)
    p.add_argument("--n_max_local_instances", type=int, default=21)
    p.add_argument("--lowres", choices=["fps", "random"], default="fps",
                   help="low-res subsample: device FPS (the preprocessing "
                        "semantics) or uniform random (faster)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--n_shuffles", type=int, default=1,
                   help="shuffle-ensemble width (quality/throughput knob)")
    p.add_argument("--fit_json", action="store_true",
                   help="also fit primitives to the fused instances and "
                        "write <stem>_primitives.json (reference order)")
    p.add_argument("--packed", action="store_true",
                   help="single-chip throughput mode: group-vmapped "
                        "two-phase cascade (CascadeRunner.run_clouds_packed"
                        ") — identical outputs, one phase-1 + one phase-2 "
                        "dispatch per --pack_group clouds (R=1 only)")
    p.add_argument("--pack_group", type=int, default=4)
    p.add_argument("--pack_width", type=int, default=8)
    p.add_argument("--cloud_parallel", action="store_true",
                   help="shard clouds over all visible devices")
    p.add_argument("--model_overrides", default="",
                   help="JSON dict of PointNet2Config overrides (the YAML "
                        "configs' model_overrides equivalent)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from cpfn_tpu.eval.cascade import CascadeRunner, ModelBundle
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.models import GlobalSPFN, LocalSPFN, PatchSelectionNet
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    classes = ("sphere", "plane", "cylinder", "cone")
    factory.register_primitives(list(classes))

    dtype = dict(compute_dtype="bfloat16") if args.bf16 else {}
    if args.model_overrides:
        ov = json.loads(args.model_overrides)
        dtype.update(
            {k: tuple(v) if isinstance(v, list) else v for k, v in ov.items()}
        )
    key = jax.random.PRNGKey(0)
    scale_tag = str(round(args.scale, 2))
    g = GlobalSPFN(key, n_max_instances=args.n_max_global_instances,
                   **dtype).load(
        os.path.join(args.checkpoint_dir, "globalspfn"))
    ps = PatchSelectionNet(key, **dtype).load(
        os.path.join(args.checkpoint_dir, f"patchselec_{scale_tag}"))
    lo = LocalSPFN(key, n_max_instances=args.n_max_local_instances,
                   **dtype).load(
        os.path.join(args.checkpoint_dir, f"localspfn_{scale_tag}"))

    runner = CascadeRunner(
        ModelBundle(g.cfg, g.params, g.state),
        ModelBundle(ps.cfg, ps.params, ps.state),
        ModelBundle(lo.cfg, lo.params, lo.state),
        n_max_global_instances=args.n_max_global_instances,
        n_max_local_instances=args.n_max_local_instances,
        num_points_patch=args.num_points_patch,
        max_patches=args.max_patches,
        scale=args.scale,
        n_shuffles=args.n_shuffles,
    )

    if os.path.isdir(args.input):
        files = sorted(
            f for pat in ("*.h5", "*.hdf5", "*.npy", "*.xyz", "*.txt")
            for f in glob.glob(os.path.join(args.input, pat))
        )
    else:
        files = [args.input]
    if not files:
        raise SystemExit(f"no cloud files found under {args.input}")
    os.makedirs(args.output_folder, exist_ok=True)

    rng = np.random.RandomState(args.seed)
    if args.lowres == "fps":
        from cpfn_tpu.ops import farthest_point_sample

        import jax.numpy as jnp

        fps = jax.jit(
            lambda pts: farthest_point_sample(pts, args.n_points_lowres)
        )

    def prep(path):
        P_hr, n_valid, sel = pad_to(
            read_cloud(path), args.n_points_highres, rng
        )
        if args.lowres == "fps":
            lr_idx = np.asarray(fps(jnp.asarray(P_hr)[None])[0])
        else:
            lr_idx = rng.choice(len(P_hr), args.n_points_lowres, replace=False)
        return P_hr, P_hr[lr_idx], (n_valid, sel)

    def write_outputs(path, out, meta):
        n_valid, sel = meta
        stem = os.path.splitext(os.path.basename(path))[0]
        hard = np.asarray(out["hard"])[:n_valid]
        X = np.asarray(out["X"])[:n_valid]
        T_pt = np.asarray(out["T"])[:n_valid]
        if len(sel) != n_valid or sel[-1] != n_valid - 1:
            # cropped cloud: outputs cover the subsampled rows; persist the
            # mapping back into the original cloud
            np.save(os.path.join(args.output_folder, f"{stem}_indices.npy"),
                    sel.astype(np.int64))
        np.save(os.path.join(args.output_folder, f"{stem}_seg.npy"), hard)
        np.save(os.path.join(args.output_folder, f"{stem}_normals.npy"), X)
        np.save(
            os.path.join(args.output_folder, f"{stem}_type.npy"),
            np.argmax(T_pt, -1).astype(np.int32),
        )
        if args.fit_json:
            from cpfn_tpu.fitting.api import fit_cloud_to_json

            P = np.asarray(read_cloud(path), np.float32)[sel[:n_valid]]
            recs = fit_cloud_to_json(P, hard, X, classes=classes)
            with open(
                os.path.join(args.output_folder, f"{stem}_primitives.json"),
                "w",
            ) as f:
                json.dump(recs, f, indent=1)
        print(f"{stem}: {int(out['n_patches'])} patches, "
              f"{len(np.unique(hard))} instances", flush=True)

    n_dev = len(jax.devices())
    if (
        args.cloud_parallel and n_dev > 1
        and args.packed and args.n_shuffles == 1
    ):
        # composed throughput mode: the packed group axis shards over the
        # mesh (zero collectives) — fewest dispatches per cloud AND one
        # packed group in flight per chip set
        from cpfn_tpu.parallel import make_cloud_parallel_packed, make_mesh

        mesh = make_mesh(n_dev)
        group = max(args.pack_group, n_dev)
        group += (-group) % n_dev  # round up to a mesh multiple
        run = make_cloud_parallel_packed(
            runner, mesh, width=args.pack_width
        )
        meta = [prep(f) for f in files]
        clouds = [(m[0], m[1], None) for m in meta]
        for path, m, out in zip(files, meta, run(clouds, group=group)):
            write_outputs(path, out, m[2])
    elif args.cloud_parallel and n_dev > 1:
        import jax.numpy as jnp

        from cpfn_tpu.parallel import make_cloud_parallel_cascade, make_mesh

        mesh = make_mesh(n_dev)
        fn = make_cloud_parallel_cascade(runner, mesh)
        for s in range(0, len(files), n_dev):
            chunk = files[s : s + n_dev]
            while len(chunk) < n_dev:  # ragged tail: repeat the last cloud
                chunk = chunk + [chunk[-1]]
            prepped = [prep(f) for f in chunk]
            P_hr = jnp.asarray(np.stack([c[0] for c in prepped]))
            P_lr = jnp.asarray(np.stack([c[1] for c in prepped]))
            keys = jax.random.split(jax.random.PRNGKey(s), n_dev)
            outs = fn(P_hr, P_lr, None, keys)
            for i, f in enumerate(files[s : s + n_dev]):
                write_outputs(
                    f, jax.tree_util.tree_map(lambda a: a[i], outs),
                    prepped[i][2],
                )
    else:
        meta = [prep(f) for f in files]
        clouds = [(m[0], m[1], None) for m in meta]
        if args.packed and args.n_shuffles == 1:
            stream = runner.run_clouds_packed(
                clouds, group=args.pack_group, width=args.pack_width
            )
        else:
            stream = runner.run_clouds_device(clouds)
        for path, m, out in zip(files, meta, stream):
            write_outputs(path, out, m[2])


if __name__ == "__main__":
    main()
