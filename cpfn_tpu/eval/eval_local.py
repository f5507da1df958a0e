"""LocalSPFN cascaded evaluation (cf. `evaluation_localSPFN.py`) — the
full-cloud pipeline: per test cloud, run LocalSPFN on the precomputed patch
indices, fuse with the saved GlobalSPFN outputs, and score the 10 metrics on
the 100k-point cloud. Writes Results.csv + Results_Stats.csv in the
reference's schema.

  python -m cpfn_tpu.eval.eval_local --config_file configs/config_localSPFN.yml \
      --lowres_dataset ... --highres_dataset ... --dir_spfn ... --dir_indices ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.config import Config
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.eval import ensemble
from cpfn_tpu.fitting import factory
from cpfn_tpu.losses import compute_miou_loss, hungarian_matching_with_mask
from cpfn_tpu.merging import fuse_cascade
from cpfn_tpu.metrics import compute_segmentation_iou, hard_W_encoding
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.train.train_spfn import read_csv_list
from cpfn_tpu.utils import restore_checkpoint
from cpfn_tpu.utils.logging import ResultsTable


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_localSPFN.yml")
    p.add_argument("--lowres_dataset", default="data/TraceParts_v2_lowres/")
    p.add_argument("--highres_dataset", default="data/TraceParts_v2/")
    p.add_argument("--dir_spfn", default="data/TraceParts_v2_globalspfn/")
    p.add_argument("--dir_indices", default="data/TraceParts_v2_heatmaps/")
    p.add_argument("--output_folder", default="data/TraceParts_v2_localspfn/")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--weights", default="")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--first_n", type=int, default=-1)
    p.add_argument("--max_patches", type=int, default=32)
    p.add_argument("--num_points_patch", type=int, default=8192)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul inputs (f32 accumulation) in the "
                   "LocalSPFN forward — the TPU mixed-precision eval mode")
    p.add_argument("--stored_point_order", action="store_true",
                   help="feed patches in the stored kNN index order instead "
                   "of the default shuffled order (the network is "
                   "order-sensitive and trained on shuffled orders)")
    p.add_argument("--n_shuffles", type=int, default=1,
                   help="shuffle-ensemble width: LocalSPFN forwards per "
                   "patch stack over independent point permutations, soft "
                   "outputs averaged after relaxed-IoU slot alignment "
                   "(eval/ensemble.py)")
    p.add_argument("--resume", action="store_true",
                   help="skip clouds with a cached rows/<stem>.json (row, "
                        "per-primitive stats, dropped-cluster count), "
                        "burning their host-RNG draws so later clouds see "
                        "the identical stream — bit-identical CSVs vs an "
                        "uninterrupted run. Recovery for tunnel drops "
                        "mid-eval.")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    conf = Config.from_yaml(args.config_file)
    factory.register_primitives(list(conf.list_of_primitives))
    k_g = conf.n_max_global_instances
    k_l = conf.n_max_local_instances
    dir_indices = os.path.join(args.dir_indices, str(round(args.scale, 2)))
    os.makedirs(args.output_folder, exist_ok=True)

    model_cfg = conf.model_config("LocalSPFN")
    if args.bf16:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    if args.weights != "__random_init__":
        # sentinel keeps the seeded init (tests / oracle-mode diagnostics),
        # mirroring eval_global
        ckpt = args.weights or os.path.join(
            conf.checkpoint_dir, f"localspfn_{round(args.scale, 2)}"
        )
        restored, _ = restore_checkpoint(
            ckpt, {"params": params, "state": state}
        )
        params, state = restored["params"], restored["state"]

    from cpfn_tpu.eval._util import make_metrics_fn

    metrics_fn = make_metrics_fn(conf.list_of_primitives)

    # Feature-injected LocalSPFN (v11): the GlobalSPFN eval artifacts carry
    # the global code (global_feat.npy, [1024]) and the full per-point
    # feature map (local_feat_full.npy, [128, N]); each patch gets the
    # feature at its SEED point (indices row 0 — the reference broadcasts
    # local_feat at patch_centers the same way, dataloaders.py:275-281).
    use_feat = bool(model_cfg.use_glob_features or model_cfg.use_loc_features)
    if use_feat:
        @jax.jit
        def local_forward(patches, glob_f, loc_f):
            kw = {}
            if model_cfg.use_glob_features:
                kw["glob_features"] = jnp.broadcast_to(
                    glob_f[None], (patches.shape[0], glob_f.shape[0])
                )
            if model_cfg.use_loc_features:
                kw["loc_features"] = loc_f
            out, _ = apply_pointnet2(
                params, state, model_cfg, patches, train=False, **kw
            )
            return spfn_postprocess(out)
    else:
        @jax.jit
        def local_forward(patches):
            out, _ = apply_pointnet2(
                params, state, model_cfg, patches, train=False
            )
            return spfn_postprocess(out)

    @jax.jit
    def normalize_patches(P_hr, idx):
        raw = P_hr[idx]
        mean = jnp.mean(raw, axis=1, keepdims=True)
        centered = raw - mean
        norm = jnp.max(
            jnp.linalg.norm(centered, axis=2, keepdims=True), axis=1,
            keepdims=True,
        )
        return centered / jnp.maximum(norm, 1e-12)

    files = read_csv_list(
        os.path.join(args.csv_dir, conf.test_data_file), args.highres_dataset
    )
    if args.first_n != -1:
        files = files[: args.first_n]

    table = ResultsTable()
    stats = ResultsTable(
        columns=["Filename", "Primitive Id", "Mask", "Nb Points", "mIoU"]
    )
    mious = []
    # counter for clusters silently dropped by fixed-width compaction
    # (VERDICT round 1: "no silent caps" — surfaced here and asserted ~0 by
    # tests/test_merging.py on realistic clouds)
    n_dropped_total = 0
    perm_rng = np.random.RandomState(1789)
    rows_dir = os.path.join(args.output_folder, "rows")
    if args.resume:
        os.makedirs(rows_dir, exist_ok=True)
    for i, path in enumerate(files):
        stem = os.path.basename(path).rsplit(".h5", 1)[0]
        row_file = os.path.join(rows_dir, stem + ".json")
        if args.resume and os.path.isfile(row_file):
            with open(row_file) as fh:
                cached = json.load(fh)
            if cached["had_patches"] and not args.stored_point_order:
                # the per-cloud draw shape is fixed: burn to keep the stream
                for _ in range(max(1, args.n_shuffles)):
                    perm_rng.random(
                        (args.max_patches, args.num_points_patch)
                    )
            mious.append(cached["row"][0])
            table.add(stem, *cached["row"])
            for srow in cached["stats"]:
                stats.add(stem, *srow)
            n_dropped_total += int(cached["n_dropped"])
            continue
        rec = read_spfn_hdf5(path, k_g, conf.test_data_noisy, shuffle=False)
        spfn_dir = os.path.join(args.dir_spfn, stem)
        spfn_labels = np.load(os.path.join(spfn_dir, "object_seg.npy"))
        spfn_normals = np.load(os.path.join(spfn_dir, "object_normals.npy"))
        spfn_type = np.load(os.path.join(spfn_dir, "object_type.npy"))
        idx_file = os.path.join(dir_indices, stem + "_indices.npy")
        P_hr = jnp.asarray(rec["P"])
        if os.path.isfile(idx_file):
            patch_idx = np.load(idx_file)[: args.max_patches]
            n_patches = patch_idx.shape[0]
            padded = np.zeros(
                (args.max_patches, args.num_points_patch), np.int64
            )
            padded[:n_patches] = patch_idx
            mask = np.zeros((args.max_patches,), np.float32)
            mask[:n_patches] = 1.0
            # Per-patch point-order shuffle: heatmap indices are stored in
            # kNN-sorted order, which the order-sensitive network was never
            # trained on. Permuting an index row permutes the gathered patch
            # points AND the scatter targets coherently; each run's outputs
            # are mapped back to the stored row order so the shuffle
            # ensemble (eval/ensemble.py) averages in a common order. R=1
            # reproduces the single-forward path exactly.
            n_runs = max(1, args.n_shuffles)
            if use_feat:
                glob_f = jnp.asarray(
                    np.load(os.path.join(spfn_dir, "global_feat.npy")),
                    jnp.float32,
                )
                lff = np.load(
                    os.path.join(spfn_dir, "local_feat_full.npy")
                )  # [128, N]
                loc_f = jnp.asarray(
                    lff[:, padded[:, 0]].T, jnp.float32
                )  # [max_patches, 128]; padded rows are masked downstream
            acc = None
            for r in range(n_runs):
                if args.stored_point_order:
                    rowperm = np.tile(
                        np.arange(args.num_points_patch),
                        (args.max_patches, 1),
                    )
                else:
                    rowperm = np.argsort(
                        perm_rng.random(padded.shape), axis=1
                    )
                idx_r = jnp.asarray(
                    np.take_along_axis(padded, rowperm, axis=1), jnp.int32
                )
                if use_feat:
                    X_p, T_p, W_p = local_forward(
                        normalize_patches(P_hr, idx_r), glob_f, loc_f
                    )
                else:
                    X_p, T_p, W_p = local_forward(
                        normalize_patches(P_hr, idx_r)
                    )
                inv = jnp.asarray(np.argsort(rowperm, axis=1))
                X_p, T_p, W_p = (
                    jnp.take_along_axis(a, inv[..., None], axis=1)
                    for a in (X_p, T_p, W_p)
                )
                acc = (
                    ensemble.init_accumulator((X_p, T_p, W_p))
                    if acc is None
                    else ensemble.average_run(acc, (X_p, T_p, W_p))
                )
            X_p, T_p, W_p = ensemble.finish_average(acc, n_runs)
            idx_j = jnp.asarray(padded, jnp.int32)
            W_f, X_f, T_f, n_valid = fuse_cascade(
                W_p, X_p, T_p, idx_j,
                spfn_labels, spfn_normals, spfn_type, k_g, k_l,
                patch_mask=mask, out_width=k_g + k_l,
                return_counts=True,
            )
            cloud_dropped = max(0, int(n_valid) - (k_g + k_l))
            n_dropped_total += cloud_dropped
            had_draws = True
        else:
            cloud_dropped = 0
            had_draws = False
            n_patches = 0
            W_f, X_f, T_f = fuse_cascade(
                np.zeros((0, args.num_points_patch, k_l), np.float32),
                np.zeros((0, args.num_points_patch, 3), np.float32),
                np.zeros((0, args.num_points_patch, spfn_type.shape[1]), np.float32),
                np.zeros((0, args.num_points_patch), np.int64),
                spfn_labels, spfn_normals, spfn_type, k_g, k_l,
                out_width=k_g + k_l,
            )
        I_gt = jnp.asarray(rec["I_gt"])[None]
        W_hard = hard_W_encoding(W_f[None])
        match, mask_f = hungarian_matching_with_mask(W_hard, I_gt)
        mask_f = mask_f.astype(jnp.float32)
        # fused-segmentation mIoU (the reference logs it per cloud; our table
        # reports the compute_all_metrics value below, which matches)
        _ = compute_segmentation_iou(W_hard, I_gt, match, mask_f)
        miou_per_prim = 1.0 - compute_miou_loss(W_hard, I_gt, match)[0]
        _, counts = np.unique(rec["I_gt"], return_counts=True)
        stats_rows = [
            [j, float(mask_f[0, j]), int(counts[j]),
             float(miou_per_prim[0, j])]
            for j in range(len(counts))
        ]
        for srow in stats_rows:
            stats.add(stem, *srow)
        m = metrics_fn(
            P_hr[None], X_f[None], jnp.asarray(rec["normal_gt"])[None],
            W_hard[:, :, : k_g + k_l], I_gt, T_f[None],
            jnp.asarray(rec["T_gt"])[None], jnp.asarray(rec["P_gt"])[None],
            {
                "plane_normal": jnp.asarray(rec["plane_n_gt"])[None],
                "cylinder_axis": jnp.asarray(rec["cylinder_axis_gt"])[None],
                "cone_axis": jnp.asarray(rec["cone_axis_gt"])[None],
            },
        )
        row_vals = [
            float(m["mIoU"][0]), float(m["type_accuracy"][0]),
            float(m["normal_difference"][0]), float(m["axis_difference"][0]),
            float(m["mean_residual"][0]), float(m["std_residual"][0]),
            float(m["Sk_coverage"][0][0]), float(m["Sk_coverage"][1][0]),
            float(m["P_coverage"][0][0]), float(m["P_coverage"][1][0]),
        ]
        mious.append(row_vals[0])
        table.add(stem, *row_vals)
        if args.resume:
            with open(row_file, "w") as fh:
                json.dump({
                    "had_patches": had_draws,
                    "row": row_vals,
                    "stats": stats_rows,
                    "n_dropped": cloud_dropped,
                }, fh)
        if i % 100 == 0:
            print(f"[{i}/{len(files)}] mIoU {np.mean(mious):.4f}", flush=True)
    table.write(os.path.join(args.output_folder, "Results.csv"))
    stats.write(os.path.join(args.output_folder, "Results_Stats.csv"))
    print(
        f"done: mean mIoU {np.mean(mious):.4f}; clusters dropped by "
        f"fixed-width compaction: {n_dropped_total}"
    )
    return table


if __name__ == "__main__":
    main()
