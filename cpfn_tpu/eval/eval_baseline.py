"""Baseline SPFN evaluation (cf. `evaluation_baselineSPFN.py`): the
global-only fusion path — GlobalSPFN's saved outputs scored on the high-res
cloud with no patches — for comparison against the full cascade.

  python -m cpfn_tpu.eval.eval_baseline --config_file configs/config_localSPFN.yml \
      --highres_dataset ... --dir_spfn ... --output_folder ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from cpfn_tpu.config import Config
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.fitting import factory
from cpfn_tpu.merging import fuse_cascade
from cpfn_tpu.train.train_spfn import read_csv_list
from cpfn_tpu.utils.logging import ResultsTable


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_localSPFN.yml")
    p.add_argument("--highres_dataset", default="data/TraceParts_v2/")
    p.add_argument("--dir_spfn", default="data/TraceParts_v2_globalspfn/")
    p.add_argument("--output_folder", default="data/TraceParts_v2_baselinespfn/")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--first_n", type=int, default=-1)
    p.add_argument("--resume", action="store_true",
                   help="skip clouds with a cached rows_baseline/<stem>.json "
                        "(row + per-primitive stats; this driver draws no "
                        "RNG) — bit-identical CSVs vs an uninterrupted run")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    conf = Config.from_yaml(args.config_file)
    factory.register_primitives(list(conf.list_of_primitives))
    k_g = conf.n_max_global_instances
    os.makedirs(args.output_folder, exist_ok=True)
    files = read_csv_list(
        os.path.join(args.csv_dir, conf.test_data_file), args.highres_dataset
    )
    if args.first_n != -1:
        files = files[: args.first_n]
    from cpfn_tpu.eval._util import make_metrics_fn

    metrics_fn = make_metrics_fn(conf.list_of_primitives)
    table = ResultsTable()
    stats = ResultsTable(
        columns=["Filename", "Primitive Id", "Mask", "Nb Points", "mIoU"]
    )
    mious = []
    rows_dir = os.path.join(args.output_folder, "rows_baseline")
    if args.resume:
        os.makedirs(rows_dir, exist_ok=True)
    for i, path in enumerate(files):
        stem = os.path.basename(path).rsplit(".h5", 1)[0]
        row_file = os.path.join(rows_dir, stem + ".json")
        if args.resume and os.path.isfile(row_file):
            with open(row_file) as fh:
                cached = json.load(fh)
            mious.append(cached["row"][0])
            table.add(stem, *cached["row"])
            for srow in cached["stats"]:
                stats.add(stem, *srow)
            continue
        rec = read_spfn_hdf5(path, k_g, conf.test_data_noisy, shuffle=False)
        spfn_dir = os.path.join(args.dir_spfn, stem)
        spfn_labels = np.load(os.path.join(spfn_dir, "object_seg.npy"))
        spfn_normals = np.load(os.path.join(spfn_dir, "object_normals.npy"))
        spfn_type = np.load(os.path.join(spfn_dir, "object_type.npy"))
        n = spfn_type.shape[1]
        W_f, X_f, T_f = fuse_cascade(
            np.zeros((0, 8192, conf.n_max_local_instances), np.float32),
            np.zeros((0, 8192, 3), np.float32),
            np.zeros((0, 8192, n), np.float32),
            np.zeros((0, 8192), np.int64),
            spfn_labels, spfn_normals, spfn_type,
            k_g, conf.n_max_local_instances,
        )
        # per-primitive IoU stats of the global-only segmentation
        from cpfn_tpu.losses import compute_miou_loss, hungarian_matching_with_mask
        from cpfn_tpu.metrics import hard_W_encoding

        I_gt_j = jnp.asarray(rec["I_gt"])[None]
        W_hard = hard_W_encoding(W_f[None])
        match_f, mask_f = hungarian_matching_with_mask(W_hard, I_gt_j)
        mask_f = mask_f.astype(jnp.float32)
        miou_per_prim = 1.0 - compute_miou_loss(W_hard, I_gt_j, match_f)[0]
        _, counts = np.unique(rec["I_gt"], return_counts=True)
        stats_rows = [
            [j, float(mask_f[0, j]), int(counts[j]),
             float(miou_per_prim[0, j])]
            for j in range(len(counts))
        ]
        for srow in stats_rows:
            stats.add(stem, *srow)
        m = metrics_fn(
            jnp.asarray(rec["P"])[None], X_f[None],
            jnp.asarray(rec["normal_gt"])[None], W_f[None],
            jnp.asarray(rec["I_gt"])[None], T_f[None],
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
                json.dump({"row": row_vals, "stats": stats_rows}, fh)
        if i % 100 == 0:
            print(f"[{i}/{len(files)}] mIoU {np.mean(mious):.4f}", flush=True)
    table.write(os.path.join(args.output_folder, "Results_baseline.csv"))
    stats.write(
        os.path.join(args.output_folder, "Results_Stats_baseline.csv")
    )
    print(f"done: mean mIoU {np.mean(mious):.4f}")
    return table


if __name__ == "__main__":
    main()
