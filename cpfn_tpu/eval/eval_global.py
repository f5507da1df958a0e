"""GlobalSPFN evaluation + feature extraction (cf. `evaluation_globalSPFN.py`).

Per test cloud (full high-res resolution): forward pass, hard segmentation,
the 10 metrics, and the .npy artifacts consumed downstream by patch creation
and the cascade (global_feat, local_feat, local_feat_full, object_seg,
object_normals, object_type).

  python -m cpfn_tpu.eval.eval_global --config_file configs/config_globalSPFN.yml \
      --lowres_dataset ... --highres_dataset ... --output_folder ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.config import Config
from cpfn_tpu.data import GlobalSPFNDataset
from cpfn_tpu.eval import ensemble
from cpfn_tpu.fitting import factory
from cpfn_tpu.metrics import hard_W_encoding
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.train.train_spfn import read_csv_list
from cpfn_tpu.utils import restore_checkpoint
from cpfn_tpu.utils.logging import ResultsTable


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_globalSPFN.yml")
    p.add_argument("--lowres_dataset", default="data/TraceParts_v2_lowres/")
    p.add_argument("--highres_dataset", default="data/TraceParts_v2/")
    p.add_argument("--path_patches", default="data/TraceParts_v2_patches/")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--output_folder", default="data/TraceParts_v2_globalspfn/")
    p.add_argument("--evaluation_set", default="test", choices=["train", "test"])
    p.add_argument("--weights", default="", help="checkpoint dir")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--first_n", type=int, default=-1)
    p.add_argument("--skip_features", action="store_true",
                   help="skip the per-point feature artifacts (the released "
                        "LocalSPFN config is feature-free; saves large "
                        "device->host transfers)")
    p.add_argument("--features_only", action="store_true",
                   help="write ONLY global_feat.npy/local_feat.npy per cloud "
                        "(no metrics, no seg artifacts): the train-split "
                        "feature-extraction pass that feeds feature-trained "
                        "LocalSPFN patches (evaluation_globalSPFN.py is run "
                        "on the train split for the same purpose). The "
                        "per-patch feature gather happens on device so only "
                        "[P,128] leaves the chip, not [N,128].")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip clouds whose feature artifacts already exist "
                        "(resume an interrupted features_only pass)")
    p.add_argument("--resume", action="store_true",
                   help="full-eval resume: skip clouds whose per-cloud "
                        "row.json cache exists (written after that cloud's "
                        "artifacts), replaying its metrics row and burning "
                        "its host-RNG permutations so all later clouds see "
                        "the identical RNG stream — bit-identical Results.csv "
                        "vs an uninterrupted run. The tunneled TPU backend "
                        "occasionally drops mid-eval; without this a 256-cloud "
                        "pass restarts from zero.")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul inputs (f32 accumulation) in the "
                   "GlobalSPFN forward — the TPU mixed-precision eval mode")
    p.add_argument("--stored_point_order", action="store_true",
                   help="feed clouds in stored .h5 point order instead of "
                   "the default shuffled order. The network is point-order "
                   "sensitive (FPS seeds at index 0, first-K ball query) and "
                   "is trained on shuffled orders; stored instance-sorted "
                   "order measurably degrades it (round-3 finding).")
    p.add_argument("--n_shuffles", type=int, default=1,
                   help="shuffle-ensemble width: forwards per cloud over "
                   "independent point permutations, soft outputs averaged "
                   "after relaxed-IoU slot alignment (eval/ensemble.py)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    conf = Config.from_yaml(args.config_file)
    factory.register_primitives(list(conf.list_of_primitives))
    model_cfg = conf.model_config("GlobalSPFN")
    if args.bf16:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    k_max = conf.n_max_global_instances
    os.makedirs(args.output_folder, exist_ok=True)

    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    if args.weights != "__random_init__":
        # the sentinel keeps the seeded init (tools/reference_parity.py
        # compares both stacks on identical exported random weights)
        ckpt = args.weights or os.path.join(conf.checkpoint_dir, "globalspfn")
        restored, _ = restore_checkpoint(
            ckpt, {"params": params, "state": state}
        )
        params, state = restored["params"], restored["state"]

    csv_file = (
        conf.train_data_file
        if args.evaluation_set == "train"
        else conf.test_data_file
    )
    files = read_csv_list(
        os.path.join(args.csv_dir, csv_file), args.highres_dataset
    )
    if args.first_n != -1:
        files = files[: args.first_n]
    patch_dir = os.path.join(args.path_patches, str(round(args.scale, 2)))
    ds = GlobalSPFNDataset(
        files, k_max, conf.test_data_noisy, n_points=None, test=True,
        patch_dir=patch_dir, preload=False,
    )

    @jax.jit
    def forward(params, state, P):
        out, _ = apply_pointnet2(params, state, model_cfg, P, train=False)
        X, T, W = spfn_postprocess(out)
        return X, T, W, out["global_feat"], out["point_feat"]

    from cpfn_tpu.eval._util import make_metrics_fn

    metrics_fn = make_metrics_fn(conf.list_of_primitives)

    @jax.jit
    def feature_forward(params, state, P, inv, centers):
        # forward on the shuffled order + on-device unshuffle + center
        # gather: only [1024] + [pad,128] cross the tunnel per cloud
        out, _ = apply_pointnet2(params, state, model_cfg, P, train=False)
        pf = out["point_feat"][0][inv]
        return out["global_feat"][0], pf[centers]

    table = ResultsTable()
    mious = []
    # Point-order normalization: the forward runs on a shuffled point order
    # (the training distribution — the network is order-sensitive through
    # FPS/ball-query scan order), and every per-point output is unshuffled
    # back to stored order before artifacts and metrics. Seeded per driver
    # run for reproducibility. See also PatchSelectionDataset.__getitem__,
    # which has always done this for the patch-selection eval.
    perm_rng = np.random.RandomState(1789)
    for i in range(len(ds)):
        stem = os.path.basename(ds.files[i]).rsplit(".h5", 1)[0]
        out_dir = os.path.join(args.output_folder, stem)
        if (
            args.features_only
            and args.skip_existing
            and os.path.isfile(os.path.join(out_dir, "local_feat.npy"))
        ):
            continue
        row_file = os.path.join(out_dir, "row.json")
        if (
            args.resume
            and not args.features_only
            and os.path.isfile(row_file)
        ):
            # replay the cached row; burn this cloud's permutations so every
            # later cloud draws the same RNG stream as an uninterrupted run
            with open(row_file) as fh:
                cached = json.load(fh)
            if not args.stored_point_order:
                for _ in range(max(1, args.n_shuffles)):
                    perm_rng.permutation(int(cached["n_pts"]))
            mious.append(cached["row"][0])
            table.add(stem, *cached["row"])
            continue
        rec = ds[i]
        os.makedirs(out_dir, exist_ok=True)
        n_pts = rec["P"].shape[0]
        if args.features_only:
            pc = np.asarray(rec["patch_centers"], np.int64)
            if len(pc) == 0:
                # no patches sampled for this cloud: nothing downstream
                # reads features for it, but write the global code anyway
                pc = np.zeros(1, np.int64)
                n_real = 0
            else:
                n_real = len(pc)
            # pad the center count to a power of two so the jitted gather
            # compiles once per bucket, not once per cloud
            pad = 1 << max(4, int(np.ceil(np.log2(len(pc)))))
            pc_pad = np.zeros(pad, np.int64)
            pc_pad[: len(pc)] = pc
            perm = (
                np.arange(n_pts)
                if args.stored_point_order
                else perm_rng.permutation(n_pts)
            )
            inv = jnp.asarray(np.argsort(perm))
            gf, lf = feature_forward(
                params, state, jnp.asarray(rec["P"][perm])[None], inv,
                jnp.asarray(pc_pad),
            )
            np.save(os.path.join(out_dir, "global_feat.npy"), np.asarray(gf))
            np.save(
                os.path.join(out_dir, "local_feat.npy"),
                np.asarray(lf)[:max(n_real, 1)].T,  # [128, P] reference layout
            )
            if i % 100 == 0:
                print(f"[{i}/{len(ds)}] features", flush=True)
            continue
        # Shuffle ensemble (eval/ensemble.py): R forwards over independent
        # point permutations, each unshuffled back to stored order, soft
        # outputs averaged after relaxed-IoU slot alignment. R=1 reproduces
        # the single-forward path exactly.
        n_runs = max(1, args.n_shuffles)
        acc = gf_sum = pf_sum = None
        for r in range(n_runs):
            if args.stored_point_order:
                perm = np.arange(n_pts)
            else:
                perm = perm_rng.permutation(n_pts)
            inv = jnp.asarray(np.argsort(perm))
            P = jnp.asarray(rec["P"][perm])[None]
            X, T, W, global_feat, point_feat = forward(params, state, P)
            # back to stored order for artifacts, metrics, feature gathers
            X, T, W, pf = (a[:, inv] for a in (X, T, W, point_feat))
            if acc is None:
                acc = ensemble.init_accumulator((X, T, W))
                gf_sum, pf_sum = global_feat, pf
            else:
                acc = ensemble.average_run(acc, (X, T, W))
                gf_sum, pf_sum = gf_sum + global_feat, pf_sum + pf
        X, T, W = ensemble.finish_average(acc, n_runs)
        global_feat, point_feat = gf_sum / n_runs, pf_sum / n_runs
        P = jnp.asarray(rec["P"])[None]
        if args.evaluation_set == "test" and not args.skip_features:
            # [C, N] layout, as the reference artifacts
            np.save(
                os.path.join(out_dir, "local_feat_full.npy"),
                np.asarray(point_feat[0]).T,
            )
        if not args.skip_features:
            local_feat = np.asarray(point_feat[0])[
                np.asarray(rec["patch_centers"], np.int64)
            ].T
        W_hard = hard_W_encoding(W)
        m = metrics_fn(
            P, X, jnp.asarray(rec["normal_gt"])[None], W_hard,
            jnp.asarray(rec["I_gt"])[None], T,
            jnp.asarray(rec["T_gt"])[None], jnp.asarray(rec["P_gt"])[None],
            {
                "plane_normal": jnp.asarray(rec["plane_n_gt"])[None],
                "cylinder_axis": jnp.asarray(rec["cylinder_axis_gt"])[None],
                "cone_axis": jnp.asarray(rec["cone_axis_gt"])[None],
            },
        )
        if args.evaluation_set == "test":
            np.save(os.path.join(out_dir, "object_seg.npy"), np.asarray(m["W"][0]))
            np.save(os.path.join(out_dir, "object_normals.npy"), np.asarray(X[0]))
            np.save(os.path.join(out_dir, "object_type.npy"), np.asarray(T[0]))
        if not args.skip_features:
            np.save(
                os.path.join(out_dir, "global_feat.npy"),
                np.asarray(global_feat[0]),
            )
            np.save(os.path.join(out_dir, "local_feat.npy"), local_feat)
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
            # written AFTER the artifacts above: its existence implies the
            # cloud is fully materialized on disk
            with open(row_file, "w") as fh:
                json.dump({"n_pts": int(n_pts), "row": row_vals}, fh)
        if i % 100 == 0:
            print(f"[{i}/{len(ds)}] mIoU {np.mean(mious):.4f}", flush=True)
    table.write(os.path.join(args.output_folder, "Results.csv"))
    print(f"done: mean mIoU {np.mean(mious):.4f}")
    return table


if __name__ == "__main__":
    main()
