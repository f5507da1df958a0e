"""Patch Selection evaluation (cf. `evaluation_PatchSelection.py`).

Predicts per-point small-primitive membership on low-res clouds, reports the
confusion matrix, extracts greedy NN patches from the predicted pool, and
saves <stem>_indices.npy heatmap artifacts. `--scale >= 1` is the GT-oracle
mode (ground-truth labels as the pool).

  python -m cpfn_tpu.eval.eval_patchselec --config_file configs/config_patchSelec.yml \
      --lowres_dataset ... --highres_dataset ... --heatmap_folder ... --scale 0.05
"""

from __future__ import annotations

import argparse
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.config import Config
from cpfn_tpu.data import PatchSelectionDataset
from cpfn_tpu.eval.sampling import sample_patches
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.train.train_spfn import read_csv_list
from cpfn_tpu.utils import restore_checkpoint


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_patchSelec.yml")
    p.add_argument("--lowres_dataset", default="data/TraceParts_v2_lowres/")
    p.add_argument("--highres_dataset", default="data/TraceParts_v2/")
    p.add_argument("--heatmap_folder", default="data/TraceParts_v2_heatmaps/")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--weights", default="")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--first_n", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--num_points_patch", type=int, default=8192)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    conf = Config.from_yaml(args.config_file)
    heatmap_folder = os.path.join(args.heatmap_folder, str(args.scale))
    os.makedirs(heatmap_folder, exist_ok=True)

    use_network = args.scale < 1
    if use_network:
        model_cfg = conf.model_config("PatchSelection")
        params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
        ckpt = args.weights or os.path.join(
            conf.checkpoint_dir, f"patchselec_{round(args.scale, 2)}"
        )
        restored, _ = restore_checkpoint(
            ckpt, {"params": params, "state": state}
        )
        params, state = restored["params"], restored["state"]

        @jax.jit
        def forward(P):
            out, _ = apply_pointnet2(
                params, state, model_cfg, P[None], train=False
            )
            return jnp.argmax(out["heads"][0][0], axis=-1)

    lr_files = read_csv_list(
        os.path.join(args.csv_dir, conf.test_data_file), args.lowres_dataset
    )
    hr_files = read_csv_list(
        os.path.join(args.csv_dir, conf.test_data_file), args.highres_dataset
    )
    if args.first_n != -1:
        lr_files, hr_files = lr_files[: args.first_n], hr_files[: args.first_n]
    # scale >= 1 marks every primitive "small" -> GT-oracle dense pool, as the
    # reference (evaluation_PatchSelection.py:43,64-68)
    ds = PatchSelectionDataset(
        lr_files, hr_files, args.scale, n_points=args.n_points, seed=args.seed
    )

    rng = np.random.RandomState(args.seed)
    confusion = np.zeros((2, 2))
    for i in range(len(ds)):
        rec = ds[i]
        if use_network:
            pred = np.asarray(forward(jnp.asarray(rec["P"])))
            for a in (0, 1):
                for b in (0, 1):
                    confusion[a, b] += np.sum(
                        (pred == a) & (rec["labels"] == b)
                    )
            pred = pred[rec["unshuffle"]]  # undo the loader's shuffling
        else:
            pred = rec["labels"][rec["unshuffle"]]
        stem = os.path.basename(lr_files[i]).rsplit(".h5", 1)[0]
        with h5py.File(hr_files[i], "r") as f:
            gt_points_hr = f["gt_points"][()]
        with h5py.File(lr_files[i], "r") as f:
            gt_points_lr = f["gt_points"][()]
        pool = np.where(pred)[0]
        if len(pool) > 0:
            patch_indices = sample_patches(
                gt_points_lr, gt_points_hr, pool,
                num_points_patch=args.num_points_patch,
                max_number_patches=len(pool), rng=rng,
            )
            np.save(
                os.path.join(heatmap_folder, stem + "_indices.npy"),
                patch_indices,
            )
        if i % 100 == 0:
            print(f"[{i}/{len(ds)}]", flush=True)
    if use_network:
        confusion = confusion / max(confusion.sum(), 1)
        print("Confusion Matrix", confusion)
        np.save(os.path.join(heatmap_folder, "confusion_matrix.npy"), confusion)


if __name__ == "__main__":
    main()
