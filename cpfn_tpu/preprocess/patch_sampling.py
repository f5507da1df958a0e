"""Ground-truth patch-index sampling for LocalSPFN training
(cf. `Preprocessing/preprocessing_sampling_patch.py`).

Small primitives are those covering < scale * N_highres points; pool = their
low-res points. Patches are extracted round-robin per label: for each
remaining label, pick a random pool point, take its `num_points_patch`
high-res nearest neighbors, and delete pool points within the patch radius.

  python -m cpfn_tpu.preprocess.patch_sampling --path_highres ... \
      --path_lowres ... --path_patches ... --scale 0.05
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def get_small_primitives(gt_labels_hr, max_nb_points):
    uniq, counts = np.unique(gt_labels_hr, return_counts=True)
    return uniq[counts < max_nb_points]


def sample_round_robin(
    gt_points_lr,
    gt_points_hr,
    pool_indices,
    pool_labels,
    num_points_patch: int = 8192,
    max_number_patches: int = 32,
    rng: np.random.RandomState | None = None,
):
    rng = rng or np.random
    patches = []
    while len(patches) < max_number_patches and len(pool_indices) != 0:
        for label in np.unique(pool_labels):
            if len(patches) >= max_number_patches:
                break
            cand = np.where(pool_labels == label)[0]
            if len(cand) == 0:
                continue
            i = pool_indices[rng.choice(cand)]
            d_hr = np.linalg.norm(
                gt_points_lr[i][None] - gt_points_hr, axis=1
            )
            order = np.argpartition(d_hr, num_points_patch - 1)[
                :num_points_patch
            ]
            order = order[np.argsort(d_hr[order])]
            patches.append(order)
            radius = d_hr[order[-1]]
            d_lr = np.linalg.norm(
                gt_points_lr[i][None] - gt_points_lr[pool_indices], axis=1
            )
            kill = np.where(d_lr <= radius)[0]
            pool_indices = np.delete(pool_indices, kill)
            pool_labels = np.delete(pool_labels, kill)
    return np.stack(patches, axis=0) if patches else None


def sample_patch_indices_file(
    highres_path: str,
    lowres_path: str,
    out_path: str,
    scale: float = 0.05,
    max_number_patches: int = 32,
    num_points_patch: int = 8192,
    rng: np.random.RandomState | None = None,
) -> bool:
    with h5py.File(highres_path, "r") as f:
        gt_points_hr = f["gt_points"][()]
        gt_labels_hr = f["gt_labels"][()]
    with h5py.File(lowres_path, "r") as f:
        gt_points_lr = f["gt_points"][()]
        gt_labels_lr = f["gt_labels"][()]
    small_ids = get_small_primitives(
        gt_labels_hr, int(scale * gt_points_hr.shape[0])
    )
    pool = np.where(np.isin(gt_labels_lr, small_ids))[0]
    if len(pool) == 0:
        return False
    patches = sample_round_robin(
        gt_points_lr, gt_points_hr, pool, gt_labels_lr[pool],
        num_points_patch=num_points_patch,
        max_number_patches=max_number_patches,
        rng=rng,
    )
    if patches is None:
        return False
    np.save(out_path, patches)
    return True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path_highres", default="data/TraceParts_v2/")
    p.add_argument("--path_lowres", default="data/TraceParts_v2_lowres/")
    p.add_argument("--path_patches", default="data/TraceParts_v2_patches/")
    p.add_argument("--path_split_file", default="Dataset/train_models.csv")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--max_number_patches", type=int, default=32)
    p.add_argument("--num_points_patch", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_existing", action="store_true",
                   help="skip clouds whose _indices.npy already exists "
                        "(resumable corpus extension)")
    args = p.parse_args(argv)
    out_dir = os.path.join(args.path_patches, str(round(args.scale, 2)))
    os.makedirs(out_dir, exist_ok=True)
    with open(args.path_split_file) as f:
        files = [line.strip() for line in f if line.strip()]
    if args.skip_existing:
        files = [
            f_ for f_ in files if not os.path.isfile(
                os.path.join(out_dir, f_.replace(".h5", "_indices.npy"))
            )
        ]
        print(f"skip_existing: {len(files)} files left to process")
    for i, file_ in enumerate(files):
        if i % 100 == 0:
            print(f"{i} / {len(files)}", flush=True)
        sample_patch_indices_file(
            os.path.join(args.path_highres, file_),
            os.path.join(args.path_lowres, file_),
            os.path.join(out_dir, file_.replace(".h5", "_indices.npy")),
            scale=args.scale,
            max_number_patches=args.max_number_patches,
            num_points_patch=args.num_points_patch,
            rng=np.random.RandomState(args.seed + i),
        )


if __name__ == "__main__":
    main()
