"""Per-patch training .h5 creation (cf. `Preprocessing/preprocessing_creation_patch.py`).

For each sampled patch: gather high-res points, normalize (mean-center +
max-norm), relabel instances contiguously within the patch, rescale the
primitive meta parameters into the patch frame, attach the GlobalSPFN
features, and write <stem>_patchK.h5 in TraceParts format.

  python -m cpfn_tpu.preprocess.patch_creation --path_highres ... \
      --path_lowres ... --path_features ... --path_patches ... --scale 0.05
"""

from __future__ import annotations

import argparse
import ast
import os
import pickle
import re

import h5py
import numpy as np

_SOUP_RE = re.compile(r"(.*)_soup_([0-9]+)$")


def _parse_meta(attr):
    if isinstance(attr, (bytes, np.void)):
        return pickle.loads(bytes(attr))
    return ast.literal_eval(str(attr))


def _rescale_meta(meta: dict, mean: np.ndarray, norm: float) -> dict:
    """Primitive parameters re-expressed in the normalized patch frame
    (preprocessing_creation_patch.py:94-111)."""
    meta = dict(meta)
    t = meta["type"]
    if t in ("plane", "sphere", "cylinder"):
        for ax, k in zip(range(3), ("location_x", "location_y", "location_z")):
            meta[k] = str((float(meta[k]) - mean[ax]) / norm)
        if t in ("sphere", "cylinder"):
            meta["radius"] = str(float(meta["radius"]) / norm)
    elif t == "cone":
        for ax, k in zip(range(3), ("apex_x", "apex_y", "apex_z")):
            meta[k] = str((float(meta[k]) - mean[ax]) / norm)
    return meta


def create_patches_file(
    highres_path: str,
    lowres_path: str,
    indices_path: str,
    features_dir: str | None,
    out_dir: str,
    num_points: int = 8192,
) -> int:
    """Returns the number of patch files written (0 if no indices exist)."""
    if not os.path.isfile(indices_path):
        return 0
    stem = os.path.basename(highres_path).rsplit(".h5", 1)[0]
    patch_indices = np.load(indices_path)
    nb_patches = patch_indices.shape[0]
    with h5py.File(highres_path, "r") as f:
        P = f["gt_points"][()].astype(np.float32)
        P_noisy = f["noisy_points"][()].astype(np.float32)
        normal_gt = f["gt_normals"][()].astype(np.float32)
        I_gt = f["gt_labels"][()].astype(np.int64)
    with h5py.File(lowres_path, "r") as f:
        soup_id_to_key = {}
        for key in f.keys():
            m = _SOUP_RE.match(key)
            if m is not None:
                soup_id_to_key[int(m.group(2))] = key
        n_instances = len(soup_id_to_key)
        P_gt, N_gt, metas = [], [], []
        for i in range(n_instances):
            g = f[soup_id_to_key[i]]
            P_gt.append(g["gt_points"][()])
            N_gt.append(g["gt_normals"][()])
            metas.append(_parse_meta(g.attrs["meta"]))
        P_gt = np.asarray(P_gt)
        N_gt = np.asarray(N_gt)

    flat = patch_indices.reshape(-1)
    Pp = P[flat].reshape(nb_patches, num_points, 3)
    Pn = P_noisy[flat].reshape(nb_patches, num_points, 3)
    Ng = normal_gt[flat].reshape(nb_patches, num_points, 3)
    Ig = I_gt[flat].reshape(nb_patches, num_points)
    mean = Pp.mean(axis=1, keepdims=True)
    Pp = Pp - mean
    norm = np.linalg.norm(Pp, axis=2, keepdims=True).max(axis=1, keepdims=True)
    Pp = Pp / norm
    Pn = (Pn - mean) / norm

    glob_features = loc_features = None
    if features_dir is not None:
        glob_features = np.load(
            os.path.join(features_dir, stem, "global_feat.npy")
        )
        loc_features = np.load(
            os.path.join(features_dir, stem, "local_feat.npy")
        )

    os.makedirs(out_dir, exist_ok=True)
    for i in range(nb_patches):
        m3 = mean[i, 0]
        s = float(norm[i, 0, 0])
        unique_values, inverse = np.unique(Ig[i], return_inverse=True)
        has_bg = -1 in Ig[i]
        if has_bg:
            inverse = inverse - 1
        unique_values = unique_values[unique_values != -1]
        path = os.path.join(out_dir, f"{stem}_patch{i}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("gt_points", data=Pp[i].astype(np.float32))
            f.create_dataset("gt_normals", data=Ng[i].astype(np.float32))
            f.create_dataset("gt_labels", data=inverse.astype(np.int64))
            f.create_dataset("noisy_points", data=Pn[i].astype(np.float32))
            if glob_features is not None:
                f.create_dataset(
                    "glob_features", data=glob_features.astype(np.float32)
                )
                f.create_dataset(
                    "loc_features", data=loc_features[:, i].astype(np.float32)
                )
            for j, value in enumerate(unique_values):
                grp = f.create_group(f"{stem}_patch{i}_soup_{j}")
                gp = (P_gt[value] - m3) / s
                # zero out GT sample slots that were zero-padding upstream
                pad = np.all(P_gt[value] == 0, axis=1, keepdims=True)
                grp["gt_points"] = np.where(pad, 0.0, gp).astype(np.float32)
                grp["gt_normals"] = N_gt[value].astype(np.float32)
                grp.attrs["meta"] = str(_rescale_meta(metas[value], m3, s))
    return nb_patches


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path_highres", default="data/TraceParts_v2/")
    p.add_argument("--path_lowres", default="data/TraceParts_v2_lowres/")
    p.add_argument("--path_features", default="data/TraceParts_v2_globalspfn/")
    p.add_argument("--path_patches", default="data/TraceParts_v2_patches/")
    p.add_argument("--path_split_file", default="Dataset/train_models.csv")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--num_points_patch", type=int, default=8192)
    p.add_argument("--no_features", action="store_true")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip clouds whose patch dir already exists "
                        "(resumable corpus extension)")
    args = p.parse_args(argv)
    patch_root = os.path.join(args.path_patches, str(round(args.scale, 2)))
    with open(args.path_split_file) as f:
        files = [line.strip() for line in f if line.strip()]
    if args.skip_existing:
        files = [
            f_ for f_ in files if not os.path.isdir(
                os.path.join(patch_root, f_.rsplit(".h5", 1)[0])
            )
        ]
        print(f"skip_existing: {len(files)} files left to process")
    for i, file_ in enumerate(files):
        if i % 100 == 0:
            print(f"{i} / {len(files)}", flush=True)
        stem = file_.rsplit(".h5", 1)[0]
        create_patches_file(
            os.path.join(args.path_highres, file_),
            os.path.join(args.path_lowres, file_),
            os.path.join(patch_root, stem + "_indices.npy"),
            None if args.no_features else args.path_features,
            os.path.join(patch_root, stem),
            num_points=args.num_points_patch,
        )


if __name__ == "__main__":
    main()
