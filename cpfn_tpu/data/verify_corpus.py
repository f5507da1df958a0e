"""Integrity scan for a TraceParts-format highres corpus.

Detects hard-reset corruption (ext4 delayed-alloc zero-filled pages: file
metadata survived, data blocks never flushed) and generally-unreadable
records. The reference pipeline has no equivalent (it trusts its dataset);
ours regenerates deterministically (`gen_corpus.py` per-cloud seeds), so
corrupt files can simply be deleted and re-derived.

  python -m cpfn_tpu.data.verify_corpus data_synth2/highres --delete

Detectors, per file:
  - unreadable h5 / missing datasets        -> corrupt
  - gt_normals: any row with norm < 0.5     -> corrupt (normals are unit)
  - gt_points / noisy_points: >=3 all-zero rows -> corrupt (measure-zero
    for the synthetic generator; zero pages produce hundreds)
  - each soup group's gt_normals rows unit  -> corrupt

Prints one line per corrupt file and a summary; with --delete removes them.
"""
import argparse
import os
import sys

import h5py
import numpy as np


def check_file(path):
    try:
        with h5py.File(path, "r") as f:
            lab = f["gt_labels"][()]
            pts = f["gt_points"][()]
            if np.count_nonzero(np.all(pts == 0, axis=1)) >= 3:
                return "gt_points zero rows"
            nrm = f["gt_normals"][()]
            if np.linalg.norm(nrm, axis=1).min() < 0.5:
                return "gt_normals non-unit"
            noisy = f["noisy_points"][()]
            if np.count_nonzero(np.all(noisy == 0, axis=1)) >= 3:
                return "noisy_points zero rows"
            if not (np.isfinite(pts).all() and np.isfinite(noisy).all()):
                return "non-finite"
            stem = os.path.basename(path).rsplit(".h5", 1)[0]
            for i in range(int(lab.max()) + 1):
                g = f[f"{stem}_soup_{i}"]
                sn = g["gt_normals"][()]
                if sn.shape[0] and np.linalg.norm(sn, axis=1).min() < 0.5:
                    return f"soup_{i} normals"
                _ = g.attrs["meta"]
    except Exception as e:  # noqa: BLE001 - any read failure = corrupt
        return f"unreadable: {type(e).__name__}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--delete", action="store_true")
    args = ap.parse_args()
    files = sorted(os.listdir(args.root))
    bad = []
    for i, name in enumerate(files):
        if i % 500 == 0:
            print(f"scan {i}/{len(files)} ({len(bad)} bad)", flush=True)
        path = os.path.join(args.root, name)
        why = check_file(path)
        if why:
            bad.append(name)
            print(f"CORRUPT {name}: {why}", flush=True)
            if args.delete:
                os.remove(path)
    print(f"done: {len(bad)}/{len(files)} corrupt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
