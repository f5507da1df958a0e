"""Synthetic TraceParts-format corpus generation CLI.

Writes a directory tree with the reference's dataset layout
(cf. `/root/reference/README.md` data section and
`Preprocessing/preprocessing_sampling_lowres.py` expectations):

    <out>/highres/<name>.h5       TraceParts-format scenes (soup groups + meta)
    <out>/Dataset/train_models.csv
    <out>/Dataset/test_models.csv

so the whole preprocessing -> training -> cascaded-eval pipeline can run at
reference-like data scale without the proprietary TraceParts_v2 dataset.
Generation is resumable: existing .h5 files are kept (their names are still
listed in the CSVs), so an interrupted run can simply be re-invoked.

  python -m cpfn_tpu.data.gen_corpus --out data_synth2 \
      --n_train 2048 --n_test 256 --n_points 100000 --seed 0
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np

from cpfn_tpu.data import synthetic


def _scene_config(args, rng: np.random.RandomState) -> synthetic.SyntheticSceneConfig:
    """Per-scene config: instance and small-primitive counts drawn per cloud
    so the corpus covers the whole difficulty range (many big surfaces, many
    sub-1.5%-coverage primitives that only the local cascade can resolve)."""
    n_small = int(rng.randint(args.min_small, args.max_small + 1))
    return synthetic.SyntheticSceneConfig(
        n_points=args.n_points,
        min_instances=args.min_instances,
        max_instances=args.max_instances,
        noise_sigma=args.noise_sigma,
        include_small_primitive=n_small > 0,
        n_small_primitives=n_small,
    )


def generate_split(args, split: str, n_clouds: int, seed0: int) -> list[str]:
    out_dir = os.path.join(args.out, "highres")
    os.makedirs(out_dir, exist_ok=True)
    names, t0, done_new = [], time.time(), 0
    for i in range(n_clouds):
        name = f"synth_{split}_{i:05d}.h5"
        names.append(name)
        path = os.path.join(out_dir, name)
        if os.path.exists(path) and not args.overwrite:
            continue
        # one independent stream per cloud -> any subset regenerates identically
        rng = np.random.RandomState(seed0 + i)
        scene = synthetic.make_synthetic_scene(rng, _scene_config(args, rng))
        tmp = path + ".tmp"
        synthetic.write_scene_hdf5(tmp, scene)
        os.replace(tmp, path)
        done_new += 1
        if done_new % args.log_every == 0:
            rate = done_new / (time.time() - t0)
            print(
                f"[{split}] {i + 1}/{n_clouds} written ({rate:.2f} clouds/s)",
                flush=True,
            )
    return names


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_synth2")
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_test", type=int, default=256)
    p.add_argument("--n_points", type=int, default=100_000)
    p.add_argument("--min_instances", type=int, default=4)
    p.add_argument("--max_instances", type=int, default=12)
    p.add_argument("--min_small", type=int, default=1,
                   help="min number of small (~1.5%% coverage) primitives")
    p.add_argument("--max_small", type=int, default=6)
    p.add_argument("--noise_sigma", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--log_every", type=int, default=50)
    args = p.parse_args(argv)

    csv_dir = os.path.join(args.out, "Dataset")
    os.makedirs(csv_dir, exist_ok=True)
    splits = [
        ("train", args.n_train, args.seed * 1_000_000),
        ("test", args.n_test, args.seed * 1_000_000 + 500_000),
    ]
    for split, n_clouds, seed0 in splits:
        names = generate_split(args, split, n_clouds, seed0)
        with open(os.path.join(csv_dir, f"{split}_models.csv"), "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"[{split}] {n_clouds} clouds listed", flush=True)
    with open(os.path.join(args.out, "GEN_ARGS.txt"), "w") as f:
        f.write(repr(dataclasses.asdict(args) if dataclasses.is_dataclass(args)
                     else vars(args)) + "\n")


if __name__ == "__main__":
    main()
