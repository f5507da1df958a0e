"""Low-res FPS subsampling of the high-res dataset
(cf. `Preprocessing/preprocessing_sampling_lowres.py`).

Per cloud: one guaranteed FPS seed per GT label (so no instance disappears),
then global FPS for `nb_query_points` more samples, writing a lowres .h5 with
the same soup groups. The FPS kernels run in the C++ host library
(`cpfn_tpu.native`) — the reference's numba JIT equivalents.

  python -m cpfn_tpu.preprocess.lowres --path_highres ... --path_lowres ... \
      --path_split_file Dataset/train_models.csv
"""

from __future__ import annotations

import argparse
import functools
import os

import h5py
import numpy as np

from cpfn_tpu import native


@functools.lru_cache(maxsize=None)
def _device_fps_fn(
    n_points: int, nb_query_points: int, max_labels: int, impl: str = "auto"
):
    """One jitted graph: per-label seeded FPS (padded to `max_labels`
    iterations, masked by the traced label count) followed by global FPS for
    `nb_query_points` more samples. Mirrors the host preprocessing kernels
    (`native.fps_host` / `fps_per_label_host`: euclidean distance, 1e6
    min-dist init, seeds zeroed, ties -> lowest index) in f32 on device —
    near-tie selections may differ from the float64 host path, which only
    perturbs which points the subsample keeps, not its validity.

    The global phase runs as the seeded Pallas kernel on TPU (the whole
    sequential chain in one VMEM-resident program) and as an XLA fori_loop
    elsewhere; `impl` ('auto'/'pallas'/'xla', or env CPFN_LOWRES_FPS)
    overrides. The ~28-step seeding phase stays XLA either way — it is
    <1% of the chain."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if impl == "auto":
        impl = os.environ.get("CPFN_LOWRES_FPS", "")
    if impl in ("auto", ""):
        impl = (
            "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        )

    def fn(points, labels, start, n_unique):
        def dist_to(idx):
            return jnp.linalg.norm(points - points[idx], axis=1)

        def label_body(i, st):
            mind, idx, seeds = st

            def take(st):
                mind, idx, seeds = st
                seeds = seeds.at[i].set(idx)
                lab = labels[idx]
                mind = jnp.minimum(mind, dist_to(idx))
                mind = jnp.where(labels == lab, 0.0, mind)
                return mind, jnp.argmax(mind).astype(jnp.int32), seeds

            return lax.cond(i < n_unique, take, lambda st: st, st)

        mind0 = jnp.full((n_points,), 1e6, jnp.float32)
        seeds0 = jnp.zeros((max_labels,), jnp.int32)
        _, _, seeds = lax.fori_loop(
            0, max_labels, label_body, (mind0, start, seeds0)
        )
        # global FPS re-initializes the min-dist buffer with only the seeds'
        # own entries zeroed, exactly as fps_host does with seed_idx (it does
        # NOT carry distance-to-seed state; first pick = lowest non-seed index)
        seed_vals = jnp.where(
            jnp.arange(max_labels) < n_unique, 0.0, 1e6
        ).astype(jnp.float32)
        mind = jnp.full((n_points,), 1e6, jnp.float32).at[seeds].min(seed_vals)

        if impl == "pallas":
            from cpfn_tpu.ops.pallas_kernels import (
                farthest_point_sample_seeded_pallas,
            )

            rest = farthest_point_sample_seeded_pallas(
                points, mind, nb_query_points
            )
            return seeds, rest

        def fps_body(i, st):
            mind, idx, out = st
            out = out.at[i].set(idx)
            mind = jnp.minimum(mind, dist_to(idx))
            return mind, jnp.argmax(mind).astype(jnp.int32), out

        out0 = jnp.zeros((nb_query_points,), jnp.int32)
        _, _, rest = lax.fori_loop(
            0, nb_query_points, fps_body,
            (mind, jnp.argmax(mind).astype(jnp.int32), out0),
        )
        return seeds, rest

    return jax.jit(fn)


def lowres_indices_device(
    gt_points: np.ndarray,
    gt_labels: np.ndarray,
    start: int,
    nb_query_points: int = 8192,
    max_labels: int = 28,
) -> np.ndarray:
    """Device (TPU) version of the seed+global FPS index selection."""
    import jax.numpy as jnp

    n_unique = len(np.unique(gt_labels))
    fn = _device_fps_fn(len(gt_points), nb_query_points, max_labels)
    seeds, rest = fn(
        jnp.asarray(gt_points, jnp.float32),
        jnp.asarray(gt_labels, jnp.int32),
        jnp.int32(start),
        jnp.int32(n_unique),
    )
    return np.concatenate([np.asarray(seeds)[:n_unique], np.asarray(rest)])


def subsample_lowres_file(
    highres_path: str,
    lowres_path: str,
    nb_query_points: int = 8192,
    rng: np.random.RandomState | None = None,
    device: bool = False,
) -> bool:
    """Returns False when the input file is unreadable (skipped, as the
    reference's swallow-and-skip, preprocessing_sampling_lowres.py:50-64)."""
    rng = rng or np.random
    stem = os.path.basename(highres_path).rsplit(".h5", 1)[0]
    try:
        with h5py.File(highres_path, "r") as f:
            gt_points = f["gt_points"][()].astype(np.float32)
            noisy_points = f["noisy_points"][()].astype(np.float32)
            gt_labels = f["gt_labels"][()].astype(np.int32)
            gt_normals = f["gt_normals"][()].astype(np.float32)
            primitives = {}
            for i in range(int(gt_labels.max()) + 1):
                key = f"{stem}_soup_{i}"
                primitives[key] = {
                    "gt_points": f[key]["gt_points"][()],
                    "gt_normals": f[key]["gt_normals"][()],
                    "meta": f[key].attrs["meta"],
                }
    except Exception:
        return False
    start = int(rng.randint(0, len(gt_points)))
    if device:
        idx = lowres_indices_device(
            gt_points, gt_labels, start, nb_query_points,
            max_labels=max(28, int(gt_labels.max()) + 1),
        )
    else:
        seed_idx = native.fps_per_label_host(gt_points, gt_labels, start)
        rest_idx = native.fps_host(
            gt_points, nb_query_points, seed_idx=seed_idx
        )
        idx = np.concatenate([seed_idx, rest_idx])
    assert len(np.unique(gt_labels)) == len(np.unique(gt_labels[idx]))
    # tmp + atomic replace: a killed/raced writer must never leave a partial
    # file that --skip_existing would then silently accept (observed risk
    # when a stall watchdog killed a run mid-write)
    tmp_path = lowres_path + ".tmp"
    with h5py.File(tmp_path, "w") as f:
        f.create_dataset("gt_points", data=gt_points[idx])
        f.create_dataset("gt_normals", data=gt_normals[idx])
        f.create_dataset("gt_labels", data=gt_labels[idx])
        f.create_dataset("noisy_points", data=noisy_points[idx])
        f.create_dataset("index_query_points", data=idx)
        for key, grp_data in primitives.items():
            grp = f.create_group(key)
            grp["gt_points"] = grp_data["gt_points"]
            grp["gt_normals"] = grp_data["gt_normals"]
            grp.attrs["meta"] = grp_data["meta"]
    os.replace(tmp_path, lowres_path)
    return True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--path_highres", default="data/TraceParts_v2/")
    p.add_argument("--path_lowres", default="data/TraceParts_v2_lowres/")
    p.add_argument("--path_split_file", default="Dataset/train_models.csv")
    p.add_argument("--nb_query_points", type=int, default=8192)
    p.add_argument("--n_jobs", type=int, default=0, help="0 = 70%% of CPUs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_existing", action="store_true",
                   help="skip files whose lowres output already exists "
                        "(resumable corpus extension)")
    p.add_argument(
        "--device", action="store_true",
        help="run the FPS selection on the accelerator (one jitted graph; "
        "an order of magnitude faster per cloud than the host kernels)",
    )
    args = p.parse_args(argv)
    os.makedirs(args.path_lowres, exist_ok=True)
    with open(args.path_split_file) as f:
        files = [line.strip() for line in f if line.strip()]
    if args.skip_existing:
        files = [
            f_ for f_ in files
            if not os.path.isfile(os.path.join(args.path_lowres, f_))
        ]
        print(f"skip_existing: {len(files)} files left to process")
    n_jobs = args.n_jobs or max(1, int(0.7 * (os.cpu_count() or 1)))

    def work(i_file):
        i, file_ = i_file
        # every 25: the stall watchdogs treat a quiet log as a hung tunnel
        # dispatch (observed: a 600 s window expired during first-compile +
        # the first 100-cloud gap and killed a healthy run)
        if i % 25 == 0:
            print(f"{i} / {len(files)}", flush=True)
        return subsample_lowres_file(
            os.path.join(args.path_highres, file_),
            os.path.join(args.path_lowres, file_),
            args.nb_query_points,
            rng=np.random.RandomState(args.seed + i),
            device=args.device,
        )

    if n_jobs > 1 and not args.device:
        from joblib import Parallel, delayed

        Parallel(n_jobs=n_jobs)(delayed(work)(t) for t in enumerate(files))
    else:
        for t in enumerate(files):
            work(t)


if __name__ == "__main__":
    main()
