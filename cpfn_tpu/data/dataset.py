"""Dataset wrappers over TraceParts-format HDF5 files (cf.
`Dataset/dataloaders.py`) — NumPy-side, feeding jitted steps with fixed-shape
stacked batches.

Replaces the torch DataLoader machinery with plain iterators: records are
either preloaded into dense arrays (the reference's `data_matrix` approach)
or fetched lazily; `batch_iterator` shuffles like the reference's
RandomSampler and yields batch dicts ready for `jax.device_put`.
"""

from __future__ import annotations

import os

import numpy as np

from cpfn_tpu.data import hdf5 as hdf5_mod

_BATCH_KEYS = (
    "P", "normal_gt", "P_gt", "I_gt", "T_gt",
    "plane_n_gt", "cylinder_axis_gt", "cone_axis_gt",
)


class GlobalSPFNDataset:
    """Low-res clouds for GlobalSPFN training / high-res clouds for eval.

    files: list of .h5 paths. In test mode records keep full resolution
    (n_points=None) and pick up `patch_centers` from <stem>_indices.npy in
    `patch_dir` when present (evaluation_globalSPFN.py:93-96).
    """

    def __init__(
        self,
        files,
        n_max_instances: int,
        noisy: bool,
        n_points: int | None = 8192,
        test: bool = False,
        patch_dir: str | None = None,
        preload: bool = True,
        seed: int = 0,
    ):
        self.files = list(files)
        self.n_max_instances = n_max_instances
        self.noisy = noisy
        self.n_points = n_points
        self.test = test
        self.patch_dir = patch_dir
        self.rng = np.random.RandomState(seed)
        self._cache = None
        if preload and not test:
            self._cache = [self._fetch(i) for i in range(len(self.files))]

    def _fetch(self, i: int) -> dict:
        rec = hdf5_mod.read_spfn_hdf5(
            self.files[i],
            self.n_max_instances,
            self.noisy,
            n_points=self.n_points,
            shuffle=not self.test,
            rng=self.rng,
        )
        assert rec is not None, f"malformed record: {self.files[i]}"
        if self.test and self.patch_dir is not None:
            stem = os.path.basename(self.files[i]).rsplit(".h5", 1)[0]
            ind = os.path.join(self.patch_dir, stem + "_indices.npy")
            rec["patch_centers"] = (
                np.load(ind)[:, 0] if os.path.isfile(ind) else np.array([], np.int64)
            )
        return rec

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> dict:
        return self._cache[i] if self._cache is not None else self._fetch(i)


class PatchSelectionDataset:
    """(low-res points, binary small-primitive labels) pairs."""

    def __init__(
        self,
        lowres_files,
        highres_files,
        scale: float,
        n_points: int | None = 8192,
        normalisation: bool = True,
        seed: int = 0,
        preload: bool = False,
    ):
        self.lowres_files = list(lowres_files)
        self.highres_files = list(highres_files)
        self.scale = scale
        self.n_points = n_points
        self.normalisation = normalisation
        self.rng = np.random.RandomState(seed)
        # preload caches the (normalized points, binary labels) pairs in RAM
        # (~160 KB/cloud); only the per-access shuffle is drawn lazily, so
        # the record RNG stream is identical to the lazy path
        self._cache = [None] * len(self.lowres_files) if preload else None

    def __len__(self):
        return len(self.lowres_files)

    def _load(self, i: int):
        return hdf5_mod.parse_patch_selection_record(
            self.lowres_files[i],
            self.highres_files[i],
            self.scale,
            normalisation=self.normalisation,
            n_points=self.n_points,
            shuffle=False,
        )

    def __getitem__(self, i: int) -> dict:
        if self._cache is not None:
            if self._cache[i] is None:
                self._cache[i] = self._load(i)[:2]
            pts, labels = self._cache[i]
        else:
            pts, labels = self._load(i)[:2]
        n = pts.shape[0]
        shuffled = self.rng.choice(n, n, replace=False)
        return {
            "P": pts[shuffled],
            "labels": labels[shuffled],
            "unshuffle": np.argsort(shuffled),
        }


class TrainLocalSPFNDataset:
    """Per-patch .h5 records (written by the patch-creation preprocessor),
    optionally with injected GlobalSPFN features."""

    def __init__(
        self,
        patch_files,
        n_max_local_instances: int,
        noisy: bool,
        use_features: bool = True,
        seed: int = 0,
    ):
        self.patch_files = list(patch_files)
        self.n_max_local_instances = n_max_local_instances
        self.noisy = noisy
        self.use_features = use_features
        self.rng = np.random.RandomState(seed)

    @staticmethod
    def enumerate_patches(patch_root: str, stems) -> list[str]:
        out = []
        for stem in stems:
            d = os.path.join(patch_root, stem)
            if not os.path.isdir(d):
                continue
            out.extend(
                sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".h5")
                )
            )
        return out

    def __len__(self):
        return len(self.patch_files)

    def __getitem__(self, i: int) -> dict:
        rec = hdf5_mod.read_spfn_hdf5(
            self.patch_files[i],
            self.n_max_local_instances,
            self.noisy,
            use_glob_features=self.use_features,
            use_loc_features=self.use_features,
            shuffle=True,
            rng=self.rng,
        )
        assert rec is not None, f"malformed record: {self.patch_files[i]}"
        return rec


def batch_iterator(
    dataset,
    batch_size: int,
    rng: np.random.RandomState | None = None,
    shuffle: bool = True,
    drop_last: bool = True,
    keys=None,
    identical_epochs: bool = False,
    seed: int = 12345,
):
    """Yield stacked batch dicts. With shuffle, a fresh permutation per pass
    (the reference's RandomSampler); `identical_epochs` re-seeds the
    permutation every pass (RandomSampler(identical_epochs=True))."""
    n = len(dataset)
    if n == 0 or batch_size <= 0:
        # empty dataset or degenerate batch (e.g. min(batch_size, 0) from an
        # empty validation split): yield nothing instead of range(0, n, 0)
        return
    if identical_epochs:
        rng = np.random.RandomState(seed)
    order = (
        rng.permutation(n) if (shuffle and rng is not None) else np.arange(n)
    )
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        records = [dataset[int(i)] for i in idx]
        want = keys or [
            k for k in records[0] if isinstance(records[0][k], np.ndarray)
        ]
        yield {k: np.stack([r[k] for r in records]) for k in want}
