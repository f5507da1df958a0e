"""TraceParts HDF5 record parsing (cf. `Utils/dataset_utils.py`).

A cloud file holds `gt_points`/`noisy_points`/`gt_normals`/`gt_labels` plus
one `<stem>_soup_<i>` group per primitive instance with its own GT surface
samples and a `meta` attribute (pickled dict or printed dict literal)
describing the primitive parameters.
"""

from __future__ import annotations

import ast
import pickle
import re

import numpy as np

from cpfn_tpu.fitting import factory

_SOUP_RE = re.compile(r"(.*)_soup_([0-9]+)$")


def _parse_meta(attr) -> dict:
    if isinstance(attr, (bytes, np.void)):
        return pickle.loads(bytes(attr))
    return ast.literal_eval(str(attr))


def parse_spfn_record(
    f,
    n_max_instances: int,
    noisy: bool,
    n_points: int | None = None,
    use_glob_features: bool = False,
    use_loc_features: bool = False,
    shuffle: bool = True,
    rng: np.random.RandomState | None = None,
):
    """Parse an open h5 file into the SPFN training record, or None if the
    record is malformed (non-consecutive soup ids, too many instances, label
    out of range) — the same rejections as the reference."""
    P = f["noisy_points"][()] if noisy else f["gt_points"][()]
    normal_gt = f["gt_normals"][()]
    I_gt = f["gt_labels"][()].astype(np.int64)
    glob_features = f["glob_features"][()] if use_glob_features else None
    loc_features = f["loc_features"][()] if use_loc_features else None
    if n_points is not None:
        P, normal_gt, I_gt = P[:n_points], normal_gt[:n_points], I_gt[:n_points]
    n_total_points = P.shape[0]

    soup_id_to_key = {}
    for key in f.keys():
        m = _SOUP_RE.match(key)
        if m is not None:
            soup_id_to_key[int(m.group(2))] = key
    n_instances = len(soup_id_to_key)
    if n_instances == 0:
        return None
    if sorted(soup_id_to_key) != list(range(n_instances)):
        return None
    if n_instances > n_max_instances:
        return None
    if np.amax(I_gt) >= n_instances:
        return None

    P_gt, instances = [], []
    for i in range(n_instances):
        g = f[soup_id_to_key[i]]
        P_gt.append(g["gt_points"][()])
        prim = factory.create_primitive_from_dict(_parse_meta(g.attrs["meta"]))
        if prim is None:
            return None
        instances.append(prim)
    T_gt = [
        factory.primitive_name_to_id(p.get_primitive_name()) for p in instances
    ]
    T_gt.extend([0] * (n_max_instances - n_instances))
    n_gt_pts = P_gt[0].shape[0]
    P_gt.extend(
        [np.zeros((n_gt_pts, 3))] * (n_max_instances - n_instances)
    )
    P_gt = np.asarray(P_gt, dtype=np.float32)
    T_gt = np.asarray(T_gt, dtype=np.int64)

    if shuffle:
        rng = rng or np.random
        perm = rng.permutation(n_total_points)
        P, normal_gt, I_gt = P[perm], normal_gt[perm], I_gt[perm]

    result = {
        "P": P.astype(np.float32),
        "normal_gt": normal_gt.astype(np.float32),
        "P_gt": P_gt,
        "I_gt": I_gt,
        "T_gt": T_gt,
    }
    if use_glob_features:
        result["glob_features"] = glob_features.astype(np.float32)
    if use_loc_features:
        result["loc_features"] = loc_features.astype(np.float32)
    for class_ in factory.get_registered_primitives():
        result.update(
            factory.get_module(class_).extract_parameter_data_as_dict(
                instances, n_max_instances
            )
        )
    for key in ("plane_n_gt", "cylinder_axis_gt", "cone_axis_gt"):
        result.setdefault(key, np.zeros((n_max_instances, 3)))
        result[key] = result[key].astype(np.float32)
    return result


def read_spfn_hdf5(path: str, n_max_instances: int, noisy: bool, **kw):
    import h5py

    with h5py.File(path, "r") as f:
        return parse_spfn_record(f, n_max_instances, noisy, **kw)


def parse_patch_selection_record(
    lowres_path: str,
    highres_path: str,
    scale: float,
    normalisation: bool = True,
    n_points: int | None = None,
    rng: np.random.RandomState | None = None,
    shuffle: bool = True,
):
    """Binary small-primitive labels on the low-res cloud
    (cf. `dataset_utils.py:10-32`): a primitive is 'small' if it covers fewer
    than scale * N_highres points of the high-res cloud. Returns
    (points, labels, unshuffle_indices); shuffle=False returns them in file
    order with an identity unshuffle (callers that cache shuffle themselves)."""
    import h5py

    rng = rng or np.random
    with h5py.File(lowres_path, "r") as f:
        points = f["noisy_points"][()].astype(np.float32)
        if n_points is not None:
            points = points[:n_points]
        n = points.shape[0]
        labels = f["gt_labels"][()].astype(np.int64)[:n]
    with h5py.File(highres_path, "r") as f:
        hr_labels = f["gt_labels"][()].astype(np.int64)
    uniq, counts = np.unique(hr_labels, return_counts=True)
    big = uniq[counts > hr_labels.shape[0] * scale]
    out_labels = 1 - np.isin(labels, big).astype(np.int64)
    if normalisation:
        points = points - points.mean(axis=0)
        points = points / np.linalg.norm(points, axis=1).max()
    if not shuffle:
        return points, out_labels, np.arange(n)
    shuffled = rng.choice(n, n, replace=False)
    return points[shuffled], out_labels[shuffled], np.argsort(shuffled)
