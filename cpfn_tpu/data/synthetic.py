"""Synthetic primitive-scene generator.

Produces clouds in the exact record format of the TraceParts HDF5 pipeline
(`Utils/dataset_utils.py:create_unit_data_from_hdf5_spfn`): points, normals,
per-point instance labels, per-instance GT surface samples, type ids, and GT
axis parameters — so every stage (training, metrics, preprocessing, the full
cascade) can be exercised and benchmarked without the real dataset. Can also
write TraceParts-format .h5 files (soup groups + meta attrs) to test the
HDF5 readers and preprocessing CLIs end to end.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from cpfn_tpu.fitting import primitives


@dataclasses.dataclass(frozen=True)
class SyntheticSceneConfig:
    n_points: int = 8192
    n_max_instances: int = 28
    min_instances: int = 3
    max_instances: int = 8
    n_gt_points_per_instance: int = 512
    noise_sigma: float = 0.01
    # registration order of the shipped configs
    classes: tuple[str, ...] = ("sphere", "plane", "cylinder", "cone")
    # deliberately small primitives (tiny point share) give the
    # patch-selection task signal and drive realistic cascade patch counts
    include_small_primitive: bool = True
    n_small_primitives: int = 1


def _random_primitive(rng: np.random.RandomState, name: str, scale: float = 1.0):
    if name == "plane":
        n = primitives.normalized(rng.randn(3))
        c = rng.uniform(-0.4, 0.4)
        ext = scale * rng.uniform(0.2, 0.6)
        return primitives.Plane(
            n, c, x_range=[-ext, ext], y_range=[-ext, ext], rng=rng
        )
    if name == "sphere":
        return primitives.Sphere(
            rng.uniform(-0.4, 0.4, 3), scale * rng.uniform(0.15, 0.45)
        )
    if name == "cylinder":
        return primitives.Cylinder(
            rng.uniform(-0.4, 0.4, 3),
            scale * rng.uniform(0.1, 0.35),
            primitives.normalized(rng.randn(3)),
            height=scale * rng.uniform(0.4, 1.0),
            rng=rng,
        )
    if name == "cone":
        return primitives.Cone(
            rng.uniform(-0.4, 0.4, 3),
            primitives.normalized(rng.randn(3)),
            rng.uniform(0.15, 0.7),
            z_min=scale * 0.1,
            z_max=scale * rng.uniform(0.4, 0.9),
        )
    raise ValueError(name)


def primitive_meta_dict(prim) -> dict:
    """TraceParts-style `meta` dict for a primitive (all values stringified)."""
    if isinstance(prim, primitives.Plane):
        loc = prim.center
        return {
            "type": "plane",
            "location_x": str(loc[0]), "location_y": str(loc[1]),
            "location_z": str(loc[2]),
            "axis_x": str(prim.n[0]), "axis_y": str(prim.n[1]),
            "axis_z": str(prim.n[2]),
        }
    if isinstance(prim, primitives.Sphere):
        return {
            "type": "sphere",
            "location_x": str(prim.center[0]),
            "location_y": str(prim.center[1]),
            "location_z": str(prim.center[2]),
            "radius": str(prim.radius),
        }
    if isinstance(prim, primitives.Cylinder):
        return {
            "type": "cylinder",
            "location_x": str(prim.center[0]),
            "location_y": str(prim.center[1]),
            "location_z": str(prim.center[2]),
            "axis_x": str(prim.axis[0]), "axis_y": str(prim.axis[1]),
            "axis_z": str(prim.axis[2]),
            "radius": str(prim.radius),
        }
    if isinstance(prim, primitives.Cone):
        return {
            "type": "cone",
            "apex_x": str(prim.apex[0]), "apex_y": str(prim.apex[1]),
            "apex_z": str(prim.apex[2]),
            "axis_x": str(prim.axis[0]), "axis_y": str(prim.axis[1]),
            "axis_z": str(prim.axis[2]),
            "semi_angle": str(prim.half_angle),
        }
    raise TypeError(type(prim))


def make_synthetic_scene(
    rng: np.random.RandomState, cfg: SyntheticSceneConfig = SyntheticSceneConfig()
) -> dict:
    """Returns the SPFN record dict (see module docstring) plus 'instances'
    (the primitive objects) and 'metas' (TraceParts meta dicts)."""
    n_instances = rng.randint(cfg.min_instances, cfg.max_instances + 1)
    names = [
        cfg.classes[rng.randint(len(cfg.classes))] for _ in range(n_instances)
    ]
    prims = [_random_primitive(rng, nm) for nm in names]
    n_small = (
        min(cfg.n_small_primitives, n_instances - 1)
        if (cfg.include_small_primitive and n_instances >= 2)
        else 0
    )
    for t in range(n_small):
        prims[-1 - t] = _random_primitive(rng, names[-1 - t], scale=0.15)

    # allocate points: each small primitive gets ~1.5% of the cloud
    weights = rng.uniform(0.5, 1.5, n_instances)
    if n_small:
        big_sum = weights[: n_instances - n_small].sum()
        share = 0.015 / (1 - 0.015 * n_small)
        weights[n_instances - n_small :] = share * big_sum
    counts = np.maximum(
        (weights / weights.sum() * cfg.n_points).astype(int), 8
    )
    counts[-1] += cfg.n_points - counts.sum()

    pts_list, nrm_list, lab_list = [], [], []
    P_gt = np.zeros(
        (cfg.n_max_instances, cfg.n_gt_points_per_instance, 3), np.float32
    )
    for i, prim in enumerate(prims):
        p, n = prim.sample_points(int(counts[i]), rng=rng)
        pts_list.append(p)
        nrm_list.append(n)
        lab_list.append(np.full(int(counts[i]), i, np.int64))
        gt_p, _ = prim.sample_points(cfg.n_gt_points_per_instance, rng=rng)
        P_gt[i] = gt_p
    P = np.concatenate(pts_list).astype(np.float32)
    normals = np.concatenate(nrm_list).astype(np.float32)
    I_gt = np.concatenate(lab_list)
    perm = rng.permutation(len(P))
    P, normals, I_gt = P[perm], normals[perm], I_gt[perm]
    noisy = P + cfg.noise_sigma * rng.randn(*P.shape).astype(np.float32)

    name_to_id = {nm: i for i, nm in enumerate(cfg.classes)}
    T_gt = np.zeros(cfg.n_max_instances, np.int64)
    T_gt[:n_instances] = [name_to_id[nm] for nm in names]
    plane_n_gt = np.zeros((cfg.n_max_instances, 3))
    cyl_axis_gt = np.zeros((cfg.n_max_instances, 3))
    cone_axis_gt = np.zeros((cfg.n_max_instances, 3))
    for i, prim in enumerate(prims):
        if isinstance(prim, primitives.Plane):
            plane_n_gt[i] = prim.n
        elif isinstance(prim, primitives.Cylinder):
            cyl_axis_gt[i] = prim.axis
        elif isinstance(prim, primitives.Cone):
            cone_axis_gt[i] = prim.axis
    return {
        "P": P,
        "noisy_points": noisy,
        "normal_gt": normals,
        "I_gt": I_gt,
        "P_gt": P_gt,
        "T_gt": T_gt,
        "plane_n_gt": plane_n_gt.astype(np.float32),
        "cylinder_axis_gt": cyl_axis_gt.astype(np.float32),
        "cone_axis_gt": cone_axis_gt.astype(np.float32),
        "instances": prims,
        "metas": [primitive_meta_dict(p) for p in prims],
    }


def make_synthetic_batch(
    rng: np.random.RandomState,
    batch_size: int,
    cfg: SyntheticSceneConfig = SyntheticSceneConfig(),
    noisy: bool = True,
) -> dict:
    """Stacked batch of scenes, keyed as the train-step batch dict."""
    scenes = [make_synthetic_scene(rng, cfg) for _ in range(batch_size)]

    def stack(key):
        return np.stack([s[key] for s in scenes])

    return {
        "P": stack("noisy_points" if noisy else "P"),
        "normal_gt": stack("normal_gt"),
        "P_gt": stack("P_gt"),
        "I_gt": stack("I_gt"),
        "T_gt": stack("T_gt"),
        "plane_n_gt": stack("plane_n_gt"),
        "cylinder_axis_gt": stack("cylinder_axis_gt"),
        "cone_axis_gt": stack("cone_axis_gt"),
    }


def write_scene_hdf5(path: str, scene: dict) -> None:
    """Write a scene as a TraceParts-format .h5 (soup groups + meta attrs)."""
    import h5py

    stem = path.split("/")[-1].rsplit(".h5", 1)[0]
    with h5py.File(path, "w") as f:
        f.create_dataset("gt_points", data=scene["P"])
        f.create_dataset("noisy_points", data=scene["noisy_points"])
        f.create_dataset("gt_normals", data=scene["normal_gt"])
        f.create_dataset("gt_labels", data=scene["I_gt"])
        for i, prim in enumerate(scene["instances"]):
            grp = f.create_group(f"{stem}_soup_{i}")
            gt_p, gt_n = prim.sample_points(
                scene["P_gt"].shape[1], rng=np.random.RandomState(i)
            )
            grp.create_dataset("gt_points", data=gt_p.astype(np.float32))
            grp.create_dataset("gt_normals", data=gt_n.astype(np.float32))
            grp.attrs["meta"] = str(scene["metas"][i])
