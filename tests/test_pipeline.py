"""Full artifact-graph integration test on tiny synthetic data: preprocessing
-> GlobalSPFN training -> GlobalSPFN eval (feature artifacts) -> patch
creation -> LocalSPFN training -> PatchSelection training/eval -> cascaded
LocalSPFN eval -> baseline eval. Mirrors the reference's README pipeline
(README.md:49-92) end to end through the CLI drivers."""

import os

import numpy as np
import pytest
import yaml

from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene, write_scene_hdf5
from cpfn_tpu.fitting import factory

pytestmark = pytest.mark.slow  # multi-graph integration (compile-heavy); default suite
# stays <3 min: pytest -m "not slow"


N_HR, N_LR, N_PATCH = 1024, 128, 128
TINY_OVERRIDES = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=[16, 16], sa2_mlp=[16, 16], sa3_mlp=[16, 32],
    fp1_mlp=[16, 16], fp2_mlp=[16, 16], fp3_mlp=[16, 16], fc_dim=16,
)


def _write_config(path, tmp, extra=None):
    conf = dict(
        batch_size=2,
        train_data_file="train_models.csv",
        train_first_n=-1, train_data_noisy=True, train_workers=0,
        val_data_file="test_models.csv",
        val_first_n=-1, val_data_noisy=True, val_workers=0,
        test_data_file="test_models.csv", test_first_n=-1,
        test_data_noisy=True,
        n_epochs=1, bn_decay_step=200000, decay_step=200000, decay_rate=0.7,
        init_learning_rate=1e-3, val_interval=5, snapshot_interval=100,
        list_of_primitives=["sphere", "plane", "cylinder", "cone"],
        n_max_global_instances=8, n_max_local_instances=5,
        checkpoint_dir=os.path.join(tmp, "checkpoints"),
        log_dir=os.path.join(tmp, "logs"),
        model_overrides=TINY_OVERRIDES,
    )
    conf.update(extra or {})
    with open(path, "w") as f:
        yaml.safe_dump(conf, f)
    return path


@pytest.mark.slow
def test_full_pipeline(tmp_path, rng):
    tmp = str(tmp_path)
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=8, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64, include_small_primitive=True,
    )
    factory.register_primitives(list(scene_cfg.classes))

    # --- synthetic "TraceParts" high-res dataset + split csvs
    hr_dir = os.path.join(tmp, "highres")
    os.makedirs(hr_dir)
    names = []
    for i in range(4):
        scene = make_synthetic_scene(rng, scene_cfg)
        name = f"cloud{i}.h5"
        write_scene_hdf5(os.path.join(hr_dir, name), scene)
        names.append(name)
    csv_dir = os.path.join(tmp, "Dataset")
    os.makedirs(csv_dir)
    for split, members in [("train_models.csv", names[:3]),
                           ("test_models.csv", names[3:])]:
        with open(os.path.join(csv_dir, split), "w") as f:
            f.write("\n".join(members) + "\n")

    # --- preprocessing: lowres FPS subsample
    from cpfn_tpu.preprocess import lowres as pre_lowres

    lr_dir = os.path.join(tmp, "lowres")
    pre_lowres.main([
        "--path_highres", hr_dir, "--path_lowres", lr_dir,
        "--path_split_file", os.path.join(csv_dir, "train_models.csv"),
        "--nb_query_points", str(N_LR), "--n_jobs", "1",
    ])
    pre_lowres.main([
        "--path_highres", hr_dir, "--path_lowres", lr_dir,
        "--path_split_file", os.path.join(csv_dir, "test_models.csv"),
        "--nb_query_points", str(N_LR), "--n_jobs", "1",
    ])
    import h5py

    with h5py.File(os.path.join(lr_dir, names[0]), "r") as f:
        assert f["gt_points"].shape[0] >= N_LR
        assert "index_query_points" in f

    # --- preprocessing: GT patch-index sampling (train + test)
    from cpfn_tpu.preprocess import patch_sampling as pre_patch

    patches_dir = os.path.join(tmp, "patches")
    for split in ("train_models.csv", "test_models.csv"):
        pre_patch.main([
            "--path_highres", hr_dir, "--path_lowres", lr_dir,
            "--path_patches", patches_dir,
            "--path_split_file", os.path.join(csv_dir, split),
            "--scale", "0.1", "--max_number_patches", "3",
            "--num_points_patch", str(N_PATCH),
        ])
    scale_dir = os.path.join(patches_dir, "0.1")
    idx_files = [f for f in os.listdir(scale_dir) if f.endswith("_indices.npy")]
    assert idx_files, "no patch indices produced"
    some = np.load(os.path.join(scale_dir, idx_files[0]))
    assert some.shape[1] == N_PATCH and some.max() < N_HR

    # --- GlobalSPFN training (few steps)
    from cpfn_tpu.train import train_spfn

    cfg_path = _write_config(os.path.join(tmp, "cfg_global.yml"), tmp)
    train_spfn.main([
        "--config_file", cfg_path, "--lowres_dataset", lr_dir,
        "--network", "GlobalSPFN", "--csv_dir", csv_dir,
        "--n_points", str(N_LR), "--max_steps", "2",
        "--path_patches", patches_dir,
    ])
    assert os.path.isdir(os.path.join(tmp, "checkpoints", "globalspfn_final"))

    # --- GlobalSPFN eval: metrics + feature artifacts (train + test split)
    from cpfn_tpu.eval import eval_global

    spfn_out = os.path.join(tmp, "globalspfn")
    for split in ("train", "test"):
        eval_global.main([
            "--config_file", cfg_path, "--lowres_dataset", lr_dir,
            "--highres_dataset", hr_dir, "--csv_dir", csv_dir,
            "--path_patches", patches_dir, "--scale", "0.1",
            "--output_folder", spfn_out, "--evaluation_set", split,
            "--weights", os.path.join(tmp, "checkpoints", "globalspfn_final"),
            "--n_shuffles", "2",  # exercises the shuffle-ensemble path
        ])
    stem0 = names[0].replace(".h5", "")
    for art in ("global_feat.npy", "local_feat.npy", "local_feat_full.npy",
                "object_seg.npy", "object_normals.npy", "object_type.npy"):
        assert os.path.isfile(os.path.join(spfn_out, names[3].replace(".h5", ""), art)), art
    assert os.path.isfile(os.path.join(spfn_out, stem0, "global_feat.npy"))
    assert os.path.isfile(os.path.join(spfn_out, "Results.csv"))

    # --- per-patch training files (with injected features)
    from cpfn_tpu.preprocess import patch_creation as pre_create

    for split in ("train_models.csv", "test_models.csv"):
        pre_create.main([
            "--path_highres", hr_dir, "--path_lowres", lr_dir,
            "--path_features", spfn_out, "--path_patches", patches_dir,
            "--path_split_file", os.path.join(csv_dir, split),
            "--scale", "0.1", "--num_points_patch", str(N_PATCH),
        ])
    patch_h5 = []
    for name in names:
        d = os.path.join(scale_dir, name.replace(".h5", ""))
        if os.path.isdir(d):
            patch_h5 += [os.path.join(d, f) for f in os.listdir(d)]
    assert patch_h5, "no patch h5 files created"

    # patch records parse through the standard reader with features
    from cpfn_tpu.data.hdf5 import read_spfn_hdf5

    rec = read_spfn_hdf5(
        patch_h5[0], 5, noisy=True,
        use_glob_features=True, use_loc_features=True, shuffle=False,
    )
    assert rec is not None and rec["glob_features"].shape[0] == 32

    # --- LocalSPFN training on the patches
    cfg_local = _write_config(
        os.path.join(tmp, "cfg_local.yml"), tmp,
        extra=dict(parameter_loss_multiplier=0.0, residue_loss_multiplier=0.0),
    )
    train_spfn.main([
        "--config_file", cfg_local, "--lowres_dataset", lr_dir,
        "--network", "LocalSPFN", "--csv_dir", csv_dir,
        "--path_patches", patches_dir, "--scale", "0.1", "--max_steps", "2",
    ])
    assert os.path.isdir(
        os.path.join(tmp, "checkpoints", "localspfn_0.1_final")
    )

    # --- PatchSelection training + eval (network mode)
    from cpfn_tpu.train import train_patchselec
    from cpfn_tpu.eval import eval_patchselec

    cfg_ps = _write_config(os.path.join(tmp, "cfg_ps.yml"), tmp)
    train_patchselec.main([
        "--config_file", cfg_ps, "--lowres_dataset", lr_dir,
        "--highres_dataset", hr_dir, "--csv_dir", csv_dir,
        "--scale", "0.1", "--n_points", str(N_LR), "--max_steps", "2",
    ])
    heatmaps = os.path.join(tmp, "heatmaps")
    eval_patchselec.main([
        "--config_file", cfg_ps, "--lowres_dataset", lr_dir,
        "--highres_dataset", hr_dir, "--csv_dir", csv_dir,
        "--heatmap_folder", heatmaps, "--scale", "0.1",
        "--weights", os.path.join(tmp, "checkpoints", "patchselec_0.1_final"),
        "--n_points", str(N_LR), "--num_points_patch", str(N_PATCH),
    ])
    assert os.path.isfile(
        os.path.join(heatmaps, "0.1", "confusion_matrix.npy")
    )

    # --- cascaded LocalSPFN eval (GT patch indices as the heatmap source)
    from cpfn_tpu.eval import eval_local

    local_out = os.path.join(tmp, "localspfn")
    eval_local.main([
        "--config_file", cfg_local, "--lowres_dataset", lr_dir,
        "--highres_dataset", hr_dir, "--csv_dir", csv_dir,
        "--dir_spfn", spfn_out, "--dir_indices", patches_dir,
        "--output_folder", local_out, "--scale", "0.1",
        "--weights", os.path.join(tmp, "checkpoints", "localspfn_0.1_final"),
        "--max_patches", "3", "--num_points_patch", str(N_PATCH),
        "--n_shuffles", "2",  # exercises the shuffle-ensemble path
    ])
    assert os.path.isfile(os.path.join(local_out, "Results.csv"))
    assert os.path.isfile(os.path.join(local_out, "Results_Stats.csv"))
    import csv

    with open(os.path.join(local_out, "Results.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0][:3] == ["Filename", "mIoU", "Type"]
    assert len(rows) == 2  # header + 1 test cloud
    assert 0.0 <= float(rows[1][1]) <= 1.0

    # --- baseline (global-only) eval
    from cpfn_tpu.eval import eval_baseline

    base_out = os.path.join(tmp, "baseline")
    eval_baseline.main([
        "--config_file", cfg_local, "--highres_dataset", hr_dir,
        "--csv_dir", csv_dir, "--dir_spfn", spfn_out,
        "--output_folder", base_out,
    ])
    assert os.path.isfile(os.path.join(base_out, "Results_baseline.csv"))
    assert os.path.isfile(os.path.join(base_out, "Results_Stats_baseline.csv"))
