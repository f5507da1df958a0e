"""--resume equivalence for the eval drivers: an interrupted-and-resumed
256-cloud pass must produce byte-identical CSVs to an uninterrupted run.
The subtle part is the host RNG stream (one permutation per cloud per
shuffle run): the resume path burns the cached clouds' draws so later
clouds see the identical stream. Pinned here on tiny synthetic data by
comparing (a) full run, (b) resume-from-partial run, row by row."""

import csv
import os
import shutil

import numpy as np
import pytest
import yaml

from cpfn_tpu.data import SyntheticSceneConfig, make_synthetic_scene, write_scene_hdf5
from cpfn_tpu.fitting import factory

pytestmark = pytest.mark.slow  # CLI integration (compile-heavy)

N_HR, N_LR, N_PATCH = 1024, 128, 128
TINY_OVERRIDES = dict(
    sa1_points=16, sa2_points=8, sa1_samples=8, sa2_samples=8,
    sa1_mlp=[16, 16], sa2_mlp=[16, 16], sa3_mlp=[16, 32],
    fp1_mlp=[16, 16], fp2_mlp=[16, 16], fp3_mlp=[16, 16], fc_dim=16,
)


def _read_rows(path):
    with open(path) as f:
        return list(csv.reader(f))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("resume"))
    rng = np.random.RandomState(7)
    scene_cfg = SyntheticSceneConfig(
        n_points=N_HR, n_max_instances=8, min_instances=3, max_instances=5,
        n_gt_points_per_instance=64, include_small_primitive=True,
    )
    factory.register_primitives(list(scene_cfg.classes))
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
    with open(os.path.join(csv_dir, "train_models.csv"), "w") as f:
        f.write(names[0] + "\n")
    with open(os.path.join(csv_dir, "test_models.csv"), "w") as f:
        f.write("\n".join(names) + "\n")  # all 4 in the eval split

    from cpfn_tpu.preprocess import lowres as pre_lowres

    lr_dir = os.path.join(tmp, "lowres")
    pre_lowres.main([
        "--path_highres", hr_dir, "--path_lowres", lr_dir,
        "--path_split_file", os.path.join(csv_dir, "test_models.csv"),
        "--nb_query_points", str(N_LR), "--n_jobs", "1",
    ])
    from cpfn_tpu.preprocess import patch_sampling as pre_patch

    patches_dir = os.path.join(tmp, "patches")
    pre_patch.main([
        "--path_highres", hr_dir, "--path_lowres", lr_dir,
        "--path_patches", patches_dir,
        "--path_split_file", os.path.join(csv_dir, "test_models.csv"),
        "--scale", "0.1", "--max_number_patches", "3",
        "--num_points_patch", str(N_PATCH),
    ])
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
    cfg_path = os.path.join(tmp, "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(conf, f)
    return dict(tmp=tmp, hr=hr_dir, lr=lr_dir, csv=csv_dir,
                patches=patches_dir, cfg=cfg_path, names=names)


def _eval_global(corpus, out, resume):
    from cpfn_tpu.eval import eval_global

    eval_global.main([
        "--config_file", corpus["cfg"], "--lowres_dataset", corpus["lr"],
        "--highres_dataset", corpus["hr"], "--csv_dir", corpus["csv"],
        "--path_patches", corpus["patches"], "--scale", "0.1",
        "--output_folder", out, "--evaluation_set", "test",
        "--weights", "__random_init__", "--n_shuffles", "2",
    ] + (["--resume"] if resume else []))


def test_eval_global_resume_identical(corpus):
    tmp = corpus["tmp"]
    full = os.path.join(tmp, "glob_full")
    _eval_global(corpus, full, resume=False)

    # build the resumed run: first pass with --resume writes row.json per
    # cloud; simulate an interruption by deleting the LAST TWO clouds' caches
    # and Results.csv, then resume
    part = os.path.join(tmp, "glob_part")
    _eval_global(corpus, part, resume=True)
    for stem in [n[:-3] for n in corpus["names"][2:]]:
        os.remove(os.path.join(part, stem, "row.json"))
    os.remove(os.path.join(part, "Results.csv"))
    _eval_global(corpus, part, resume=True)

    a = _read_rows(os.path.join(full, "Results.csv"))
    b = _read_rows(os.path.join(part, "Results.csv"))
    assert a == b


def test_eval_local_resume_identical(corpus):
    tmp = corpus["tmp"]
    spfn_out = os.path.join(tmp, "glob_full")  # artifacts from the test above
    assert os.path.isfile(os.path.join(spfn_out, "Results.csv"))

    from cpfn_tpu.eval import eval_local

    def run(out, resume):
        eval_local.main([
            "--config_file", corpus["cfg"], "--lowres_dataset", corpus["lr"],
            "--highres_dataset", corpus["hr"], "--csv_dir", corpus["csv"],
            "--dir_spfn", spfn_out, "--dir_indices", corpus["patches"],
            "--output_folder", out, "--scale", "0.1",
            "--weights", "__random_init__",
            "--max_patches", "3", "--num_points_patch", str(N_PATCH),
            "--n_shuffles", "2",
        ] + (["--resume"] if resume else []))

    full = os.path.join(tmp, "loc_full")
    run(full, resume=False)

    part = os.path.join(tmp, "loc_part")
    run(part, resume=True)
    rows_dir = os.path.join(part, "rows")
    for stem in [n[:-3] for n in corpus["names"][1:3]]:
        os.remove(os.path.join(rows_dir, stem + ".json"))
    os.remove(os.path.join(part, "Results.csv"))
    os.remove(os.path.join(part, "Results_Stats.csv"))
    run(part, resume=True)

    for csv_name in ("Results.csv", "Results_Stats.csv"):
        assert _read_rows(os.path.join(full, csv_name)) == _read_rows(
            os.path.join(part, csv_name)
        ), csv_name


def test_eval_baseline_resume_identical(corpus):
    tmp = corpus["tmp"]
    spfn_out = os.path.join(tmp, "glob_full")
    assert os.path.isfile(os.path.join(spfn_out, "Results.csv"))

    from cpfn_tpu.eval import eval_baseline

    def run(out, resume):
        eval_baseline.main([
            "--config_file", corpus["cfg"], "--highres_dataset", corpus["hr"],
            "--csv_dir", corpus["csv"], "--dir_spfn", spfn_out,
            "--output_folder", out,
        ] + (["--resume"] if resume else []))

    full = os.path.join(tmp, "base_full")
    run(full, resume=False)

    part = os.path.join(tmp, "base_part")
    run(part, resume=True)
    shutil.rmtree(
        os.path.join(part, "rows_baseline", corpus["names"][0][:-3] + ".json"),
        ignore_errors=True,
    )
    os.remove(
        os.path.join(part, "rows_baseline", corpus["names"][2][:-3] + ".json")
    )
    os.remove(os.path.join(part, "Results_baseline.csv"))
    run(part, resume=True)

    for csv_name in ("Results_baseline.csv", "Results_Stats_baseline.csv"):
        assert _read_rows(os.path.join(full, csv_name)) == _read_rows(
            os.path.join(part, csv_name)
        ), csv_name
