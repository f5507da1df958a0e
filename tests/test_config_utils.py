"""Config system, checkpoint round trip, logging, and sampler options."""

import os

import jax
import numpy as np
import yaml

from cpfn_tpu.config import Config
from cpfn_tpu.nn import PointNet2Config, init_pointnet2
from cpfn_tpu.utils import latest_step, restore_checkpoint, save_checkpoint
from cpfn_tpu.utils.logging import MetricsLogger, ResultsTable


def test_config_from_reference_yaml(tmp_path):
    # the reference's YAML schema (including CUDA_visible_GPUs) must load
    raw = {
        "CUDA_visible_GPUs": ["0"],
        "batch_size": 16,
        "miou_loss_multiplier": 1.0,
        "normal_loss_multiplier": 1.0,
        "type_loss_multiplier": 1.0,
        "parameter_loss_multiplier": 1.0,
        "residue_loss_multiplier": 1.0,
        "total_loss_multiplier": 1.0,
        "list_of_primitives": ["sphere", "plane", "cylinder", "cone"],
        "n_max_global_instances": 28,
        "train_data_file": "train_models.csv",
        "n_epochs": 100,
        "decay_step": 200000,
        "decay_rate": 0.7,
        "init_learning_rate": 0.001,
    }
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        yaml.safe_dump(raw, f)
    conf = Config.from_yaml(p)
    assert conf.batch_size == 16
    assert conf.n_max_global_instances == 28
    m = conf.model_config("GlobalSPFN")
    assert m.output_sizes == (3, 4, 28)
    assert conf.model_config("LocalSPFN").output_sizes == (3, 4, 21)
    assert conf.model_config("PatchSelection").output_sizes == (2,)
    t = conf.train_config()
    assert t.classes == ("sphere", "plane", "cylinder", "cone")


def test_config_model_overrides(tmp_path):
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        yaml.safe_dump({"model_overrides": {"sa1_points": 16,
                                            "sa1_mlp": [8, 8]}}, f)
    conf = Config.from_yaml(p)
    m = conf.model_config("GlobalSPFN")
    assert m.sa1_points == 16 and m.sa1_mlp == (8, 8)


def test_config_rejects_unknown_keys(tmp_path):
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        yaml.safe_dump({"batch_sizee": 4}, f)
    import pytest

    with pytest.raises(ValueError, match="unknown config keys"):
        Config.from_yaml(p)


def test_checkpoint_roundtrip(tmp_path):
    cfg = PointNet2Config(
        output_sizes=(2,), sa1_points=8, sa2_points=4, sa1_samples=4,
        sa2_samples=4, sa1_mlp=(8, 8), sa2_mlp=(8, 8), sa3_mlp=(8, 8),
        fp1_mlp=(8, 8), fp2_mlp=(8, 8), fp3_mlp=(8, 8), fc_dim=8,
    )
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    d = os.path.join(tmp_path, "ckpt")
    save_checkpoint(d, 7, params, state, opt_state={"count": np.zeros(3)})
    assert latest_step(d) == 7
    p2, s2 = init_pointnet2(jax.random.PRNGKey(1), cfg)
    restored, step = restore_checkpoint(d, {"params": p2, "state": s2})
    assert step == 7
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path), "t", window=2, print_interval=0)
    lg.log(0, {"loss": 1.0})
    lg.log(1, {"loss": 3.0})
    lg.close()
    import json

    rows = [json.loads(l) for l in open(os.path.join(tmp_path, "t.jsonl"))]
    assert rows[0]["loss"] == 1.0 and rows[1]["loss"] == 3.0


def test_results_table(tmp_path):
    t = ResultsTable()
    t.add("a", 0.5, 1.0, 0.1, 0.2, 0.01, 0.02, 0.9, 0.95, 0.8, 0.85)
    t.add("b", 0.7, 1.0, 0.1, 0.2, 0.01, 0.02, 0.9, 0.95, 0.8, 0.85)
    assert abs(t.mean("mIoU") - 0.6) < 1e-9
    path = os.path.join(tmp_path, "r.csv")
    t.write(path)
    import csv

    rows = list(csv.reader(open(path)))
    assert rows[0] == ResultsTable.COLUMNS and len(rows) == 3


def test_identical_epochs_sampler():
    from cpfn_tpu.data.dataset import batch_iterator

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.array([i])}

    def epoch():
        return [
            int(b["x"][0, 0])
            for b in batch_iterator(DS(), 1, shuffle=True,
                                    identical_epochs=True)
        ]

    assert epoch() == epoch()


def test_plot_tool(tmp_path):
    import json

    from cpfn_tpu.utils import plots

    p = os.path.join(tmp_path, "m.jsonl")
    with open(p, "w") as f:
        for i in range(20):
            f.write(json.dumps({"step": i, "time": i * 0.1,
                                "total_loss": 1.0 / (i + 1),
                                "miou_loss": 0.5}) + "\n")
    out = os.path.join(tmp_path, "c.png")
    plots.plot(p, out, window=5)
    assert os.path.getsize(out) > 1000
