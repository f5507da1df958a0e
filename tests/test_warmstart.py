"""The Global->Local warm-start converter (train/make_warmstart.py).

The reference warm-starts LocalSPFN from GlobalSPFN weights
(training_SPFN.py:72-74); the nets differ only in the membership head width
(28 vs 21, training_SPFN.py:68,71). The converter must slice that head,
keep every other tensor bit-identical, and emit a checkpoint the training
driver restores through its primary (non-fallback) path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cpfn_tpu.config import Config  # noqa: E402
from cpfn_tpu.fitting import factory  # noqa: E402
from cpfn_tpu.nn import init_pointnet2  # noqa: E402
from cpfn_tpu.train import init_optimizer  # noqa: E402
from cpfn_tpu.train.make_warmstart import main as make_warmstart  # noqa: E402
from cpfn_tpu.utils import restore_checkpoint, save_checkpoint  # noqa: E402

_YAML = """
batch_size: 2
miou_loss_multiplier: 1.0
normal_loss_multiplier: 1.0
type_loss_multiplier: 1.0
parameter_loss_multiplier: 1.0
residue_loss_multiplier: 1.0
total_loss_multiplier: 1.0
list_of_primitives: ['sphere', 'plane', 'cylinder', 'cone']
n_max_global_instances: 9
n_max_local_instances: 5
train_data_file: "train_models.csv"
train_first_n: -1
train_data_noisy: true
train_workers: 0
val_data_file: "test_models.csv"
val_first_n: -1
val_data_noisy: true
val_workers: 0
test_data_file: "test_models.csv"
test_first_n: -1
test_data_noisy: true
n_epochs: 1
bn_decay_step: 200000
decay_step: 200000
decay_rate: 0.7
init_learning_rate: 0.001
val_interval: 10
snapshot_interval: 10
checkpoint_dir: '{d}'
log_dir: '{d}/logs'
"""


def test_warmstart_slices_membership_head(tmp_path):
    cfg_file = tmp_path / "conf.yml"
    cfg_file.write_text(_YAML.format(d=tmp_path))
    conf = Config.from_yaml(str(cfg_file))
    factory.register_primitives(list(conf.list_of_primitives))

    g_cfg = conf.model_config("GlobalSPFN")
    g_params, g_state = init_pointnet2(jax.random.PRNGKey(7), g_cfg)
    g_dir = str(tmp_path / "global_ckpt")
    opt = init_optimizer(conf.train_config())
    save_checkpoint(g_dir, 123, g_params, g_state, opt.init(g_params))

    out_dir = str(tmp_path / "warmstart")
    make_warmstart([
        "--global_config", str(cfg_file),
        "--local_config", str(cfg_file),
        "--global_weights", g_dir,
        "--out", out_dir,
    ])

    l_cfg = conf.model_config("LocalSPFN")
    tpl_p, tpl_s = init_pointnet2(jax.random.PRNGKey(0), l_cfg)
    tpl_opt = init_optimizer(conf.train_config()).init(tpl_p)
    restored, at = restore_checkpoint(
        out_dir, {"params": tpl_p, "state": tpl_s, "opt_state": tpl_opt}
    )
    assert at == 0
    l_params = restored["params"]

    # membership head sliced to K_local; X/T heads and trunk bit-identical
    k_l = conf.n_max_local_instances
    np.testing.assert_array_equal(
        l_params["heads"][2]["w"], np.asarray(g_params["heads"][2]["w"])[:, :k_l]
    )
    np.testing.assert_array_equal(
        l_params["heads"][2]["b"], np.asarray(g_params["heads"][2]["b"])[:k_l]
    )
    for h in range(2):
        np.testing.assert_array_equal(
            l_params["heads"][h]["w"], g_params["heads"][h]["w"]
        )
    np.testing.assert_array_equal(
        l_params["fc1"]["w"], g_params["fc1"]["w"]
    )
    # BN running stats carried over
    g_leaves = jax.tree_util.tree_leaves(g_state)
    l_leaves = jax.tree_util.tree_leaves(restored["state"])
    assert len(g_leaves) == len(l_leaves)
    for a, b in zip(g_leaves, l_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
