"""Build a LocalSPFN warm-start checkpoint from a trained GlobalSPFN.

The reference warm-starts LocalSPFN from GlobalSPFN weights via
`--spfn_weigths` (training_SPFN.py:72-74); the two networks share every
layer except the membership head, whose width differs (K_global=28 vs
K_local=21, training_SPFN.py:68,71). This CLI loads the global checkpoint,
slices the membership head's kernel/bias to the local instance count,
copies the BN running stats, initializes fresh optimizer moments for the
*local* training config, and saves a step-0 checkpoint that
`train_spfn --spfn_weights <out>` restores without any fallback path.

  python -m cpfn_tpu.train.make_warmstart \
      --global_config configs/config_synth2_global_v2.yml \
      --local_config configs/config_synth2_local_v8.yml \
      --global_weights data_synth2/checkpoints_g2/globalspfn_final \
      --out data_synth2/warmstart/localspfn_from_g2
"""

from __future__ import annotations

import argparse

import jax

from cpfn_tpu.config import Config
from cpfn_tpu.fitting import factory
from cpfn_tpu.nn import init_pointnet2
from cpfn_tpu.train import init_optimizer
from cpfn_tpu.utils import restore_checkpoint, save_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--global_config", required=True)
    p.add_argument("--local_config", required=True)
    p.add_argument("--global_weights", required=True,
                   help="checkpoint dir of the trained GlobalSPFN")
    p.add_argument("--out", required=True,
                   help="output checkpoint dir for the LocalSPFN warm start")
    args = p.parse_args(argv)

    gconf = Config.from_yaml(args.global_config)
    lconf = Config.from_yaml(args.local_config)
    factory.register_primitives(list(gconf.list_of_primitives))

    g_cfg = gconf.model_config("GlobalSPFN")
    l_cfg = lconf.model_config("LocalSPFN")

    g_params, g_state = init_pointnet2(jax.random.PRNGKey(0), g_cfg)
    restored, at = restore_checkpoint(
        args.global_weights, {"params": g_params, "state": g_state}
    )
    g_params, g_state = restored["params"], restored["state"]
    print(f"loaded GlobalSPFN from {args.global_weights} @ step {at}")

    k_l = l_cfg.output_sizes[-1]
    l_params = dict(g_params)
    heads = list(g_params["heads"])
    w_head = heads[-1]
    heads[-1] = {"w": w_head["w"][:, :k_l], "b": w_head["b"][:k_l]}
    l_params["heads"] = heads
    l_state = g_state  # BN running stats: identical shapes across the nets

    if l_cfg.use_glob_features or l_cfg.use_loc_features:
        # Feature-trained LocalSPFN: fp1's first conv consumes
        # [l2_skip(256) | l3(1024) | glob(1024) | loc(128)] (init_pointnet2 +
        # the _feature_propagation concat order). Copy the global kernel
        # into the skip+l3 rows and ZERO the new feature rows: at step 0
        # the network computes exactly the feature-free warm start (the
        # injected features multiply by zero) and training grows into them.
        import numpy as np

        n_copy = g_cfg.sa2_mlp[-1] + g_cfg.sa3_mlp[-1]
        fp1 = dict(l_params["fp1"])
        convs = list(fp1["convs"])
        w_g = np.asarray(convs[0]["w"])  # [n_copy, C_out]
        offset = 0
        if l_cfg.use_glob_features:
            offset += l_cfg.glob_feature_dim
        if l_cfg.use_loc_features:
            offset += l_cfg.loc_feature_dim
        w_l = np.concatenate(
            [w_g, np.zeros((offset, w_g.shape[1]), w_g.dtype)], axis=0
        )
        assert w_l.shape[0] == n_copy + offset
        convs[0] = {"w": jax.numpy.asarray(w_l), "b": convs[0]["b"]}
        fp1["convs"] = convs
        l_params["fp1"] = fp1

    # sanity: the sliced tree must match a fresh local init's structure
    ref_p, ref_s = init_pointnet2(jax.random.PRNGKey(0), l_cfg)
    chk = jax.tree_util.tree_structure(ref_p)
    got = jax.tree_util.tree_structure(l_params)
    assert chk == got, f"param structure mismatch:\n{chk}\nvs\n{got}"
    for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                    jax.tree_util.tree_leaves(l_params)):
        assert a.shape == b.shape, (a.shape, b.shape)
    del ref_s

    opt = init_optimizer(lconf.train_config())
    opt_state = opt.init(l_params)
    save_checkpoint(args.out, 0, l_params, l_state, opt_state)
    print(f"saved LocalSPFN warm start (K={k_l}) to {args.out} @ 0")


if __name__ == "__main__":
    main()
