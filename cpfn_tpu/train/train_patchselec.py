"""Patch Selection network training driver (cf. `training_PatchSelection.py`).

Per-point binary classification: does this low-res point belong to a small
primitive (one covering < scale * N_highres points)?

  python -m cpfn_tpu.train.train_patchselec --config_file configs/config_patchSelec.yml \
      --lowres_dataset ... --highres_dataset ... --scale 0.05
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpfn_tpu.config import Config
from cpfn_tpu.data import PatchSelectionDataset, batch_iterator
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.train import init_optimizer, make_patch_selection_train_step
from cpfn_tpu.train.train_spfn import read_csv_list
from cpfn_tpu.utils import MetricsLogger, latest_step, restore_checkpoint, save_checkpoint


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_patchSelec.yml")
    p.add_argument("--lowres_dataset", default="data/TraceParts_v2_lowres/")
    p.add_argument("--highres_dataset", default="data/TraceParts_v2/")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--patchselec_weights", default="")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--max_steps", type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    conf = Config.from_yaml(args.config_file)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model_cfg = conf.model_config("PatchSelection")
    train_cfg = conf.train_config()
    name = f"patchselec_{round(args.scale, 2)}"

    def make_ds(csv_file, first_n, seed):
        lr = read_csv_list(
            os.path.join(args.csv_dir, csv_file), args.lowres_dataset
        )
        hr = read_csv_list(
            os.path.join(args.csv_dir, csv_file), args.highres_dataset
        )
        if first_n != -1:
            lr, hr = lr[:first_n], hr[:first_n]
        # preload: each record costs ~1 MB of h5 reads (lowres cloud + the
        # high-res label vector); cached once, the multi-epoch loop is
        # device-bound instead of host-IO-bound
        return PatchSelectionDataset(
            lr, hr, args.scale, n_points=args.n_points, seed=seed,
            preload=True,
        )

    train_ds = make_ds(conf.train_data_file, conf.train_first_n, 1)
    val_ds = make_ds(conf.val_data_file, conf.val_first_n, 2)
    print(f"PatchSelection: {len(train_ds)} train / {len(val_ds)} val")

    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step_idx = 0
    ckpt_dir = os.path.join(conf.checkpoint_dir, name)
    if args.patchselec_weights:
        tpl = {"params": params, "state": state, "opt_state": opt_state}
        restored, _ = restore_checkpoint(args.patchselec_weights, tpl)
        params, state = restored["params"], restored["state"]
    elif latest_step(ckpt_dir) is not None:
        tpl = {"params": params, "state": state, "opt_state": opt_state}
        restored, step_idx = restore_checkpoint(ckpt_dir, tpl)
        params, state, opt_state = (
            restored["params"], restored["state"], restored["opt_state"],
        )

    step_fn = jax.jit(
        make_patch_selection_train_step(model_cfg, train_cfg, optimizer=opt)
    )

    @jax.jit
    def eval_loss(params, state, batch):
        out, _ = apply_pointnet2(
            params, state, model_cfg, batch["P"], train=False
        )
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out["heads"][0], batch["labels"]
            )
        )

    logger = MetricsLogger(conf.log_dir, name)
    key = jax.random.PRNGKey(7)
    shuffle_rng = np.random.RandomState(12345)
    best_val = np.inf
    pending = None
    for epoch in range(conf.n_epochs):
        for batch in batch_iterator(
            train_ds, conf.batch_size, rng=shuffle_rng,
            keys=("P", "labels"),
        ):
            key, sub = jax.random.split(key)
            params, state, opt_state, metrics = step_fn(
                params, state, opt_state,
                jax.device_put({k: jnp.asarray(v) for k, v in batch.items()}),
                jnp.int32(step_idx), sub,
            )
            if pending is not None:
                logger.log(step_idx - 1, pending)
            pending = metrics
            step_idx += 1
            if args.max_steps and step_idx >= args.max_steps:
                break
        if args.max_steps and step_idx >= args.max_steps:
            break
        if epoch % conf.val_interval == 0 and epoch > 0:
            losses = [
                float(eval_loss(params, state, jax.device_put(
                    {k: jnp.asarray(v) for k, v in b.items()})))
                for b in batch_iterator(
                    val_ds, conf.batch_size, rng=shuffle_rng,
                    keys=("P", "labels"),
                )
            ]
            val_loss = float(np.mean(losses)) if losses else np.inf
            print(f"[epoch {epoch}] val_loss {val_loss:.4f}")
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(ckpt_dir, step_idx, params, state, opt_state)
    save_checkpoint(ckpt_dir + "_final", step_idx, params, state, opt_state)
    logger.close()
    return params, state


if __name__ == "__main__":
    main()
