"""GlobalSPFN / LocalSPFN training driver.

CLI-compatible with the reference's `training_SPFN.py` (same YAML schema and
flags), TPU-native execution: one jitted train step (data-parallel shard_map
when the mesh has >1 device), traced LR/BN schedules, orbax checkpoints of
params+state+optimizer+step, JSONL metric logs.

  python -m cpfn_tpu.train.train_spfn --config_file configs/config_globalSPFN.yml \
      --lowres_dataset data/TraceParts_v2_lowres/ --network GlobalSPFN
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from cpfn_tpu.config import Config
from cpfn_tpu.data import GlobalSPFNDataset, TrainLocalSPFNDataset, batch_iterator
from cpfn_tpu.data.dataset import _BATCH_KEYS
from cpfn_tpu.fitting import factory
from cpfn_tpu.nn import init_pointnet2
from cpfn_tpu.parallel import (
    make_mesh,
    make_sharded_spfn_train_step,
    replicate,
    shard_batch,
)
from cpfn_tpu.train import init_optimizer, make_spfn_eval_step, make_spfn_train_step
from cpfn_tpu.utils import MetricsLogger, latest_step, restore_checkpoint, save_checkpoint


def read_csv_list(csv_path: str, data_dir: str) -> list[str]:
    with open(csv_path) as f:
        names = sorted(line.strip() for line in f if line.strip())
    return [os.path.join(data_dir, n) for n in names]


def permute_batch_points(batch: dict, key) -> dict:
    """Apply an independent fresh point-order permutation to each record's
    per-point arrays (P / normal_gt / I_gt stay jointly aligned; per-instance
    arrays untouched). Traceable — used inside the staged-dataset train step."""
    perm_key = key
    n_pts = batch["P"].shape[1]
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n_pts)
    )(jax.random.split(perm_key, batch["P"].shape[0]))
    out = dict(batch)
    for k in ("P", "normal_gt", "I_gt"):
        if k in out:
            ix = perms
            if out[k].ndim == 3:
                ix = perms[:, :, None]
            out[k] = jnp.take_along_axis(out[k], ix, axis=1)
    return out


def _shard_slice(files: list, skip_n: int, first_n: int) -> list:
    """Rotate-and-take: skip `skip_n` records (mod corpus size), then take
    `first_n` wrapping around the end (-1 = all). Shards a corpus larger
    than the device-dataset HBM budget across resume segments."""
    if not files:
        return files
    skip_n = skip_n % len(files)
    rotated = files[skip_n:] + files[:skip_n]
    return rotated if first_n == -1 else rotated[:first_n]


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="configs/config_globalSPFN.yml")
    p.add_argument("--lowres_dataset", default="data/TraceParts_v2_lowres/")
    p.add_argument("--network", default="GlobalSPFN",
                   choices=["GlobalSPFN", "LocalSPFN"])
    p.add_argument("--path_patches", default="data/TraceParts_v2_patches")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--spfn_weights", default="",
                   help="checkpoint dir to warm-start from")
    p.add_argument("--csv_dir", default="Dataset")
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N optimizer steps (0 = by epochs)")
    p.add_argument("--snapshot_steps", type=int, default=500,
                   help="checkpoint every N steps (0 = off); enables resume "
                        "after preemption/backend loss")
    p.add_argument("--device_dataset", action="store_true",
                   help="stage the full (preloaded) training set in HBM once "
                        "and gather batches on device — removes the per-step "
                        "host->device batch upload (single-device runs)")
    p.add_argument("--log_every", type=int, default=1,
                   help="materialize/log train metrics every N steps (higher "
                        "values reduce host<->device round trips)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    conf = Config.from_yaml(args.config_file)
    from cpfn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    factory.register_primitives(list(conf.list_of_primitives))
    model_cfg = conf.model_config(args.network)
    train_cfg = conf.train_config()
    # feature-trained LocalSPFN: the per-record glob/loc feature arrays ride
    # along in every batch (host iterator AND the HBM-staged device dataset)
    batch_keys = _BATCH_KEYS
    if model_cfg.use_glob_features:
        batch_keys = batch_keys + ("glob_features",)
    if model_cfg.use_loc_features:
        batch_keys = batch_keys + ("loc_features",)

    if args.network == "GlobalSPFN":
        name = "globalspfn"
        k_max = conf.n_max_global_instances

        def make_ds(csv_file, noisy, first_n, seed, skip_n=0):
            files = read_csv_list(
                os.path.join(args.csv_dir, csv_file), args.lowres_dataset
            )
            files = _shard_slice(files, skip_n, first_n)
            return GlobalSPFNDataset(
                files, k_max, noisy, n_points=args.n_points, seed=seed
            )
    else:
        name = f"localspfn_{round(args.scale, 2)}"
        k_max = conf.n_max_local_instances
        patch_root = os.path.join(args.path_patches, str(round(args.scale, 2)))

        def make_ds(csv_file, noisy, first_n, seed, skip_n=0):
            stems = [
                os.path.basename(f).rsplit(".h5", 1)[0]
                for f in read_csv_list(os.path.join(args.csv_dir, csv_file), "")
            ]
            patch_files = TrainLocalSPFNDataset.enumerate_patches(
                patch_root, stems
            )
            patch_files = _shard_slice(patch_files, skip_n, first_n)
            # feature-trained LocalSPFN (config model_overrides sets
            # use_glob/loc_features): the patches must have been created
            # WITH --path_features so the h5s carry glob/loc_features
            use_feat = bool(
                model_cfg.use_glob_features or model_cfg.use_loc_features
            )
            return TrainLocalSPFNDataset(
                patch_files, k_max, noisy, use_features=use_feat, seed=seed
            )

    train_ds = make_ds(
        conf.train_data_file, conf.train_data_noisy, conf.train_first_n, 1,
        skip_n=conf.train_skip_n,
    )
    val_ds = make_ds(
        conf.val_data_file, conf.val_data_noisy, conf.val_first_n, 2
    )
    print(f"{args.network}: {len(train_ds)} train / {len(val_ds)} val records")

    n_avail = conf.n_devices or len(jax.devices())
    # largest device count that divides the global batch
    n_dev = max(d for d in range(1, n_avail + 1) if conf.batch_size % d == 0)
    mesh = make_mesh(n_dev)
    params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
    opt = init_optimizer(train_cfg)
    opt_state = opt.init(params)
    step_idx = 0
    ckpt_dir = os.path.join(conf.checkpoint_dir, name)
    def _restore(directory):
        """Restore params+state+opt_state; if the checkpoint's optimizer
        state has a different structure (the optimizer config changed since
        the snapshot, e.g. grad clipping toggled), restore params+state and
        start from fresh optimizer moments instead of failing."""
        tpl = {"params": params, "state": state, "opt_state": opt_state}
        try:
            restored, at = restore_checkpoint(directory, tpl)
        except (ValueError, KeyError, TypeError) as e:
            # Structure-mismatch errors only (optimizer config changed since
            # the snapshot). I/O errors (OSError etc.) propagate — silently
            # resetting Adam moments on a transient read failure would
            # corrupt a resumed run.
            restored, at = restore_checkpoint(
                directory, {"params": params, "state": state}
            )
            restored = dict(restored)
            restored["opt_state"] = opt_state
            print(
                "optimizer state structure changed; reinitialized moments "
                f"({type(e).__name__}: {e})"
            )
        return restored, at

    # resume wins over warm-start: a watchdog relaunch of a warm-started run
    # must continue from the run's own snapshots, not restart at step 0
    if args.spfn_weights and latest_step(ckpt_dir) is None:
        restored, at = _restore(args.spfn_weights)
        params, state = restored["params"], restored["state"]
        opt_state = restored["opt_state"]
        print(f"warm-started from {args.spfn_weights} @ step {at}")
    elif latest_step(ckpt_dir) is not None:
        restored, step_idx = _restore(ckpt_dir)
        params, state = restored["params"], restored["state"]
        opt_state = restored["opt_state"]
        print(f"resumed from {ckpt_dir} @ step {step_idx}")

    if n_dev > 1:
        step_fn = make_sharded_spfn_train_step(
            model_cfg, train_cfg, mesh, optimizer=opt
        )
        params = replicate(params, mesh)
        state = replicate(state, mesh)
        opt_state = replicate(opt_state, mesh)

        def put(batch):
            return shard_batch(batch, mesh)

        def put_scalar(x):
            return replicate(x, mesh)
    else:
        step_fn = jax.jit(
            make_spfn_train_step(model_cfg, train_cfg, optimizer=opt)
        )

        def put(batch):
            return jax.device_put(batch)

        def put_scalar(x):
            return x

    gather_step = None
    if args.device_dataset and n_dev == 1:
        # one __getitem__ per record, all keys from the SAME returned dict:
        # datasets with stochastic __getitem__ (TrainLocalSPFNDataset draws a
        # fresh point permutation per call) would otherwise get a different
        # permutation per key, silently decorrelating P from its labels
        def _stack_records(ds):
            out = None
            for i in range(len(ds)):
                rec = ds[i]
                if out is None:
                    out = {
                        k: np.empty((len(ds),) + rec[k].shape, rec[k].dtype)
                        for k in batch_keys
                    }
                for k in batch_keys:
                    out[k][i] = rec[k]
            return out

        stacked = {
            k: jnp.asarray(v) for k, v in _stack_records(train_ds).items()
        }
        data_dev = jax.device_put(stacked)
        inner_step = make_spfn_train_step(model_cfg, train_cfg, optimizer=opt)

        @jax.jit
        def gather_step(params, state, opt_state, data, idx, step_i, rng):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            # fresh point-order permutation per record visit: the staged
            # arrays froze ONE permutation per record at staging time, but
            # the host (non-staged) path re-shuffles every epoch and the
            # networks are point-order sensitive — re-permuting in-graph
            # restores that augmentation at negligible cost
            perm_key, rng = jax.random.split(rng)
            batch = permute_batch_points(batch, perm_key)
            return inner_step(params, state, opt_state, batch, step_i, rng)

        print(
            f"device-resident dataset: "
            f"{sum(v.nbytes for v in stacked.values()) / 1e6:.1f} MB in HBM"
        )

    logger = MetricsLogger(conf.log_dir, name)
    if conf.profile_dir:
        # capture a jax.profiler trace of a few steps after warmup
        profile_gate = {"active": False, "start": 3, "stop": 8}
    key = jax.random.PRNGKey(123)
    shuffle_rng = np.random.RandomState(12345)
    best_val = np.inf
    pending = None  # one-step-lagged metric materialization: logging step i
    # while the device runs step i+1 keeps the dispatch pipeline full
    n_train = len(train_ds)
    for epoch in range(conf.n_epochs):
        if gather_step is not None:
            order = shuffle_rng.permutation(n_train)
            batch_indices = [
                order[s : s + conf.batch_size]
                for s in range(0, n_train - conf.batch_size + 1, conf.batch_size)
            ]
            batches = (jnp.asarray(ix, jnp.int32) for ix in batch_indices)
        else:
            batches = batch_iterator(
                train_ds, conf.batch_size, rng=shuffle_rng, keys=batch_keys
            )
        for batch in batches:
            key, sub = jax.random.split(key)
            if conf.profile_dir:
                if step_idx == profile_gate["start"] and not profile_gate["active"]:
                    jax.profiler.start_trace(conf.profile_dir)
                    profile_gate["active"] = True
                elif step_idx == profile_gate["stop"] and profile_gate["active"]:
                    jax.profiler.stop_trace()
                    profile_gate["active"] = False
            if gather_step is not None:
                params, state, opt_state, metrics = gather_step(
                    params, state, opt_state, data_dev, batch,
                    jnp.int32(step_idx), sub,
                )
            else:
                params, state, opt_state, metrics = step_fn(
                    params, state, opt_state,
                    put({k: jnp.asarray(v) for k, v in batch.items()}),
                    put_scalar(jnp.int32(step_idx)), put_scalar(sub),
                )
            if pending is not None and (step_idx - 1) % args.log_every == 0:
                logger.log(step_idx - 1, pending)
            pending = metrics
            step_idx += 1
            if args.snapshot_steps and step_idx % args.snapshot_steps == 0:
                save_checkpoint(ckpt_dir, step_idx, params, state, opt_state)
            if args.max_steps and step_idx >= args.max_steps:
                break
        if args.max_steps and step_idx >= args.max_steps:
            break
        if epoch % conf.val_interval == 0 and epoch > 0 and len(val_ds) > 0:
            # Single-execution validation: the axon TPU runtime deterministically
            # kills the session on the SECOND execution of a (second-compiled)
            # executable containing the losses graph (minimal repro: one train
            # step, then any fresh losses-graph jit run twice -> INVALID_ARGUMENT
            # on materialization; same-executable repeats and first executions
            # always succeed). Workaround: build a FRESH executable per
            # validation pass and execute it exactly once, lax.map-ing over the
            # stacked validation batches inside the graph. Verified stable over
            # repeated train/validate alternation.
            bs = min(conf.batch_size, len(val_ds))
            stacked_val = None
            for batch in batch_iterator(
                val_ds, bs, rng=np.random.RandomState(7), keys=batch_keys,
            ):
                if len(batch["P"]) != bs:
                    continue  # lax.map needs equal batch shapes
                b = {k: jnp.asarray(v)[None] for k, v in batch.items()}
                stacked_val = (
                    b if stacked_val is None else
                    {k: jnp.concatenate([stacked_val[k], b[k]]) for k in b}
                )
            step_closure = make_spfn_eval_step(model_cfg, train_cfg)

            @jax.jit
            def val_once(params, state, data):
                def one(b):
                    _, m = step_closure(params, state, b)
                    return m["total_loss"]
                return jnp.mean(jax.lax.map(one, data))

            if n_dev > 1:
                # mesh-replicated trees -> plain single-device arrays (a
                # replicated buffer fed to a fresh single-device jit trips
                # buffer-count mismatches on this runtime; see ROUND1_NOTES)
                p_v, s_v = jax.device_get((params, state))
            else:
                p_v, s_v = params, state
            val_loss = float(val_once(p_v, s_v, stacked_val))
            print(f"[epoch {epoch}] val_loss {val_loss:.4f}", flush=True)
            logger.log(step_idx, {"val_loss": val_loss})
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(ckpt_dir, step_idx, params, state, opt_state)
        if epoch % conf.snapshot_interval == 0 and epoch > 0:
            save_checkpoint(
                ckpt_dir + "_snapshots", step_idx, params, state, opt_state
            )
    save_checkpoint(ckpt_dir + "_final", step_idx, params, state, opt_state)
    logger.close()
    return params, state


if __name__ == "__main__":
    main()
