"""Jitted train/eval steps for the three CPFN networks.

Replaces the reference's Python epoch loops (`Utils/training_utils.py:33-176`)
with single compiled step functions:

- LR and BN-momentum staircase schedules are traced (no per-step Python
  re-assignment, no recompilation).
- The reference's NaN/Inf-gradient gate (`training_utils.py:150-158` — a full
  host sync over every parameter every step) becomes `optax.apply_if_finite`,
  one fused on-device check.
- With `axis_name` set, the step runs inside shard_map/pmap-style
  data-parallel: gradients are `pmean`ed over the mesh axis and BN uses
  cross-device statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from cpfn_tpu.losses import compute_all_losses
from cpfn_tpu.nn import PointNet2Config, apply_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.train import schedules


@dataclasses.dataclass(frozen=True)
class SPFNTrainConfig:
    batch_size: int = 16
    init_learning_rate: float = 1e-3
    decay_step: int = 200000
    decay_rate: float = 0.7
    bn_decay_step: int = 200000
    miou_loss_multiplier: float = 1.0
    normal_loss_multiplier: float = 1.0
    type_loss_multiplier: float = 1.0
    parameter_loss_multiplier: float = 1.0
    residue_loss_multiplier: float = 1.0
    total_loss_multiplier: float = 1.0
    # Registration order defines type ids; the shipped configs register
    # ['sphere','plane','cylinder','cone'] (config_globalSPFN.yml:13-17).
    classes: Sequence[str] = ("sphere", "plane", "cylinder", "cone")
    # global-norm gradient clip; 0 disables. The reference only gates
    # nonfinite grads (training_utils.py:152-158) — finite-but-huge spikes
    # from the TLS eigh VJP on near-degenerate fits can still wreck a run
    # (observed in round 2: one spike undid 10k steps of LocalSPFN training).
    grad_clip_norm: float = 0.0


def init_optimizer(cfg: SPFNTrainConfig):
    """Adam with the staircase LR schedule and a nonfinite-gradient gate."""
    lr = schedules.staircase_learning_rate(
        cfg.init_learning_rate, cfg.batch_size, cfg.decay_step, cfg.decay_rate
    )
    opt = optax.adam(learning_rate=lr)
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        opt = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), opt
        )
    return optax.apply_if_finite(opt, max_consecutive_errors=10**8)


def _gt_parameters(batch: dict) -> dict:
    return {
        "plane_normal": batch["plane_n_gt"],
        "cylinder_axis": batch["cylinder_axis_gt"],
        "cone_axis": batch["cone_axis_gt"],
    }


def make_spfn_train_step(
    model_cfg: PointNet2Config,
    train_cfg: SPFNTrainConfig,
    optimizer=None,
    axis_name: str | None = None,
):
    """Returns step(params, state, opt_state, batch, step_idx, rng) ->
    (params, state, opt_state, metrics)."""
    opt = optimizer if optimizer is not None else init_optimizer(train_cfg)
    bn_schedule = schedules.batch_norm_momentum(
        train_cfg.batch_size, train_cfg.bn_decay_step
    )

    def step(params, state, opt_state, batch, step_idx, rng):
        bn_momentum = bn_schedule(step_idx)

        def loss_fn(params):
            out, new_state = apply_pointnet2(
                params, state, model_cfg, batch["P"],
                glob_features=batch.get("glob_features"),
                loc_features=batch.get("loc_features"),
                train=True, rng=rng, bn_momentum=bn_momentum,
                axis_name=axis_name,
            )
            X, T, W = spfn_postprocess(out)
            louts = compute_all_losses(
                batch["P"], W, batch["I_gt"], X, batch["normal_gt"], T,
                batch["T_gt"], _gt_parameters(batch), batch["P_gt"],
                train_cfg.normal_loss_multiplier,
                train_cfg.type_loss_multiplier,
                train_cfg.miou_loss_multiplier,
                train_cfg.residue_loss_multiplier,
                train_cfg.parameter_loss_multiplier,
                train_cfg.total_loss_multiplier,
                is_eval=False,
                classes=train_cfg.classes,
            )
            return louts["total_loss"], (new_state, louts)

        grads, (new_state, louts) = jax.grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {
            k: louts[k]
            for k in (
                "total_loss", "normal_loss", "type_loss", "miou_loss",
                "residue_loss", "parameter_loss",
            )
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_params, new_state, new_opt_state, metrics

    return step


def make_spfn_eval_step(
    model_cfg: PointNet2Config,
    train_cfg: SPFNTrainConfig,
    axis_name: str | None = None,
):
    """Returns eval_step(params, state, batch) -> (outputs, metrics).

    outputs carries (X, T, W, global_feat, point_feat) for downstream
    feature extraction (evaluation_globalSPFN.py saves these artifacts).
    """

    def eval_step(params, state, batch):
        out, _ = apply_pointnet2(
            params, state, model_cfg, batch["P"],
            glob_features=batch.get("glob_features"),
            loc_features=batch.get("loc_features"),
            train=False, axis_name=None,
        )
        X, T, W = spfn_postprocess(out)
        louts = compute_all_losses(
            batch["P"], W, batch["I_gt"], X, batch["normal_gt"], T,
            batch["T_gt"], _gt_parameters(batch), batch["P_gt"],
            train_cfg.normal_loss_multiplier,
            train_cfg.type_loss_multiplier,
            train_cfg.miou_loss_multiplier,
            train_cfg.residue_loss_multiplier,
            train_cfg.parameter_loss_multiplier,
            train_cfg.total_loss_multiplier,
            is_eval=False,
            classes=train_cfg.classes,
        )
        metrics = {
            k: louts[k]
            for k in (
                "total_loss", "normal_loss", "type_loss", "miou_loss",
                "residue_loss", "parameter_loss",
            )
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        outputs = {
            "X": X, "T": T, "W": W,
            "global_feat": out["global_feat"],
            "point_feat": out["point_feat"],
        }
        return outputs, metrics

    return eval_step


def make_patch_selection_train_step(
    model_cfg: PointNet2Config,
    train_cfg: SPFNTrainConfig,
    optimizer=None,
    axis_name: str | None = None,
):
    """Binary per-point classification (small-primitive membership).

    batch: {'P': [B, N, 3], 'labels': [B, N] in {0, 1}} — cross-entropy as
    `training_utils.patch_selection_train_val_epoch`.
    """
    opt = optimizer if optimizer is not None else init_optimizer(train_cfg)
    bn_schedule = schedules.batch_norm_momentum(
        train_cfg.batch_size, train_cfg.bn_decay_step
    )

    def step(params, state, opt_state, batch, step_idx, rng):
        bn_momentum = bn_schedule(step_idx)

        def loss_fn(params):
            out, new_state = apply_pointnet2(
                params, state, model_cfg, batch["P"],
                train=True, rng=rng, bn_momentum=bn_momentum,
                axis_name=axis_name,
            )
            logits = out["heads"][0]  # [B, N, 2]
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"]
                )
            )
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, {"total_loss": loss}

    return step
