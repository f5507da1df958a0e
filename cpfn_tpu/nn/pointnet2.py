"""PointNet++ backbone: set abstraction + feature propagation + multi-head FC.

Functional re-design of the reference network (`PointNet2/pn2_network.py`,
`.../pointset_abstraction.py`, `.../pointset_feature_propagation.py`) with
channels-last tensors. The grouped-MLP stacks are einsums over [B, S, K, C]
blocks — the bulk of the FLOPs, mapped straight onto the MXU — and the
FPS/ball-query/3-NN index ops come from `cpfn_tpu.ops`.

Channel schedule (reference defaults, `pn2_network.py:18-36`):
  SA1: 8192 -> 512 pts, r=0.2, K=64, MLP [64, 64, 128]
  SA2:  512 -> 128 pts, r=0.4, K=64, MLP [128, 128, 256]
  SA3:  group_all,               MLP [256, 512, 1024]
  FP1: 1024(+glob 1024 +loc 128 if injected) + 256 -> [256, 256]
  FP2: 256 + 128 -> [256, 128]
  FP3: 128 (+input feats) -> [128, 128, 128]
  FC:  conv(128,128) -> BN -> ReLU -> Dropout(0.5) -> one conv per head.

Heads (driver configs): GlobalSPFN [3, Q=4, K=28]; LocalSPFN [3, 4, 21];
PatchSelection [2].

Concat-order quirks preserved from the reference: grouped features come
before relative positions in SA blocks (`pointset_abstraction.py:66`) but
positions come first in the group_all block (`:56`); skip features come
before interpolated features in FP blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from cpfn_tpu import ops
from cpfn_tpu.nn import layers


@dataclasses.dataclass(frozen=True)
class PointNet2Config:
    dim_input: int = 3
    dim_pos: int = 3
    output_sizes: tuple[int, ...] = (16,)
    use_glob_features: bool = False
    use_loc_features: bool = False
    features_extractor: bool = False
    # Architecture scale knobs (defaults = reference; shrink for tiny tests)
    sa1_points: int = 512
    sa2_points: int = 128
    sa1_samples: int = 64
    sa2_samples: int = 64
    sa1_radius: float = 0.2
    sa2_radius: float = 0.4
    sa1_mlp: tuple[int, ...] = (64, 64, 128)
    sa2_mlp: tuple[int, ...] = (128, 128, 256)
    sa3_mlp: tuple[int, ...] = (256, 512, 1024)
    fp1_mlp: tuple[int, ...] = (256, 256)
    fp2_mlp: tuple[int, ...] = (256, 128)
    fp3_mlp: tuple[int, ...] = (128, 128, 128)
    fc_dim: int = 128
    dropout_rate: float = 0.5
    fps_impl: str = "auto"
    # 'bfloat16': in eval, the full bf16 ACTIVATION pipeline — intermediates
    # (grouped tensors, interpolated/skip features, folded-BN affines) flow
    # in bf16 with f32 matmul accumulation and f32 params/BN stats/outputs,
    # halving the HBM traffic the roofline says dominates. In train, only
    # matmul inputs are tagged bf16 (activations/statistics stay f32; the
    # TPU MXU truncates f32 matmul inputs to bf16 by default anyway).
    # None keeps full f32.
    compute_dtype: str | None = None
    # Frozen-BN fine-tune mode: always normalize with the (restored) running
    # statistics and never update them, even under train=True. Standard
    # transfer-learning practice; essential when warm-starting LocalSPFN from
    # GlobalSPFN — batch statistics of the patch distribution wash out the
    # transferred membership structure (QUALITY.md round 2).
    bn_eval_mode: bool = False
    # Eval-only fused Pallas MLP chains (ops/fused_mlp.py): keeps the
    # channel-expanded grouped activations in VMEM instead of HBM — the
    # LocalSPFN forward is bytes-bound (roofline), so this targets its
    # dominant traffic. Ignored under train=True (BN batch stats need the
    # XLA path); validated bit-for-bit against it in tests/test_fused_mlp.py
    fused_eval_mlp: bool = False

    @property
    def glob_feature_dim(self) -> int:
        return self.sa3_mlp[-1]

    @property
    def loc_feature_dim(self) -> int:
        return self.fc_dim


def _mlp_init(key, cin: int, widths: Sequence[int]):
    convs, bns, bn_states = [], [], []
    for w in widths:
        key, sub = jax.random.split(key)
        convs.append(layers.linear_init(sub, cin, w))
        p, s = layers.bn_init(w)
        bns.append(p)
        bn_states.append(s)
        cin = w
    return {"convs": convs, "bns": bns}, {"bns": bn_states}


def _mlp_apply(params, state, x, *, train, momentum, axis_name=None,
               compute_dtype=None, act_dtype=None):
    """act_dtype (eval only): keep the activation in this dtype between ops —
    linear outputs, the folded BN affine, and the ReLU all stay low-precision
    so the [B, S, K, C] intermediates cost half the HBM traffic."""
    new_bn_states = []
    for conv, bn, bn_state in zip(params["convs"], params["bns"], state["bns"]):
        x = layers.linear_apply(conv, x, compute_dtype, out_dtype=act_dtype)
        x, ns = layers.bn_apply(
            bn, bn_state, x, train=train, momentum=momentum,
            axis_name=axis_name, out_dtype=act_dtype,
        )
        x = jax.nn.relu(x)
        new_bn_states.append(ns)
    return x, {"bns": new_bn_states}


def init_pointnet2(key: jax.Array, cfg: PointNet2Config):
    """Returns (params, state) pytrees."""
    dim_feats = cfg.dim_input - cfg.dim_pos
    keys = jax.random.split(key, 16)
    params, state = {}, {}
    params["sa1"], state["sa1"] = _mlp_init(
        keys[0], cfg.dim_pos + dim_feats, cfg.sa1_mlp
    )
    params["sa2"], state["sa2"] = _mlp_init(
        keys[1], cfg.dim_pos + cfg.sa1_mlp[-1], cfg.sa2_mlp
    )
    params["sa3"], state["sa3"] = _mlp_init(
        keys[2], cfg.dim_pos + cfg.sa2_mlp[-1], cfg.sa3_mlp
    )
    offset = 0
    if cfg.use_glob_features:
        offset += cfg.glob_feature_dim
    if cfg.use_loc_features:
        offset += cfg.loc_feature_dim
    params["fp1"], state["fp1"] = _mlp_init(
        keys[3], cfg.sa3_mlp[-1] + offset + cfg.sa2_mlp[-1], cfg.fp1_mlp
    )
    params["fp2"], state["fp2"] = _mlp_init(
        keys[4], cfg.fp1_mlp[-1] + cfg.sa1_mlp[-1], cfg.fp2_mlp
    )
    params["fp3"], state["fp3"] = _mlp_init(
        keys[5], cfg.fp2_mlp[-1] + dim_feats, cfg.fp3_mlp
    )
    params["fc1"] = layers.linear_init(keys[6], cfg.fp3_mlp[-1], cfg.fc_dim)
    if not cfg.features_extractor:
        bn1_p, bn1_s = layers.bn_init(cfg.fc_dim)
        params["bn1"], state["bn1"] = bn1_p, bn1_s
        params["heads"] = [
            layers.linear_init(keys[7 + i], cfg.fc_dim, size)
            for i, size in enumerate(cfg.output_sizes)
        ]
    return params, state


def _set_abstraction(
    params,
    state,
    pos,
    feats,
    *,
    num_points,
    radius,
    num_samples,
    train,
    momentum,
    fps_impl,
    axis_name=None,
    compute_dtype=None,
    act_dtype=None,
    fused_eval=False,
):
    """One SA block: FPS -> ball query -> group -> MLP -> max-pool over K.

    With act_dtype, the channel-expanded grouped tensor — the graph's
    dominant HBM traffic — is built and consumed in low precision; the
    geometry (FPS / ball query / distances) always stays f32."""
    idx = ops.farthest_point_sample(pos, num_points, impl=fps_impl)
    new_pos = ops.gather_points(pos, idx)  # [B, S, 3]
    group_idx = ops.ball_query(pos, new_pos, radius, num_samples)
    grouped_pos = ops.gather_points(pos, group_idx) - new_pos[:, :, None, :]
    if act_dtype is not None:
        grouped_pos = grouped_pos.astype(act_dtype)
    if feats is not None:
        grouped_feats = ops.gather_points(feats, group_idx)
        grouped = jnp.concatenate([grouped_feats, grouped_pos], axis=-1)
    else:
        grouped = grouped_pos
    if fused_eval:
        from cpfn_tpu.ops.fused_mlp import fold_bn_eval, fused_mlp_maxpool

        B, S, K, C = grouped.shape
        pooled = fused_mlp_maxpool(
            grouped.reshape(B, S * K, C), fold_bn_eval(params, state),
            K, compute_dtype=compute_dtype, out_dtype=act_dtype,
        )
        return new_pos, pooled, state
    out, new_state = _mlp_apply(
        params, state, grouped, train=train, momentum=momentum,
        axis_name=axis_name, compute_dtype=compute_dtype, act_dtype=act_dtype,
    )
    return new_pos, jnp.max(out, axis=2), new_state  # [B, S, C']


def _group_all(params, state, pos, feats, *, train, momentum, axis_name=None,
               compute_dtype=None, act_dtype=None, fused_eval=False):
    """The final SA block: single group over all points (positions first)."""
    pos_in = pos.astype(act_dtype) if act_dtype is not None else pos
    grouped = pos_in[:, None]  # [B, 1, N, 3]
    if feats is not None:
        grouped = jnp.concatenate([grouped, feats[:, None]], axis=-1)
    if fused_eval:
        from cpfn_tpu.ops.fused_mlp import fold_bn_eval, fused_mlp_maxpool

        B, _, N, C = grouped.shape
        pooled = fused_mlp_maxpool(
            grouped.reshape(B, N, C), fold_bn_eval(params, state),
            N, compute_dtype=compute_dtype, out_dtype=act_dtype,
        )
        return pooled, state  # [B, 1, C']
    out, new_state = _mlp_apply(
        params, state, grouped, train=train, momentum=momentum,
        axis_name=axis_name, compute_dtype=compute_dtype, act_dtype=act_dtype,
    )
    return jnp.max(out, axis=2), new_state  # [B, 1, C']


def _feature_propagation(
    params,
    state,
    pos1,
    pos2,
    feats1,
    feats2,
    *,
    train,
    momentum,
    axis_name=None,
    compute_dtype=None,
    act_dtype=None,
    fused_eval=False,
):
    """One FP block: 3-NN inverse-distance interpolation + skip + MLP.

    With act_dtype, the interpolated and skip features flow in low precision
    (the 3-NN geometry stays f32)."""
    N = pos1.shape[1]
    if pos2 is None:
        interpolated = jnp.broadcast_to(
            feats2, (feats2.shape[0], N, feats2.shape[-1])
        )
    else:
        dists, idx = ops.three_nn(pos1, pos2)
        weights = ops.geometry.interpolation_weights(dists)
        interpolated = ops.three_interpolate(feats2, idx, weights)
    if act_dtype is not None:
        interpolated = interpolated.astype(act_dtype)
        if feats1 is not None:
            feats1 = feats1.astype(act_dtype)
    if feats1 is not None:
        x = jnp.concatenate([feats1, interpolated], axis=-1)
    else:
        x = interpolated
    if fused_eval:
        from cpfn_tpu.ops.fused_mlp import fold_bn_eval, fused_mlp_pointwise

        return fused_mlp_pointwise(
            x, fold_bn_eval(params, state), compute_dtype=compute_dtype,
            out_dtype=act_dtype,
        ), state
    return _mlp_apply(
        params, state, x, train=train, momentum=momentum,
        axis_name=axis_name, compute_dtype=compute_dtype, act_dtype=act_dtype,
    )


def apply_pointnet2(
    params,
    state,
    cfg: PointNet2Config,
    points: jax.Array,
    *,
    glob_features: jax.Array | None = None,
    loc_features: jax.Array | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
    bn_momentum=0.5,
    axis_name: str | None = None,
):
    """Forward pass.

    Args:
      points: [B, N, dim_input] — positions first, optional extra features.
      glob_features: [B, glob_dim] injected global code (LocalSPFN w/ features).
      loc_features: [B, loc_dim] injected per-patch feature.
      train: enables batch-stat BN and dropout (rng required).
      bn_momentum: scalar (may be traced) — the decay schedule input.
      axis_name: mesh axis for cross-device sync BN (None = local).
    Returns:
      (outputs, new_state) where outputs = {
        'heads': [each [B, N, size]],
        'global_feat': [B, glob_dim(+offset)],
        'point_feat': [B, N, fc_dim],
      }. For features_extractor configs 'heads' is [].
    """
    input_pos = points[..., : cfg.dim_pos]
    input_feats = (
        points[..., cfg.dim_pos :] if points.shape[-1] > cfg.dim_pos else None
    )
    cdt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    # Eval-only bf16 ACTIVATION pipeline: intermediates flow in compute_dtype
    # (folded-affine BN, low-precision gathers/interpolation), halving the
    # HBM traffic the roofline says dominates. Training keeps f32 activations
    # and f32 BN statistics (compute_dtype there only tags matmul inputs,
    # which the TPU MXU truncates to bf16 by default anyway).
    act_dt = cdt if (cdt is not None and not train) else None
    # bn_eval_mode freezes BN (running stats, no updates) while dropout and
    # everything else still follow `train`
    bn_train = train and not cfg.bn_eval_mode
    kw = dict(
        train=bn_train, momentum=bn_momentum, axis_name=axis_name,
        compute_dtype=cdt, act_dtype=act_dt,
        fused_eval=cfg.fused_eval_mlp and not train,
    )
    new_state = {}
    l1_pos, l1_feats, new_state["sa1"] = _set_abstraction(
        params["sa1"], state["sa1"], input_pos, input_feats,
        num_points=cfg.sa1_points, radius=cfg.sa1_radius,
        num_samples=cfg.sa1_samples, fps_impl=cfg.fps_impl, **kw,
    )
    l2_pos, l2_feats, new_state["sa2"] = _set_abstraction(
        params["sa2"], state["sa2"], l1_pos, l1_feats,
        num_points=cfg.sa2_points, radius=cfg.sa2_radius,
        num_samples=cfg.sa2_samples, fps_impl=cfg.fps_impl, **kw,
    )
    l3_feats, new_state["sa3"] = _group_all(
        params["sa3"], state["sa3"], l2_pos, l2_feats, **kw
    )  # [B, 1, 1024]
    if cfg.use_glob_features:
        l3_feats = jnp.concatenate(
            [l3_feats, glob_features[:, None, :].astype(l3_feats.dtype)],
            axis=-1,
        )
    if cfg.use_loc_features:
        l3_feats = jnp.concatenate(
            [l3_feats, loc_features[:, None, :].astype(l3_feats.dtype)],
            axis=-1,
        )
    l4_feats, new_state["fp1"] = _feature_propagation(
        params["fp1"], state["fp1"], l2_pos, None, l2_feats, l3_feats, **kw
    )
    l5_feats, new_state["fp2"] = _feature_propagation(
        params["fp2"], state["fp2"], l1_pos, l2_pos, l1_feats, l4_feats, **kw
    )
    l6_feats, new_state["fp3"] = _feature_propagation(
        params["fp3"], state["fp3"], input_pos, l1_pos, input_feats, l5_feats,
        **kw,
    )
    point_feat = layers.linear_apply(params["fc1"], l6_feats, cdt,
                                     out_dtype=act_dt)
    # boundary: everything returned to callers (fusion, losses, features
    # injection across models) is f32 regardless of the internal pipeline
    outputs = {"global_feat": l3_feats[:, 0, :].astype(jnp.float32)}
    if cfg.features_extractor:
        outputs["heads"] = []
        outputs["point_feat"] = point_feat.astype(jnp.float32)
    else:
        x, new_state["bn1"] = layers.bn_apply(
            params["bn1"], state["bn1"], point_feat,
            train=bn_train, momentum=bn_momentum, axis_name=axis_name,
            out_dtype=act_dt,
        )
        x = jax.nn.relu(x)
        x = layers.dropout(rng, x, cfg.dropout_rate, train=train)
        # heads accumulate in f32 and keep the f32 bias: outputs are f32
        outputs["heads"] = [
            layers.linear_apply(head, x, cdt) for head in params["heads"]
        ]
        outputs["point_feat"] = x.astype(jnp.float32)
    return outputs, new_state


def spfn_postprocess(outputs: dict):
    """Normalize the normal head and soft-max the membership head.

    Mirrors `training_utils.py:141-142`: X <- X/||X||, W <- softmax(W).
    Head order: [normals (3), type logits (Q), membership (K)].
    Returns (X, T_logits, W).
    """
    X, T, W = outputs["heads"][0], outputs["heads"][1], outputs["heads"][2]
    X = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-12)
    W = jax.nn.softmax(W, axis=-1)
    return X, T, W
