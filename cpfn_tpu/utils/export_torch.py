"""Export cpfn_tpu checkpoints to reference-loadable PyTorch ``.pth`` files.

Inverse of `utils/import_torch.py`: maps our functional pytrees back onto the
flat ``state_dict`` schema of `PointNet2.pn2_network.PointNet2`, so a model
trained here can be dropped into the reference's own eval stack — its drivers
call ``load_state_dict(dict, strict=True)`` (`/root/reference/
training_SPFN.py:74`, `evaluation_globalSPFN.py:59`), which this satisfies
key-for-key (including BatchNorm ``num_batches_tracked``). Shape conventions
per module (`pointnet2_ops/modules/pointset_abstraction.py:28`:
Conv2d/BN2d in SA; `pointset_feature_propagation.py:17`: Conv1d/BN1d in FP;
`pn2_network.py:31-36`: Conv1d fc1/fc2):

    SA convs   [out, in, 1, 1]     FP/fc convs  [out, in, 1]

  python -m cpfn_tpu.utils.export_torch \
      --checkpoint data_synth2/checkpoints_g2/globalspfn_final \
      --config_file configs/config_synth2_global_v2.yml --network GlobalSPFN \
      --out trained_models_export/globalspfn_module.pth
"""

from __future__ import annotations

import argparse

import numpy as np

import jax

__all__ = ["state_dict_from_pytrees"]


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _emit_lin(sd: dict, prefix: str, lin: dict, conv2d: bool) -> None:
    w = _np(lin["w"]).T  # [in, out] -> [out, in]
    w = w[..., None, None] if conv2d else w[..., None]
    sd[f"{prefix}.weight"] = w
    sd[f"{prefix}.bias"] = _np(lin["b"])


def _emit_bn(sd: dict, prefix: str, bn_p: dict, bn_s: dict) -> None:
    sd[f"{prefix}.weight"] = _np(bn_p["scale"])
    sd[f"{prefix}.bias"] = _np(bn_p["bias"])
    sd[f"{prefix}.running_mean"] = _np(bn_s["mean"])
    sd[f"{prefix}.running_var"] = _np(bn_s["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def state_dict_from_pytrees(params: dict, state: dict) -> dict:
    """(params, state) pytrees -> flat reference state_dict of numpy arrays."""
    sd: dict = {}
    for ours, theirs in (("sa", "sa"), ("fp", "sfp")):
        conv2d = ours == "sa"
        for k in (1, 2, 3):
            block_p, block_s = params[f"{ours}{k}"], state[f"{ours}{k}"]
            sub = "conv_blocks.0.{}" if conv2d else "mlp_convs.{}"
            bnsub = "bn_blocks.0.{}" if conv2d else "mlp_bns.{}"
            for j, lin in enumerate(block_p["convs"]):
                _emit_lin(sd, f"{theirs}{k}.{sub.format(j)}", lin, conv2d)
                _emit_bn(
                    sd, f"{theirs}{k}.{bnsub.format(j)}",
                    block_p["bns"][j], block_s["bns"][j],
                )
    _emit_lin(sd, "fc1", params["fc1"], conv2d=False)
    if "bn1" in params:  # features_extractor models have no bn1/fc2
        _emit_bn(sd, "bn1", params["bn1"], state["bn1"])
        for i, head in enumerate(params["heads"]):
            _emit_lin(sd, f"fc2.{i}", head, conv2d=False)
    return sd


def main(argv=None):
    from cpfn_tpu.config import Config
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.nn import init_pointnet2
    from cpfn_tpu.utils import restore_checkpoint

    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "writing .pth checkpoints needs the (CPU) torch wheel"
        ) from e

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint dir (empty: export the seeded "
                        "random init — pipeline-parity runs)")
    p.add_argument("--config_file", default="configs/config_globalSPFN.yml")
    p.add_argument(
        "--network", default="GlobalSPFN",
        choices=["GlobalSPFN", "LocalSPFN", "PatchSelection"],
    )
    p.add_argument("--out", required=True, help="output .pth path")
    args = p.parse_args(argv)

    conf = Config.from_yaml(args.config_file)
    factory.register_primitives(list(conf.list_of_primitives))
    cfg = conf.model_config(args.network)
    params, state = init_pointnet2(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        restored, at = restore_checkpoint(
            args.checkpoint, {"params": params, "state": state}
        )
    else:
        # random-init export: still a full pipeline-parity artifact (the
        # reference eval runs the same function on the same weights)
        restored, at = {"params": params, "state": state}, 0
    sd = state_dict_from_pytrees(restored["params"], restored["state"])
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"exported {args.checkpoint} @ step {at} -> {args.out} "
          f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()
