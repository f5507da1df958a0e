"""Import reference PyTorch ``.pth`` checkpoints into cpfn_tpu.

The reference trains `PointNet2.pn2_network.PointNet2` and saves raw
``state_dict()`` files (`/root/reference/training_SPFN.py:111-115`), which its
eval drivers reload by filename convention — ``globalspfn_module.pth``,
``localspfn_<scale>_module.pth``, ``patchselec_<scale>_module.pth``
(`evaluation_globalSPFN.py:56`, `evaluation_localSPFN.py:54`,
`evaluation_PatchSelection.py:44`). A reference user switching to this
framework brings exactly those files, so this module maps the flat torch
key/value pairs onto our functional pytrees (`nn/pointnet2.py`) — without
importing any reference code — and writes a step-0 orbax checkpoint that
every driver flag (``--weights`` / ``--spfn_weights`` /
``--patchselec_weights``) restores directly.

Key schema of the reference state_dict (module attribute names from
`pn2_network.py:18-36` and `pointnet2_ops/modules/*.py`):

    sa{1,2,3}.conv_blocks.0.{j}.weight|bias        Conv2d [out, in, 1, 1]
    sa{1,2,3}.bn_blocks.0.{j}.weight|bias|running_mean|running_var
    sfp{1,2,3}.mlp_convs.{j}.weight|bias           Conv1d [out, in, 1]
    sfp{1,2,3}.mlp_bns.{j}.weight|...
    fc1.weight|bias
    bn1.weight|...                                  (absent: features_extractor)
    fc2.{i}.weight|bias                             one head per output size

Torch stores linear kernels [out, in]; we store channels-last [in, out].

  python -m cpfn_tpu.utils.import_torch \
      --pth trained_models/globalspfn_module.pth \
      --config_file configs/config_globalSPFN.yml --network GlobalSPFN \
      --out checkpoints_imported/globalspfn
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["pytrees_from_state_dict", "load_torch_state_dict"]


def _lin(sd: dict, prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    # Conv2d [out, in, 1, 1] and Conv1d [out, in, 1] are both pointwise
    w = w.reshape(w.shape[0], w.shape[1])
    return {
        "w": jnp.asarray(w.T),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }


def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    get = lambda k: jnp.asarray(np.asarray(sd[f"{prefix}.{k}"], np.float32))
    return (
        {"scale": get("weight"), "bias": get("bias")},
        {"mean": get("running_mean"), "var": get("running_var")},
    )


def _block(sd: dict, conv_fmt: str, bn_fmt: str) -> tuple[dict, dict]:
    """One SA/FP block: enumerate its conv/BN stack until the keys run out."""
    convs, bns, bn_states = [], [], []
    j = 0
    while f"{conv_fmt.format(j)}.weight" in sd:
        convs.append(_lin(sd, conv_fmt.format(j)))
        p, s = _bn(sd, bn_fmt.format(j))
        bns.append(p)
        bn_states.append(s)
        j += 1
    if not convs:
        raise ValueError(f"no layers found under '{conv_fmt.format(0)}.*'")
    return {"convs": convs, "bns": bns}, {"bns": bn_states}


def pytrees_from_state_dict(sd: dict) -> tuple[dict, dict]:
    """Flat torch ``state_dict`` (tensors or arrays) -> our (params, state).

    Pure mapping — no torch dependency; values only need ``np.asarray``.
    """
    params, state = {}, {}
    for ours, theirs in (("sa", "sa"), ("fp", "sfp")):
        for k in (1, 2, 3):
            sub = "conv_blocks.0.{}" if theirs == "sa" else "mlp_convs.{}"
            bnsub = "bn_blocks.0.{}" if theirs == "sa" else "mlp_bns.{}"
            p, s = _block(
                sd, f"{theirs}{k}.{sub}", f"{theirs}{k}.{bnsub}"
            )
            params[f"{ours}{k}"], state[f"{ours}{k}"] = p, s
    params["fc1"] = _lin(sd, "fc1")
    if "bn1.weight" in sd:  # absent on features_extractor models
        params["bn1"], state["bn1"] = _bn(sd, "bn1")
        heads = []
        while f"fc2.{len(heads)}.weight" in sd:
            heads.append(_lin(sd, f"fc2.{len(heads)}"))
        params["heads"] = heads
    return params, state


def load_torch_state_dict(path: str) -> dict:
    """Load a reference ``.pth`` into a {key: np.ndarray} dict."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "importing .pth checkpoints needs the (CPU) torch wheel"
        ) from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _check_against_template(got, template, what: str) -> None:
    """Same treedef + same leaf shapes as a freshly initialized model."""
    gl, gt = jax.tree_util.tree_flatten(got)
    tl, tt = jax.tree_util.tree_flatten(template)
    if gt != tt:
        raise ValueError(
            f"{what}: imported tree structure does not match the configured "
            f"model — wrong --network/--config_file for this .pth?\n"
            f"imported: {gt}\nexpected: {tt}"
        )
    for g, t in zip(gl, tl):
        if g.shape != t.shape:
            raise ValueError(
                f"{what}: leaf shape mismatch {g.shape} vs {t.shape} — the "
                ".pth was trained with a different architecture scale"
            )


def main(argv=None):
    from cpfn_tpu.config import Config
    from cpfn_tpu.fitting import factory
    from cpfn_tpu.nn import init_pointnet2
    from cpfn_tpu.utils import save_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="reference state_dict file")
    p.add_argument("--config_file", default="configs/config_globalSPFN.yml")
    p.add_argument(
        "--network", default="GlobalSPFN",
        choices=["GlobalSPFN", "LocalSPFN", "PatchSelection"],
    )
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = p.parse_args(argv)

    conf = Config.from_yaml(args.config_file)
    factory.register_primitives(list(conf.list_of_primitives))
    cfg = conf.model_config(args.network)
    t_params, t_state = init_pointnet2(jax.random.PRNGKey(0), cfg)

    sd = load_torch_state_dict(args.pth)
    params, state = pytrees_from_state_dict(sd)
    _check_against_template(params, t_params, "params")
    _check_against_template(state, t_state, "state")

    save_checkpoint(args.out, 0, params, state)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imported {args.pth} -> {args.out} ({n:,} params, step 0)")


if __name__ == "__main__":
    main()
