"""Matched-hard-IoU probe of a LocalSPFN checkpoint on patch corpora
(round-3 recipe selection)."""

# repo-root bootstrap: these scripts run as `python tools/<name>.py`, which
# puts tools/ (not the repo root) on sys.path
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
import sys

import h5py
import numpy as np
import jax

if os.environ.get("CPFN_FORCE_CPU"):
    # must land before backend init; the axon sitecustomize overrides the
    # JAX_PLATFORMS env var, so the config update is the only reliable lever
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cpfn_tpu.config import Config
from cpfn_tpu.fitting import factory
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.utils import enable_compilation_cache, restore_checkpoint

enable_compilation_cache()

config_file, ckpt = sys.argv[1], sys.argv[2]
conf = Config.from_yaml(config_file)
factory.register_primitives(list(conf.list_of_primitives))
model_cfg = conf.model_config("LocalSPFN")
params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
restored, at = restore_checkpoint(ckpt, {"params": params, "state": state})
params, state = restored["params"], restored["state"]


@jax.jit
def fwd(patches):
    out, _ = apply_pointnet2(params, state, model_cfg, patches, train=False)
    return spfn_postprocess(out)


def matched_iou(hard, gt):
    ious = []
    for g in np.unique(gt):
        gm = gt == g
        best = 0.0
        for c in np.unique(hard):
            cm = hard == c
            iou = (gm & cm).sum() / max((gm | cm).sum(), 1)
            best = max(best, iou)
        ious.append(best)
    return np.mean(ious)


def small_instance_iou(hard, gt):
    """matched IoU over instances covering < 30% of the patch (the small
    primitives the cascade exists for)."""
    ious = []
    n = len(gt)
    for g in np.unique(gt):
        gm = gt == g
        if gm.sum() >= 0.3 * n:
            continue
        best = 0.0
        for c in np.unique(hard):
            cm = hard == c
            iou = (gm & cm).sum() / max((gm | cm).sum(), 1)
            best = max(best, iou)
        ious.append(best)
    return ious


for name, pat in [
    ("test ", "data_synth2/patches/0.05/synth_test_00[0-3]*/*.h5"),
]:
    files = sorted(glob.glob(pat))[:128]
    mious, smalls = [], []
    for s in range(0, len(files), 16):
        chunk = files[s : s + 16]
        P, L = [], []
        shuf = np.random.RandomState(0)
        for fp in chunk:
            with h5py.File(fp, "r") as f:
                pts = f["noisy_points"][:]
                lab = f["gt_labels"][:]
            # match the fixed eval paths: the stored kNN order is out of the
            # training distribution for these order-sensitive networks
            perm = shuf.permutation(len(pts))
            P.append(pts[perm])
            L.append(lab[perm])
        W = fwd(jnp.asarray(np.stack(P), jnp.float32))[2]
        hard = np.asarray(W).argmax(-1)
        for i in range(len(chunk)):
            mious.append(matched_iou(hard[i], L[i]))
            smalls.extend(small_instance_iou(hard[i], L[i]))
    print(
        f"{config_file} @ {at}: {name} n={len(files)} "
        f"matched-IoU {np.mean(mious):.4f}  "
        f"small-instance IoU {np.mean(smalls):.4f} (n={len(smalls)})"
    )
