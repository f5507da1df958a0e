"""Diagnose cascade degradation on specific clouds: per-patch local quality
vs the merge/fusion stages (round-3 crossover investigation)."""

# repo-root bootstrap: these scripts run as `python tools/<name>.py`, which
# puts tools/ (not the repo root) on sys.path
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

import numpy as np

sys.argv = sys.argv[:1]

import jax
import jax.numpy as jnp

from cpfn_tpu.config import Config
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.fitting import factory
from cpfn_tpu.merging import fuse_cascade, similarity_soft, run_heuristic_solver
from cpfn_tpu.metrics import hard_W_encoding
from cpfn_tpu.nn import apply_pointnet2, init_pointnet2
from cpfn_tpu.nn.pointnet2 import spfn_postprocess
from cpfn_tpu.utils import enable_compilation_cache, restore_checkpoint

enable_compilation_cache()

CLOUDS = ["synth_test_00214", "synth_test_00093"]
conf = Config.from_yaml("configs/config_synth2_local_v8.yml")
factory.register_primitives(list(conf.list_of_primitives))
k_g, k_l = conf.n_max_global_instances, conf.n_max_local_instances
model_cfg = conf.model_config("LocalSPFN")
params, state = init_pointnet2(jax.random.PRNGKey(0), model_cfg)
restored, at = restore_checkpoint(
    os.path.join(conf.checkpoint_dir, "localspfn_0.05"),
    {"params": params, "state": state},
)
params, state = restored["params"], restored["state"]
print("local model @", at)


@jax.jit
def local_forward(patches):
    out, _ = apply_pointnet2(params, state, model_cfg, patches, train=False)
    return spfn_postprocess(out)


@jax.jit
def normalize_patches(P_hr, idx):
    raw = P_hr[idx]
    mean = jnp.mean(raw, axis=1, keepdims=True)
    centered = raw - mean
    norm = jnp.max(
        jnp.linalg.norm(centered, axis=2, keepdims=True), axis=1, keepdims=True
    )
    return centered / jnp.maximum(norm, 1e-12)


def patch_miou(w_hard, gt):
    """matched IoU per GT instance in one patch (greedy best column)."""
    out = {}
    for g in np.unique(gt):
        best = 0.0
        gm = gt == g
        for c in np.unique(w_hard):
            cm = w_hard == c
            iou = (gm & cm).sum() / max((gm | cm).sum(), 1)
            best = max(best, iou)
        out[int(g)] = round(float(best), 3)
    return out


for stem in CLOUDS:
    path = f"data_synth2/highres/{stem}.h5"
    rec = read_spfn_hdf5(path, k_g, conf.test_data_noisy, shuffle=False)
    spfn_dir = f"data_synth2/globalspfn_eval/{stem}"
    spfn_labels = np.load(os.path.join(spfn_dir, "object_seg.npy"))
    spfn_normals = np.load(os.path.join(spfn_dir, "object_normals.npy"))
    spfn_type = np.load(os.path.join(spfn_dir, "object_type.npy"))
    patch_idx = np.load(f"data_synth2/heatmaps/0.05/{stem}_indices.npy")[:32]
    P = patch_idx.shape[0]
    I_gt = np.asarray(rec["I_gt"])
    counts = np.bincount(I_gt[I_gt >= 0])
    small = set(np.where(counts < 0.05 * len(I_gt))[0].tolist())
    print(f"\n=== {stem}: {P} patches, small prims {sorted(small)} "
          f"(sizes {[int(counts[s]) for s in sorted(small)]})")

    P_hr = jnp.asarray(rec["P"])
    idx_j = jnp.asarray(patch_idx, jnp.int32)
    X_p, T_p, W_p = local_forward(normalize_patches(P_hr, idx_j))
    W_np = np.asarray(W_p)

    # 1) per-patch local segmentation quality on patch GT
    for b in range(P):
        gt_b = I_gt[patch_idx[b]]
        hard_b = W_np[b].argmax(-1)
        cover = {int(g): round(float((gt_b == g).mean()), 3)
                 for g in np.unique(gt_b)}
        print(f" patch {b}: npred={len(np.unique(hard_b))} "
              f"gt_cover={cover} matched_iou={patch_miou(hard_b, gt_b)}")

    # 2) merge structure
    sim = np.asarray(similarity_soft(
        jnp.asarray(spfn_labels, jnp.float32), W_p, idx_j))
    labels = run_heuristic_solver(sim, P, k_g, k_l, 0.0)
    # which local columns merged with which global columns?
    gcols = np.arange(P * k_l, P * k_l + k_g)
    for b in range(P):
        row = []
        for k in range(k_l):
            c = b * k_l + k
            mates_g = [int(g - P * k_l) for g in gcols
                       if labels[g] == labels[c]]
            mates_l = [(int(o // k_l), int(o % k_l)) for o in range(P * k_l)
                       if o != c and labels[o] == labels[c]]
            if sim[c, c] > 0 and (mates_g or mates_l):
                row.append((k, "g" + str(mates_g), "l" + str(mates_l)))
        print(f" patch {b} merged cols: {row}")

    # 3) fused hard labels on small-primitive points
    W_f, X_f, T_f = fuse_cascade(
        W_p, X_p, T_p, idx_j, spfn_labels, spfn_normals, spfn_type,
        k_g, k_l, out_width=k_g + k_l,
    )
    hard = np.asarray(hard_W_encoding(W_f[None])[0]).argmax(-1)
    covered = np.zeros(len(I_gt), bool)
    covered[patch_idx.reshape(-1)] = True
    g_hard = spfn_labels.argmax(-1)
    for s in sorted(small):
        pts = I_gt == s
        fused_dist = np.bincount(hard[pts], minlength=hard.max() + 1)
        top = np.argsort(fused_dist)[::-1][:3]
        print(f" small prim {s}: {pts.sum()} pts, covered-by-patch "
              f"{covered[pts].mean():.2f}; fused top clusters "
              f"{[(int(t), int(fused_dist[t])) for t in top if fused_dist[t]]}"
              f"; global-label purity "
              f"{np.bincount(g_hard[pts]).max() / pts.sum():.2f}")
