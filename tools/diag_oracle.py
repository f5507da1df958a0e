"""Oracle decomposition of the cascade (round-3): replace the LocalSPFN
patch predictions with GT patch labels/normals/types and run the exact
eval_local fusion + metric path. Separates local-model quality from the
fusion/sampling mechanics:

  oracle >> baseline  -> fusion fine; the local model is the whole gap
  oracle <= baseline  -> fusion / patch placement / data setup flaw

Usage: python _diag_oracle.py [n_clouds] [spfn_eval_dir]
"""

# repo-root bootstrap: these scripts run as `python tools/<name>.py`, which
# puts tools/ (not the repo root) on sys.path
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

import numpy as np

n_clouds = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SPFN_EVAL = sys.argv[2] if len(sys.argv) > 2 else "data_synth2/globalspfn_eval"
sys.argv = sys.argv[:1]

import jax
import jax.numpy as jnp

from cpfn_tpu.config import Config
from cpfn_tpu.data.hdf5 import read_spfn_hdf5
from cpfn_tpu.fitting import factory
from cpfn_tpu.losses import compute_miou_loss, hungarian_matching_with_mask
from cpfn_tpu.merging import fuse_cascade
from cpfn_tpu.metrics import hard_W_encoding
from cpfn_tpu.utils import enable_compilation_cache

enable_compilation_cache()

conf = Config.from_yaml("configs/config_synth2_local_v8.yml")
factory.register_primitives(list(conf.list_of_primitives))
k_g, k_l = conf.n_max_global_instances, conf.n_max_local_instances
MAX_P, NPP = 32, 8192
Q = len(conf.list_of_primitives)

csv = "data_synth2/Dataset/test_models.csv"
stems = [line.strip().rsplit(".h5", 1)[0].rsplit("/", 1)[-1]
         for line in open(csv) if line.strip()][:n_clouds]

mious, base_mious, rows = [], [], []
for i, stem in enumerate(stems):
    rec = read_spfn_hdf5(f"data_synth2/highres/{stem}.h5", k_g,
                         conf.test_data_noisy, shuffle=False)
    spfn_dir = f"{SPFN_EVAL}/{stem}"
    spfn_labels = np.load(os.path.join(spfn_dir, "object_seg.npy"))
    spfn_normals = np.load(os.path.join(spfn_dir, "object_normals.npy"))
    spfn_type = np.load(os.path.join(spfn_dir, "object_type.npy"))
    idx_file = f"data_synth2/heatmaps/0.05/{stem}_indices.npy"
    if not os.path.isfile(idx_file):
        continue
    patch_idx = np.load(idx_file)[:MAX_P]
    n_patches = patch_idx.shape[0]
    I_gt = np.asarray(rec["I_gt"])
    T_gt = np.asarray(rec["T_gt"])
    N_gt = np.asarray(rec["normal_gt"])

    padded = np.zeros((MAX_P, NPP), np.int64)
    padded[:n_patches] = patch_idx
    mask = np.zeros((MAX_P,), np.float32)
    mask[:n_patches] = 1.0

    # oracle W: GT labels relabeled contiguously per patch, one-hot at K_l
    W_p = np.zeros((MAX_P, NPP, k_l), np.float32)
    X_p = np.zeros((MAX_P, NPP, 3), np.float32)
    T_p = np.zeros((MAX_P, NPP, Q), np.float32)
    for b in range(n_patches):
        lab = I_gt[patch_idx[b]]
        uniq = np.unique(lab[lab >= 0])[:k_l]
        for j, u in enumerate(uniq):
            W_p[b, lab == u, j] = 1.0
            T_p[b, lab == u, T_gt[u]] = 1.0
        X_p[b] = N_gt[patch_idx[b]]

    W_f, X_f, T_f = fuse_cascade(
        jnp.asarray(W_p), jnp.asarray(X_p), jnp.asarray(T_p),
        jnp.asarray(padded, jnp.int32),
        spfn_labels, spfn_normals, spfn_type, k_g, k_l,
        patch_mask=mask, out_width=k_g + k_l,
    )
    I_gt_j = jnp.asarray(I_gt)[None]
    W_hard = hard_W_encoding(W_f[None])
    match, mask_f = hungarian_matching_with_mask(W_hard, I_gt_j)
    miou_per_prim = 1.0 - compute_miou_loss(W_hard, I_gt_j, match)[0]
    mask_f = np.asarray(mask_f[0], np.float32)
    per = np.asarray(miou_per_prim[0])
    n_inst = int(I_gt.max()) + 1
    miou = float((per[:n_inst] * mask_f[:n_inst]).sum()
                 / max(mask_f[:n_inst].sum(), 1))
    mious.append(miou)

    # global-only baseline on the same cloud (argmax of spfn_labels)
    gl = jnp.asarray(np.asarray(spfn_labels))
    Wb_hard = hard_W_encoding(gl[None])
    match_b, mask_b = hungarian_matching_with_mask(Wb_hard, I_gt_j)
    per_b = np.asarray((1.0 - compute_miou_loss(Wb_hard, I_gt_j, match_b)[0])[0])
    mask_b = np.asarray(mask_b[0], np.float32)
    base = float((per_b[:n_inst] * mask_b[:n_inst]).sum()
                 / max(mask_b[:n_inst].sum(), 1))
    base_mious.append(base)
    rows.append((stem, n_patches, miou, base))
    if i % 16 == 0:
        print(f"[{i}] oracle {np.mean(mious):.4f} vs base {np.mean(base_mious):.4f}",
              flush=True)

print(f"\noracle-cascade mIoU {np.mean(mious):.4f}  "
      f"global-baseline mIoU {np.mean(base_mious):.4f}  (n={len(mious)})")
worst = sorted(rows, key=lambda r: r[2] - r[3])[:6]
print("worst oracle-vs-base clouds:")
for stem, npt, m, b in worst:
    print(f"  {stem}: patches={npt} oracle={m:.3f} base={b:.3f} d={m-b:+.3f}")
