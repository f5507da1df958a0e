"""Closed-loop parity vs the REFERENCE's own eval stack (VERDICT r4 item 5).

Strongest possible parity claim: export a cpfn_tpu GlobalSPFN checkpoint to
the reference's state_dict schema (`utils/export_torch.py`), run the
reference's *actual* `evaluation_globalSPFN.py` (shimmed to CPU, with the
CUDA kernels replaced by torch implementations of their exact semantics),
and run our `eval_global` on the SAME clouds with the SAME weights in the
SAME (stored) point order. Both stacks emit Results.csv with the 10 metrics;
the comparison (per-metric mean deltas) is the parity artifact. BASELINE bar:
Seg-mIoU delta < 0.5%.

  python tools/reference_parity.py --checkpoint <ckpt_dir> [--n_clouds 8]
  python tools/reference_parity.py --random-init   # pipeline-parity smoke

Writes data_parity/{ref_out,tpu_out}/Results.csv and
artifacts_r5/reference_parity.json.

The cuda_ops stand-ins below implement the CUDA kernels' semantics
(`sampling_gpu.cu:63-211`, `ball_query_gpu.cu:9-54`, `interpolate_gpu.cu`):
FPS starts at index 0 / skips ||p||^2<=1e-3 / 1e10 init; ball query is
first-K-within-radius in scan order with fill-then-overwrite; three_nn is a
3-best scan (sqrt at the wrapper). The reference's fast=False fallbacks
differ semantically (sorted-by-index ball query, squared three_nn dists) —
using them would test the wrong function.
"""

import argparse
import json
import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


# ---------------------------------------------------------------- cuda_ops
def _make_cuda_ops_standin(torch):
    m = types.ModuleType("PointNet2.pointnet2_ops.cuda_ops")

    def farthest_point_sampling(xyz, npoint):
        # xyz [B, N, 3] -> [B, npoint] int32; CUDA semantics
        B, N, _ = xyz.shape
        valid = (xyz ** 2).sum(-1) > 1e-3
        temp = torch.full((B, N), 1e10, dtype=xyz.dtype)
        idxs = torch.zeros(B, npoint, dtype=torch.int32)
        last = torch.zeros(B, dtype=torch.long)
        ar = torch.arange(B)
        neg = torch.full_like(temp, -1.0)
        for i in range(1, npoint):
            d2 = ((xyz - xyz[ar, last][:, None]) ** 2).sum(-1)
            temp = torch.minimum(temp, d2)
            last = torch.where(valid, temp, neg).argmax(-1)
            idxs[:, i] = last.int()
        return idxs

    def ball_query(query_pos, point_pos, radius, num_samples):
        # [B,S,3], [B,N,3] -> [B,S,K] int32; first-K-found, fill-then-
        # overwrite, strict < r^2 (scan order = point index order)
        B, S, _ = query_pos.shape
        N = point_pos.shape[1]
        d2 = (
            (query_pos[:, :, None, :] - point_pos[:, None, :, :]) ** 2
        ).sum(-1)
        inr = d2 < radius * radius
        rank = inr.long().cumsum(-1) - 1
        first = inr.long().argmax(-1)  # 0 when no hit (zeros output)
        out = first[..., None].repeat(1, 1, num_samples)
        sel = inr & (rank >= 0) & (rank < num_samples)
        b, s, n = sel.nonzero(as_tuple=True)
        out[b, s, rank[b, s, n]] = n
        has = inr.any(-1)
        out[~has] = 0
        return out.int()

    def three_nn(unknown, known):
        # [B,S,3], [B,N,3] -> (dist2 [B,S,3], idx int32); stable sort ->
        # lower-index ties, exactly the running 3-best scan's rule
        d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
        dists, idx = d2.sort(dim=-1, stable=True)
        return dists[:, :, :3].contiguous(), idx[:, :, :3].int()

    def three_weighted_sum(features, idx, weight):
        # [B,C,N], [B,S,3] int, [B,S,3] -> [B,C,S]
        B, C, N = features.shape
        S = idx.shape[1]
        flat = idx.long().reshape(B, S * 3)
        g = torch.gather(
            features, 2, flat[:, None, :].expand(B, C, S * 3)
        ).reshape(B, C, S, 3)
        return (g * weight[:, None, :, :]).sum(-1)

    m.farthest_point_sampling = farthest_point_sampling
    m.ball_query = ball_query
    m.three_nn = three_nn
    m.three_weighted_sum = three_weighted_sum
    return m


def run_reference_eval(args, out_dir):
    """Shim CUDA away and execute /root/reference/evaluation_globalSPFN.py
    in-process on CPU."""
    import runpy

    import torch

    sys.path.insert(0, REFERENCE)
    import PointNet2.pointnet2_ops as pops  # noqa: F401

    standin = _make_cuda_ops_standin(torch)
    sys.modules["PointNet2.pointnet2_ops.cuda_ops"] = standin
    pops.cuda_ops = standin

    # torch.solve was removed; the reference shims expect old API
    torch.solve = lambda B, A: (torch.linalg.solve(A, B), None)
    # Reference bug neutralized for the comparison: pn2_network.py:63 calls
    # F.dropout(output_feat, p=0.5) WITHOUT training=self.training — the
    # functional default is training=True, so the reference applies 0.5
    # dropout at EVAL time (module.eval() does not reach F.dropout). Our
    # framework disables dropout at eval; comparing against the reference's
    # intent (and getting deterministic outputs) requires patching it off.
    # (The repo's own parity suite does the same, tests/test_network_parity
    # .py; round-5 bisect: encoder+FP stack match to 4e-8, the entire
    # remaining divergence was this dropout.)
    torch.nn.functional.dropout = lambda x, *a, **k: x
    _orig_device = torch.device

    def _device(*a, **k):
        if a and a[0] == "cuda":
            return _orig_device("cpu")
        return _orig_device(*a, **k)

    torch.device = _device
    _orig_get_device = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"

    cwd = os.getcwd()
    argv = sys.argv
    try:
        os.chdir(args.workdir)
        sys.argv = [
            "evaluation_globalSPFN.py",
            "--config_file", os.path.join(args.workdir, "ref_config.yml"),
            "--lowres_dataset", os.path.join(args.workdir, "highres"),
            "--highres_dataset", os.path.join(args.workdir, "highres"),
            "--path_patches", os.path.join(args.workdir, "patches"),
            "--output_folder", out_dir,
            "--evaluation_set", "test",
        ]
        runpy.run_path(
            os.path.join(REFERENCE, "evaluation_globalSPFN.py"),
            run_name="__main__",
        )
    finally:
        os.chdir(cwd)
        sys.argv = argv
        torch.device = _orig_device
        torch.Tensor.get_device = _orig_get_device


def compare_csvs(ref_csv, tpu_csv):
    import csv as _csv

    def load(path, key_col, skip_first_col):
        with open(path, newline="") as f:
            rows = list(_csv.reader(f))
        header = rows[0][1:] if skip_first_col else rows[0]
        out = {}
        for r in rows[1:]:
            vals = r[1:] if skip_first_col else r
            out[vals[0]] = [float(x) for x in vals[1:]]
        return header[1:], out

    # reference: pandas CSV with a leading unnamed index column
    ref_head, ref_rows = load(ref_csv, 0, True)
    tpu_head, tpu_rows = load(tpu_csv, 0, False)
    common = sorted(set(ref_rows) & set(tpu_rows))
    assert common, (ref_rows.keys(), tpu_rows.keys())
    import numpy as np

    ref_m = np.array([ref_rows[k] for k in common])
    tpu_m = np.array([tpu_rows[k] for k in common])
    n = min(ref_m.shape[1], tpu_m.shape[1])
    report = {"n_clouds": len(common), "metrics": {}}
    for j in range(n):
        name = ref_head[j] if j < len(ref_head) else f"col{j}"
        report["metrics"][name] = {
            "reference": float(ref_m[:, j].mean()),
            "cpfn_tpu": float(tpu_m[:, j].mean()),
            "delta": float(tpu_m[:, j].mean() - ref_m[:, j].mean()),
            "max_abs_per_cloud_delta": float(
                np.abs(tpu_m[:, j] - ref_m[:, j]).max()
            ),
        }
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="",
                   help="cpfn_tpu GlobalSPFN checkpoint dir (empty: random "
                        "init — still a valid pipeline-parity check)")
    p.add_argument("--workdir", default=os.path.join(REPO, "data_parity"))
    p.add_argument("--n_clouds", type=int, default=8)
    p.add_argument("--n_points", type=int, default=20000)
    p.add_argument("--skip_ref", action="store_true")
    p.add_argument("--skip_tpu", action="store_true")
    p.add_argument("--out_json", default=os.path.join(
        REPO, "artifacts_r5", "reference_parity.json"))
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(os.path.join(args.workdir, "patches", "0.05"), exist_ok=True)

    env = dict(
        os.environ, JAX_PLATFORMS="cpu", CPFN_PLATFORM="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
        ).strip(),
    )

    # 1. corpus (deterministic; skip if present)
    hr = os.path.join(args.workdir, "highres")
    if not (
        os.path.isdir(hr) and len(os.listdir(hr)) >= args.n_clouds
    ):
        subprocess.run(
            [sys.executable, "-m", "cpfn_tpu.data.gen_corpus",
             "--out", args.workdir, "--n_train", "0",
             "--n_test", str(args.n_clouds),
             "--n_points", str(args.n_points)],
            check=True, cwd=REPO, env=env,
        )

    # 2. export weights (random init if no checkpoint)
    ref_cfg_src = os.path.join(REPO, "configs", "config_globalSPFN.yml")
    pth_dir = os.path.join(args.workdir, "trained_models")
    os.makedirs(pth_dir, exist_ok=True)
    pth = os.path.join(pth_dir, "globalspfn_module.pth")
    if not os.path.isfile(pth):
        cmd = [sys.executable, "-m", "cpfn_tpu.utils.export_torch",
               "--config_file", ref_cfg_src, "--network", "GlobalSPFN",
               "--out", pth]
        if args.checkpoint:
            cmd += ["--checkpoint", args.checkpoint]
        subprocess.run(cmd, check=True, cwd=REPO, env=env)

    # 3. reference config: reuse the reference's own yml, repoint weights
    with open(os.path.join(REFERENCE, "Configs/config_globalSPFN.yml")) as f:
        cfg_text = f.read()
    cfg_text = cfg_text.replace(
        "weights_folder: 'trained_models'",
        f"weights_folder: '{pth_dir}'",
    )
    with open(os.path.join(args.workdir, "ref_config.yml"), "w") as f:
        f.write(cfg_text)
    ds_dir = os.path.join(args.workdir, "Dataset")

    ref_out = os.path.join(args.workdir, "ref_out")
    if not args.skip_ref:
        os.makedirs(ref_out, exist_ok=True)
        run_reference_eval(args, ref_out)

    # 4. our eval on the same clouds / weights / stored point order
    tpu_out = os.path.join(args.workdir, "tpu_out")
    if not args.skip_tpu:
        cmd = [sys.executable, "-m", "cpfn_tpu.eval.eval_global",
               "--config_file", ref_cfg_src,
               "--lowres_dataset", hr, "--highres_dataset", hr,
               "--path_patches", os.path.join(args.workdir, "patches"),
               "--output_folder", tpu_out, "--evaluation_set", "test",
               "--csv_dir", ds_dir, "--skip_features",
               "--stored_point_order"]
        if args.checkpoint:
            cmd += ["--weights", args.checkpoint]
        else:
            cmd += ["--weights", "__random_init__"]
        subprocess.run(cmd, check=True, cwd=REPO, env=env)

    report = compare_csvs(
        os.path.join(ref_out, "Results.csv"),
        os.path.join(tpu_out, "Results.csv"),
    )
    report["checkpoint"] = args.checkpoint or "random-init"
    report["point_order"] = "stored (fixed_order both sides)"
    out = args.out_json
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    miou = report["metrics"].get("mIoU")
    if miou:
        rel = abs(miou["delta"]) / max(abs(miou["reference"]), 1e-9)
        print(f"mIoU rel delta: {rel * 100:.3f}% (bar: <0.5%)")


if __name__ == "__main__":
    main()
