"""Cascade-vs-baseline quality comparison over eval artifacts.

Joins the CSVs written by `eval_local` (Results.csv, Results_Stats.csv) and
`eval_baseline` (Results_baseline.csv, Results_Stats_baseline.csv) in one
output folder and prints the reference's headline comparison
(`/root/reference/README.md:19`, `evaluation_localSPFN.py:150-165`): overall
metric means plus the small-primitive mIoU slice where the cascade's gains
concentrate (primitives covering < scale * n_highres points, matched
instances only).

  python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out \
      --scale 0.05 --n_highres 100000
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def _read_csv(path: str) -> tuple[list[str], list[list[str]]]:
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def _metric_means(path: str) -> dict[str, float]:
    header, rows = _read_csv(path)
    out = {}
    for i, col in enumerate(header):
        if col == "Filename":
            continue
        vals = [float(r[i]) for r in rows]
        out[col] = sum(vals) / max(len(vals), 1)
    return out


def _small_primitive_miou(
    path: str, max_points: float
) -> tuple[float, int, float, int]:
    """(mean mIoU over matched small primitives, their count,
    mean over ALL small primitives counting unmatched as 0, total count).

    The reference accumulates per-primitive rows with the instance size and
    the post-matching validity mask (`evaluation_localSPFN.py:144-151`); the
    unmatched-as-zero variant is the stricter detection-style score.
    """
    header, rows = _read_csv(path)
    i_mask = header.index("Mask")
    i_np = header.index("Nb Points")
    i_miou = header.index("mIoU")
    matched, all_small = [], []
    for r in rows:
        if float(r[i_np]) >= max_points:
            continue
        miou = float(r[i_miou])
        m = float(r[i_mask]) > 0
        all_small.append(miou if m else 0.0)
        if m:
            matched.append(miou)
    n_m, n_a = len(matched), len(all_small)
    return (
        sum(matched) / max(n_m, 1), n_m,
        sum(all_small) / max(n_a, 1), n_a,
    )


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--output_folder", default="data_synth2/eval_out")
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--n_highres", type=int, default=100_000,
                   help="high-res cloud size defining 'small' primitives")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line instead of the table")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    d = args.output_folder
    cascade = _metric_means(os.path.join(d, "Results.csv"))
    baseline = _metric_means(os.path.join(d, "Results_baseline.csv"))
    thr = args.scale * args.n_highres
    sc = _small_primitive_miou(os.path.join(d, "Results_Stats.csv"), thr)
    sb = _small_primitive_miou(
        os.path.join(d, "Results_Stats_baseline.csv"), thr
    )
    report = {
        "overall": {
            k: {"baseline": baseline[k], "cascade": cascade[k],
                "delta": cascade[k] - baseline[k]}
            for k in cascade
            if k in baseline
        },
        "small_primitives": {
            "threshold_points": thr,
            "baseline_matched_miou": sb[0], "baseline_n_matched": sb[1],
            "cascade_matched_miou": sc[0], "cascade_n_matched": sc[1],
            "baseline_all_miou": sb[2], "cascade_all_miou": sc[2],
            "n_small_total": sc[3],
        },
    }
    if args.json:
        print(json.dumps(report))
        return report
    print(f"{'metric':<16}{'baseline':>10}{'cascade':>10}{'delta':>10}")
    for k, v in report["overall"].items():
        print(
            f"{k:<16}{v['baseline']:>10.4f}{v['cascade']:>10.4f}"
            f"{v['delta']:>+10.4f}"
        )
    s = report["small_primitives"]
    print(
        f"\nsmall primitives (< {thr:.0f} pts, {s['n_small_total']} total):"
    )
    print(
        f"  matched-only mIoU: baseline {s['baseline_matched_miou']:.4f} "
        f"({s['baseline_n_matched']} matched) vs cascade "
        f"{s['cascade_matched_miou']:.4f} ({s['cascade_n_matched']} matched)"
    )
    print(
        f"  unmatched-as-zero mIoU: baseline {s['baseline_all_miou']:.4f} "
        f"vs cascade {s['cascade_all_miou']:.4f}"
    )
    return report


if __name__ == "__main__":
    main()
