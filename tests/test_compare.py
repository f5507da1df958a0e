"""eval.compare: cascade-vs-baseline report over Results*.csv artifacts."""

import csv
import os

from cpfn_tpu.eval.compare import main as compare_main

HEADER = [
    "Filename", "mIoU", "Type", "Normal", "Axis", "MeanRes", "StdRes",
    "SkCoverage0.01", "SkCoverage0.02", "PCoverage0.01", "PCoverage0.02",
]
STATS_HEADER = ["Filename", "Primitive Id", "Mask", "Nb Points", "mIoU"]


def _write(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_compare_report(tmp_path):
    d = str(tmp_path)
    pad = [0.9, 0.1, 0.1, 0.01, 0.01, 0.8, 0.9, 0.7, 0.8]
    _write(os.path.join(d, "Results.csv"), HEADER,
           [["a", 0.6] + pad, ["b", 0.8] + pad])
    _write(os.path.join(d, "Results_baseline.csv"), HEADER,
           [["a", 0.5] + pad, ["b", 0.5] + pad])
    # one large primitive (ignored by the small slice), two small ones:
    # cascade matches both (0.9, 0.5); baseline matches one (0.4)
    _write(os.path.join(d, "Results_Stats.csv"), STATS_HEADER,
           [["a", 0, 1.0, 50000, 0.95], ["a", 1, 1.0, 2000, 0.9],
            ["b", 0, 1.0, 1000, 0.5]])
    _write(os.path.join(d, "Results_Stats_baseline.csv"), STATS_HEADER,
           [["a", 0, 1.0, 50000, 0.95], ["a", 1, 1.0, 2000, 0.4],
            ["b", 0, 0.0, 1000, 0.0]])
    rep = compare_main(
        ["--output_folder", d, "--scale", "0.05", "--n_highres", "100000",
         "--json"]
    )
    assert abs(rep["overall"]["mIoU"]["baseline"] - 0.5) < 1e-9
    assert abs(rep["overall"]["mIoU"]["cascade"] - 0.7) < 1e-9
    assert abs(rep["overall"]["mIoU"]["delta"] - 0.2) < 1e-9
    s = rep["small_primitives"]
    assert s["threshold_points"] == 5000
    assert s["n_small_total"] == 2
    assert s["cascade_n_matched"] == 2 and s["baseline_n_matched"] == 1
    assert abs(s["cascade_matched_miou"] - 0.7) < 1e-9
    assert abs(s["baseline_matched_miou"] - 0.4) < 1e-9
    # unmatched-as-zero: baseline (0.4 + 0)/2
    assert abs(s["baseline_all_miou"] - 0.2) < 1e-9
