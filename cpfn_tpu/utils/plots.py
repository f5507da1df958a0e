"""Offline training-curve plots from the JSONL metric logs.

Replaces the reference's live visdom dashboards (`training_visualisation.py`)
with artifact plots: one PNG per run with every logged loss series,
sliding-window smoothed like the reference's plotting_interval.

  python -m cpfn_tpu.utils.plots logs/globalspfn.jsonl -o curves.png
"""

from __future__ import annotations

import argparse
import json


def load_series(jsonl_path: str) -> dict[str, tuple[list, list]]:
    series: dict[str, tuple[list, list]] = {}
    with open(jsonl_path) as f:
        for line in f:
            row = json.loads(line)
            step = row.get("step", 0)
            for k, v in row.items():
                if k in ("step", "time"):
                    continue
                xs, ys = series.setdefault(k, ([], []))
                xs.append(step)
                ys.append(float(v))
    return series


def smooth(ys, window: int = 50):
    out, acc = [], []
    for y in ys:
        acc.append(y)
        if len(acc) > window:
            acc.pop(0)
        out.append(sum(acc) / len(acc))
    return out


def plot(jsonl_path: str, out_path: str, window: int = 50) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = load_series(jsonl_path)
    n = len(series)
    fig, axes = plt.subplots(
        (n + 2) // 3, 3, figsize=(14, 3.2 * ((n + 2) // 3)), squeeze=False
    )
    for ax, (name, (xs, ys)) in zip(axes.flat, sorted(series.items())):
        ax.plot(xs, ys, alpha=0.25, lw=0.7)
        ax.plot(xs, smooth(ys, window), lw=1.5)
        ax.set_title(name)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    for ax in axes.flat[n:]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("-o", "--out", default="curves.png")
    p.add_argument("--window", type=int, default=50)
    args = p.parse_args(argv)
    plot(args.jsonl, args.out, args.window)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
