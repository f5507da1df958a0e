"""Training-curve plots from the JSONL metric logs.

Replaces the reference's live visdom dashboards (`training_visualisation.py`)
with artifact plots — one PNG per run with every logged loss series,
sliding-window smoothed like the reference's plotting_interval — plus a
`--watch` mode that re-renders the PNG and an HTML auto-refresh page as the
log grows (the live-dashboard equivalent, no server dependency):

  python -m cpfn_tpu.utils.plots logs/globalspfn.jsonl -o curves.png
  python -m cpfn_tpu.utils.plots logs/globalspfn.jsonl -o curves.png --watch
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


_WATCH_HTML = """<!doctype html><title>cpfn_tpu training</title>
<meta http-equiv="refresh" content="{interval}">
<body style="margin:0;background:#111"><img src="{png}" style="width:100%">
</body>"""


def watch(jsonl_path: str, out_path: str, window: int, interval: float) -> None:
    """Re-render the plot whenever the log grows; also writes an HTML page
    next to the PNG that auto-refreshes (open it in any browser)."""
    import os
    import time

    html_path = out_path.rsplit(".", 1)[0] + ".html"
    with open(html_path, "w") as f:
        f.write(_WATCH_HTML.format(
            interval=max(1, int(interval)), png=os.path.basename(out_path)
        ))
    print(f"watching {jsonl_path} -> {out_path} (page: {html_path})",
          flush=True)
    last_size = -1
    while True:
        try:
            size = os.path.getsize(jsonl_path)
        except OSError:
            size = -1
        if size != last_size and size > 0:
            try:
                plot(jsonl_path, out_path, window)
                last_size = size
                print(f"re-rendered at {size} bytes", flush=True)
            except (json.JSONDecodeError, ValueError):
                pass  # partial trailing line; retry next tick
        time.sleep(interval)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("-o", "--out", default="curves.png")
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--watch", action="store_true",
                   help="keep re-rendering as the log grows")
    p.add_argument("--interval", type=float, default=10.0,
                   help="--watch poll/refresh seconds")
    args = p.parse_args(argv)
    if args.watch:
        watch(args.jsonl, args.out, args.window, args.interval)
        return
    plot(args.jsonl, args.out, args.window)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
