"""Training/eval observability.

Replaces the reference's visdom live plots (`Utils/training_visualisation.py`)
with dependency-free CSV/JSONL metric logs (the reference's sliding-window
smoothing is reproduced for parity of what gets reported) plus stdout
summaries. Eval results tables keep the reference's CSV schema
(`evaluation_localSPFN.py:65`).
"""

from __future__ import annotations

import collections
import csv
import json
import os
import time


class MetricsLogger:
    """Windowed-mean metric logger -> JSONL file + periodic stdout lines.

    window: smoothing window in steps (the reference's `plotting_interval`,
    default 50, training_visualisation.py:10-43).
    """

    def __init__(
        self, log_dir: str | None, name: str, window: int = 50,
        print_interval: int = 100,
    ):
        self.window = window
        self.print_interval = print_interval
        self._series: dict[str, collections.deque] = {}
        self._step = 0
        self._t0 = time.time()
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(
                os.path.join(log_dir, f"{name}.jsonl"), "a", buffering=1
            )

    def log(self, step: int, values: dict) -> None:
        self._step = step
        smoothed = {}
        for k, v in values.items():
            v = float(v)
            q = self._series.setdefault(
                k, collections.deque(maxlen=self.window)
            )
            q.append(v)
            smoothed[k] = sum(q) / len(q)
        if self._fh is not None:
            self._fh.write(
                json.dumps(
                    {
                        "step": step,
                        "time": round(time.time() - self._t0, 3),
                        **{k: float(v) for k, v in values.items()},
                    }
                )
                + "\n"
            )
        if self.print_interval and step % self.print_interval == 0:
            parts = " ".join(f"{k}={v:.4f}" for k, v in smoothed.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self._fh is not None:
            self._fh.close()


class ResultsTable:
    """Accumulates per-cloud eval rows and writes the reference-schema CSV."""

    COLUMNS = [
        "Filename", "mIoU", "Type", "Normal", "Axis", "MeanRes", "StdRes",
        "SkCoverage0.01", "SkCoverage0.02", "PCoverage0.01", "PCoverage0.02",
    ]

    def __init__(self, columns=None):
        self.columns = list(columns or self.COLUMNS)
        self.rows: list[list] = []

    def add(self, *row):
        assert len(row) == len(self.columns)
        self.rows.append(list(row))

    def mean(self, column: str) -> float:
        i = self.columns.index(column)
        vals = [r[i] for r in self.rows if isinstance(r[i], (int, float))]
        return sum(vals) / max(len(vals), 1)

    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(self.columns)
            w.writerows(self.rows)
