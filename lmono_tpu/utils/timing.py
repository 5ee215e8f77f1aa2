"""Per-stage wall-clock timing (reference `TicToc` + times_recorder.txt
parity: `include/utils/TicToc.h:38-61`, `Estimator.cc:374-377,647-648`)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates per-stage wall times; dumps CSV like the reference's
    per-frame recorder files."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.rows = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.rows.append((name, dt))

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def save_csv(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("stage,seconds\n")
            for name, dt in self.rows:
                f.write(f"{name},{dt:.6f}\n")
