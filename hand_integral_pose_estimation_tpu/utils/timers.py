"""tic/toc timers with warmup (equivalent of common/timer.py:20-38).

The reference wires three of these (total / GPU / read) into its train loop
(common/base.py:42-44, main/train.py:117-125); the read/compute split metric
is kept because the host input pipeline was the reference's bottleneck.
"""

from __future__ import annotations

import time


class Timer:
    """Running average that ignores the first `warmup` measurements."""

    def __init__(self, warmup: int = 10):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self.calls = 0
        self.total_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0
        self._start = 0.0

    def tic(self):
        self._start = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self._start
        self.calls += 1
        if self.calls <= self.warmup:
            # warmup: report instantaneous time, don't pollute the average
            self.average_time = self.diff
            return self.diff if not average else self.average_time
        self.total_time += self.diff
        self.average_time = self.total_time / (self.calls - self.warmup)
        return self.average_time if average else self.diff
