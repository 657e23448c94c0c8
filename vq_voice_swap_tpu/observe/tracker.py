"""Windowed per-timestep-quantile loss tracking.

Capability parity with /root/reference/vq_voice_swap/loss_tracker.py:7-36:
buckets per-element losses into timestep quantiles and reports the windowed
mean of the most recent ``avg_size`` entries per bucket. Inputs arrive as
device arrays once per step (a single small D2H copy, vs. the reference's
per-element Python loop).
"""

from collections import deque
from typing import Dict, List, Optional

import numpy as np

__all__ = ["LossTracker"]


class LossTracker:
    def __init__(self, quantiles: int = 4, avg_size: int = 1000,
                 prefix: str = ""):
        self.quantiles = quantiles
        self.avg_size = avg_size
        self.prefix = prefix
        self.history: List[deque] = [
            deque(maxlen=avg_size) for _ in range(quantiles)
        ]

    def add(self, ts, losses) -> None:
        # float64: in f32 the 1e-8 epsilon rounds away and ts==1.0 would map
        # to a nonexistent bucket (reference loss_tracker.py uses Python
        # floats, i.e. f64 semantics).
        ts = np.asarray(ts, np.float64).reshape(-1)
        losses = np.asarray(losses).reshape(-1)
        buckets = (ts * (self.quantiles - 1e-8)).astype(np.int64)
        for q in range(self.quantiles):
            sel = losses[buckets == q]
            if sel.size:
                self.history[q].extend(sel.tolist())

    def quantile_averages(self) -> List[Optional[float]]:
        return [
            float(np.mean(h)) if len(h) else None for h in self.history
        ]

    def log_dict(self) -> Dict[str, float]:
        return {
            f"{self.prefix}q{i}": avg
            for i, avg in enumerate(self.quantile_averages())
            if avg is not None
        }
