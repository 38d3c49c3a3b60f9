"""Training-stats collection.

Re-design of reference stylegan2ada/torch_utils/training_stats.py (268 LoC of
device counters + NCCL all-reduce).  Under SPMD there is nothing to
all-reduce at collection time: the jitted steps *return* stat scalars that
are already global (XLA all-reduces batch means over the sharded batch), so
the collector is a small host-side moment accumulator with the same
reporting surface: per-name (num, sum, sum-of-squares), `mean()`, `std()`,
jsonl snapshots with the reference's stat names.
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, Mapping, Optional

import numpy as np


class Collector:
    """Accumulate (n, sum, sum_sq) per stat name between ticks
    (reference: training_stats.py:55-99, 234-266)."""

    def __init__(self, regex: str = ".*"):
        self._totals: Dict[str, np.ndarray] = {}
        self._deltas: Dict[str, np.ndarray] = {}

    def report(self, name: str, value: Any) -> None:
        v = np.asarray(value, dtype=np.float64).reshape(-1)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        moments = np.array([v.size, v.sum(), np.square(v).sum()], np.float64)
        self._totals[name] = self._totals.get(name, np.zeros(3)) + moments

    def report_dict(self, stats: Mapping[str, Any]) -> None:
        for k, v in stats.items():
            self.report(k, v)

    def update(self) -> None:
        """Snapshot deltas since last update (a 'tick')."""
        self._deltas = {k: v.copy() for k, v in self._totals.items()}
        self._totals = {}

    def names(self):
        return sorted(self._deltas.keys())

    def num(self, name: str) -> int:
        d = self._deltas.get(name)
        return int(d[0]) if d is not None else 0

    def mean(self, name: str, default: float = 0.0) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] == 0:
            return default
        return float(d[1] / d[0])

    def std(self, name: str) -> float:
        d = self._deltas.get(name)
        if d is None or d[0] < 1:
            return 0.0
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)} for name in self.names()}

    def default_collector_jsonl(self, timestamp: Optional[float] = None) -> str:
        """One stats.jsonl line (reference: trainers.py:855-858 format)."""
        fields = {name: self.as_dict()[name] for name in self.names()}
        fields["timestamp"] = timestamp if timestamp is not None else time.time()
        return json.dumps(fields)
