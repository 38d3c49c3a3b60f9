"""ADA probability controller (host-side heuristic).

reference: trainers.py:768-771 — every `ada_interval` batches, move p by
sign(E[sign(D(real))] - target) * (batch*interval) / (ada_kimg*1000),
clamped at 0.  The sign statistic comes back from the jitted D step (already
globally averaged by GSPMD), so the controller is pure host arithmetic.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class AdaController:
    def __init__(self, target: float = 0.6, interval: int = 4,
                 kimg: int = 500, batch_size: int = 64):
        self.target = float(target)
        self.interval = int(interval)
        self.kimg = float(kimg)
        self.batch_size = int(batch_size)
        self._signs = []

    def observe(self, sign_real_mean: float) -> None:
        self._signs.append(float(sign_real_mean))

    def adjust(self, current_p: float) -> Optional[float]:
        if not self._signs:
            return None
        mean_sign = float(np.mean(self._signs))
        # Scale by the number of batches actually observed since the last
        # adjustment: equals `interval` in per-batch dispatch mode (the
        # reference's batch*interval), and keeps the same p-ramp *rate* when
        # the trainer dispatches several batches per program
        # (perf.steps_per_dispatch) and adjusts at window granularity.
        n_batches = len(self._signs)
        self._signs = []
        direction = np.sign(mean_sign - self.target)
        step = direction * (self.batch_size * n_batches) / \
            (self.kimg * 1000.0)
        return float(max(current_p + step, 0.0))
