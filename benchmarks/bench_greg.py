#!/usr/bin/env python
"""Time ONLY the g_reg (PPL) program of the flagship config — the fast
iteration loop for attacking its HBM-bound vjp remainder (BASELINE.md r3).

    python benchmarks/bench_greg.py [--iters 12]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()

    import bench
    jax, steps, state = bench.build()
    import jax.numpy as jnp

    c1 = jnp.zeros((bench.BATCH, 0), np.float32)
    state, _ = steps.g_reg_step(state, c1)          # compile
    int(np.asarray(state.step))
    t0 = time.time()
    for _ in range(args.iters):
        state, stats = steps.g_reg_step(state, c1)
    int(np.asarray(state.step))
    dt = (time.time() - t0) / args.iters
    print(f"g_reg(PPL): {dt * 1e3:.2f} ms   "
          f"(stats: { {k: float(v) for k, v in stats.items()} })")


if __name__ == "__main__":
    main()
