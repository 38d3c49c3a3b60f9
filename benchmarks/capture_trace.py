#!/usr/bin/env python
"""Capture a jax.profiler trace of the FFHQ-256 phase mix for analyze_trace.

Builds the flagship model/steps from configs/ffhq256_sg2ada.yaml (exactly
what bench.py measures), warms every program, then traces N executions of
the k=4 cycle + R1 + PPL programs.

    python benchmarks/capture_trace.py [--out /tmp/sbg_trace] [--execs 2]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/sbg_trace")
    p.add_argument("--execs", type=int, default=2)
    args = p.parse_args()

    import bench
    jax, steps, state = bench.build()
    import jax.numpy as jnp

    K = bench.K_STEPS_PER_DISPATCH
    B, RES = bench.BATCH, bench.RES
    rnd = np.random.RandomState(0)
    reals = jnp.asarray(rnd.randn(K, B, RES, RES, 3).astype(np.float32))
    cs = jnp.zeros((K, B, 0), np.float32)
    betas = jnp.full((K,), 0.998, jnp.float32)
    real1, c1 = reals[0], cs[0]

    def mix(state):
        state, _ = steps.d_reg_step(state, real1, c1, c1)
        state, _, _ = steps.cycle_step(state, reals, cs, cs, betas)
        state, _ = steps.g_reg_step(state, c1)
        return state

    state = mix(state)           # compile + warm
    int(np.asarray(state.step))  # hard sync

    with jax.profiler.trace(args.out):
        for _ in range(args.execs):
            state = mix(state)
        int(np.asarray(state.step))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
