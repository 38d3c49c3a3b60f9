#!/usr/bin/env python
"""Probe: fuse the lazy Greg (PPL) into the steps-per-dispatch cycle.

``StepBuilder(cycle_g_reg_tail=True)`` appends one Greg update to the end
of the k=4 scanned [Dmain+Gmain] program, removing Greg's own dispatch.
At the 2x-wide (channel_base 32768) 256px model this tripped the axon
backend's program-size ceiling (INVALID_ARGUMENT at run time — round-2
note in bench.py); this probe re-tests viability and measures ms/iter at
the current flagship width, against the split form bench.py uses.

    python benchmarks/bench_tail.py [--res 256] [--batch 8] [--cycles 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run(steps, state, jnp, K, CYCLE, batch, res, cycles, tail):
    rnd = np.random.RandomState(0)
    reals = jnp.asarray(rnd.randn(K, batch, res, res, 3).astype(np.float32))
    cs = jnp.zeros((K, batch, 0), np.float32)
    betas = jnp.full((K,), 0.998, jnp.float32)
    real1, c1 = reals[0], cs[0]

    def one_cycle(s):
        for i in range(0, CYCLE, K):
            if i % 16 == 0:
                s, _ = steps.d_reg_step(s, real1, c1, c1)
            s, _, _ = steps.cycle_step(s, reals, cs, cs, betas)
            if not tail:
                s, _ = steps.g_reg_step(s, c1)
        return s

    t0 = time.time()
    state = one_cycle(state)
    int(np.asarray(state.step))
    print(f"  compile+first cycle: {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(cycles):
        state = one_cycle(state)
    int(np.asarray(state.step))
    dt = time.time() - t0
    iters = cycles * CYCLE
    print(f"  {dt / iters * 1000:.1f} ms/iter  "
          f"({iters * batch / dt:.1f} imgs/s)")
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cycles", type=int, default=3)
    args = p.parse_args()

    import jax  # noqa: F401
    import jax.numpy as jnp

    import bench
    bench.RES = args.res
    bench.BATCH = args.batch
    _, steps, state = bench.build()
    from style_big_gan_tpu.train.steps import StepBuilder
    tail_steps = StepBuilder(
        steps.arch, steps.opt_g_tx, steps.opt_d_tx, z_dim=steps.z_dim,
        num_accum_rounds=steps.rounds, g_reg_gain=steps.g_reg_gain,
        d_reg_gain=steps.d_reg_gain, donate=False, cycle_g_reg_tail=True)

    K, CYCLE = bench.K_STEPS_PER_DISPATCH, bench.CYCLE
    print("split form (cycle + separate Greg dispatch):")
    state = run(steps, state, jnp, K, CYCLE, args.batch, args.res,
                args.cycles, tail=False)
    print("fused form (Greg at the cycle tail):")
    try:
        run(tail_steps, state, jnp, K, CYCLE, args.batch, args.res,
            args.cycles, tail=True)
    except Exception as e:  # program-size ceiling shows up at run time
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
