#!/usr/bin/env python
"""Per-phase timings of the SG2-ADA FFHQ-256 train step mix on the local chip.

Times each jitted step of the lazy-regularization cycle separately
(d_step, d_reg(R1), g_step, g_reg(PPL)) plus the ADA pipe forward, so the
next kernel target is chosen from data, not guesses.

    python benchmarks/bench_phases.py [--res 256] [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


from _util import sync as _sync
from _util import timeit as _timeit


def timeit(fn, *args, warmup=2, iters=8):
    return _timeit(fn, *args, warmup=warmup, iters=iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import bench
    bench.RES = args.res
    bench.BATCH = args.batch
    import jax
    import jax.numpy as jnp

    jax_mod, steps, state = bench.build()
    rnd = np.random.RandomState(0)
    real = jnp.asarray(rnd.randn(args.batch, args.res, args.res, 3)
                       .astype(np.float32))
    c = jnp.zeros((args.batch, 0), np.float32)

    # steps.d_step mutates state (donated); rebuild state stream per phase by
    # chaining through — time with the state returned each call.
    results = {}

    def chain(fn, *extra, name):
        nonlocal state
        # capture state flow: wrapper returns new state and we time that.
        def run(s):
            out = fn(s, *extra)
            return out
        # warmup + timing with explicit state threading (donation-safe)
        s = state
        for _ in range(2):
            s, _ = run(s)
        _sync(s.step)
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            s, _ = run(s)
        _sync(s.step)
        results[name] = (time.time() - t0) / iters
        state = s

    chain(steps.d_step, real, c, c, name="d_step")
    chain(steps.d_reg_step, real, c, c, name="d_reg(R1)")
    chain(lambda s, cc: steps.g_step(s, cc, 0.998), c, name="g_step")
    chain(steps.g_reg_step, c, name="g_reg(PPL)")

    # ADA pipe forward alone.
    from style_big_gan_tpu.augment.ada import AUGPIPE_SPECS, AugmentPipe
    pipe = AugmentPipe(**AUGPIPE_SPECS["bgc"])
    key = jax.random.PRNGKey(0)
    pfn = jax.jit(lambda im, k: pipe(im, k, 0.3))
    results["ada_fwd"] = timeit(pfn, real, key)

    # G fwd alone (rollout).
    results["rollout(G fwd)"] = timeit(steps._rollout_jit, state, c)

    cycle = (16 * (results["d_step"] + results["g_step"]) +
             results["d_reg(R1)"] + 4 * results["g_reg(PPL)"])
    for k, v in results.items():
        print(f"{k:>16}: {v * 1e3:8.2f} ms")
    print(f"{'cycle(16)':>16}: {cycle * 1e3:8.2f} ms  -> "
          f"{16 * args.batch / cycle:.2f} imgs/sec/chip")


if __name__ == "__main__":
    main()
