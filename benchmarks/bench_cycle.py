#!/usr/bin/env python
"""Experiment: k training iterations (Dmain+Gmain) inside ONE TPU program.

bench_decomp.py shows ~18 ms/iter (~16%) of the 256px cycle is per-dispatch
latency through the axon tunnel (d_step alone is 2 dispatches).  The
TPU-idiomatic fix is MaxText-style steps-per-loop: lax.scan the per-iteration
phase work (G rollout -> D update -> G update) inside one jitted program and
dispatch once per k iterations.  This probes compile viability (the round-1
monolithic d_step hit a program-size ceiling at 256px) and the per-iter time.

    python benchmarks/bench_cycle.py [--res 256] [--batch 8] [--k 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args()
    n, res, k = args.batch, args.res, args.k

    import jax
    import jax.numpy as jnp

    import bench
    bench.RES = res
    bench.BATCH = n
    _, steps, state = bench.build()

    rnd = np.random.RandomState(0)
    reals = jnp.asarray(rnd.randn(k, n, res, res, 3).astype(np.float32))
    c = jnp.zeros((n, 0), jnp.float32)

    def one_iter(s, real):
        s, fake = steps._rollout(s, c)
        s, d_stats = steps._d_update(s, fake, real, c, c)
        s, g_stats = steps._g_step(s, c, jnp.float32(0.998))
        return s, {**d_stats, **g_stats}

    def cycle(s, reals):
        return jax.lax.scan(one_iter, s, reals)

    jcycle = jax.jit(cycle, donate_argnums=(0,))

    t0 = time.time()
    state2, stats = jcycle(jax.tree_util.tree_map(jnp.copy, state), reals)
    int(np.asarray(state2.step))
    print(f"compile+first run: {time.time()-t0:.1f}s")

    s = state2
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        s, stats = jcycle(s, reals)
    int(np.asarray(s.step))
    dt = (time.time() - t0) / reps
    per_iter = dt / k * 1e3
    print(f"cycle k={k}: {dt*1e3:8.2f} ms -> {per_iter:6.2f} ms/iter "
          f"({n/ (per_iter/1e3):6.1f} imgs/s d+g only)")
    print({kk: float(v[-1]) for kk, v in stats.items() if "loss" in kk.lower()})


if __name__ == "__main__":
    main()
