#!/usr/bin/env python
"""In-program decomposition of the SG2 256px train steps.

Per-dispatch latency through the axon tunnel (~1-4 ms) swamps single-op
timings (see bench_convs.py), so every probe here runs K iterations inside
ONE jitted program via lax.scan and reports per-iteration device time.
This is the data source for the d_step/g_step optimization targets and the
roofline proof in BASELINE.md.

    python benchmarks/bench_decomp.py [--res 256] [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def scan_time(fn, *args, k=12, warmup=1):
    """Device time per iteration of fn, amortized inside one program.

    The loop body's inputs are perturbed by the carry scalar so XLA cannot
    hoist fn out of the scan as loop-invariant (it would otherwise: the
    first version of this probe reported a 12 ms G forward as 1.3 ms).
    """
    import jax
    import jax.numpy as jnp

    def many(args):
        def body(c, _):
            s0, a = c
            # make every float input depend on the carry -> not hoistable
            a_dep = jax.tree_util.tree_map(
                lambda x: x + s0.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            out = fn(*a_dep)
            # fold output into a scalar carry so nothing is DCE'd
            s = jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)) * 1e-30,
                out, s0)
            return (s, a), None

        (s, _), _ = jax.lax.scan(body, (jnp.float32(0.0), args), None,
                                 length=k)
        return s

    j = jax.jit(many)
    for _ in range(warmup + 1):
        r = j(args)
    float(r)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        r = j(args)
    float(r)
    return (time.time() - t0) / reps / k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    n, res = args.batch, args.res

    import jax
    import jax.numpy as jnp

    import bench
    bench.RES = res
    bench.BATCH = n
    jax_mod, steps, state = bench.build()
    arch = steps.arch
    rnd = np.random.RandomState(0)
    real16 = jnp.asarray(rnd.randn(2 * n, res, res, 3).astype(np.float32))
    real8 = real16[:n]
    c16 = jnp.zeros((2 * n, 0), jnp.float32)
    c8 = jnp.zeros((n, 0), jnp.float32)
    key = jax.random.PRNGKey(0)
    g_vars = {"params": state.params_g, **state.g_state}
    d_vars = {"params": state.params_d, **state.d_state}
    z8 = jnp.asarray(rnd.randn(n, 512).astype(np.float32))

    res_ms = {}

    def probe(name, fn, *a, k=12):
        res_ms[name] = scan_time(fn, *a, k=k) * 1e3
        print(f"{name:>28}: {res_ms[name]:8.2f} ms")

    # --- pieces ---
    probe("G fwd b8", lambda z: arch.run_G(g_vars, z, None, key,
                                           update_emas=False)[0], z8)

    def d_fwd(img, c):
        logits, _ = arch.run_D(d_vars, img, c, key, state.ada_p,
                               update_stats=False)
        return logits

    probe("ADA+D fwd b16", d_fwd, real16, c16)
    probe("ADA+D fwd b8", d_fwd, real8, c8)

    from style_big_gan_tpu.augment.ada import AUGPIPE_SPECS, AugmentPipe
    pipe = AugmentPipe(**AUGPIPE_SPECS["bgc"])
    probe("ADA fwd b16", lambda im: pipe(im, key, 0.3), real16)

    def d_wgrad(img, c):
        return jax.grad(
            lambda pd: jnp.sum(d_fwd_p(pd, img, c)))(state.params_d)

    def d_fwd_p(pd, img, c):
        logits, _ = arch.run_D({"params": pd, **state.d_state}, img, c,
                               key, state.ada_p, update_stats=False)
        return logits.astype(jnp.float32)

    probe("ADA+D fwd+wgrad b16", d_wgrad, real16, c16)

    def g_fwd_bwd(z):
        def loss(pg):
            img, _ = arch.run_G({"params": pg, **state.g_state}, z, None,
                                key, update_emas=False)
            logits, _ = arch.run_D(d_vars, img, c8, key, state.ada_p,
                                   update_stats=False)
            return jnp.sum(jax.nn.softplus(-logits.astype(jnp.float32)))
        return jax.grad(loss)(state.params_g)

    probe("Gmain fwd+bwd b8", g_fwd_bwd, z8, k=8)

    # --- full steps (as dispatched), for reference ---
    def full(step_fn, *extra):
        # fresh buffers each time: the steps donate their inputs, so the
        # global `state` must never be passed in directly
        s = jax.tree_util.tree_map(jnp.copy, state)
        def run(s):
            out, _ = step_fn(s, *extra)
            return out
        for _ in range(2):
            s = run(s)
        int(np.asarray(s.step))
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            s = run(s)
        int(np.asarray(s.step))
        return (time.time() - t0) / iters * 1e3

    print(f"{'d_step (2 dispatches)':>28}: "
          f"{full(steps.d_step, real8, c8, c8):8.2f} ms")
    print(f"{'g_step':>28}: "
          f"{full(lambda s, c: steps.g_step(s, c, 0.998), c8):8.2f} ms")
    print(f"{'d_reg_step (R1)':>28}: "
          f"{full(steps.d_reg_step, real8, c8, c8):8.2f} ms")
    print(f"{'g_reg_step (PPL)':>28}: "
          f"{full(steps.g_reg_step, c8):8.2f} ms")

    # --- in-program matmul peak ---
    a = jnp.asarray(rnd.randn(4096, 4096).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rnd.randn(4096, 4096).astype(np.float32), jnp.bfloat16)
    t = scan_time(lambda a, b: (a @ b).astype(jnp.bfloat16), a, b, k=24)
    fl = 2 * 4096 ** 3
    print(f"{'4096^3 bf16 matmul (scan)':>28}: {t*1e3:8.2f} ms  "
          f"{fl/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
