#!/usr/bin/env python
"""Per-shape attainable conv rates for the SHIPPED paper256 ladder.

The batch-8 trace (BASELINE.md round-5) shows the full phase mix executing
its convolution fusions at ~73 TF/s — well under the 109.6 TF/s in-program
matmul rate.  This probe answers whether that gap is *implementation* slack
or *shape-inherent*: it times every (res, cin, cout) 3x3 conv of the
paper256-width (fmaps=0.5, channel_base=16384) G/D ladder standalone —
forward, input-gradient (dgrad) and weight-gradient (wgrad) forms — inside
ONE scanned program (so the axon tunnel's per-dispatch floor cannot inflate
small shapes), and reports achieved TFLOP/s per shape plus the
FLOP-weighted ladder rate.  If the model's in-trace conv rate matches the
FLOP-weighted standalone rate, the conv stack is at its shape-attainable
ceiling and further gains require different shapes (bigger batch / wider
channels), not better scheduling.

Reference context: the reference's custom CUDA kernels exist for the same
reason (upfirdn2d.cu:205-341) — small-shape efficiency.

    python benchmarks/bench_convs_attain.py [--batch 8] [--iters 30]
"""

from __future__ import annotations

import argparse

import numpy as np

from _util import sync


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--res", type=int, default=0,
                   help="only run shapes at this resolution (0 = all)")
    args = p.parse_args()
    n = args.batch

    import time

    import jax
    import jax.numpy as jnp

    # paper256 ladder: fmaps=0.5 -> channel_base 16384, channel_max 512
    # (reference stylegan2ada/train.py:157,178): res -> channels(res).
    def ch(res):
        return min(16384 // res, 512)

    # G synthesis per res r (8..256): conv0 ch(r/2)->ch(r) (up), conv1
    # ch(r)->ch(r); D per res r: conv0 ch(r)->ch(r), conv1 ch(r)->ch(r*2)
    # (down).  Stride-1 square shapes dominate; up/down FIR passes are
    # measured separately in bench_ada/bench_ops.  D runs batch 2n
    # (real+fake concatenated) for fwd+bwd; G runs batch n.
    shapes = []
    for r in (8, 16, 32, 64, 128, 256):
        shapes.append((r, ch(r), ch(r), n))        # G conv1 / D conv0 @ n
        shapes.append((r, ch(r), ch(r), 2 * n))    # D batch 2n
        if ch(r // 2) != ch(r):
            shapes.append((r, ch(r // 2), ch(r), n))

    dn = ("NHWC", "HWIO", "NHWC")
    rnd = np.random.RandomState(0)

    def run_case(res, ci, co, b, form):
        x = jnp.asarray(rnd.randn(b, res, res, ci).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rnd.randn(3, 3, ci, co).astype(np.float32) * 0.05,
                        jnp.bfloat16)

        def fwd(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn)

        if form == "fwd":
            f = fwd
            fa = (x, w)
        elif form == "dgrad":
            y = fwd(x, w)
            f = lambda y, w: jax.vjp(lambda x_: fwd(x_, w), x)[1](y)[0]
            fa = (y, w)
        else:  # wgrad
            y = fwd(x, w)
            f = lambda x, y: jax.vjp(lambda w_: fwd(x, w_), w)[1](y)[0]
            fa = (x, y)

        # Amortize inside one program: scan with a carry-dependent input
        # so XLA cannot hoist the conv out of the loop.  The operands are
        # jit ARGUMENTS, not closure constants — closured concrete arrays
        # get baked into the HLO and blow the axon remote-compile request
        # body limit at 256px (HTTP 413).
        def body(c, _, a0, a1):
            out = f(a0 + c.astype(jnp.bfloat16) * 0, a1)
            return c + 1, jnp.float32(out.reshape(-1)[0])

        @jax.jit
        def prog(a0, a1):
            _, ys = jax.lax.scan(
                lambda c, x: body(c, x, a0, a1), jnp.int32(0), None,
                length=args.iters)
            return ys

        out = prog(*fa)
        sync(out)
        t0 = time.time()
        out = prog(*fa)
        sync(out)
        t = (time.time() - t0) / args.iters
        fl = 2 * b * res * res * 9 * ci * co
        return t, fl

    print(f"paper256 ladder, batch {n} (D forms at 2n={2*n}), "
          f"{args.iters} in-program iters")
    tot_t = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0}
    tot_f = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0}
    for res, ci, co, b in shapes:
        if args.res and res != args.res:
            continue
        row = f"3x3 {res:>4}px {ci:>3}->{co:<3} b{b:<3}"
        for form in ("fwd", "dgrad", "wgrad"):
            t, fl = run_case(res, ci, co, b, form)
            tot_t[form] += t
            tot_f[form] += fl
            row += f"  {form} {t*1e3:6.2f}ms {fl/t/1e12:5.1f}TF/s"
        print(row)
    for form in ("fwd", "dgrad", "wgrad"):
        rate = tot_f[form] / tot_t[form] / 1e12
        print(f"FLOP-weighted ladder rate [{form}]: {rate:6.1f} TF/s "
              f"({tot_t[form]*1e3:.2f} ms total)")
    allr = sum(tot_f.values()) / sum(tot_t.values()) / 1e12
    print(f"FLOP-weighted ladder rate [all forms]: {allr:6.1f} TF/s")


if __name__ == "__main__":
    main()
