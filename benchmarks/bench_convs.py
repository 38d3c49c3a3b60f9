#!/usr/bin/env python
"""Roofline microbenchmark of the StyleGAN2 G/D conv shapes at 256px.

Times each (res, cin, cout) 3x3 conv of the synthesis/discriminator ladder
standalone in bf16 NHWC, plus layout/dtype variants, and reports achieved
TFLOP/s — so conv-stack optimization targets the shapes that are actually
far from roofline.

    python benchmarks/bench_convs.py [--batch 8]
"""

from __future__ import annotations

import argparse

import numpy as np

from _util import timeit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    n = args.batch

    import jax
    import jax.numpy as jnp

    # SG2 channel ladder at 256px, channel_base=32768, channel_max=512
    # (models/stylegan2.py): res -> channels.
    ladder = [(4, 512), (8, 512), (16, 512), (32, 512),
              (64, 512), (128, 256), (256, 128)]

    rnd = np.random.RandomState(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn)

    total = 0.0
    for res, c in ladder:
        x = jnp.asarray(rnd.randn(n, res, res, c).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rnd.randn(3, 3, c, c).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        t = timeit(jax.jit(conv), x, w)
        fl = 2 * n * res * res * 9 * c * c
        total += t
        print(f"3x3 {res:>4}px c={c:<4} bf16 NHWC: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TFLOP/s")

    # D's downsample convs: rectangular (cin != cout), stride 2 — different
    # lowering than the square stride-1 shapes above.
    for res, ci, co in [(256, 128, 256), (128, 256, 512), (64, 512, 512),
                        (32, 512, 512)]:
        x = jnp.asarray(rnd.randn(n, res, res, ci).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rnd.randn(3, 3, ci, co).astype(np.float32) * 0.05,
                        jnp.bfloat16)

        def down(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME", dimension_numbers=dn)
        t = timeit(jax.jit(down), x, w)
        fl = 2 * n * (res // 2) * (res // 2) * 9 * ci * co
        print(f"3x3s2 {res:>3}px {ci}->{co:<4} bf16: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TFLOP/s")

    # The same at fp32 for the top block (ToRGB etc).
    res, c = 256, 128
    x32 = jnp.asarray(rnd.randn(n, res, res, c).astype(np.float32))
    w32 = jnp.asarray(rnd.randn(3, 3, c, c).astype(np.float32) * 0.05)
    t = timeit(jax.jit(conv), x32, w32)
    fl = 2 * n * res * res * 9 * c * c
    print(f"3x3 {res:>4}px c={c:<4} f32  NHWC: {t*1e3:7.3f} ms  "
          f"{fl/t/1e12:6.1f} TFLOP/s")

    # Big matmul sanity roofline.
    a = jnp.asarray(rnd.randn(4096, 4096).astype(np.float32), jnp.bfloat16)
    t = timeit(jax.jit(lambda a: a @ a), a)
    print(f"4096^3 matmul bf16:        {t*1e3:7.3f} ms  "
          f"{2*4096**3/t/1e12:6.1f} TFLOP/s")
    a32 = jnp.asarray(rnd.randn(4096, 4096).astype(np.float32))
    t = timeit(jax.jit(lambda a: a @ a), a32)
    print(f"4096^3 matmul f32:         {t*1e3:7.3f} ms  "
          f"{2*4096**3/t/1e12:6.1f} TFLOP/s")

    # HBM bandwidth sanity.
    big = jnp.asarray(rnd.randn(64, 1024, 1024).astype(np.float32))
    t = timeit(jax.jit(lambda x: x + 1.0), big)
    print(f"copy 256MB:                {t*1e3:7.3f} ms  "
          f"{2*big.nbytes/t/1e9:6.0f} GB/s")

    print(f"\nladder total fwd conv time: {total*1e3:.2f} ms "
          f"(x2 convs/block in G)")


if __name__ == "__main__":
    main()
