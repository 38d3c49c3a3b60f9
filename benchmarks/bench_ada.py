#!/usr/bin/env python
"""Microbenchmarks of the ADA pipe internals at 256px: where do 69 ms go?

    python benchmarks/bench_ada.py [--batch 8] [--res 256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


from _util import sync as _sync, timeit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--res", type=int, default=256)
    args = p.parse_args()
    n, s = args.batch, args.res

    import jax
    import jax.numpy as jnp
    from style_big_gan_tpu.augment.ada import (AUGPIPE_SPECS, AugmentPipe,
                                               bilinear_sample)
    from style_big_gan_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

    rnd = np.random.RandomState(0)
    img = jnp.asarray(rnd.randn(n, s, s, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)

    pipe = AugmentPipe(**AUGPIPE_SPECS["bgc"])
    res = {}

    res["full bgc"] = timeit(jax.jit(lambda im, k: pipe(im, k, 0.3)),
                             img, key)
    # geometry only
    geo = AugmentPipe(scale=1, rotate=1, aniso=1, xfrac=1)
    res["geom only"] = timeit(jax.jit(lambda im, k: geo(im, k, 0.3)),
                              img, key)
    blit = AugmentPipe(xflip=1, rotate90=1, xint=1)
    res["blit only"] = timeit(jax.jit(lambda im, k: blit(im, k, 0.3)),
                              img, key)
    col = AugmentPipe(brightness=1, contrast=1, lumaflip=1, hue=1,
                      saturation=1)
    res["color only"] = timeit(jax.jit(lambda im, k: col(im, k, 0.3)),
                               img, key)

    # Warp pieces at the shapes _execute_geom uses.
    hz = geo.hz_geom
    taps = int(hz.shape[0])
    margin = min(s // 4, 64) + taps
    pad = jnp.asarray(rnd.randn(n, s + 2 * margin, s + 2 * margin, 3)
                      .astype(np.float32))
    res[f"pad reflect {s}->{s+2*margin}"] = timeit(
        jax.jit(lambda x: jnp.pad(x, ((0, 0), (margin, margin),
                                      (margin, margin), (0, 0)),
                                  mode="reflect")), img)
    up_fn = jax.jit(lambda x: upfirdn2d(
        x, hz, up=2, padding=(taps // 2, (taps - 1) // 2,
                              taps // 2, (taps - 1) // 2), impl="shift"))
    res[f"up2x shift {pad.shape[1]}"] = timeit(up_fn, pad)
    up = up_fn(pad)

    gx = jnp.asarray(rnd.rand(n, 2 * s, 2 * s).astype(np.float32)) * \
        (up.shape[2] - 2)
    gy = jnp.asarray(rnd.rand(n, 2 * s, 2 * s).astype(np.float32)) * \
        (up.shape[1] - 2)
    res[f"gather warp {up.shape[1]}->{2*s}"] = timeit(
        jax.jit(bilinear_sample), up, gx, gy)

    warped = bilinear_sample(up, gx, gy)
    down_fn = jax.jit(lambda x: upfirdn2d(
        x, hz, down=2, padding=((taps - 1) // 2, (taps - 2) // 2,
                                (taps - 1) // 2, (taps - 2) // 2),
        impl="shift"))
    res[f"down2x shift {warped.shape[1]}"] = timeit(down_fn, warped)

    # Same resamples with the conv impl for comparison.
    res[f"up2x conv {pad.shape[1]}"] = timeit(
        jax.jit(lambda x: upfirdn2d(
            x, hz, up=2, padding=(taps // 2, (taps - 1) // 2,
                                  taps // 2, (taps - 1) // 2),
            impl="conv")), pad)
    res[f"down2x conv {warped.shape[1]}"] = timeit(
        jax.jit(lambda x: upfirdn2d(
            x, hz, down=2, padding=((taps - 1) // 2, (taps - 2) // 2,
                                    (taps - 1) // 2, (taps - 2) // 2),
            impl="conv")), warped)

    # Backward of the full pipe wrt images (the g_step path).
    def loss(im, k):
        return jnp.sum(pipe(im, k, 0.3) ** 2)
    res["full bgc bwd"] = timeit(jax.jit(jax.grad(loss)), img, key)

    for k, v in res.items():
        print(f"{k:>28}: {v * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
