#!/usr/bin/env python
"""Metric-evaluation throughput: G_ema rollout + detector features.

FID-50k spends its time in two loops (reference: metric_utils.py:181-276):
dataset features (detector only) and generator features (G rollout +
detector).  This measures both at the bench model size so the metric path's
TPU cost is known: a full fid50k_full evaluation is
50k/gen_rate + 50k/data_rate seconds (plus one-time dataset-side caching).

    python benchmarks/bench_metrics.py [--res 256] [--batch 32]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

import numpy as np

from _util import sync


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from style_big_gan_tpu import registries
    registries._import_all()
    from style_big_gan_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    from style_big_gan_tpu.metrics.metric_utils import get_feature_detector

    G = registries.generators["sg2_classic"](
        z_dim=512, w_dim=512, c_dim=0, img_resolution=args.res,
        img_channels=3, num_fp16_res=4, conv_clamp=256,
        mapping_kwargs={"num_layers": 8})
    z = jnp.zeros((args.batch, 512), jnp.float32)
    g_vars = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, None)

    @jax.jit
    def rollout(key):
        zz = jax.random.normal(key, (args.batch, 512), jnp.float32)
        img = G.apply(g_vars, zz, None, noise_mode="const",
                      rngs={"noise": jax.random.PRNGKey(2)})
        img = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        return img

    key = jax.random.PRNGKey(0)
    imgs = rollout(key)
    sync(imgs)
    t0 = time.time()
    for i in range(args.iters):
        imgs = rollout(jax.random.fold_in(key, i))
    sync(imgs)
    gen_rate = args.batch * args.iters / (time.time() - t0)
    print(f"G_ema rollout: {gen_rate:,.0f} imgs/sec "
          f"(50k in {50000 / gen_rate:.1f}s)")

    # Detector throughput.  Use the native JAX inception with random weights
    # when available (same compute as converted weights), else fake_v1.
    try:
        from style_big_gan_tpu.metrics.inception_jax import (
            InceptionV3JaxDetector, random_params)
        det = InceptionV3JaxDetector(params=random_params(0))
        name = "inception_v3_jax(random weights)"
    except Exception:                       # noqa: BLE001
        det = get_feature_detector("fake_v1")
        name = "fake_v1"
    det(imgs)                               # compile (device-resident input)
    t0 = time.time()
    for _ in range(args.iters):
        det(imgs)
    det_rate = args.batch * args.iters / (time.time() - t0)
    print(f"detector [{name}], device input: {det_rate:,.0f} imgs/sec "
          f"(50k in {50000 / det_rate:.1f}s)")
    host_imgs = np.asarray(imgs)
    t0 = time.time()
    for _ in range(args.iters):
        det(host_imgs)
    host_rate = args.batch * args.iters / (time.time() - t0)
    print(f"detector [{name}], host input: {host_rate:,.0f} imgs/sec "
          f"(tunnel transfer bound)")

    # Generator-side features use the device rate; dataset-side features
    # feed host numpy images (tunnel-bound) but are md5-cached after the
    # first run (metric_utils.py).
    warm = 50000 / gen_rate + 50000 / det_rate
    cold = warm + 50000 / host_rate
    print(f"fid50k_full estimate: {warm:.0f}s with cached dataset features "
          f"({cold:.0f}s cold)")


if __name__ == "__main__":
    main()
