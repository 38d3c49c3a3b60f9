#!/usr/bin/env python
"""Per-op microbenchmarks on the local chip: where do the milliseconds go?

Measures the hot ops of the StyleGAN2 256 forward/backward (upfirdn2d,
modulated conv, bias_act, self-attention, full G/D) to decide which deserve
hand-written Pallas kernels vs XLA's native lowering.

    python benchmarks/bench_ops.py [--ops upfirdn,modconv,...]
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
    p.add_argument("--ops", default="upfirdn,modconv,bias_act,attn,g_fwd,g_bwd")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    ops = args.ops.split(",")

    import jax
    import jax.numpy as jnp
    from style_big_gan_tpu.ops import (bias_act, modulated_conv2d,
                                       setup_filter, upsample2d)
    import importlib
    upfirdn_mod = importlib.import_module("style_big_gan_tpu.ops.upfirdn2d")
    from style_big_gan_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()

    N = args.batch
    results = {}

    def emit(name, dt, note=""):
        results[name] = (dt, note)
        print(f"{name:<30s} {dt * 1e3:>8.2f}ms  {note}", flush=True)

    if "upfirdn" in ops:
        f = setup_filter([1, 3, 3, 1])
        for res, c in [(64, 512), (128, 256), (256, 128)]:
            x = jnp.ones((N, res, res, c), jnp.bfloat16)
            for impl in ["conv", "shift", "matmul"]:
                fn = jax.jit(lambda x, impl=impl: upfirdn_mod.upsample2d(
                    x, f, impl=impl))
                dt = timeit(fn, x)
                gbps = 2 * x.size * 2 * 4 / dt / 1e9
                emit(f"upfirdn_up2_{res}x{c}_{impl}", dt,
                     f"{gbps:.0f} GB/s eff")
            xd = jnp.ones((N, res * 2, res * 2, c), jnp.bfloat16)
            for impl in ["conv", "matmul"]:
                fn = jax.jit(lambda x, impl=impl: upfirdn_mod.downsample2d(
                    x, f, impl=impl))
                dt = timeit(fn, xd)
                gbps = (xd.size + xd.size // 4) * 2 / dt / 1e9
                emit(f"upfirdn_down2_{res * 2}x{c}_{impl}", dt,
                     f"{gbps:.0f} GB/s eff")

    if "modconv" in ops:
        for res, cin, cout in [(32, 512, 512), (64, 512, 512),
                               (128, 256, 256), (256, 128, 128)]:
            x = jnp.ones((N, res, res, cin), jnp.bfloat16)
            w = jnp.ones((3, 3, cin, cout), jnp.float32)
            s = jnp.ones((N, cin), jnp.float32)
            fn = jax.jit(lambda x, w, s: modulated_conv2d(x, w, s, padding=1))
            dt = timeit(fn, x, w, s)
            flops = 2 * N * res * res * 9 * cin * cout
            emit(f"modconv_{res}_{cin}x{cout}", dt,
                 f"{flops / dt / 1e12:.1f} TFLOP/s")

    if "bias_act" in ops:
        x = jnp.ones((N, 128, 128, 256), jnp.bfloat16)
        b = jnp.ones((256,), jnp.float32)
        fn = jax.jit(lambda x, b: bias_act(x, b, act="lrelu", clamp=256.0))
        dt = timeit(fn, x, b)
        emit("bias_act_128x256", dt, f"{2 * x.size * 2 / dt / 1e9:.0f} GB/s")

    if "attn" in ops:
        from style_big_gan_tpu.models.attention import SelfAttention
        for res, c in [(32, 256), (64, 128)]:
            m = SelfAttention(c, use_sn=False)
            x = jnp.ones((N, res, res, c), jnp.float32)
            v = m.init(jax.random.PRNGKey(0), x)
            fn = jax.jit(lambda v, x: m.apply(v, x))
            dt = timeit(fn, v, x)
            emit(f"attn_{res}x{c}", dt)

    if "g_fwd" in ops or "g_bwd" in ops:
        from style_big_gan_tpu import registries
        registries._import_all()
        G = registries.generators["sg2_classic"](
            z_dim=512, w_dim=512, c_dim=0, img_resolution=256,
            num_fp16_res=4, conv_clamp=256, mapping_kwargs={"num_layers": 8})
        z = jnp.ones((N, 512), jnp.float32)
        gv = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, None)

        if "g_fwd" in ops:
            fn = jax.jit(lambda v, z: G.apply(
                v, z, None, noise_mode="const",
                rngs={"noise": jax.random.PRNGKey(0)}))
            dt = timeit(fn, gv, z)
            emit("G256_forward", dt, f"{N / dt:.1f} imgs/s")

        if "g_bwd" in ops:
            def loss(params, z):
                img = G.apply({**gv, "params": params}, z, None,
                              noise_mode="const",
                              rngs={"noise": jax.random.PRNGKey(0)})
                return jnp.sum(img.astype(jnp.float32) ** 2)
            fn = jax.jit(jax.grad(loss))
            dt = timeit(fn, gv["params"], z)
            emit("G256_backward", dt, f"{N / dt:.1f} imgs/s")

    print(f"{'op':<28s} {'ms':>9s}  note")
    for k, (dt, note) in results.items():
        print(f"{k:<28s} {dt * 1e3:>8.2f}ms  {note}")


if __name__ == "__main__":
    main()
