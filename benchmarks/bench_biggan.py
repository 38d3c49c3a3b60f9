#!/usr/bin/env python
"""BigGAN CIFAR training throughput on the local chip.

The second flagship family: class-conditional BigGAN at 32px with the
big_gan.yaml recipe (batch 50, hinge loss, n_dis=4 critic steps, EMA, no
ADA — reference: configs/big_gan.yaml).  Reports amortized imgs/sec over
the n_dis cycle.

    python benchmarks/bench_biggan.py [--batch 50] [--cycles 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--n-dis", type=int, default=4)
    p.add_argument("--windows", type=int, default=0,
                   help=">0: scan this many [n_dis x D + G] critic windows "
                        "per dispatch (StepBuilder.cycle_step)")
    args = p.parse_args()
    batch, n_dis = args.batch, args.n_dis

    import jax
    import jax.numpy as jnp
    import optax
    from style_big_gan_tpu import registries
    registries._import_all()
    from style_big_gan_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    res, zdim, ncls = 32, 128, 10
    G = registries.generators["big_gan"](
        G_ch=64, z_dim=zdim, c_dim=ncls, img_resolution=res, img_channels=3,
        G_shared=False, hier=False)
    D = registries.discriminators["big_gan"](
        D_ch=64, z_dim=zdim, c_dim=ncls, img_resolution=res, img_channels=3)

    arch = registries.losses_arch["base"]()
    arch.initialize(G, D, registries.losses["hinge"](), [], [], None)

    rnd = np.random.RandomState(0)
    z = jnp.zeros((batch, zdim), jnp.float32)
    c = jax.nn.one_hot(jnp.asarray(rnd.randint(0, ncls, batch)), ncls)
    img = jnp.zeros((batch, res, res, 3), jnp.float32)
    g_vars = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, c)
    d_vars = D.init({"params": jax.random.PRNGKey(2)}, img, c)
    pg, gs = split_vars(g_vars)
    pd, ds = split_vars(d_vars)
    opt = optax.adam(2e-4, b1=0.0, b2=0.999)
    state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds, opt,
                               opt, gen_regs=arch.gen_regs)
    W = args.windows
    steps = StepBuilder(arch, opt, opt, z_dim=zdim, num_accum_rounds=1,
                        donate=(W == 0), n_dis=(n_dis if W else 1))

    real = jnp.asarray(rnd.randn(batch, res, res, 3).astype(np.float32))
    if W:
        kb = W * n_dis
        reals = jnp.asarray(rnd.randn(kb, batch, res, res, 3)
                            .astype(np.float32))
        cs = jax.nn.one_hot(jnp.asarray(rnd.randint(0, ncls, (kb, batch))),
                            ncls)
        betas = jnp.full((W,), 0.9999, jnp.float32)

    def one_cycle(state):
        if W:
            state, _, _ = steps.cycle_step(state, reals, cs, cs, betas)
            return state
        # reference n_dis semantics: n_dis D steps per G step
        # (trainers.py:609-618).
        for _ in range(n_dis):
            state, _ = steps.d_step(state, real, c, c)
        state, _ = steps.g_step(state, c, 0.9999)
        return state

    def sync(state):
        int(np.asarray(state.step))

    for _ in range(2):
        state = one_cycle(state)
    sync(state)

    t0 = time.time()
    for _ in range(args.cycles * 10):
        state = one_cycle(state)
    sync(state)
    dt = time.time() - t0
    # imgs consumed per cycle = n_dis * batch reals (reference counts
    # cur_nimg by D batches).
    total = args.cycles * 10 * n_dis * batch * max(1, W)
    print(f"biggan_cifar32 train: {total / dt:.1f} imgs/sec/chip "
          f"(batch {batch}, n_dis {n_dis}, windows/dispatch {W})")


if __name__ == "__main__":
    main()
