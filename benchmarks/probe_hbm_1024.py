"""AOT HBM probe for the ffhq1024 cycle program — no params materialized.

Lowers the EXACT programs the trainer dispatches for ffhq1024_sg2ada.yaml
(cycle_step k=4 rounds=16, d_reg_step r1, g_reg_step ppl) from abstract
ShapeDtypeStructs and asks the TPU AOT compiler for the memory verdict.
Turns a ~35-minute trainer-setup round trip into a few minutes when
validating HBM fits at new resolutions (the 1024 OOM of round 5 was only
reported at first-cycle compile, after full setup).

Usage:  python benchmarks/probe_hbm_1024.py [cycle|dreg|greg|all]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from style_big_gan_tpu import registries
from style_big_gan_tpu.parallel import mesh as mesh_lib
from style_big_gan_tpu.train.loss_arch import split_vars
from style_big_gan_tpu.train.state import create_train_state
from style_big_gan_tpu.train.steps import StepBuilder

registries._import_all()

RES, ZW, CB = 1024, 512, 32768
BATCH, BATCH_DEVICE, K, N_DIS = 32, 2, 4, 1


def sds(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    G = registries.generators["sg2_classic"](
        z_dim=ZW, w_dim=ZW, img_resolution=RES, channel_base=CB,
        channel_max=512, num_fp16_res=4, conv_clamp=256,
        mapping_kwargs={"num_layers": 8})
    D = registries.discriminators["sg2_classic"](
        img_resolution=RES, channel_base=CB, channel_max=512,
        num_fp16_res=4, conv_clamp=256,
        epilogue_kwargs={"mbstd_group_size": 4})
    arch = registries.losses_arch["sg2"](style_mixing_prob=0.9)
    gen_regs = [registries.generator_regs["ppl"](pl_weight=2.0)]
    dis_regs = [registries.discriminator_regs["r1"](r1_gamma=2.0)]
    arch.initialize(G, D, registries.losses["softplus"](), gen_regs,
                    dis_regs, None)

    z = jax.ShapeDtypeStruct((BATCH, ZW), jnp.float32)
    img = jax.ShapeDtypeStruct((BATCH, RES, RES, 3), jnp.float32)

    def init_shapes(z, img):
        gv = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, jnp.zeros(z.shape), None)
        dv = D.init({"params": jax.random.PRNGKey(2)},
                    jnp.zeros(img.shape), None)
        return gv, dv

    gv, dv = jax.eval_shape(init_shapes, z, img)
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.adam(0.002, b1=0.0, b2=0.99)
    state = jax.eval_shape(
        lambda: create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds,
                                   tx, tx, gen_regs=gen_regs))

    mesh = mesh_lib.make_mesh(1)
    steps = StepBuilder(arch, tx, tx, z_dim=ZW,
                        num_accum_rounds=BATCH // BATCH_DEVICE,
                        g_reg_gain=4.0, d_reg_gain=16.0, donate=False,
                        data_sharding=mesh_lib.batch_sharding(mesh, 2),
                        n_dis=N_DIS)

    reals = jax.ShapeDtypeStruct((K, BATCH, RES, RES, 3), jnp.float32)
    cs = jax.ShapeDtypeStruct((K, BATCH, 0), jnp.float32)
    betas = jax.ShapeDtypeStruct((K // N_DIS,), jnp.float32)
    c1 = jax.ShapeDtypeStruct((BATCH, 0), jnp.float32)
    img1 = jax.ShapeDtypeStruct((BATCH, RES, RES, 3), jnp.float32)

    jobs = {
        "cycle": lambda: steps.cycle_step.lower(state, reals, cs, cs, betas),
        "dstep": lambda: steps._d_update_jit.lower(state, None, img1, c1, c1),
        "gstep": lambda: steps.g_step.lower(state, c1,
                                            jax.ShapeDtypeStruct(
                                                (), jnp.float32)),
        "dreg": lambda: steps._d_reg_update_jit.lower(state, None, img1,
                                                      c1, c1),
        "greg": lambda: steps.g_reg_step.lower(state, c1),
    }
    for name, low in jobs.items():
        if what not in ("all", name):
            continue
        import time
        t0 = time.time()
        lowered = low()
        print(f"[{name}] lowered in {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        try:
            compiled = lowered.compile()
        except Exception as e:  # OOM verdicts arrive as compile errors
            print(f"[{name}] COMPILE FAILED in {time.time()-t0:.1f}s: "
                  f"{str(e)[:8000]}")
            continue
        print(f"[{name}] compiled in {time.time()-t0:.1f}s", flush=True)
        ma = compiled.memory_analysis()
        if ma is not None:
            for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                         "output_size_in_bytes", "alias_size_in_bytes"):
                v = getattr(ma, attr, None)
                if v is not None:
                    print(f"[{name}] {attr} = {v/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
