"""Regularizers: PPL (G), R1 and WGAN-GP (D).

TPU-native rebuild of reference train_parts/regularizations.py:11-85.  Every
double-backward (`torch.autograd.grad(create_graph=True)` under
`conv2d_gradfix.no_weight_gradients()`) becomes a `jax.grad` w.r.t. the
*inputs* composed inside an outer `jax.grad` w.r.t. the params — JAX computes
no weight gradients in the inner grad by construction, so the gradfix
machinery has no equivalent here.

Persistent regularizer state (PPL's path-length EMA) lives in the train
state's ``reg_state`` dict instead of a module buffer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.registries import discriminator_regs, generator_regs
from style_big_gan_tpu.train.loss_arch import merge_vars


@generator_regs.add_to_registry("ppl")
class PPLReg:
    """Path-length regularization (reference: regularizations.py:11-37)."""

    def __init__(self, pl_batch_shrink: float = 2.0, pl_decay: float = 0.01,
                 pl_weight: float = 2.0):
        self.pl_batch_shrink = pl_batch_shrink
        self.pl_decay = pl_decay
        self.pl_weight = pl_weight

    def init_state(self) -> Dict[str, jax.Array]:
        return {"pl_mean": jnp.zeros((), jnp.float32)}

    def calc_reg(self, arch, params_g, g_state, gen_z, gen_c, rng, reg_state):
        if self.pl_weight == 0 or not hasattr(arch, "ws_only"):
            return jnp.float32(0.0), {}, {}
        batch = max(1, int(gen_z.shape[0] // self.pl_batch_shrink))
        z = gen_z[:batch]
        c = gen_c[:batch] if gen_c is not None else None
        k_run, k_noise = jax.random.split(rng)
        g_vars = merge_vars(params_g, g_state)

        # Reference computes grad of sum(img * noise) w.r.t. ws on the same
        # graph that produced img (regularizations.py:19-26).  jax.vjp shares
        # the synthesis forward with its pullback the same way — one
        # synthesis, not two — and stays differentiable for the outer
        # param grad.
        ws, k_synth = arch.ws_only(g_vars, z, c, k_run)

        # Perf experiment knobs (BASELINE.md round-5 pod-regime work):
        # SBG_PPL_DTYPE=bf16 runs the vjp cotangent flow in bf16 (halves
        # the HBM traffic of the transposed-conv intermediates and layout
        # copies the trace attributes to this program); SBG_PPL_REMAT=1
        # rematerializes the synthesis forward inside the pullback.
        import os
        ppl_bf16 = os.environ.get("SBG_PPL_DTYPE", "f32") == "bf16"
        ppl_remat = os.environ.get("SBG_PPL_REMAT", "0") == "1"
        out_dtype = jnp.bfloat16 if ppl_bf16 else jnp.float32

        def synth32(ws_in):
            im = arch.G.apply(g_vars, ws_in, method=arch.G.synthesize,
                              rngs={"noise": k_synth})
            return im.astype(out_dtype)

        if ppl_remat:
            synth32 = jax.checkpoint(synth32)
        img, pullback = jax.vjp(synth32, ws)
        h, w = img.shape[1], img.shape[2]
        pl_noise = (jax.random.normal(k_noise, img.shape, out_dtype)
                    / np.sqrt(h * w)).astype(out_dtype)
        (pl_grads,) = pullback(pl_noise)
        pl_grads = pl_grads.astype(jnp.float32)
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2),
                                       axis=1))
        pl_mean_old = reg_state["pl_mean"]
        pl_mean = pl_mean_old + self.pl_decay * (jnp.mean(pl_lengths) -
                                                 pl_mean_old)
        pl_mean = jax.lax.stop_gradient(pl_mean)
        pl_penalty = jnp.square(pl_lengths - pl_mean)
        loss = jnp.mean(pl_penalty) * self.pl_weight
        stats = {"Loss/pl_penalty": jnp.mean(pl_penalty),
                 "Loss/G/reg": loss}
        return loss, stats, {"pl_mean": pl_mean}


@discriminator_regs.add_to_registry("r1")
class R1Reg:
    """R1 gradient penalty on reals (reference: regularizations.py:40-56)."""

    def __init__(self, r1_gamma: float = 10.0):
        self.r1_gamma = r1_gamma

    needs_fake = False

    def calc_reg(self, arch, params_d, d_state, gen_img, real_img,
                 real_c, gen_c, rng, aug_p):
        if self.r1_gamma == 0:
            return jnp.float32(0.0), {}
        d_vars = merge_vars(params_d, d_state)

        def d_sum(img):
            logits, _ = arch.run_D(d_vars, img, real_c, rng, aug_p,
                                   update_stats=False)
            return jnp.sum(logits.astype(jnp.float32))

        r1_grads = jax.grad(d_sum)(real_img.astype(jnp.float32))
        r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
        loss = jnp.mean(r1_penalty) * (self.r1_gamma / 2.0)
        stats = {"Loss/r1_penalty": jnp.mean(r1_penalty),
                 "Loss/D/r1reg": loss}
        return loss, stats


@discriminator_regs.add_to_registry("grad_pen")
class GradPenReg:
    """WGAN-GP interpolate penalty (reference: regularizations.py:59-85)."""

    def __init__(self, alpha: float = 10.0):
        self.alpha = alpha

    needs_fake = True

    def calc_reg(self, arch, params_d, d_state, gen_img, real_img,
                 real_c, gen_c, rng, aug_p):
        k_t, k_d = jax.random.split(rng, 2)
        fake = jax.lax.stop_gradient(gen_img)
        real = real_img.astype(jnp.float32)
        t = jax.random.uniform(k_t, (real.shape[0], 1, 1, 1), jnp.float32)
        interp = t * real + (1.0 - t) * fake.astype(jnp.float32)
        d_vars = merge_vars(params_d, d_state)

        def d_sum(img):
            logits, _ = arch.run_D(d_vars, img, gen_c, k_d, aug_p,
                                   update_stats=False)
            return jnp.sum(logits.astype(jnp.float32))

        grads = jax.grad(d_sum)(interp)
        grad_norm = jnp.sqrt(jnp.sum(jnp.square(
            grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
        loss_gp = self.alpha * jnp.mean(jnp.square(grad_norm - 1.0))
        return loss_gp, {"Loss/D/grad_pen": loss_gp}
