"""Loss architectures: pure-function re-design of the reference phase engine.

The reference accumulates gradients imperatively (`requires_grad_` toggling,
`.backward()` per phase, DDP no_sync; reference: train_parts/losses_base.py
28-153).  Here each phase is a *pure loss function* over the param pytrees —
the trainer wraps them in `jax.grad` + optax and jits the whole step; under a
sharded batch GSPMD inserts the gradient all-reduce automatically, replacing
DDP.  Grad-of-grad regularizers (R1, PPL, WGAN-GP) use native `jax.grad`
composition — no gradfix machinery.

Stat names are kept verbatim (Loss/scores/fake, Loss/signs/real, ...) so the
reference's logging/ADA heuristics carry over.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from style_big_gan_tpu.registries import losses_arch


def split_vars(variables: Dict[str, Any]) -> Tuple[Any, Dict[str, Any]]:
    params = variables.get("params", {})
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def merge_vars(params, state) -> Dict[str, Any]:
    return {"params": params, **state}


class LossArchBase:
    """Owns G, D, augment pipe, loss fn and regularizer lists
    (reference: losses_base.py:28-109).  ``initialize`` binds the runtime
    modules after registry construction, keeping __init__ config-only."""

    def __init__(self):
        self.G = None
        self.D = None
        self.loss = None
        self.gen_regs = []
        self.dis_regs = []
        self.augment_pipe = None   # callable (img, key, p) -> img, or None

    def initialize(self, G, D, loss, gen_regs=(), dis_regs=(),
                   augment_pipe=None):
        self.G = G
        self.D = D
        self.loss = loss
        self.gen_regs = list(gen_regs)
        self.dis_regs = list(dis_regs)
        self.augment_pipe = augment_pipe
        return self

    # ---------------------------------------------------------------- helpers

    def run_G(self, g_vars, z, c, rng, update_emas: bool = False):
        """G forward; returns (img, new_g_state) (reference: losses_base.py:38-41).

        All state collections (moving averages, batch_stats) are writable
        during the forward — torch train-mode semantics — but the updates are
        *discarded* unless update_emas is set, so only the designated phase
        (Gmain) advances G state."""
        _, old_state = split_vars(g_vars)
        mutable = list(old_state.keys())
        if mutable:
            # flax returns (out, vars) whenever mutable is passed — even [].
            img, new_state = self.G.apply(
                g_vars, z, c, update_emas=update_emas, rngs={"noise": rng},
                mutable=mutable)
        else:
            img = self.G.apply(g_vars, z, c, update_emas=update_emas,
                               rngs={"noise": rng})
            new_state = {}
        if update_emas:
            return img, {**old_state, **new_state}
        return img, old_state

    def run_D(self, d_vars, img, c, rng, aug_p=None, update_stats: bool = False):
        """ADA-augment then D forward (reference: losses_base.py:43-48).
        Spectral-norm u vectors / BN stats update only when update_stats."""
        if self.augment_pipe is not None:
            img = self.augment_pipe(img, rng, aug_p)
        _, old_state = split_vars(d_vars)
        mutable = list(old_state.keys())
        if mutable:
            logits, new_state = self.D.apply(d_vars, img, c, mutable=mutable)
        else:
            logits, new_state = self.D.apply(d_vars, img, c), {}
        if update_stats:
            return logits, {**old_state, **new_state}
        return logits, old_state

    # ----------------------------------------------------------------- phases
    # Each returns (loss_scalar, (stats_dict, new_state_dict)).

    def g_main(self, params_g, g_state, params_d, d_state, gen_z, gen_c,
               rng, aug_p):
        """reference: losses_base.py:50-62 (do_Gmain)."""
        k_noise, k_aug = jax.random.split(rng)
        gen_img, new_g_state = self.run_G(merge_vars(params_g, g_state),
                                          gen_z, gen_c, k_noise,
                                          update_emas=True)
        gen_logits, _ = self.run_D(merge_vars(params_d, d_state), gen_img,
                                   gen_c, k_aug, aug_p, update_stats=False)
        loss_Gmain = self.loss.calc_loss(gen_logits, None)
        stats = {
            "Loss/scores/fake": jnp.mean(gen_logits),
            "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
            "Loss/G/loss": loss_Gmain,
        }
        return loss_Gmain, (stats, {"g_state": new_g_state})

    def d_main(self, params_d, d_state, gen_img, real_img, real_c,
               gen_c, rng, aug_p):
        """reference: losses_base.py:65-81 (do_Dmain).

        `gen_img` comes from a *separately jitted* G rollout
        (StepBuilder._rollout): the reference detaches fakes for the D step
        anyway (run_G with sync=False + no G grads), so generating them in
        their own program is exact — and it keeps each TPU program under the
        backend's program-size ceiling (the monolithic G+2xD+ADA+Adam graph
        exceeded it at 256px)."""
        k_aug_f, k_aug_r = jax.random.split(rng, 2)
        gen_img = jax.lax.stop_gradient(gen_img)
        d_vars = merge_vars(params_d, d_state)
        gen_logits, _ = self.run_D(d_vars, gen_img, gen_c, k_aug_f, aug_p,
                                   update_stats=False)
        real_logits, new_d_state = self.run_D(d_vars, real_img, real_c,
                                              k_aug_r, aug_p,
                                              update_stats=True)
        loss_D = self.loss.calc_loss(real_logits, gen_logits)
        stats = {
            "Loss/scores/fake": jnp.mean(gen_logits),
            "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
            "Loss/scores/real": jnp.mean(real_logits),
            "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
            "Loss/D/loss": loss_D,
        }
        return loss_D, (stats, {"d_state": new_d_state})

    def g_reg(self, params_g, g_state, params_d, d_state, gen_z, gen_c,
              rng, aug_p, reg_state, gain):
        """Generator regularizers (PPL).  reg_state carries pl_mean etc."""
        total = jnp.float32(0.0)
        stats: Dict[str, jax.Array] = {}
        new_reg_state = dict(reg_state)
        for reg in self.gen_regs:
            loss, rstats, rstate = reg.calc_reg(
                self, params_g, g_state, gen_z, gen_c, rng, reg_state)
            total = total + loss * gain
            stats.update(rstats)
            new_reg_state.update(rstate)
        return total, (stats, {"reg_state": new_reg_state})

    def d_reg(self, params_d, d_state, gen_img, real_img, real_c,
              gen_c, rng, aug_p, reg_state, gain):
        """Discriminator regularizers (R1, WGAN-GP).  gen_img comes from the
        separate rollout program (None when no registered reg needs fakes)."""
        total = jnp.float32(0.0)
        stats: Dict[str, jax.Array] = {}
        for reg in self.dis_regs:
            loss, rstats = reg.calc_reg(
                self, params_d, d_state, gen_img, real_img, real_c,
                gen_c, rng, aug_p)
            total = total + loss * gain
            stats.update(rstats)
        return total, (stats, {})

    @property
    def d_reg_needs_fake(self) -> bool:
        return any(getattr(reg, "needs_fake", False) for reg in self.dis_regs)

    # G decomposition hooks used by PPL / style mixing; overridden in SG2.
    def map_ws(self, g_vars, z, c, rng, skip_w_avg_update=False):
        return self.G.apply(g_vars, z, c, method=self.G.map_ws,
                            rngs={"noise": rng})

    def synthesize(self, g_vars, ws, rng):
        return self.G.apply(g_vars, ws, method=self.G.synthesize,
                            rngs={"noise": rng})


@losses_arch.add_to_registry("base")
class BasicLossArch(LossArchBase):
    """'base' == LossBase semantics (fixing the reference's __int__ typo,
    losses_base.py:113-115)."""

    def __init__(self):
        super().__init__()


@losses_arch.add_to_registry("sg2")
class SG2LossArch(LossArchBase):
    """Adds style mixing to G rollouts (reference: losses_base.py:118-153).

    The data-dependent `ws[:, cutoff:] = ...` becomes a masked `where` over
    the ws rows — same distribution, static shapes for XLA."""

    def __init__(self, style_mixing_prob: float = 0.9):
        super().__init__()
        self.style_mixing_prob = float(style_mixing_prob)

    def _mixed_ws(self, g_vars, z, c, rng, update_emas: bool):
        """Mapping + masked style mixing.  Returns (ws, new_state, k_noise)."""
        k_z2, k_cut, k_gate, k_noise = jax.random.split(rng, 4)
        _, state = split_vars(g_vars)
        if update_emas:
            ws, mut = self.G.apply(g_vars, z, c, update_emas=True,
                                   method=self.G.map_ws, mutable=["moving"])
            state = {**state, **mut}
        else:
            ws = self.G.apply(g_vars, z, c, method=self.G.map_ws)
        if self.style_mixing_prob > 0:
            num_ws = ws.shape[1]
            z2 = jax.random.normal(k_z2, z.shape, ws.dtype)
            ws2 = self.G.apply(g_vars, z2, c, method=self.G.map_ws,
                               skip_w_avg_update=True)
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            mixing = jax.random.uniform(k_gate, ()) < self.style_mixing_prob
            idx = jnp.arange(num_ws)
            mask = (idx >= cutoff) & mixing
            ws = jnp.where(mask[None, :, None], ws2, ws)
        return ws, state, k_noise

    def run_G(self, g_vars, z, c, rng, update_emas: bool = False):
        ws, state, k_noise = self._mixed_ws(g_vars, z, c, rng, update_emas)
        img = self.G.apply(g_vars, ws, method=self.G.synthesize,
                           rngs={"noise": k_noise})
        return img, state

    # ------------------------------------------------------------- fused Dmain

    def _mbstd_group_size(self) -> Optional[int]:
        return (getattr(self.D, "epilogue_kwargs", None) or {}).get(
            "mbstd_group_size", 4)

    def _mbstd_concat_exact(self, half: int) -> bool:
        """True iff a fused D(fake ∪ real) can reproduce the separate
        D(fake), D(real) exactly.

        The SG2 D's only batch-coupled op is the minibatch-stddev layer.
        Its groups are STRIDED — ``x.reshape(G, n//G, ...)`` reduced over
        axis 0, so group column k holds images {a*(n//G) + k}
        (models/layers.py:187-190, reference discriminators.py:319-321).
        Interleaving fake/real in chunks of ``half//G`` keeps every fused
        column purely fake or purely real AND equal to a separate-pass
        column; requires G | half."""
        gs = self._mbstd_group_size()
        return gs is not None and gs <= half and half % gs == 0

    def d_main(self, params_d, d_state, gen_img, real_img, real_c,
               gen_c, rng, aug_p):
        """Dmain with fake+real fused into ONE ADA pass + ONE D forward.

        The reference runs D(fake) and D(real) separately
        (losses_base.py:65-81); with no BN in the SG2 D and the mbstd
        chunk-interleave (see _mbstd_concat_exact) the fused batch is
        numerically identical while halving ADA/D dispatches and doubling
        the matmul batch on the MXU."""
        half = int(gen_img.shape[0])
        if half != int(real_img.shape[0]) or not self._mbstd_concat_exact(half):
            return super().d_main(params_d, d_state, gen_img, real_img,
                                  real_c, gen_c, rng, aug_p)
        gen_img = jax.lax.stop_gradient(gen_img)
        d_vars = merge_vars(params_d, d_state)
        m = half // self._mbstd_group_size()     # interleave chunk

        def ilv(a, b):
            if a.size == 0:                    # c_dim == 0 labels
                return jnp.concatenate([a, b], axis=0)
            ab = jnp.concatenate([a.reshape(-1, m, *a.shape[1:]),
                                  b.reshape(-1, m, *b.shape[1:])], axis=1)
            return ab.reshape(2 * half, *a.shape[1:])

        both = ilv(gen_img.astype(real_img.dtype), real_img)
        c_both = ilv(gen_c, real_c)
        logits, new_d_state = self.run_D(d_vars, both, c_both, rng, aug_p,
                                         update_stats=True)
        lg = logits.reshape(-1, 2 * m, *logits.shape[1:])
        gen_logits = lg[:, :m].reshape(half, *logits.shape[1:])
        real_logits = lg[:, m:].reshape(half, *logits.shape[1:])
        loss_D = self.loss.calc_loss(real_logits, gen_logits)
        stats = {
            "Loss/scores/fake": jnp.mean(gen_logits),
            "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
            "Loss/scores/real": jnp.mean(real_logits),
            "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
            "Loss/D/loss": loss_D,
        }
        return loss_D, (stats, {"d_state": new_d_state})

    def run_G_ws(self, g_vars, z, c, rng):
        """(img, ws) for PPL (reference: losses_base.py:143-153)."""
        ws, _, k_noise = self._mixed_ws(g_vars, z, c, rng, update_emas=False)
        img = self.G.apply(g_vars, ws, method=self.G.synthesize,
                           rngs={"noise": k_noise})
        return img, ws

    def ws_only(self, g_vars, z, c, rng):
        """(ws, noise_key) without synthesizing — PPL runs the synthesis
        itself under jax.vjp so the forward is shared with the pullback."""
        ws, _, k_noise = self._mixed_ws(g_vars, z, c, rng, update_emas=False)
        return ws, k_noise
