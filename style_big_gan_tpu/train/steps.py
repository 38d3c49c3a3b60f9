"""Jitted training steps: the reference's phase machinery as pure functions.

The imperative loop of reference trainers.py:699-776 (zero_grad /
accumulate_gradients over microbatch rounds / DDP sync on last round /
nan_to_num / opt.step / G_ema lerp) collapses into four jitted step functions
over `GANTrainState`:

    g_step, g_reg_step, d_step, d_reg_step   (+ 'both' fusions via flags)
    cycle_step: k batches of the [Dmain x n_dis + Gmain] schedule scanned
        inside ONE program (steps-per-dispatch; see _cycle)

* gradient accumulation = `lax.scan` over microbatch rounds, averaging grads
  (multi-device mean semantics; the reference *sums* rounds — an
  inconsistency between its 1-GPU and 8-GPU runs we do not replicate);
* DDP all-reduce = nothing: with the batch sharded over the mesh's data
  axis, GSPMD inserts the psum when grads are computed;
* nan scrubbing of grads (reference: trainers.py:745-747) is kept;
* G_ema lerp (reference: trainers.py:752-761) is fused into the G step, beta
  computed host-side (rampup) and passed as a scalar.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from style_big_gan_tpu.train.state import GANTrainState
from style_big_gan_tpu.utils.misc import nan_to_num


def _scrub(grads):
    """reference: trainers.py:745-747."""
    return jax.tree_util.tree_map(lambda g: nan_to_num(g, 0.0, 1e5, -1e5),
                                  grads)


class StepBuilder:
    """Builds the jitted step functions for one training configuration.

    `arch` is an initialized loss architecture (train/loss_arch.py).  Loss
    closures all have signature ``loss_fn(params, *batch_args, key)`` where
    batch_args have a leading batch dim that accumulation splits.
    """

    def __init__(self, arch, opt_g_tx, opt_d_tx, *, z_dim: int,
                 num_accum_rounds: int = 1, g_reg_gain: float = 1.0,
                 d_reg_gain: float = 1.0, fuse_g_reg: bool = False,
                 fuse_d_reg: bool = False, donate: bool = False,
                 data_sharding=None, cycle_g_reg_tail: bool = False,
                 n_dis: int = 1):
        self.arch = arch
        self.opt_g_tx = opt_g_tx
        self.opt_d_tx = opt_d_tx
        self.z_dim = int(z_dim)
        # Sharding constraint for internally sampled latents: without it the
        # partitioner keeps z (sampled from a replicated key) replicated and
        # replicates the whole G subgraph across the mesh.
        self.data_sharding = data_sharding
        self.rounds = max(1, int(num_accum_rounds))
        self.g_reg_gain = float(g_reg_gain)
        self.d_reg_gain = float(d_reg_gain)
        self.fuse_g_reg = fuse_g_reg
        self.fuse_d_reg = fuse_d_reg
        if donate:
            from style_big_gan_tpu.parallel.platform import donation_supported
            donate = donation_supported()
        donate_kw = dict(donate_argnums=(0,)) if donate else {}
        self.g_step = jax.jit(self._g_step, **donate_kw)
        self.g_reg_step = jax.jit(self._g_reg_step, **donate_kw)
        # The D phases run as TWO programs: a G rollout producing the fake
        # images (no D, no optimizer) and the D update consuming them.  The
        # reference detaches fakes in do_Dmain anyway (losses_base.py:67-68),
        # so the split is exact — and it keeps each TPU program well under
        # the backend program-size ceiling that the monolithic graph hit at
        # 256px (~127 MB generated code).
        self._rollout_jit = jax.jit(self._rollout)
        self._d_update_jit = jax.jit(self._d_update, **donate_kw)
        self._d_reg_update_jit = jax.jit(self._d_reg_update, **donate_kw)
        # k-iterations-per-dispatch training cycle (MaxText-style
        # steps-per-loop): ~16% of the 256px iteration is per-dispatch
        # latency through the axon tunnel (benchmarks/bench_decomp.py), and
        # scanning Dmain+Gmain inside ONE program removes it — the scan body
        # is emitted once, so the program stays under the size ceiling that
        # the round-1 monolithic d_step hit.  k is baked in per jit cache
        # entry by the leading axis of the stacked batch.
        self._cycle_g_reg_tail = bool(cycle_g_reg_tail)
        self.n_dis = max(1, int(n_dis))
        # The cycle never donates: on the axon TPU backend, mixing the
        # scanned program with donating producers/consumers of the same
        # state buffers fails with INVALID_ARGUMENT at run time.  Callers
        # that use cycle_step should build with donate=False throughout
        # (probed: donation off costs no measurable throughput there).
        self.cycle_step = jax.jit(self._cycle)

    def d_step(self, state, real_img, real_c, gen_c):
        if self.rounds > 1:
            # Memory-lean path: under gradient accumulation the fakes are
            # generated INSIDE each microbatch round (peak G activation =
            # batch_device, not the global batch).  The full-batch rollout
            # at 1024px holds a [batch, 1024, 1024, C] pyramid that
            # exceeds HBM even though every consumer only ever sees
            # batch_device-sized slices.
            return self._d_update_jit(state, None, real_img, real_c, gen_c)
        state, fake = self._rollout_jit(state, gen_c)
        return self._d_update_jit(state, fake, real_img, real_c, gen_c)

    def d_reg_step(self, state, real_img, real_c, gen_c):
        if self.arch.d_reg_needs_fake and self.rounds <= 1:
            state, fake = self._rollout_jit(state, gen_c)
        else:
            fake = None
        return self._d_reg_update_jit(state, fake, real_img, real_c, gen_c)

    # ------------------------------------------------------------------ util

    def _accum_grads(self, loss_fn: Callable, params, batch_args: Tuple,
                     key) -> Tuple[Any, Any, Any]:
        """(grads, stats, aux) averaged over `self.rounds` microbatch rounds.
        aux (state updates) from the last round wins, matching the reference
        where stateful buffers reflect the final round."""
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        r = self.rounds
        if r <= 1:
            (_, (stats, aux)), grads = grad_fn(params, *batch_args, key)
            return grads, stats, aux

        def reshape(x):
            return x.reshape(r, x.shape[0] // r, *x.shape[1:])

        stacked = jax.tree_util.tree_map(reshape, tuple(batch_args))
        keys = jax.random.split(key, r)

        first = jax.tree_util.tree_map(lambda x: x[0], stacked)
        rest = jax.tree_util.tree_map(lambda x: x[1:], stacked)
        (_, (stats0, aux0)), grads0 = grad_fn(params, *first, keys[0])

        def body(carry, xs):
            grads_acc, stats_acc, _ = carry
            args, k = xs
            (_, (stats, aux)), grads = grad_fn(params, *args, k)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            stats_acc = jax.tree_util.tree_map(jnp.add, stats_acc, stats)
            return (grads_acc, stats_acc, aux), None

        (grads, stats, aux), _ = jax.lax.scan(
            body, (grads0, stats0, aux0), (rest, keys[1:]))
        inv = 1.0 / r
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        stats = jax.tree_util.tree_map(lambda s: s * inv, stats)
        return grads, stats, aux

    def _sample_z(self, key, n):
        z = jax.random.normal(key, (n, self.z_dim), jnp.float32)
        if self.data_sharding is not None:
            z = jax.lax.with_sharding_constraint(z, self.data_sharding)
        return z

    # ----------------------------------------------------------------- steps

    def _g_step(self, state: GANTrainState, gen_c, ema_beta):
        """Gmain (+fused Greg) + optimizer + EMA
        (reference: losses_base.py:50-62, trainers.py:725-761)."""
        rng, k_z, k_run, k_reg = jax.random.split(state.rng, 4)
        gen_z = self._sample_z(k_z, gen_c.shape[0])

        def loss_fn(params_g, gen_z, gen_c, key):
            loss, (stats, aux) = self.arch.g_main(
                params_g, state.g_state, state.params_d, state.d_state,
                gen_z, gen_c, key, state.ada_p)
            if self.fuse_g_reg and self.arch.gen_regs:
                rloss, (rstats, raux) = self.arch.g_reg(
                    params_g, state.g_state, state.params_d, state.d_state,
                    gen_z, gen_c, k_reg, state.ada_p, state.reg_state, 1.0)
                loss, stats, aux = loss + rloss, {**stats, **rstats}, \
                    {**aux, **raux}
            return loss, (stats, aux)

        grads, stats, aux = self._accum_grads(loss_fn, state.params_g,
                                              (gen_z, gen_c), k_run)
        grads = _scrub(grads)
        updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                              state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        g_state = aux.get("g_state", state.g_state)
        reg_state = aux.get("reg_state", state.reg_state)

        ema_beta = jnp.asarray(ema_beta, jnp.float32)
        params_g_ema = jax.tree_util.tree_map(
            lambda e, p: p + (e - p) * ema_beta.astype(p.dtype),
            state.params_g_ema, params_g)
        new_state = state.replace(
            step=state.step + 1, params_g=params_g, g_state=g_state,
            opt_g=opt_g, params_g_ema=params_g_ema, g_state_ema=g_state,
            reg_state=reg_state, rng=rng)
        return new_state, stats

    def _g_reg_step(self, state: GANTrainState, gen_c):
        """Lazy Greg (PPL), loss pre-multiplied by the reg interval
        (reference: regularizations.py:19-37, trainers.py:601-633)."""
        rng, k_z, k_run = jax.random.split(state.rng, 3)
        gen_z = self._sample_z(k_z, gen_c.shape[0])

        def loss_fn(params_g, gen_z, gen_c, key):
            return self.arch.g_reg(params_g, state.g_state, state.params_d,
                                   state.d_state, gen_z, gen_c, key,
                                   state.ada_p, state.reg_state,
                                   self.g_reg_gain)

        grads, stats, aux = self._accum_grads(loss_fn, state.params_g,
                                              (gen_z, gen_c), k_run)
        grads = _scrub(grads)
        updates, opt_g = self.opt_g_tx.update(grads, state.opt_g,
                                              state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        return state.replace(params_g=params_g, opt_g=opt_g,
                             reg_state=aux.get("reg_state", state.reg_state),
                             rng=rng), stats

    def _rollout(self, state: GANTrainState, gen_c):
        """Detached G rollout for the D phases (its own TPU program)."""
        rng, k_z, k_run = jax.random.split(state.rng, 3)
        gen_z = self._sample_z(k_z, gen_c.shape[0])
        g_vars = {"params": jax.lax.stop_gradient(state.params_g),
                  **state.g_state}
        fake, _ = self.arch.run_G(g_vars, gen_z, gen_c, k_run,
                                  update_emas=False)
        return state.replace(rng=rng), jax.lax.stop_gradient(fake)

    def _d_update(self, state: GANTrainState, fake_img, real_img, real_c,
                  gen_c):
        """Dmain (+fused Dreg) + optimizer (reference: losses_base.py:65-81).

        ``fake_img=None`` selects the accumulation-rounds rollout: fakes
        are generated per microbatch round inside the round scan (from the
        round's slice of a full-batch z), so the G forward runs at
        batch_device instead of the global batch — the only shape that
        fits HBM at 1024px.  The fakes stay detached either way."""
        if fake_img is None:
            rng, k_z, k_run, k_reg = jax.random.split(state.rng, 4)
            gen_z = self._sample_z(k_z, gen_c.shape[0])
            g_vars = {"params": jax.lax.stop_gradient(state.params_g),
                      **state.g_state}

            def loss_fn(params_d, gen_z, real_img, real_c, gen_c, key):
                k_g, k_d = jax.random.split(key)
                fake, _ = self.arch.run_G(g_vars, gen_z, gen_c, k_g,
                                          update_emas=False)
                fake = jax.lax.stop_gradient(fake)
                loss, (stats, aux) = self.arch.d_main(
                    params_d, state.d_state, fake, real_img, real_c,
                    gen_c, k_d, state.ada_p)
                if self.fuse_d_reg and self.arch.dis_regs:
                    rloss, (rstats, _) = self.arch.d_reg(
                        params_d, state.d_state, fake, real_img, real_c,
                        gen_c, k_reg, state.ada_p, state.reg_state, 1.0)
                    loss, stats = loss + rloss, {**stats, **rstats}
                return loss, (stats, aux)

            batch_args = (gen_z, real_img, real_c, gen_c)
        else:
            rng, k_run, k_reg = jax.random.split(state.rng, 3)

            def loss_fn(params_d, fake_img, real_img, real_c, gen_c, key):
                loss, (stats, aux) = self.arch.d_main(
                    params_d, state.d_state, fake_img, real_img, real_c,
                    gen_c, key, state.ada_p)
                if self.fuse_d_reg and self.arch.dis_regs:
                    rloss, (rstats, _) = self.arch.d_reg(
                        params_d, state.d_state, fake_img, real_img, real_c,
                        gen_c, k_reg, state.ada_p, state.reg_state, 1.0)
                    loss, stats = loss + rloss, {**stats, **rstats}
                return loss, (stats, aux)

            batch_args = (fake_img, real_img, real_c, gen_c)

        grads, stats, aux = self._accum_grads(
            loss_fn, state.params_d, batch_args, k_run)
        grads = _scrub(grads)
        updates, opt_d = self.opt_d_tx.update(grads, state.opt_d,
                                              state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
        return state.replace(params_d=params_d,
                             d_state=aux.get("d_state", state.d_state),
                             opt_d=opt_d, rng=rng), stats

    def _cycle(self, state: GANTrainState, real_imgs, real_cs, gen_cs,
               ema_betas):
        """k batches of the [Dmain x n_dis -> Gmain] schedule scanned
        inside one program.

        Inputs are stacked along a leading k axis (``real_imgs`` is
        ``[k, batch, H, W, C]``, k a multiple of ``n_dis``; ``ema_betas``
        is ``[k // n_dis]`` — one per G update — so the EMA rampup stays
        exact).  The scan unit is one critic window of ``n_dis`` batches:
        Dmain on batch 0, then Gmain (the reference fires Gmain when
        ``batch_idx % n_dis == 0``, i.e. alongside the *first* D batch of
        the window; trainers.py:725-748), then Dmain on batches 1..n-1.
        Per-batch D stats come back stacked ``(k,)`` (G stats ``(k //
        n_dis,)``) so the host collector and the ADA controller see every
        batch.  When ``cycle_g_reg_tail`` is set, one lazy Greg (PPL)
        update runs at the end of the program (caller aligns the cycle
        length with the g_reg interval)."""
        n_dis = self.n_dis
        k = real_imgs.shape[0]
        assert k % n_dis == 0, (k, n_dis)

        def window(x):
            return x.reshape(k // n_dis, n_dis, *x.shape[1:])

        # Zero-width label stacks (unconditional models) must NOT be scan
        # xs: the axon backend chokes on per-iteration slices of empty
        # arrays (compile hangs / INVALID_ARGUMENT).  All slices are equal
        # anyway — close over one.
        scan_c = real_cs.shape[-1] > 0 or gen_cs.shape[-1] > 0
        rc0, gc0 = real_cs[0], gen_cs[0]

        def body(s, xs):
            if scan_c:
                reals, rcs, gcs, beta = xs
            else:
                (reals, beta), rcs, gcs = xs, None, None
            d_stats_all = []
            g_stats = {}
            for i in range(n_dis):
                real = reals[i]
                rc = rcs[i] if scan_c else rc0
                gc = gcs[i] if scan_c else gc0
                if self.rounds > 1:
                    s, d_stats = self._d_update(s, None, real, rc, gc)
                else:
                    s, fake = self._rollout(s, gc)
                    s, d_stats = self._d_update(s, fake, real, rc, gc)
                d_stats_all.append(d_stats)
                if i == 0:
                    s, g_stats = self._g_step(s, gc, beta)
            d_stats = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *d_stats_all)
            return s, {**d_stats, **g_stats}

        xs = (window(real_imgs), window(real_cs), window(gen_cs),
              ema_betas) if scan_c else (window(real_imgs), ema_betas)
        state, stats = jax.lax.scan(body, state, xs)
        # flatten the (k//n_dis, n_dis) D-stat stacking back to (k,)
        stats = {name: v.reshape(-1) if v.ndim > 1 else v
                 for name, v in stats.items()}
        reg_stats = {}
        if self._cycle_g_reg_tail and self.arch.gen_regs:
            state, reg_stats = self._g_reg_step(state, gen_cs[-1])
        return state, stats, reg_stats

    def _d_reg_update(self, state: GANTrainState, fake_img, real_img, real_c,
                      gen_c):
        """Lazy Dreg (R1 / WGAN-GP) (reference: regularizations.py:40-85)."""
        rng, k_run = jax.random.split(state.rng, 2)

        if fake_img is None and self.arch.d_reg_needs_fake:
            # accumulation rounds: per-round in-program rollout (see
            # _d_update's memory-lean path).
            rng, k_z, k_run = jax.random.split(state.rng, 3)
            gen_z = self._sample_z(k_z, gen_c.shape[0])
            g_vars = {"params": jax.lax.stop_gradient(state.params_g),
                      **state.g_state}

            def loss_fn(params_d, gen_z, real_img, real_c, gen_c, key):
                k_g, k_d = jax.random.split(key)
                fake, _ = self.arch.run_G(g_vars, gen_z, gen_c, k_g,
                                          update_emas=False)
                fake = jax.lax.stop_gradient(fake)
                return self.arch.d_reg(
                    params_d, state.d_state, fake, real_img, real_c,
                    gen_c, k_d, state.ada_p, state.reg_state,
                    self.d_reg_gain)
            batch_args = (gen_z, real_img, real_c, gen_c)
        elif fake_img is None:
            def loss_fn(params_d, real_img, real_c, gen_c, key):
                return self.arch.d_reg(
                    params_d, state.d_state, None, real_img, real_c,
                    gen_c, key, state.ada_p, state.reg_state,
                    self.d_reg_gain)
            batch_args = (real_img, real_c, gen_c)
        else:
            def loss_fn(params_d, fake_img, real_img, real_c, gen_c, key):
                return self.arch.d_reg(
                    params_d, state.d_state, fake_img, real_img, real_c,
                    gen_c, key, state.ada_p, state.reg_state,
                    self.d_reg_gain)
            batch_args = (fake_img, real_img, real_c, gen_c)

        grads, stats, _ = self._accum_grads(
            loss_fn, state.params_d, batch_args, k_run)
        grads = _scrub(grads)
        updates, opt_d = self.opt_d_tx.update(grads, state.opt_d,
                                              state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
        return state.replace(params_d=params_d, opt_d=opt_d, rng=rng), stats
