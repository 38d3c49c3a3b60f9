"""Train state: one pytree carrying everything a training step touches.

Replaces the reference's scattered mutable objects (module params, optimizer
slots, G_ema deepcopy, regularizer buffers, ADA p buffer, torch RNG state;
reference: trainers.py:533-633) with a single flax PyTreeNode that jitted
steps consume and return — donate-able, checkpointable, shardable.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp


class GANTrainState(flax.struct.PyTreeNode):
    step: jax.Array                 # int32 global step counter
    params_g: Any
    g_state: Any                    # non-param collections: moving, noise, ...
    params_d: Any
    d_state: Any                    # spectral, batch_stats, ...
    opt_g: Any
    opt_d: Any
    params_g_ema: Any
    g_state_ema: Any
    reg_state: Dict[str, Any]       # e.g. PPL pl_mean
    ada_p: jax.Array                # ADA probability (device scalar)
    rng: jax.Array                  # training PRNG key


def init_reg_state(gen_regs) -> Dict[str, Any]:
    state: Dict[str, Any] = {}
    for reg in gen_regs:
        if hasattr(reg, "init_state"):
            state.update(reg.init_state())
    return state


def create_train_state(rng, params_g, g_state, params_d, d_state, opt_g_tx,
                       opt_d_tx, gen_regs=(), ada_p: float = 0.0):
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g, g_state=g_state,
        params_d=params_d, d_state=d_state,
        opt_g=opt_g_tx.init(params_g),
        opt_d=opt_d_tx.init(params_d),
        params_g_ema=jax.tree_util.tree_map(lambda x: x, params_g),
        g_state_ema=jax.tree_util.tree_map(lambda x: x, g_state),
        reg_state=init_reg_state(gen_regs),
        ada_p=jnp.asarray(ada_p, jnp.float32),
        rng=rng)
