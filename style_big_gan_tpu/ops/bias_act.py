"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference's custom CUDA kernel
(reference: stylegan2ada/torch_utils/ops/bias_act.{cu,cpp,py}).  On TPU the
whole op is elementwise, so XLA fuses it into the surrounding conv/matmul for
free — what must be preserved is the *semantics table*: per-activation default
gain (`def_gain`), default alpha, and the clamp behavior
(reference: bias_act.py:23-33, 93-123).

Gradients (including the grad-of-grad needed by R1 / path-length
regularization) come from plain `jax.grad` — no hand-built autograd pair
(reference: bias_act.py:127-210) is needed.

Layout note: the framework is NHWC, so the default bias dimension is the LAST
axis (the reference's NCHW default was dim=1).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ActivationSpec(NamedTuple):
    fn: callable
    def_alpha: float
    def_gain: float
    has_2nd_grad: bool


# Semantics table (reference: bias_act.py:23-33).
activation_funcs = {
    "linear": ActivationSpec(lambda x, a: x, 0.0, 1.0, False),
    "relu": ActivationSpec(lambda x, a: jax.nn.relu(x), 0.0, math.sqrt(2.0), False),
    "lrelu": ActivationSpec(lambda x, a: jax.nn.leaky_relu(x, a), 0.2, math.sqrt(2.0), False),
    "tanh": ActivationSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0, True),
    "sigmoid": ActivationSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0, True),
    "elu": ActivationSpec(lambda x, a: jax.nn.elu(x), 0.0, 1.0, True),
    "selu": ActivationSpec(lambda x, a: jax.nn.selu(x), 0.0, 1.0, True),
    "softplus": ActivationSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0, True),
    "swish": ActivationSpec(lambda x, a: jax.nn.silu(x), 0.0, math.sqrt(2.0), True),
}


def bias_act(x: jax.Array,
             b: Optional[jax.Array] = None,
             dim: int = -1,
             act: str = "linear",
             alpha: Optional[float] = None,
             gain: Optional[float] = None,
             clamp: Optional[float] = None) -> jax.Array:
    """y = clamp(gain * act(x + broadcast(b, dim)), +-clamp).

    Matches reference `_bias_act_ref` (bias_act.py:93-123) with NHWC default
    bias axis.  `clamp` < 0 or None disables clamping.
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp) if clamp is not None else -1.0

    if b is not None:
        if b.ndim != 1:
            raise ValueError("bias must be 1-D")
        shape = [1] * x.ndim
        shape[dim] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp >= 0.0:
        x = jnp.clip(x, -clamp, clamp)
    return x
