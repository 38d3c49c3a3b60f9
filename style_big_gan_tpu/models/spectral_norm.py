"""Spectral normalization with persistent power-iteration state.

Functional re-design of reference biggan/layers.py:28-138 (SN base class with
multi-singular-value Gram-Schmidt power iteration) for a pure-function
framework: the u-vectors are flax variables in the ``spectral`` collection,
updated (without gradient) during training forwards and carried in the train
state pytree, replacing torch's in-place buffer mutation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _l2normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.sum(jnp.square(v)) + eps)


def power_iteration(w2d: jax.Array, us: jax.Array, num_itrs: int = 1,
                    eps: float = 1e-12):
    """Gram-Schmidt multi-sv power iteration (reference: biggan/layers.py:28-50).

    w2d: [rows, cols]; us: [num_svs, rows].  Returns (svs, new_us, new_vs).
    The u/v updates are detached (the reference runs them under no_grad), but
    each sv = u^T W v is computed against the *live* weight so the gradient of
    W/sv includes the -W u v^T / sv^2 term, exactly as in the reference.
    """
    w_det = jax.lax.stop_gradient(w2d)
    num_svs = us.shape[0]
    new_us, new_vs, svs = [], [], []
    for i in range(num_svs):
        u = us[i]
        v = None
        for _ in range(num_itrs):
            v = _l2normalize(jnp.matmul(u, w_det), eps)
            # Gram-Schmidt against previously extracted directions.
            u = jnp.matmul(w_det, v)
            for uj in new_us:
                u = u - uj * jnp.dot(uj, u)
            u = _l2normalize(u, eps)
        sv = jnp.einsum("r,rc,c->", u, w2d, v)
        new_us.append(u)
        new_vs.append(v)
        svs.append(sv)
    return jnp.stack(svs), jnp.stack(new_us), jnp.stack(new_vs)


class SpectralNorm(nn.Module):
    """Module mixin-style helper: normalize a weight by its leading singular
    value, tracking u in the 'spectral' variable collection."""
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = 1e-12

    @nn.compact
    def __call__(self, w: jax.Array, update_stats: bool = True) -> jax.Array:
        rows = w.shape[-1]                     # output dim last in our layouts
        w2d = w.reshape(-1, rows).T            # [out, fan_in]
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0),
                                      (self.num_svs, w2d.shape[0]), jnp.float32))
        svs, new_us, _ = power_iteration(w2d, u_var.value, self.num_itrs, self.eps)
        if (update_stats and not self.is_initializing()
                and self.is_mutable_collection("spectral")):
            u_var.value = new_us
        return w / svs[0]


class SNDense(nn.Module):
    """Spectrally-normalized linear (reference: biggan/layers.py:116-122)."""
    features: int
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    kernel_init: nn.initializers.Initializer = nn.initializers.orthogonal()
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        w = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        w = SpectralNorm(self.num_svs, self.num_itrs, name="sn")(w, update_stats)
        y = jnp.matmul(x, w.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class SNConv(nn.Module):
    """Spectrally-normalized conv2d, NHWC (reference: biggan/layers.py:103-112)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    kernel_init: nn.initializers.Initializer = nn.initializers.orthogonal()

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        k = self.kernel_size
        w = self.param("kernel", self.kernel_init,
                       (k, k, x.shape[-1], self.features), jnp.float32)
        w = SpectralNorm(self.num_svs, self.num_itrs, name="sn")(w, update_stats)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.strides, self.strides),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class SNEmbedding(nn.Module):
    """Spectrally-normalized embedding (reference: biggan/layers.py:128-138).
    Takes one-hot or integer labels."""
    num_classes: int
    features: int
    num_svs: int = 1
    num_itrs: int = 1

    @nn.compact
    def __call__(self, y: jax.Array, update_stats: bool = True) -> jax.Array:
        w = self.param("embedding", nn.initializers.orthogonal(),
                       (self.num_classes, self.features), jnp.float32)
        w = SpectralNorm(self.num_svs, self.num_itrs, name="sn")(w, update_stats)
        if y.ndim == 1 or (y.ndim == 2 and y.shape[-1] != self.num_classes):
            return w[y.astype(jnp.int32)]
        return jnp.matmul(y.astype(w.dtype), w)
