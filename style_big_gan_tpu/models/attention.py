"""SA-GAN self-attention (non-local) block.

TPU-native rebuild of reference biggan/layers.py:144-169: theta/phi/g/o 1x1
convs (phi and g max-pooled 2x), softmax attention, learnable gamma gate.
On NHWC the 1x1 convs and the attention itself are plain batched matmuls that
tile directly onto the MXU; attention runs in fp32 regardless of block dtype,
matching the reference's fp32 island inside fp16 blocks (generators.py:443-445).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from style_big_gan_tpu.models.spectral_norm import SNConv


def _maxpool2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class SelfAttention(nn.Module):
    """gamma * o( softmax(theta(x) phi(x)^T) g(x) ) + x."""
    channels: int
    use_sn: bool = True          # BigGAN uses spectral-norm 1x1 convs

    def _conv1x1(self, features: int, name: str):
        if self.use_sn:
            return SNConv(features, kernel_size=1, padding=0, use_bias=False,
                          name=name)
        return nn.Conv(features, (1, 1), use_bias=False, name=name,
                       kernel_init=nn.initializers.orthogonal())

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        n, h, w, c = x.shape
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)

        def apply(conv, v):
            return conv(v, update_stats) if self.use_sn else conv(v)

        theta = apply(self._conv1x1(c // 8, "theta"), xf)            # [N,H,W,C/8]
        phi = _maxpool2(apply(self._conv1x1(c // 8, "phi"), xf))     # [N,H/2,W/2,C/8]
        g = _maxpool2(apply(self._conv1x1(c // 2, "g"), xf))         # [N,H/2,W/2,C/2]

        theta = theta.reshape(n, h * w, c // 8)
        phi = phi.reshape(n, (h // 2) * (w // 2), c // 8)
        g = g.reshape(n, (h // 2) * (w // 2), c // 2)

        beta = jax.nn.softmax(
            jnp.einsum("nqk,npk->nqp", theta, phi,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("nqp,npk->nqk", beta, g,
                       preferred_element_type=jnp.float32)
        o = o.reshape(n, h, w, c // 2)
        o = apply(self._conv1x1(c, "o"), o)

        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return (gamma * o + xf).astype(in_dtype)
