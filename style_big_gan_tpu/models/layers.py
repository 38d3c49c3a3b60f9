"""Shared equalized-LR layers for the StyleGAN2 family.

TPU-native re-design of reference train_parts/generators.py:105-348 and
train_parts/discriminators.py:44-207 as flax.linen modules over NHWC
activations.  Parameters live in fp32; compute dtype is per-module (bf16 on
the MXU for the hot blocks).  Equalized learning rate is runtime weight
scaling, exactly as the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.ops import bias_act as _bias_act
from style_big_gan_tpu.ops import setup_filter, upfirdn2d
from style_big_gan_tpu.ops.bias_act import activation_funcs
from style_big_gan_tpu.ops.conv2d_resample import conv2d_resample
from style_big_gan_tpu.ops.modconv import modulated_conv2d

Dtype = Any


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(E[x^2]) (reference: generators.py:36-39)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def _maybe_stop_grad(x: jax.Array, trainable: bool) -> jax.Array:
    """Freeze-D support: non-trainable params are cut out of the grad graph
    (reference keeps them as buffers, discriminators.py:100-106)."""
    return x if trainable else jax.lax.stop_gradient(x)


class FullyConnectedLayer(nn.Module):
    """Equalized-LR linear + fused bias_act
    (reference: generators.py:105-134)."""
    features: int
    activation: str = "linear"
    use_bias: bool = True
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: Dtype = jnp.float32
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        w = self.param("weight",
                       lambda key: jax.random.normal(key, (in_features, self.features),
                                                     jnp.float32) / self.lr_multiplier)
        w = _maybe_stop_grad(w, self.trainable)
        weight_gain = self.lr_multiplier / np.sqrt(in_features)
        y = jnp.matmul(x.astype(self.dtype), (w * weight_gain).astype(self.dtype))
        b = None
        if self.use_bias:
            b = self.param("bias",
                           lambda key: jnp.full((self.features,), self.bias_init,
                                                jnp.float32))
            b = _maybe_stop_grad(b, self.trainable) * self.lr_multiplier
        return _bias_act(y, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with integrated up/down resampling and fused
    bias_act (reference: generators.py:139-185)."""
    out_channels: int
    kernel_size: int = 3
    activation: str = "linear"
    up: int = 1
    down: int = 1
    use_bias: bool = True
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight",
                       lambda key: jax.random.normal(
                           key, (k, k, in_channels, self.out_channels), jnp.float32))
        w = _maybe_stop_grad(w, self.trainable)
        weight_gain = 1.0 / np.sqrt(in_channels * k * k)
        f = setup_filter(list(self.resample_filter)) if (self.up > 1 or self.down > 1) else None
        flip_weight = (self.up == 1)
        y = conv2d_resample(x.astype(self.dtype), (w * weight_gain).astype(self.dtype),
                            f=f, up=self.up, down=self.down, padding=k // 2,
                            flip_weight=flip_weight)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                           jnp.float32)
            b = _maybe_stop_grad(b, self.trainable)
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        act_gain = activation_funcs[self.activation].def_gain * gain
        return _bias_act(y, b, act=self.activation, gain=act_gain, clamp=clamp)


class MappingNetwork(nn.Module):
    """z -> w with class conditioning, w_avg tracking and truncation
    (reference: generators.py:190-269).

    Under SPMD data sharding, the w_avg EMA uses the *global* batch mean —
    `jnp.mean` over a sharded batch is all-reduced by GSPMD — so every
    replica tracks an identical w_avg (the reference's per-rank EMAs could
    drift)."""
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Optional[jax.Array], c: Optional[jax.Array],
                 truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False,
                 skip_w_avg_update: bool = False) -> jax.Array:
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim

        xs = []
        if self.z_dim > 0:
            xs.append(normalize_2nd_moment(z.astype(jnp.float32)))
        if self.c_dim > 0:
            y = FullyConnectedLayer(embed_features, name="embed")(c.astype(jnp.float32))
            xs.append(normalize_2nd_moment(y))
        x = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]

        for idx in range(self.num_layers):
            features = self.w_dim if idx == self.num_layers - 1 else layer_features
            x = FullyConnectedLayer(features, activation=self.activation,
                                    lr_multiplier=self.lr_multiplier,
                                    name=f"fc{idx}")(x)

        w_avg = self.variable("moving", "w_avg",
                              lambda: jnp.zeros((self.w_dim,), jnp.float32))
        if update_emas and not skip_w_avg_update and not self.is_initializing():
            w_avg.value = (jnp.mean(x, axis=0) +
                           self.w_avg_beta * (w_avg.value - jnp.mean(x, axis=0)))

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg.value + truncation_psi * (x - w_avg.value)
            else:
                trunc = w_avg.value + truncation_psi * (x[:, :truncation_cutoff] -
                                                        w_avg.value)
                x = jnp.concatenate([trunc, x[:, truncation_cutoff:]], axis=1)
        return x


class MinibatchStdLayer(nn.Module):
    """Append per-group feature-std statistics as an extra channel
    (reference: discriminators.py:307-328).  NHWC."""
    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        g = n if self.group_size is None else min(self.group_size, n)
        # Fall back to the full batch if it does not divide evenly.
        if n % g != 0:
            g = n
        f = self.num_channels
        cg = c // f
        y = x.reshape(g, n // g, h, w, f, cg).astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))          # [n//g, f]
        y = jnp.tile(y[:, None, None, :], (g, h, w, 1)).reshape(n, h, w, f)
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
