"""BigGAN generator/discriminator, TPU-native.

From-scratch flax/NHWC rebuild of reference train_parts/generators.py:720-937,
train_parts/discriminators.py:702-842 and biggan/layers.py (ccbn/bn/GBlock/
DBlock/Attention/SN*).  TPU-first notes:

* **Cross-replica BatchNorm is free.**  The reference carries ~700 LoC of
  master/slave SyncBN machinery (biggan/sync_batchnorm/).  Here BN is a plain
  `jnp.mean` over the batch axis inside the jitted step; with the batch
  sharded over the mesh, GSPMD all-reduces the moments automatically — every
  BN in this file is a cross-replica BN whenever the batch is sharded.
* Spectral norm power-iteration state lives in the 'spectral' collection
  (models/spectral_norm.py), standing/running BN stats in 'batch_stats'.
* The reference's forward wiring for shared embeddings is broken (it feeds
  raw argmax indices to a Linear, generators.py:914-923); this build applies
  the shared embedding and hierarchical z-chunk concat per the BigGAN paper.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.models.attention import SelfAttention
from style_big_gan_tpu.models.spectral_norm import (SNConv, SNDense,
                                                    SNEmbedding)
from style_big_gan_tpu.registries import discriminators, generators

_ortho = nn.initializers.orthogonal()


def g_arch(ch=64, attention="64"):
    """Channel/attention tables (reference: generators.py:720-753)."""
    att = [int(a) for a in str(attention).split("_")]
    arch = {
        512: dict(in_ch=[16, 16, 8, 8, 4, 2, 1], out_ch=[16, 8, 8, 4, 2, 1, 1],
                  res=[8, 16, 32, 64, 128, 256, 512]),
        256: dict(in_ch=[16, 16, 8, 8, 4, 2], out_ch=[16, 8, 8, 4, 2, 1],
                  res=[8, 16, 32, 64, 128, 256]),
        128: dict(in_ch=[16, 16, 8, 4, 2], out_ch=[16, 8, 4, 2, 1],
                  res=[8, 16, 32, 64, 128]),
        64: dict(in_ch=[16, 16, 8, 4], out_ch=[16, 8, 4, 2],
                 res=[8, 16, 32, 64]),
        32: dict(in_ch=[4, 4, 4], out_ch=[4, 4, 4], res=[8, 16, 32]),
    }
    for cfg in arch.values():
        cfg["in_ch"] = [ch * c for c in cfg["in_ch"]]
        cfg["out_ch"] = [ch * c for c in cfg["out_ch"]]
        cfg["attention"] = [r in att for r in cfg["res"]]
    return arch


def d_arch(ch=64, attention="64"):
    """reference: discriminators.py:702-728."""
    att = [int(a) for a in str(attention).split("_")]
    arch = {
        256: dict(in_ch=[0, 1, 2, 4, 8, 8, 16],
                  out_ch=[1, 2, 4, 8, 8, 16, 16],
                  down=[True] * 6 + [False], res=[128, 64, 32, 16, 8, 4, 4]),
        128: dict(in_ch=[0, 1, 2, 4, 8, 16], out_ch=[1, 2, 4, 8, 16, 16],
                  down=[True] * 5 + [False], res=[64, 32, 16, 8, 4, 4]),
        64: dict(in_ch=[0, 1, 2, 4, 8], out_ch=[1, 2, 4, 8, 16],
                 down=[True] * 4 + [False], res=[32, 16, 8, 4, 4]),
        32: dict(in_ch=[0, 4, 4, 4], out_ch=[4, 4, 4, 4],
                 down=[True, True, False, False], res=[16, 16, 16, 16]),
    }
    for cfg in arch.values():
        cfg["in_ch"] = [3] + [ch * c for c in cfg["in_ch"][1:]]
        cfg["out_ch"] = [ch * c for c in cfg["out_ch"]]
        cfg["attention"] = [r in att for r in cfg["res"]]
    return arch


def _upsample2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _avgpool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _bn_moments(mod: nn.Module, x, channels: int, momentum: float,
                train: bool, update_stats: bool, standing: bool):
    """Batch-norm moment bookkeeping shared by CCBN and BigGANBN.

    Three modes, mirroring the reference's myBN (biggan/layers.py:212-255):

    * train, standing=False — batch moments; running averages updated
      (momentum) when ``update_stats``.
    * train, standing=True — batch moments; they are ADDED to standing
      sums and a counter is bumped (``accumulate_standing``,
      reference :238-241).  Running averages untouched.
    * eval — standing sums / counter when any accumulation happened,
      else the running averages (reference :248-255).

    Standing variables are created at module init (stable pytree for
    train states) or lazily on the first standing pass; eval falls back
    to running averages when a loaded checkpoint predates them."""
    stored_mean = mod.variable("batch_stats", "mean",
                               lambda: jnp.zeros((channels,), jnp.float32))
    stored_var = mod.variable("batch_stats", "var",
                              lambda: jnp.ones((channels,), jnp.float32))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        if mod.is_initializing() or standing:
            s_mean = mod.variable("batch_stats", "standing_mean",
                                  lambda: jnp.zeros((channels,), jnp.float32))
            s_var = mod.variable("batch_stats", "standing_var",
                                 lambda: jnp.zeros((channels,), jnp.float32))
            s_cnt = mod.variable("batch_stats", "standing_count",
                                 lambda: jnp.zeros((), jnp.float32))
            if standing and not mod.is_initializing():
                s_mean.value = s_mean.value + mean
                s_var.value = s_var.value + var
                s_cnt.value = s_cnt.value + 1.0
        if update_stats and not standing and not mod.is_initializing():
            stored_mean.value = ((1 - momentum) * stored_mean.value +
                                 momentum * mean)
            stored_var.value = ((1 - momentum) * stored_var.value +
                                momentum * var)
        return mean, var
    if mod.has_variable("batch_stats", "standing_count"):
        s_mean = mod.variable("batch_stats", "standing_mean",
                              lambda: jnp.zeros((channels,), jnp.float32))
        s_var = mod.variable("batch_stats", "standing_var",
                             lambda: jnp.zeros((channels,), jnp.float32))
        s_cnt = mod.variable("batch_stats", "standing_count",
                             lambda: jnp.zeros((), jnp.float32))
        cnt = s_cnt.value
        safe = jnp.maximum(cnt, 1.0)
        mean = jnp.where(cnt > 0, s_mean.value / safe, stored_mean.value)
        var = jnp.where(cnt > 0, s_var.value / safe, stored_var.value)
        return mean, var
    return stored_mean.value, stored_var.value


def reset_standing_stats(batch_stats):
    """Zero every standing_{mean,var,count} leaf (reference myBN
    ``reset_stats``, biggan/layers.py:229-233).  Pure tree -> tree."""
    def visit(path, leaf):
        name = str(path[-1].key) if path else ""
        if name.startswith("standing_"):
            return jnp.zeros_like(leaf)
        return leaf
    return jax.tree_util.tree_map_with_path(visit, batch_stats)


def accumulate_standing_stats(model, variables, rng, num_batches: int = 16,
                              batch_size: int = 32, **apply_kwargs):
    """Refresh standing statistics: reset, then run ``num_batches``
    train-mode forwards with ``standing_stats=True``, accumulating BN sums
    (the BigGAN eval-time trick the reference exposes via the G args
    ``mybn``/``accumulate_standing``, generators.py:762,791-793).

    Returns the variables dict with an updated ``batch_stats`` collection;
    every other collection (params, spectral u-vectors) is untouched."""
    variables = dict(variables)
    variables["batch_stats"] = reset_standing_stats(
        variables.get("batch_stats", {}))
    z_dim = int(getattr(model, "z_dim", 128))
    c_dim = int(getattr(model, "c_dim", 0))
    n_classes = int(getattr(model, "n_classes", 0) or c_dim)
    for i in range(num_batches):
        rng, kz, kc, kn = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (batch_size, z_dim), jnp.float32)
        if c_dim > 0:
            idx = jax.random.randint(kc, (batch_size,), 0, max(n_classes, 1))
            c = jax.nn.one_hot(idx, c_dim, dtype=jnp.float32)
        else:
            c = jnp.zeros((batch_size, 0), jnp.float32)
        _, updates = model.apply(variables, z, c, train=True,
                                 standing_stats=True,
                                 mutable=["batch_stats"],
                                 rngs={"noise": kn}, **apply_kwargs)
        variables["batch_stats"] = updates["batch_stats"]
    return variables


class CCBN(nn.Module):
    """Class-conditional BatchNorm (reference: biggan/layers.py:278-329).

    gain/bias come from a linear map of the conditioning vector (shared-
    embedding mode) or an embedding lookup (index mode).  Batch statistics
    are global across the sharded batch under GSPMD (SyncBN semantics)."""
    channels: int
    use_sn: bool = True       # SN on the gain/bias linears when vector input
    eps: float = 1e-5
    momentum: float = 0.1
    norm_style: str = "bn"    # 'bn' | 'in' | 'gn' | 'nonorm'
    n_classes: int = 0        # >0 when conditioning is an int class index

    @nn.compact
    def __call__(self, x, y, train: bool = True, update_stats: bool = True,
                 standing: bool = False):
        if self.n_classes > 0:
            gain_w = self.param("gain_embed", _ortho,
                                (self.n_classes, self.channels), jnp.float32)
            bias_w = self.param("bias_embed", _ortho,
                                (self.n_classes, self.channels), jnp.float32)
            yi = y.astype(jnp.int32)
            gain = 1.0 + gain_w[yi]
            bias = bias_w[yi]
        else:
            if self.use_sn:
                gain = 1.0 + SNDense(self.channels, use_bias=False,
                                     name="gain")(y, update_stats)
                bias = SNDense(self.channels, use_bias=False,
                               name="bias")(y, update_stats)
            else:
                gain = 1.0 + nn.Dense(self.channels, use_bias=False,
                                      kernel_init=_ortho, name="gain")(y)
                bias = nn.Dense(self.channels, use_bias=False,
                                kernel_init=_ortho, name="bias")(y)
        gain = gain[:, None, None, :].astype(x.dtype)
        bias = bias[:, None, None, :].astype(x.dtype)

        if self.norm_style == "nonorm":
            return x * gain + bias
        if self.norm_style == "gn":
            xn = nn.GroupNorm(num_groups=16, epsilon=self.eps,
                              use_bias=False, use_scale=False, name="gn")(x)
            return xn * gain + bias

        if self.norm_style != "bn":
            raise NotImplementedError(f"norm_style={self.norm_style}")
        mean, var = _bn_moments(self, x, self.channels, self.momentum,
                                train, update_stats, standing)
        xn = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + self.eps).astype(x.dtype)
        return xn * gain + bias


class _AffineBN(nn.Module):
    """Hand-rolled affine BN with standing-stats support.  Variable names
    (params scale/bias, batch_stats mean/var) match flax nn.BatchNorm so
    reference-weight imports are unchanged."""
    channels: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True,
                 standing: bool = False):
        scale = self.param("scale", nn.initializers.ones,
                           (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.channels,), jnp.float32)
        mean, var = _bn_moments(self, x, self.channels, self.momentum,
                                train, update_stats, standing)
        xn = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + self.eps).astype(x.dtype)
        return xn * scale.astype(x.dtype) + bias.astype(x.dtype)


class BigGANBN(nn.Module):
    """Plain affine BN (reference: biggan/layers.py:333-366; standing-stats
    mode per myBN, :212-255)."""
    channels: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True,
                 standing: bool = False):
        return _AffineBN(self.channels, eps=self.eps, momentum=self.momentum,
                         name="bn")(x, train, update_stats, standing)


class GBlock(nn.Module):
    """BN->act->[up]->conv x2 + learnable shortcut
    (reference: biggan/layers.py:375-408)."""
    in_channels: int
    out_channels: int
    upsample: bool = True
    use_sn: bool = True
    n_classes: int = 0      # index-mode ccbn when >0

    @nn.compact
    def __call__(self, x, y, train: bool = True, update_stats: bool = True,
                 standing: bool = False):
        h = CCBN(self.in_channels, use_sn=self.use_sn,
                 n_classes=self.n_classes, name="bn1")(x, y, train,
                                                       update_stats, standing)
        h = nn.relu(h)
        if self.upsample:
            h = _upsample2x(h)
            x = _upsample2x(x)
        if self.use_sn:
            h = SNConv(self.out_channels, 3, padding=1, kernel_init=_ortho,
                       name="conv1")(h, update_stats)
        else:
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        kernel_init=_ortho, name="conv1")(h)
        h = CCBN(self.out_channels, use_sn=self.use_sn,
                 n_classes=self.n_classes, name="bn2")(h, y, train,
                                                       update_stats, standing)
        h = nn.relu(h)
        if self.use_sn:
            h = SNConv(self.out_channels, 3, padding=1, kernel_init=_ortho,
                       name="conv2")(h, update_stats)
        else:
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        kernel_init=_ortho, name="conv2")(h)
        if self.in_channels != self.out_channels or self.upsample:
            if self.use_sn:
                x = SNConv(self.out_channels, 1, padding=0, kernel_init=_ortho,
                           name="conv_sc")(x, update_stats)
            else:
                x = nn.Conv(self.out_channels, (1, 1), kernel_init=_ortho,
                            name="conv_sc")(x)
        return h + x


class DBlock(nn.Module):
    """Preactivation resnet D block (reference: biggan/layers.py:412-457)."""
    in_channels: int
    out_channels: int
    wide: bool = True
    preactivation: bool = False
    downsample: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        hidden = self.out_channels if self.wide else self.in_channels
        h = nn.relu(x) if self.preactivation else x
        h = SNConv(hidden, 3, padding=1, kernel_init=_ortho,
                   name="conv1")(h, update_stats)
        h = SNConv(self.out_channels, 3, padding=1, kernel_init=_ortho,
                   name="conv2")(nn.relu(h), update_stats)
        if self.downsample:
            h = _avgpool2(h)

        s = x
        learnable_sc = (self.in_channels != self.out_channels) or self.downsample
        if self.preactivation:
            if learnable_sc:
                s = SNConv(self.out_channels, 1, padding=0, kernel_init=_ortho,
                           name="conv_sc")(s, update_stats)
            if self.downsample:
                s = _avgpool2(s)
        else:
            if self.downsample:
                s = _avgpool2(s)
            if learnable_sc:
                s = SNConv(self.out_channels, 1, padding=0, kernel_init=_ortho,
                           name="conv_sc")(s, update_stats)
        return h + s


@generators.add_to_registry("big_gan", skip_args=("c_dim", "img_resolution",
                                                  "img_channels"))
class BigGANGenerator(nn.Module):
    """Class-conditional BigGAN G (reference: generators.py:756-937)."""
    G_ch: int = 64
    z_dim: int = 128
    c_dim: int = 10
    img_resolution: int = 128
    img_channels: int = 3
    bottom_width: int = 4
    G_attn: str = "64"
    n_classes: int = 0          # 0 -> use c_dim
    G_shared: bool = True
    shared_dim: int = 0
    hier: bool = False
    G_param: str = "SN"

    @nn.compact
    def __call__(self, z, c, noise_mode: str = "random", train: bool = True,
                 update_emas: bool = False, standing_stats: bool = False):
        n_classes = self.n_classes or self.c_dim
        use_sn = self.G_param == "SN"
        arch = g_arch(self.G_ch, self.G_attn)[self.img_resolution]
        num_blocks = len(arch["out_ch"])
        shared_dim = self.shared_dim if self.shared_dim > 0 else self.z_dim
        # Standing-stats accumulation passes run BN in batch-moment mode but
        # must not advance the SN power iteration or the running averages.
        update_stats = train and not standing_stats

        y_idx = jnp.argmax(c, axis=1) if c.ndim == 2 else c.astype(jnp.int32)

        if self.hier:
            num_slots = num_blocks + 1
            chunk = self.z_dim // num_slots
            z = z[:, :chunk * num_slots]
            z_chunks = [z[:, i * chunk:(i + 1) * chunk]
                        for i in range(num_slots)]
            z0 = z_chunks[0]
        else:
            num_slots, chunk = 1, 0
            z0, z_chunks = z, None

        if self.G_shared:
            shared_w = self.param("shared_embedding", _ortho,
                                  (n_classes, shared_dim), jnp.float32)
            y_vec = shared_w[y_idx]
            if self.hier:
                ys = [jnp.concatenate([y_vec, z_chunks[i + 1]], axis=1)
                      for i in range(num_blocks)]
            else:
                ys = [y_vec] * num_blocks
            ccbn_classes = 0
        else:
            ys = [y_idx] * num_blocks
            ccbn_classes = n_classes

        if use_sn:
            h = SNDense(arch["in_ch"][0] * self.bottom_width ** 2,
                        kernel_init=_ortho, name="linear")(z0, update_stats)
        else:
            h = nn.Dense(arch["in_ch"][0] * self.bottom_width ** 2,
                         kernel_init=_ortho, name="linear")(z0)
        h = h.reshape(z.shape[0], self.bottom_width, self.bottom_width,
                      arch["in_ch"][0])

        for i in range(num_blocks):
            h = GBlock(arch["in_ch"][i], arch["out_ch"][i], upsample=True,
                       use_sn=use_sn, n_classes=ccbn_classes,
                       name=f"block{i}")(h, ys[i], train, update_stats,
                                         standing_stats)
            if arch["attention"][i]:
                h = SelfAttention(arch["out_ch"][i], use_sn=use_sn,
                                  name=f"attn{i}")(h, update_stats)

        h = BigGANBN(arch["out_ch"][-1], name="out_bn")(h, train,
                                                        update_stats,
                                                        standing_stats)
        h = nn.relu(h)
        if use_sn:
            h = SNConv(self.img_channels, 3, padding=1, kernel_init=_ortho,
                       name="out_conv")(h, update_stats)
        else:
            h = nn.Conv(self.img_channels, (3, 3), padding=1,
                        kernel_init=_ortho, name="out_conv")(h)
        return jnp.tanh(h)


@discriminators.add_to_registry("big_gan", skip_args=("c_dim", "img_resolution",
                                                      "img_channels"))
class BigGANDiscriminator(nn.Module):
    """Projection discriminator (reference: discriminators.py:732-842)."""
    D_ch: int = 64
    z_dim: int = 128
    c_dim: int = 10
    img_resolution: int = 128
    img_channels: int = 3
    D_wide: bool = True
    D_attn: str = "64"
    n_classes: int = 0
    output_dim: int = 1

    @nn.compact
    def __call__(self, x, c=None, train: bool = True, update_emas: bool = False):
        n_classes = self.n_classes or self.c_dim
        arch = d_arch(self.D_ch, self.D_attn)[self.img_resolution]
        update_stats = train

        h = x
        for i in range(len(arch["out_ch"])):
            h = DBlock(arch["in_ch"][i], arch["out_ch"][i], wide=self.D_wide,
                       preactivation=(i > 0), downsample=arch["down"][i],
                       name=f"block{i}")(h, update_stats)
            if arch["attention"][i]:
                h = SelfAttention(arch["out_ch"][i], use_sn=True,
                                  name=f"attn{i}")(h, update_stats)
        h = jnp.sum(nn.relu(h), axis=(1, 2))
        out = SNDense(self.output_dim, kernel_init=_ortho,
                      name="linear")(h, update_stats)
        if c is not None and n_classes > 0:
            y_idx = jnp.argmax(c, axis=1) if c.ndim == 2 else c.astype(jnp.int32)
            embed = SNEmbedding(n_classes, arch["out_ch"][-1],
                                name="embed")(y_idx, update_stats)
            out = out + jnp.sum(embed * h, axis=1, keepdims=True)
        return out
