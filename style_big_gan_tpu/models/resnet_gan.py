"""SN-GAN / WGAN 32x32 residual models
(reference: train_parts/generators.py:610-714,
train_parts/discriminators.py:517-695).

Same topology, NHWC/flax: upsample-resnet generator with BN, preactivation
downsample-resnet discriminator.  The SN-GAN variant spectrally normalizes
every D conv/linear via power iteration carried in the 'spectral' collection
(models/spectral_norm.py) instead of torch.nn.utils.spectral_norm hooks.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from style_big_gan_tpu.models.spectral_norm import SNConv, SNDense
from style_big_gan_tpu.registries import discriminators, generators

_xavier = nn.initializers.xavier_uniform()
_xavier_g2 = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")


def _upsample_nearest(x):
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _avgpool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _BN(nn.Module):
    train: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ResGenBlock(nn.Module):
    """BN-ReLU-up-conv x2 + 1x1 upsampled shortcut
    (reference: generators.py:610-639)."""
    out_channels: int
    train: bool = True

    @nn.compact
    def __call__(self, x):
        h = _BN(self.train, name="bn0")(x)
        h = nn.relu(h)
        h = _upsample_nearest(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=_xavier_g2,
                    name="conv0")(h)
        h = _BN(self.train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=_xavier_g2,
                    name="conv1")(h)
        s = _upsample_nearest(x)
        s = nn.Conv(self.out_channels, (1, 1), kernel_init=_xavier,
                    name="shortcut")(s)
        return h + s


class ResGenerator32(nn.Module):
    """Shared SNGAN/WGAN generator (reference: generators.py:642-714)."""
    z_dim: int = 128
    c_dim: int = 0
    img_resolution: int = 32
    img_channels: int = 3
    base_width: int = 256   # width of every gen block (reference fixes 256)

    @nn.compact
    def __call__(self, z, c=None, noise_mode: str = "random",
                 train: bool = True, update_emas: bool = False):
        w = self.base_width
        x = nn.Dense(4 * 4 * w, kernel_init=_xavier, name="linear")(z)
        x = x.reshape(z.shape[0], 4, 4, w)
        for i in range(3):
            x = ResGenBlock(w, train=train, name=f"block{i}")(x)
        x = _BN(train, name="bn_out")(x)
        x = nn.relu(x)
        x = nn.Conv(self.img_channels, (3, 3), padding=1, kernel_init=_xavier,
                    name="conv_out")(x)
        return jnp.tanh(x)


@generators.add_to_registry("res32_sngan",
                            skip_args=("c_dim", "img_resolution", "img_channels"))
class ResGenerator32SNGAN(ResGenerator32):
    pass


@generators.add_to_registry("res32_wgan",
                            skip_args=("c_dim", "img_resolution", "img_channels"))
class ResGenerator32WGAN(ResGenerator32):
    pass


class _DConv(nn.Module):
    """Conv that is spectral-normalized in the SNGAN variant."""
    features: int
    kernel: int
    padding: int
    use_sn: bool
    gain2: bool = False    # xavier with gain sqrt(2)

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        init = _xavier_g2 if self.gain2 else _xavier
        if self.use_sn:
            return SNConv(self.features, kernel_size=self.kernel,
                          padding=self.padding, kernel_init=init,
                          name="conv")(x, update_stats)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding=self.padding, kernel_init=init, name="conv")(x)


class OptimizedResDisBlock(nn.Module):
    """First D block: conv-relu-conv-pool + pooled 1x1 shortcut
    (reference: discriminators.py:517-543)."""
    out_channels: int
    use_sn: bool

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        h = _DConv(self.out_channels, 3, 1, self.use_sn, gain2=True,
                   name="res0")(x, update_stats)
        h = nn.relu(h)
        h = _DConv(self.out_channels, 3, 1, self.use_sn, gain2=True,
                   name="res1")(h, update_stats)
        h = _avgpool2(h)
        s = _avgpool2(x)
        s = _DConv(self.out_channels, 1, 0, self.use_sn, name="shortcut")(
            s, update_stats)
        return h + s


class ResDisBlock(nn.Module):
    """Preactivation resnet D block (reference: discriminators.py:546-581)."""
    out_channels: int
    use_sn: bool
    down: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_channels = x.shape[-1]
        h = nn.relu(x)
        h = _DConv(self.out_channels, 3, 1, self.use_sn, gain2=True,
                   name="res0")(h, update_stats)
        h = nn.relu(h)
        h = _DConv(self.out_channels, 3, 1, self.use_sn, gain2=True,
                   name="res1")(h, update_stats)
        if self.down:
            h = _avgpool2(h)
        s = x
        if in_channels != self.out_channels or self.down:
            s = _DConv(self.out_channels, 1, 0, self.use_sn,
                       name="shortcut")(s, update_stats)
        if self.down:
            s = _avgpool2(s)
        return h + s


class ResDiscriminator32(nn.Module):
    """Shared SNGAN/WGAN discriminator (reference: discriminators.py:584-695)."""
    z_dim: int = 128
    c_dim: int = 0
    img_resolution: int = 32
    img_channels: int = 3
    use_sn: bool = True
    base_width: int = 128   # width of every dis block (reference fixes 128)

    @nn.compact
    def __call__(self, x, c=None, train: bool = True, update_emas: bool = False):
        update_stats = train
        w = self.base_width
        x = OptimizedResDisBlock(w, self.use_sn, name="block0")(x, update_stats)
        x = ResDisBlock(w, self.use_sn, down=True, name="block1")(x, update_stats)
        x = ResDisBlock(w, self.use_sn, name="block2")(x, update_stats)
        x = ResDisBlock(w, self.use_sn, name="block3")(x, update_stats)
        x = nn.relu(x)
        x = jnp.sum(x, axis=(1, 2))
        if self.use_sn:
            return SNDense(1, use_bias=False, kernel_init=_xavier,
                           name="linear")(x, update_stats)
        return nn.Dense(1, kernel_init=_xavier, name="linear")(x)


@discriminators.add_to_registry("res32_sngan",
                                skip_args=("c_dim", "img_resolution",
                                           "img_channels", "use_sn"))
class ResDiscriminator32SNGAN(ResDiscriminator32):
    use_sn: bool = True


@discriminators.add_to_registry("res32_wgan",
                                skip_args=("c_dim", "img_resolution",
                                           "img_channels", "use_sn"))
class ResDiscriminator32WGAN(ResDiscriminator32):
    use_sn: bool = False
