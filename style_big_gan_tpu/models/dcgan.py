"""DCGAN generator/discriminator (reference: train_parts/generators.py:569-605,
train_parts/discriminators.py:471-512).

NHWC/flax rebuild: ConvTranspose+BN+ReLU stack for G, strided conv +
LeakyReLU(+BN) stack for D.  BatchNorm here uses batch statistics
(torch train-mode semantics); under a sharded batch the statistics are global
across devices for free (GSPMD all-reduces the mean) — cross-replica BN with
zero extra code.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from style_big_gan_tpu.registries import discriminators, generators


class _BN(nn.Module):
    """Train-mode batchnorm tracking running stats for eval."""
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=self.use_running_average,
                            momentum=0.9, epsilon=1e-5,
                            dtype=x.dtype, name="bn")(x)


class DCGANGeneratorCore(nn.Module):
    z_dim: int
    first_kernel: int       # M: 2 -> 32x32 output, 4 -> 48/64-family
    img_channels: int = 3
    base_width: int = 1024  # top deconv width; the ladder is /2 /4 /8

    @nn.compact
    def __call__(self, z, c=None, noise_mode: str = "random",
                 train: bool = True, update_emas: bool = False):
        x = z.reshape(z.shape[0], 1, 1, self.z_dim)
        m = self.first_kernel
        # ConvTranspose z -> base_width x M x M (valid).
        x = nn.ConvTranspose(self.base_width, (m, m), strides=(1, 1),
                             padding="VALID",
                             use_bias=False, name="deconv0")(x)
        x = nn.relu(_BN(not train, name="bn0")(x))
        for i, ch in enumerate([self.base_width // 2, self.base_width // 4,
                                self.base_width // 8]):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, name=f"deconv{i + 1}")(x)
            x = nn.relu(_BN(not train, name=f"bn{i + 1}")(x))
        x = nn.ConvTranspose(self.img_channels, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False, name="deconv4")(x)
        return jnp.tanh(x)


@generators.add_to_registry("cnn32_dcgan",
                            skip_args=("c_dim", "img_resolution", "img_channels"))
class DCGANGenerator32(DCGANGeneratorCore):
    z_dim: int = 100
    first_kernel: int = 2
    c_dim: int = 0
    img_resolution: int = 32
    img_channels: int = 3


@generators.add_to_registry("cnn48_dcgan",
                            skip_args=("c_dim", "img_resolution", "img_channels"))
class DCGANGenerator48(DCGANGeneratorCore):
    z_dim: int = 100
    first_kernel: int = 3
    c_dim: int = 0
    img_resolution: int = 48
    img_channels: int = 3


class DCGANDiscriminatorCore(nn.Module):
    img_resolution: int = 32
    img_channels: int = 3
    base_width: int = 512   # deepest conv width; the ladder is /8 /4 /2 up

    @nn.compact
    def __call__(self, x, c=None, train: bool = True, update_emas: bool = False):
        x = nn.Conv(self.base_width // 8, (5, 5), strides=(2, 2), padding=2,
                    use_bias=False, name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        for i, ch in enumerate([self.base_width // 4, self.base_width // 2,
                                self.base_width]):
            x = nn.Conv(ch, (5, 5), strides=(2, 2), padding=2, use_bias=False,
                        name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = _BN(not train, name=f"bn{i + 1}")(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, name="linear")(x)


@discriminators.add_to_registry("cnn32_dcgan",
                                skip_args=("c_dim", "img_resolution",
                                           "img_channels"))
class DCGANDiscriminator32(DCGANDiscriminatorCore):
    z_dim: int = 100      # accepted for config parity with the reference
    c_dim: int = 0
    img_resolution: int = 32
    img_channels: int = 3


@discriminators.add_to_registry("cnn48_dcgan",
                                skip_args=("c_dim", "img_resolution",
                                           "img_channels"))
class DCGANDiscriminator48(DCGANDiscriminatorCore):
    z_dim: int = 100
    c_dim: int = 0
    img_resolution: int = 48
    img_channels: int = 3
