"""StyleGAN2 generator and discriminator, TPU-native.

From-scratch flax/NHWC rebuild of reference train_parts/generators.py:273-563
and train_parts/discriminators.py:211-466 (which themselves derive from the
NVlabs networks).  Differences by design:

* modulated conv uses the input/output-scaling formulation (ops/modconv.py) —
  one big batched conv on the MXU, no per-sample grouped weights;
* per-block fp16 becomes bfloat16 (TPU numeric sweet spot; no loss-scaling
  needed), ToRGB accumulation stays fp32 as in the reference;
* per-layer noise uses explicit jax PRNG streams (rng collection 'noise');
* Freeze-D is stop_gradient on frozen layers instead of requires_grad_.

Registered under the same names: 'sg2_classic' (set ``attentions`` for the
sg2attent config).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.models.attention import SelfAttention
from style_big_gan_tpu.models.layers import (Conv2dLayer, FullyConnectedLayer,
                                             MappingNetwork, MinibatchStdLayer)
from style_big_gan_tpu.ops import (bias_act, downsample2d, setup_filter,
                                   upsample2d)
from style_big_gan_tpu.ops.bias_act import activation_funcs
from style_big_gan_tpu.ops.modconv import modulated_conv2d
from style_big_gan_tpu.registries import discriminators, generators


def _channels_dict(resolutions, channel_base, channel_max):
    return {res: min(channel_base // res, channel_max) for res in resolutions}


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias_act (reference: generators.py:273-329)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, noise_mode: str = "random",
                 gain: float = 1.0, fused_modconv: Optional[bool] = None) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnectedLayer(self.in_channels, bias_init=1.0,
                                     name="affine")(w)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size, self.kernel_size,
                             self.in_channels, self.out_channels), jnp.float32)
        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, (),
                                  jnp.float32)
            noise_const = self.variable(
                "noise", "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("noise") if self.has_rng("noise")
                    else jax.random.PRNGKey(0),
                    (self.resolution, self.resolution, 1), jnp.float32))
            if noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"),
                    (x.shape[0], self.resolution, self.resolution, 1),
                    jnp.float32) * strength
            elif noise_mode == "const":
                noise = noise_const.value[None] * strength

        flip_weight = (self.up == 1)
        f = setup_filter(list(self.resample_filter)) if self.up > 1 else None
        x = modulated_conv2d(x.astype(self.dtype), weight, styles,
                             noise=noise, up=self.up,
                             padding=self.kernel_size // 2, resample_filter=f,
                             flip_weight=flip_weight)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                          jnp.float32)
        act_gain = activation_funcs[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias, act=self.activation, gain=act_gain, clamp=clamp)


class ToRGBLayer(nn.Module):
    """1x1 modconv without demodulation (reference: generators.py:334-348)."""
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array,
                 fused_modconv: Optional[bool] = None) -> jax.Array:
        weight_gain = 1.0 / np.sqrt(self.in_channels * self.kernel_size ** 2)
        styles = FullyConnectedLayer(self.in_channels, bias_init=1.0,
                                     name="affine")(w) * weight_gain
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size, self.kernel_size,
                             self.in_channels, self.out_channels), jnp.float32)
        x = modulated_conv2d(x.astype(self.dtype), weight, styles,
                             demodulate=False, padding=self.kernel_size // 2)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                          jnp.float32)
        return bias_act(x, bias, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution rung: const/upsample input, 1-2 SynthesisLayers,
    orig/skip/resnet wiring, optional attention, ToRGB accumulation
    (reference: generators.py:354-458)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    attention: bool = False
    layer_kwargs: Dict[str, Any] = None

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 ws: jax.Array, force_fp32: bool = False,
                 noise_mode: str = "random") -> Tuple[jax.Array, Optional[jax.Array]]:
        assert self.architecture in ("orig", "skip", "resnet")
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        lk = dict(self.layer_kwargs or {})
        f = setup_filter(list(self.resample_filter))
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        if self.in_channels == 0:
            const = self.param("const", nn.initializers.normal(1.0),
                               (self.resolution, self.resolution,
                                self.out_channels), jnp.float32)
            x = jnp.tile(const[None].astype(dtype), (ws.shape[0], 1, 1, 1))
        else:
            x = x.astype(dtype)

        common = dict(w_dim=self.w_dim, resolution=self.resolution,
                      conv_clamp=self.conv_clamp, dtype=dtype,
                      resample_filter=tuple(self.resample_filter), **lk)
        if self.in_channels == 0:
            x = SynthesisLayer(self.out_channels, self.out_channels,
                               name="conv1", **common)(
                x, next_w(), noise_mode=noise_mode)
        elif self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, kernel_size=1, use_bias=False,
                            up=2, resample_filter=tuple(self.resample_filter),
                            dtype=dtype, name="skip")(x, gain=np.sqrt(0.5))
            x = SynthesisLayer(self.in_channels, self.out_channels, up=2,
                               name="conv0", **common)(
                x, next_w(), noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, self.out_channels,
                               name="conv1", **common)(
                x, next_w(), noise_mode=noise_mode, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = SynthesisLayer(self.in_channels, self.out_channels, up=2,
                               name="conv0", **common)(
                x, next_w(), noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, self.out_channels,
                               name="conv1", **common)(
                x, next_w(), noise_mode=noise_mode)

        if self.attention:
            x = SelfAttention(self.out_channels, name="attention")(x)

        if img is not None:
            img = upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.out_channels, self.img_channels,
                           w_dim=self.w_dim, conv_clamp=self.conv_clamp,
                           dtype=dtype, name="torgb")(x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """Resolution ladder 4 -> img_resolution (reference: generators.py:464-519)."""
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    architecture: str = "skip"
    attentions: Sequence[int] = ()
    remat: bool = False         # jax.checkpoint each block (memory for FLOPs)
    layer_kwargs: Dict[str, Any] = None

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self) -> int:
        # conv ws plus the final torgb w (intermediate torgbs reuse the next
        # block's first w, reference: generators.py:498-500).
        n = sum(1 if res == 4 else 2 for res in self.block_resolutions)
        return n + 1

    @nn.compact
    def __call__(self, ws: jax.Array, force_fp32: bool = False,
                 noise_mode: str = "random") -> jax.Array:
        assert self.img_resolution >= 4 and (self.img_resolution &
                                             (self.img_resolution - 1)) == 0
        resolutions = self.block_resolutions
        channels = _channels_dict(resolutions, self.channel_base, self.channel_max)
        fp16_res = max(2 ** (int(np.log2(self.img_resolution)) + 1 -
                             self.num_fp16_res), 8)
        ws = ws.astype(jnp.float32)

        x = img = None
        w_idx = 0
        for res in resolutions:
            in_ch = channels[res // 2] if res > 4 else 0
            block = SynthesisBlock(
                in_channels=in_ch, out_channels=channels[res], w_dim=self.w_dim,
                resolution=res, img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_res and self.num_fp16_res > 0),
                attention=(res in tuple(self.attentions)),
                layer_kwargs=self.layer_kwargs, name=f"b{res}")
            n_ws = block.num_conv + block.num_torgb

            def run_block(blk, x, img, w):
                return blk(x, img, w, force_fp32=force_fp32,
                           noise_mode=noise_mode)

            if self.remat:
                run_block = nn.remat(run_block)
            x, img = run_block(block, x, img, ws[:, w_idx:w_idx + n_ws])
            w_idx += block.num_conv
        return img


@generators.add_to_registry("sg2_classic", skip_args=("c_dim", "img_resolution",
                                                      "img_channels"))
class Generator(nn.Module):
    """StyleGAN2 generator: mapping + synthesis
    (reference: generators.py:533-563).  forward(z, c) -> NHWC image."""
    z_dim: int = 512
    w_dim: int = 512
    c_dim: int = 0
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    architecture: str = "skip"
    attentions: Sequence[int] = ()
    remat: bool = False
    mapping_kwargs: Dict[str, Any] = None
    layer_kwargs: Dict[str, Any] = None

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp, architecture=self.architecture,
            attentions=tuple(self.attentions), remat=self.remat,
            layer_kwargs=self.layer_kwargs)
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, **dict(self.mapping_kwargs or {}))

    @property
    def num_ws(self) -> int:
        return 2 * (int(np.log2(self.img_resolution)) - 1)

    def __call__(self, z: jax.Array, c: Optional[jax.Array] = None,
                 truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False, force_fp32: bool = False,
                 noise_mode: str = "random") -> jax.Array:
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas)
        return self.synthesis(ws, force_fp32=force_fp32, noise_mode=noise_mode)

    def map_ws(self, z, c=None, **kwargs):
        """Expose w for style mixing / PPL (reference SG2Loss.run_Gws)."""
        return self.mapping(z, c, **kwargs)

    def synthesize(self, ws, **kwargs):
        return self.synthesis(ws, **kwargs)


class DiscriminatorBlock(nn.Module):
    """fromRGB + conv ladder rung with orig/skip/resnet wiring and Freeze-D
    (reference: discriminators.py:211-302)."""
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    first_layer_idx: int
    architecture: str = "resnet"
    attention: bool = False
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    freeze_layers: int = 0

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 force_fp32: bool = False) -> Tuple[jax.Array, Optional[jax.Array]]:
        assert self.architecture in ("orig", "skip", "resnet")
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        f = setup_filter(list(self.resample_filter))
        layer_idx = [self.first_layer_idx]

        def trainable():
            t = layer_idx[0] >= self.freeze_layers
            layer_idx[0] += 1
            return t

        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2dLayer(self.tmp_channels, kernel_size=1,
                            activation=self.activation,
                            conv_clamp=self.conv_clamp, dtype=dtype,
                            trainable=trainable(), name="fromrgb")(img)
            x = x + y if x is not None else y
            img = downsample2d(img, f) if self.architecture == "skip" else None

        common = dict(activation=self.activation, conv_clamp=self.conv_clamp,
                      dtype=dtype)
        if self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, kernel_size=1, use_bias=False,
                            down=2, resample_filter=tuple(self.resample_filter),
                            dtype=dtype, trainable=trainable(),
                            name="skip")(x, gain=np.sqrt(0.5))
            x = Conv2dLayer(self.tmp_channels, kernel_size=3,
                            trainable=trainable(), name="conv0", **common)(x)
            x = Conv2dLayer(self.out_channels, kernel_size=3, down=2,
                            resample_filter=tuple(self.resample_filter),
                            trainable=trainable(), name="conv1", **common)(
                x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(self.tmp_channels, kernel_size=3,
                            trainable=trainable(), name="conv0", **common)(x)
            x = Conv2dLayer(self.out_channels, kernel_size=3, down=2,
                            resample_filter=tuple(self.resample_filter),
                            trainable=trainable(), name="conv1", **common)(x)

        if self.attention:
            x = SelfAttention(self.out_channels, name="attention")(x)
        return x, img

    @property
    def num_layers(self) -> int:
        n = 2  # conv0, conv1
        if self.in_channels == 0 or self.architecture == "skip":
            n += 1
        if self.architecture == "resnet":
            n += 1
        return n


class DiscriminatorEpilogue(nn.Module):
    """mbstd -> conv -> fc -> out, projection conditioning
    (reference: discriminators.py:332-389)."""
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, img: Optional[jax.Array],
                 cmap: Optional[jax.Array]) -> jax.Array:
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(self.in_channels, kernel_size=1,
                                activation=self.activation,
                                name="fromrgb")(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size,
                                  self.mbstd_num_channels, name="mbstd")(x)
        x = Conv2dLayer(self.in_channels, kernel_size=3,
                        activation=self.activation, conv_clamp=self.conv_clamp,
                        name="conv")(x)
        x = FullyConnectedLayer(self.in_channels, activation=self.activation,
                                name="fc")(x.reshape(x.shape[0], -1))
        x = FullyConnectedLayer(1 if self.cmap_dim == 0 else self.cmap_dim,
                                name="out")(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (
                1.0 / np.sqrt(self.cmap_dim))
        return x


@discriminators.add_to_registry("sg2_classic", skip_args=("c_dim",
                                                          "img_resolution",
                                                          "img_channels"))
class Discriminator(nn.Module):
    """StyleGAN2 discriminator (reference: discriminators.py:402-466)."""
    c_dim: int = 0
    img_resolution: int = 256
    img_channels: int = 3
    attentions: Sequence[int] = ()
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    freeze_layers: int = 0
    mapping_kwargs: Dict[str, Any] = None
    epilogue_kwargs: Dict[str, Any] = None

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array] = None,
                 force_fp32: bool = False, update_emas: bool = False) -> jax.Array:
        res_log2 = int(np.log2(self.img_resolution))
        resolutions = [2 ** i for i in range(res_log2, 2, -1)]
        channels = _channels_dict(resolutions + [4], self.channel_base,
                                  self.channel_max)
        fp16_res = max(2 ** (res_log2 + 1 - self.num_fp16_res), 8)
        cmap_dim = self.cmap_dim
        if cmap_dim is None:
            cmap_dim = channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        cur_layer_idx = 0
        for res in resolutions:
            block = DiscriminatorBlock(
                in_channels=channels[res] if res < self.img_resolution else 0,
                tmp_channels=channels[res], out_channels=channels[res // 2],
                resolution=res, img_channels=self.img_channels,
                first_layer_idx=cur_layer_idx, architecture=self.architecture,
                attention=(res in tuple(self.attentions)),
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_res and self.num_fp16_res > 0),
                freeze_layers=self.freeze_layers, name=f"b{res}")
            x, img = block(x, img, force_fp32=force_fp32)
            cur_layer_idx += block.num_layers

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim,
                                  num_ws=None, w_avg_beta=1.0,
                                  name="mapping",
                                  **dict(self.mapping_kwargs or {}))(
                None, c, update_emas=False)
        return DiscriminatorEpilogue(
            in_channels=channels[4], cmap_dim=cmap_dim, resolution=4,
            img_channels=self.img_channels, architecture=self.architecture,
            conv_clamp=self.conv_clamp, name="b4",
            **dict(self.epilogue_kwargs or {}))(x, img, cmap)
