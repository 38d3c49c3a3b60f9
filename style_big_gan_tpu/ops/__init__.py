"""Compute ops: XLA-native reference implementations + Pallas TPU kernels.

Every op has a pure-XLA implementation (always available, differentiable to
any order) and, where profitable, a hand-written Pallas kernel selected at
runtime.  Mirrors the reference's `impl='ref'|'cuda'` switch
(reference: upfirdn2d.py:120-164, bias_act.py:55-89).
"""

from style_big_gan_tpu.ops.bias_act import activation_funcs, bias_act
from style_big_gan_tpu.ops.conv2d_resample import conv2d, conv2d_resample
from style_big_gan_tpu.ops.modconv import modulated_conv2d
from style_big_gan_tpu.ops.upfirdn2d import (downsample2d, filter2d,
                                             setup_filter, upfirdn2d,
                                             upsample2d)

__all__ = [
    "activation_funcs", "bias_act", "conv2d", "conv2d_resample",
    "modulated_conv2d", "downsample2d", "filter2d", "setup_filter",
    "upfirdn2d", "upsample2d",
]
