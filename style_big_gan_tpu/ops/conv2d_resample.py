"""2-D convolution with integrated up/down FIR resampling.

TPU-native equivalent of reference
stylegan2ada/torch_utils/ops/conv2d_resample.py:29-154.  The reference
dispatches between five GPU fast paths (transpose conv, strided conv, 1x1
tricks); on TPU all of them are the same XLA HLO — `conv_general_dilated`
with `lhs_dilation` (upsample) or `window_strides` (downsample) — so this
implementation has just three cases with identical semantics:

  up path   : zero-insert upsample by `up` via conv with lhs_dilation, with the
              *convolution* (flipped-kernel) orientation the reference uses for
              transpose conv (flip_weight=False there), then FIR `f` with gain
              up^2.
  down path : FIR `f` first, then conv with window_strides=down.
  plain     : one conv.

Weight layout: HWIO ([kh, kw, in_channels, out_channels]).  Activation layout:
NHWC.  `flip_weight=True` means cross-correlation (torch conv2d semantics);
False means true convolution.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from style_big_gan_tpu.ops.upfirdn2d import _filter_taps, upfirdn2d

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 0,
           groups: int = 1, flip_weight: bool = True) -> jax.Array:
    """Plain conv wrapper (NHWC / HWIO)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )


def conv2d_resample(x: jax.Array,
                    w: jax.Array,
                    f: Optional[jnp.ndarray] = None,
                    up: int = 1,
                    down: int = 1,
                    padding: int = 0,
                    groups: int = 1,
                    flip_weight: bool = True,
                    flip_filter: bool = False) -> jax.Array:
    """Conv2d with optional up/downsampling (reference:
    conv2d_resample.py:59-154, same padding arithmetic).

    x: [N, H, W, Cin] -- w: [kh, kw, Cin//groups, Cout] -- f: canonical filter.
    """
    assert up >= 1 and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fh, fw = _filter_taps(f)
    px0 = px1 = py0 = py1 = int(padding)

    # Adjust padding for the resampling (reference: conv2d_resample.py:70-79).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        # Transpose-conv path (reference: conv2d_resample.py:106-136).  The
        # conv itself: dilate input by `up`, pad k-1 (minus the crop the
        # reference folds into conv_transpose's padding arg), correlate with
        # the kernel per flip_weight.  conv_transpose(w) == convolution, i.e.
        # flipped correlation, which is what flip_weight=False selects.
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        wc = w if flip_weight else jnp.flip(w, axis=(0, 1))
        x = jax.lax.conv_general_dilated(
            x, wc.astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - pyt, kh - 1 - pyt), (kw - 1 - pxt, kw - 1 - pxt)),
            lhs_dilation=(up, up),
            dimension_numbers=_DN,
            feature_group_count=groups,
        )
        x = upfirdn2d(x, f, padding=(px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt),
                      gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        # FIR first, then strided conv (reference: conv2d_resample.py:96-104).
        if f is not None and (fh > 1 or fw > 1):
            x = upfirdn2d(x, f, padding=(px0, px1, py0, py1),
                          flip_filter=flip_filter)
            return conv2d(x, w, stride=down, groups=groups,
                          flip_weight=flip_weight)
        # No filter: plain strided conv with the adjusted padding.
        wq = w if flip_weight else jnp.flip(w, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            x, wq.astype(x.dtype),
            window_strides=(down, down),
            padding=((py0, py1), (px0, px1)),
            dimension_numbers=_DN,
            feature_group_count=groups,
        )

    # Plain conv (reference: conv2d_resample.py:139-141).
    wq = w if flip_weight else jnp.flip(w, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, wq.astype(x.dtype),
        window_strides=(1, 1),
        padding=((py0, py1), (px0, px1)),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
