"""upfirdn2d: pad -> zero-insert upsample -> FIR filter -> downsample, fused.

TPU-native equivalent of the reference CUDA kernel
(reference: stylegan2ada/torch_utils/ops/upfirdn2d.{cu,cpp,h,py}).  On TPU the
whole operation is exactly one `lax.conv_general_dilated`:

  * zero-insert upsampling  == `lhs_dilation=(up, up)`  (applied before pad),
  * the pad (incl. negative crop) == the conv `padding` argument,
  * the FIR filter           == a depthwise kernel (feature_group_count=C),
  * downsampling             == `window_strides=(down, down)`.

XLA lowers this straight onto the MXU/VPU with no intermediate materialized in
HBM, so there is nothing left for a handwritten kernel to fuse — the ~70
template-specialized CUDA kernels (upfirdn2d.cu:205-341) collapse into this
one call.  Separable filters run as two rank-1 passes (half the MACs).

Layout: NHWC (TPU-native).  Gradients of any order come from `jax.grad`; the
analytic transpose rule of the reference (upfirdn2d.py:212-268) is what XLA's
autodiff derives automatically for this conv.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")


def _parse_scaling(scaling) -> tuple:
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def setup_filter(f,
                 normalize: bool = True,
                 flip_filter: bool = False,
                 gain: float = 1.0,
                 separable: Optional[bool] = None) -> jnp.ndarray:
    """Canonicalize a FIR filter for use with upfirdn2d
    (reference: upfirdn2d.py:72-116).

    Returns float32 array of shape [fh, fw] (non-separable) or [taps]
    (separable).  None -> identity filter.
    """
    if f is None:
        f = 1.0
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim not in (1, 2):
        raise ValueError("filter must be 0/1/2-D")
    if f.size == 0:
        raise ValueError("empty filter")

    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)

    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _filter_taps(f) -> tuple:
    """(fh, fw) of a canonical filter."""
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[0]), int(f.shape[1])


def _depthwise(x: jax.Array, f2d: jnp.ndarray, *,
               up: tuple, down: tuple, pad: tuple) -> jax.Array:
    """One dilated depthwise conv implementing the full upfirdn pipeline."""
    n, h, w, c = x.shape
    fh, fw = int(f2d.shape[0]), int(f2d.shape[1])
    kern = jnp.tile(f2d.astype(x.dtype)[:, :, None, None], (1, 1, 1, c))
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = pad
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(downy, downx),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=_DN,
        feature_group_count=c,
    )


# Implementation selector: 'matmul' = per-axis band-matrix contractions on
# the MXU, 'conv' = depthwise conv_general_dilated (one HLO), 'shift' =
# tap-by-tap shifted adds (pure VPU elementwise, no grouped conv).
# Mirrors the reference's impl='ref'|'cuda' switch (upfirdn2d.py:120-164).
# Measured on TPU v5e (benchmarks/bench_ops.py): the depthwise conv
# lowering runs at only 83-192 GB/s (VPU-bound), while the band-matmul
# formulation — upfirdn along one axis is a linear map, i.e. a banded
# (out_len x in_len) matrix contracted on the MXU, the same trick the ADA
# warp uses for its pad+up2/down2 passes — runs the G/D ladder resamples at
# matmul rates.  'matmul' is the default and falls back to 'conv' for
# traced filters / taps > _MATMUL_MAX_TAPS.
_DEFAULT_IMPL = "matmul"
_MATMUL_MAX_TAPS = 24


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("conv", "shift", "matmul")
    _DEFAULT_IMPL = impl


def _band_matrix(n_in: int, f1d: np.ndarray, up: int, down: int,
                 p0: int, p1: int) -> np.ndarray:
    """Banded matrix M [out, in] of the 1-D upfirdn pipeline
    out[o] = sum_k f[k] * stuffed_padded[o*down + k], stuffed_padded the
    zero-stuffed (factor `up`, up-1 trailing zeros) input padded by
    (p0, p1).  f1d must already be flipped/gained by the caller."""
    taps = int(f1d.shape[0])
    total = n_in * up + p0 + p1
    n_out = (total - taps) // down + 1
    m = np.zeros((max(n_out, 0), n_in), np.float32)
    for o in range(n_out):
        for k in range(taps):
            j = o * down + k - p0
            if 0 <= j < n_in * up and j % up == 0:
                m[o, j // up] += float(f1d[k])
    return m


def _axis_upfirdn_matmul(x: jax.Array, f1d: np.ndarray, axis: int, up: int,
                         down: int, p0: int, p1: int) -> jax.Array:
    """One 1-D upfirdn pass as a band-matrix contraction (MXU)."""
    m = _band_matrix(int(x.shape[axis]), f1d, up, down, p0, p1)
    mj = jnp.asarray(m, x.dtype)
    # Contract x's `axis` with m's second axis; result axis moves to front.
    y = jnp.tensordot(mj, x, axes=((1,), (axis,)))
    return jnp.moveaxis(y, 0, axis)


def _axis_upfirdn_shift(x: jax.Array, f1d: jnp.ndarray, axis: int, up: int,
                        down: int, p0: int, p1: int) -> jax.Array:
    """One 1-D upfirdn pass along `axis` as shifted strided adds.

    out[j] = sum_k f[k] * stuffed_padded[j*down + k], where stuffed_padded is
    the zero-stuffed signal padded by (p0, p1 + up-1).  Negative pads crop.
    """
    taps = int(f1d.shape[0])
    n = x.shape[axis]
    # Zero-stuff along axis (interleave up-1 zeros, trailing included).
    if up > 1:
        shape = list(x.shape)
        xe = jnp.expand_dims(x, axis + 1)
        pads = [(0, 0)] * xe.ndim
        pads[axis + 1] = (0, up - 1)
        xe = jnp.pad(xe, pads)
        shape[axis] = n * up
        x = xe.reshape(shape)
    # Pad / crop.
    lo, hi = p0, p1 + (0 if up == 1 else 0)
    pads = [(0, 0)] * x.ndim
    pads[axis] = (max(lo, 0), max(hi, 0))
    x = jnp.pad(x, pads)
    if lo < 0 or hi < 0:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(max(-lo, 0), x.shape[axis] - max(-hi, 0))
        x = x[tuple(sl)]
    total = x.shape[axis]
    out_len = (total - taps) // down + 1
    out = None
    for k in range(taps):
        w = float(f1d[k])
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + (out_len - 1) * down + 1, down)
        term = x[tuple(sl)] * jnp.asarray(w, x.dtype)
        out = term if out is None else out + term
    if out is None:
        shape = list(x.shape)
        shape[axis] = out_len
        out = jnp.zeros(shape, x.dtype)
    return out


def upfirdn2d(x: jax.Array,
              f: Optional[jnp.ndarray],
              up: Union[int, Sequence[int]] = 1,
              down: Union[int, Sequence[int]] = 1,
              padding: Union[int, Sequence[int]] = 0,
              flip_filter: bool = False,
              gain: float = 1.0,
              impl: Optional[str] = None) -> jax.Array:
    """Upsample, pad (possibly crop), FIR-filter, downsample — in one fused op.

    Semantics match reference `_upfirdn2d_ref` (upfirdn2d.py:168-208) on NHWC:
      out = downsample_{down}( filter_f( pad_{padding}( upsample_{up}(x) ) ) )
    with the upsample contributing gain up_x*up_y through `gain`.
    `flip_filter=False` means true convolution (filter is flipped), matching
    the reference.
    """
    if x.ndim != 4:
        raise ValueError("x must be [N, H, W, C]")
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    total_gain = gain * (upx * upy)
    impl = impl or _DEFAULT_IMPL
    # The shift/matmul paths build static banded structure from the filter,
    # so traced filters fall back to the conv impl.
    if impl in ("shift", "matmul") and isinstance(f, jax.core.Tracer):
        impl = "conv"
    if impl == "matmul":
        fc = np.asarray(f, np.float32)
        if fc.ndim == 2:
            # Rank-1 2-D filters (every SG2 resample filter: outer product
            # of the binomial taps) split into two axis passes; general 2-D
            # filters fall back to the depthwise conv.
            u, s, vt = np.linalg.svd(fc)
            if fc.shape[0] <= _MATMUL_MAX_TAPS and s[0] > 0 and (
                    s[1:] <= 1e-6 * s[0]).all():
                fy1 = u[:, 0] * np.sqrt(s[0])
                fx1 = vt[0] * np.sqrt(s[0])
                # Fix the sign ambiguity: keep each factor's peak positive
                # (binomial filters are nonnegative).
                if fy1[np.abs(fy1).argmax()] < 0:
                    fy1, fx1 = -fy1, -fx1
                fy = (fy1 if flip_filter else fy1[::-1]) * np.sqrt(total_gain)
                fx = (fx1 if flip_filter else fx1[::-1]) * np.sqrt(total_gain)
                x = _axis_upfirdn_matmul(x, fy, axis=1, up=upy, down=downy,
                                         p0=py0, p1=py1)
                return _axis_upfirdn_matmul(x, fx, axis=2, up=upx,
                                            down=downx, p0=px0, p1=px1)
            impl = "conv"
        elif fc.size <= _MATMUL_MAX_TAPS:
            g = float(np.sqrt(total_gain))
            fy = (fc if flip_filter else fc[::-1]) * g
            x = _axis_upfirdn_matmul(x, fy, axis=1, up=upy, down=downy,
                                     p0=py0, p1=py1)
            return _axis_upfirdn_matmul(x, fy, axis=2, up=upx, down=downx,
                                        p0=px0, p1=px1)
        else:
            impl = "conv"

    if impl == "shift":
        f = np.asarray(f, dtype=np.float32)
        # Tap-by-tap shifted adds (see _axis_upfirdn_shift).  2-D filters run
        # as a full 2-D tap loop only if non-separable.
        if f.ndim == 1:
            g = float(np.sqrt(total_gain))
            fy = (f if flip_filter else f[::-1]) * g
            x = _axis_upfirdn_shift(x, fy, axis=1, up=upy, down=downy,
                                    p0=py0, p1=py1)
            x = _axis_upfirdn_shift(x, fy, axis=2, up=upx, down=downx,
                                    p0=px0, p1=px1)
            return x
        f2 = (f if flip_filter else f[::-1, ::-1]) * total_gain
        # Row pass with each filter row, then combine: do the vertical pass
        # per row tap of a 2-D filter == full 2-D correlation; cheaper to do
        # axis passes when the 2-D filter is an outer product, but general
        # 2-D small filters (<=4x4) just loop taps.
        fh, fw = f2.shape
        # vertical: treat each row as contributing a horizontal 1-D pass on a
        # vertically shifted slice; implement as 2-D tap loop via two nested
        # axis shifts on the stuffed/padded array.
        x = _axis_upfirdn_shift(x, np.ones(1, np.float32), axis=1, up=upy,
                                down=1, p0=py0, p1=py1) if upy > 1 or py0 or py1 \
            else x
        # After the vertical stuff+pad (identity filter), run the true 2-D
        # tap loop vertically+horizontally.
        out = None
        n = x.shape[1]
        for i in range(fh):
            sl_v = x[:, i:n - fh + i + 1:downy, :, :] if fh > 1 or downy > 1 \
                else x
            row = _axis_upfirdn_shift(sl_v, f2[i], axis=2, up=upx,
                                      down=downx, p0=px0, p1=px1)
            out = row if out is None else out + row
        return out

    # conv impl: one depthwise conv_general_dilated.  lhs_dilation yields
    # (H-1)*up+1 samples; zero-stuffing semantics append up-1 trailing
    # zeros, which is extra padding on the high side.
    f = jnp.asarray(f, dtype=jnp.float32)
    px1 += upx - 1
    py1 += upy - 1
    if f.ndim == 1:
        # Separable: vertical pass then horizontal pass, sqrt(gain) each.
        g = float(np.sqrt(total_gain))
        fy = f if flip_filter else f[::-1]
        fx = f if flip_filter else f[::-1]
        x = _depthwise(x, (fy * g)[:, None], up=(1, upy), down=(1, downy),
                       pad=(0, 0, py0, py1))
        x = _depthwise(x, (fx * g)[None, :], up=(upx, 1), down=(downx, 1),
                       pad=(px0, px1, 0, 0))
        return x
    if not flip_filter:
        f = f[::-1, ::-1]
    return _depthwise(x, f * total_gain, up=(upx, upy), down=(downx, downy),
                      pad=(px0, px1, py0, py1))


def filter2d(x: jax.Array, f, padding=0, flip_filter: bool = False,
             gain: float = 1.0, impl: Optional[str] = None) -> jax.Array:
    """Filter without resampling (reference: upfirdn2d.py:272-304)."""
    fh, fw = _filter_taps(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += fw // 2
    px1 += (fw - 1) // 2
    py0 += fh // 2
    py1 += (fh - 1) // 2
    return upfirdn2d(x, f, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain, impl=impl)


def upsample2d(x: jax.Array, f, up=2, padding=0, flip_filter: bool = False,
               gain: float = 1.0, impl: Optional[str] = None) -> jax.Array:
    """Upsample with the given filter (reference: upfirdn2d.py:308-343)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = _filter_taps(f)
    px0 += (fw + upx - 1) // 2
    px1 += (fw - upx) // 2
    py0 += (fh + upy - 1) // 2
    py1 += (fh - upy) // 2
    return upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain, impl=impl)


def downsample2d(x: jax.Array, f, down=2, padding=0, flip_filter: bool = False,
                 gain: float = 1.0, impl: Optional[str] = None) -> jax.Array:
    """Downsample with the given filter (reference: upfirdn2d.py:347-382)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = _filter_taps(f)
    px0 += (fw - downx + 1) // 2
    px1 += (fw - downx) // 2
    py0 += (fh - downy + 1) // 2
    py1 += (fh - downy) // 2
    return upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain, impl=impl)
