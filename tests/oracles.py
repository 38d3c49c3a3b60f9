"""Brute-force numpy oracles for the core ops.

These deliberately mirror the mathematical *definition* (pad, zero-insert,
correlate, stride) with naive loops/stride tricks, independent of the XLA
implementations, so op tests compare two independently-derived programs —
the testing strategy the reference used with its `impl='ref'` twins
(reference: upfirdn2d.py:168-208, bias_act.py:93-123)."""

import numpy as np


def upfirdn2d_np(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False,
                 gain=1.0):
    """x: [N,H,W,C] float64. f: [fh,fw] or [taps] or None."""
    x = np.asarray(x, np.float64)
    n, h, w, c = x.shape
    upx = upy = up if np.isscalar(up) else None
    if upx is None:
        upx, upy = up
    downx = downy = down if np.isscalar(down) else None
    if downx is None:
        downx, downy = down
    if np.isscalar(padding):
        px0 = px1 = py0 = py1 = padding
    elif len(padding) == 2:
        px0 = px1 = padding[0]
        py0 = py1 = padding[1]
    else:
        px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones((1, 1))
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)
    if not flip_filter:
        f = f[::-1, ::-1]
    fh, fw = f.shape

    # 1. zero-insert upsample
    up_img = np.zeros((n, h * upy, w * upx, c))
    up_img[:, ::upy, ::upx, :] = x
    # 2. pad (negative = crop)
    H, W = h * upy, w * upx
    padded = np.zeros((n, H + py0 + py1, W + px0 + px1, c))
    ys0, ys1 = max(py0, 0), max(py0, 0) + H - max(-py0, 0) - max(-py1, 0)
    xs0, xs1 = max(px0, 0), max(px0, 0) + W - max(-px0, 0) - max(-px1, 0)
    padded[:, ys0:ys1, xs0:xs1, :] = \
        up_img[:, max(-py0, 0):H - max(-py1, 0), max(-px0, 0):W - max(-px1, 0), :]
    # 3. correlate with f (valid)
    ph, pw = padded.shape[1], padded.shape[2]
    oh, ow = ph - fh + 1, pw - fw + 1
    out = np.zeros((n, oh, ow, c))
    for i in range(fh):
        for j in range(fw):
            out += f[i, j] * padded[:, i:i + oh, j:j + ow, :]
    # 4. downsample
    out = out[:, ::downy, ::downx, :]
    return out * (gain * upx * upy)


def conv2d_np(x, w, stride=1, padding=0, flip_weight=True):
    """x: [N,H,W,Ci], w: [kh,kw,Ci,Co]. Cross-correlation when flip_weight."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    if not flip_weight:
        w = w[::-1, ::-1]
    n, h, ww_, ci = x.shape
    kh, kw, _, co = w.shape
    xp = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (xp.shape[1] - kh) // stride + 1
    ow = (xp.shape[2] - kw) // stride + 1
    out = np.zeros((n, oh, ow, co))
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
            out += np.einsum("nhwc,co->nhwo", patch, w[i, j])
    return out


def conv_transpose2d_np(x, w, stride=2, flip_weight=False):
    """Transpose conv, zero padding: dilate input, pad k-1, convolve."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    kh, kw = w.shape[:2]
    n, h, ww_, ci = x.shape
    dil = np.zeros((n, (h - 1) * stride + 1, (ww_ - 1) * stride + 1, ci))
    dil[:, ::stride, ::stride, :] = x
    dil = np.pad(dil, ((0, 0), (kh - 1, kh - 1), (kw - 1, kw - 1), (0, 0)))
    return conv2d_np(dil, w, stride=1, padding=0, flip_weight=flip_weight)
