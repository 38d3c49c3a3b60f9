"""ADA augmentation pipeline: 18-knob differentiable, on-device, jit-stable.

TPU-native rebuild of reference train_parts/augmentations.py:24-433 (the
StyleGAN2-ADA pipe).  It runs *inside* the jitted D step as a pure function
``pipe(images, key, p)`` — images NHWC fp32 in [-1,1], ``p`` a traced device
scalar so the ADA controller can update it without recompiling.

Design changes for XLA (reference: SURVEY.md §7 hard parts):

* the reference computes a data-dependent reflect-pad margin from transformed
  corners (augmentations.py:276-291) — a dynamic shape.  Here the margin is a
  *fixed* conservative bound (image_size//2 + filter taps), so every shape is
  static; out-of-range samples reflect, as in the reference.
* `affine_grid`+`grid_sample` become an explicit bilinear gather, which JAX
  differentiates to any order (needed: ADA sits inside the R1 double
  backward).
* per-op gating is a `where` mask per image; matrix ops compose
  conditionally, so the whole pipe is one trace regardless of p.

`debug_percentile` replaces every random draw with a fixed percentile of its
distribution (reference: augmentations.py:185-431) — used by golden tests.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from style_big_gan_tpu.ops.upfirdn2d import setup_filter, upfirdn2d
from style_big_gan_tpu.registries import augmentations

# ---------------------------------------------------------------------------
# Wavelet table (reference: augmentations.py:24-41).
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "db1": [0.7071067811865476, 0.7071067811865476],
    "db2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
            0.48296291314469025],
    "db3": [0.035226291882100656, -0.08544127388224149, -0.13501102001039084,
            0.4598775021193313, 0.8068915093133388, 0.3326705529509569],
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym3": [0.035226291882100656, -0.08544127388224149, -0.13501102001039084,
             0.4598775021193313, 0.8068915093133388, 0.3326705529509569],
    "sym6": [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}

# ---------------------------------------------------------------------------
# Homogeneous-matrix helpers (reference: augmentations.py:46-110).


def _mat3(rows):
    return jnp.stack([jnp.stack(r) for r in rows])


def translate2d(tx, ty):
    z, o = jnp.zeros_like(tx * 1.0), jnp.ones_like(tx * 1.0)
    return _mat3([[o, z, tx * o], [z, o, ty * o], [z, z, o]])


def translate2d_inv(tx, ty):
    return translate2d(-tx, -ty)


def scale2d(sx, sy):
    sx, sy = jnp.asarray(sx, jnp.float32), jnp.asarray(sy, jnp.float32)
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return _mat3([[sx, z, z], [z, sy, z], [z, z, o]])


def scale2d_inv(sx, sy):
    return scale2d(1.0 / sx, 1.0 / sy)


def rotate2d(theta):
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return _mat3([[c, -s, z], [s, c, z], [z, z, o]])


def rotate2d_inv(theta):
    return rotate2d(-theta)


def translate3d(tx, ty, tz):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[0, 3].set(tx).at[1, 3].set(ty).at[2, 3].set(tz)


def scale3d(sx, sy, sz):
    return jnp.diag(jnp.asarray([sx, sy, sz, 1.0], jnp.float32))


def rotate3d(v, theta):
    """Rotation about axis v (reference: augmentations.py:88-99)."""
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1.0 - c
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, 0.0 * s],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, 0.0 * s],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, 0.0 * s],
        [0.0 * s, 0.0 * s, 0.0 * s, 1.0 + 0.0 * s],
    ]
    return jnp.stack([jnp.stack([jnp.asarray(e, jnp.float32) for e in r])
                      for r in rows])


def _filter_bank() -> np.ndarray:
    """4-band a-trous filter bank from sym2 (reference: augmentations.py:168-174)."""
    hz_lo = np.asarray(WAVELETS["sym2"])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, 4):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(4, -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2], mode="full")
        fbank[i, (fbank.shape[1] - hz_hi2.size) // 2:
              (fbank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return fbank


_MM_PREC = jax.lax.Precision.HIGHEST


def _prec_for(dtype) -> jax.lax.Precision:
    """Matmul precision by datapath dtype: full 6-pass fp32 for f32, native
    MXU for bf16.  Single source of truth for the warp's einsums."""
    return _MM_PREC if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _shift_clamp(x: jax.Array, t: int, axis: int) -> jax.Array:
    """x[clamp(i + t)] along `axis` for static t >= 0 (edge-replicating
    shift): a concat of a slice and a broadcast edge — no gather."""
    if t == 0:
        return x
    size = x.shape[axis]
    t = min(t, size - 1)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(t, None)
    body = x[tuple(sl)]
    sl[axis] = slice(size - 1, size)
    edge = x[tuple(sl)]
    reps = list(x.shape)
    reps[axis] = t
    return jnp.concatenate([body, jnp.broadcast_to(edge, reps)], axis=axis)


def _fractional_shift(x: jax.Array, shift: jax.Array, axis: int,
                      max_shift: int) -> jax.Array:
    """x[clamp(i + shift)] along `axis` with linear interpolation; `shift` is
    a non-negative float array broadcastable to x (constant along `axis`).

    TPU-native variable shift: binary decomposition of the integer part into
    log2(max_shift) static edge-replicating shifts gated by per-element
    selects (clamped shifts in one direction compose exactly), plus one more
    shift for the fractional lerp.  All ops are slices/selects/FMAs — no
    gather, and the whole thing transposes cleanly under AD."""
    bits = max(1, int(np.ceil(np.log2(max_shift + 2))))
    idx = jnp.floor(shift)
    # Position math stays f32 (bf16 has 8 mantissa bits: positions beyond
    # 256 would quantize); only the in-[0,1) lerp weight drops to x.dtype.
    frac = (shift - idx).astype(x.dtype)
    idx = idx.astype(jnp.int32)
    cur = x
    for b in range(bits):
        k = 1 << b
        cur = jnp.where((idx & k) > 0, _shift_clamp(cur, k, axis), cur)
    nxt = _shift_clamp(cur, 1, axis)
    return cur * (1.0 - frac) + nxt * frac


def _edge_pad_front(x: jax.Array, t: int, axis: int) -> jax.Array:
    """Prepend t edge-replicated slices along `axis`: xP[i] = x[max(i-t, 0)].
    Turns the signed shift range [-t, +t] into non-negative shifts (which
    compose exactly under clamping) while keeping every original position
    addressable."""
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, 1)
    edge = x[tuple(sl)]
    reps = list(x.shape)
    reps[axis] = t
    return jnp.concatenate([jnp.broadcast_to(edge, reps), x], axis=axis)


def _tent_matrix(pos: jax.Array, size: int) -> jax.Array:
    """[n, V, size] linear-interpolation (tent) weights for clamped sampling
    at real positions pos [n, V] — the 1-D resample becomes one MXU matmul."""
    pos = jnp.clip(pos, 0.0, float(size - 1))
    i = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - i))


# Backend for the warp's scanline pass: 'jnp' = shift cascade + einsum (the
# reference formulation below), 'pallas' = the fused single-HBM-pass kernel
# (ops/warp_pallas.py), 'auto' = pallas on accelerators, jnp on CPU.
_WARP_PASS_BACKEND = "auto"


def set_warp_pass_backend(backend: str) -> None:
    """Select the scanline-pass backend.  The choice is baked in at trace
    time and is NOT part of the jit cache key, so already-compiled
    functions would silently keep the old backend — clear the caches to
    force retraces."""
    global _WARP_PASS_BACKEND
    assert backend in ("auto", "jnp", "pallas")
    if backend != _WARP_PASS_BACKEND:
        _WARP_PASS_BACKEND = backend
        jax.clear_caches()


def _use_pallas_warp() -> bool:
    if _WARP_PASS_BACKEND == "auto":
        # The kernel is GSPMD-partitionable along the batch axis
        # (ops/warp_pallas.py::_sharded_call), so it is the accelerator
        # default for single- and multi-chip meshes alike; CPU keeps the
        # jnp path (interpret-mode pallas is for tests only).
        return jax.default_backend() != "cpu"
    return _WARP_PASS_BACKEND == "pallas"


def _scanline_pass(padded, tent, shift, smax: int) -> jax.Array:
    """One warp pass over `padded` [n, A, B, c]: per-column fractional
    clamp-shift along axis 1 by shift [n, B], then the tent resample
    [n, V, A] @ rows -> [n, V, B, c]."""
    n, a, bcols, c = padded.shape
    bits = max(1, int(np.ceil(np.log2(2 * smax + 2))))
    # Kernel VMEM working set per grid cell: src block (a x 128) with ~3
    # cascade temporaries, the whole tent (V x a), and the out block.  Fall
    # back to the jnp path when it would not fit the ~16 MB VMEM (a 512px
    # warp with an f32 tent already exceeds it).
    v = tent.shape[1]
    dt = padded.dtype.itemsize
    vmem_est = dt * (4 * a * 128 + v * a + v * 128)
    if _use_pallas_warp() and vmem_est < 12 * 1024 * 1024:
        from style_big_gan_tpu.ops.warp_pallas import warp_pass
        flat = padded.reshape(n, a, bcols * c)
        shift_l = jnp.repeat(shift, c, axis=1)
        out = warp_pass(flat, tent.astype(padded.dtype), shift_l, bits)
        return out.reshape(n, v, bcols, c)
    sh = _fractional_shift(padded, shift[:, None, :, None], axis=1,
                           max_shift=2 * smax)
    return jnp.einsum("nvi,niwc->nvwc", tent.astype(padded.dtype), sh,
                      precision=_prec_for(padded.dtype))


def affine_warp_2pass(src: jax.Array, coef: jax.Array,
                      out_h: int, out_w: int) -> jax.Array:
    """Per-image affine warp out[yo,xo] = src[py(xo,yo), px(xo,yo)] as a
    2-pass Catmull-Smith scanline decomposition — the TPU-native replacement
    for grid_sample (reference: augmentations.py:297-301).

    coef is [n, 6] = (a, b, c, d, e, f) with px = a*xo + b*yo + c and
    py = d*xo + e*yo + f.  Structure per pass: a per-(row|column) fractional
    shift (static shift cascade + selects) followed by a per-image 1-D tent
    resample as ONE batched matmul on the MXU.  A per-image transpose select
    first bounds the vertical-pass slope |d/a| <= 1 (the classic rotation
    "bottleneck" fix).  Everything is linear in src: jax.grad to any order
    works with no custom VJP, and the transpose ops are equally TPU-fast.

    Versus the bilinear gather (`bilinear_sample`): TPU gathers are
    index-rate-bound (measured 54 ms fwd / ~250 ms bwd for the 256px ADA
    warp; this form is ~10x faster).  Interpolation is linear per pass
    (cascaded lerps), which differs from single-pass 2-D bilinear by
    O(h^2 f_xy) — negligible on ADA's 2x-oversampled low-passed input.
    Out-of-range samples clamp, as in `bilinear_sample`; per-pass shifts
    clamp to +-smax (extreme draws degrade at borders exactly like the
    fixed-margin reflect pad does)."""
    n, size, size2, c = src.shape
    assert size == size2, "2-pass warp requires square input"
    # Per-pass shifts are measured from the array center; |slope| <= 1 for
    # the vertical pass (swap) and samples farther than size/2 from center
    # are off-array (edge-clamped) anyway, so size//2 bounds every shift
    # that can matter.
    smax = size // 2
    a, b, c0, d, e, f0 = (coef[:, i].astype(jnp.float32) for i in range(6))

    # Factor out the quarter turn: sample the transposed image when the
    # transform maps output-x mostly to source-y.  Reflections need no
    # handling — negative slopes flow through shifts and tent matrices.
    swap = jnp.abs(d) > jnp.abs(a)
    src_t = jnp.transpose(src, (0, 2, 1, 3))
    src2 = jnp.where(swap[:, None, None, None], src_t, src)
    ax = jnp.where(swap, d, a)
    bx = jnp.where(swap, e, b)
    cx0 = jnp.where(swap, f0, c0)
    ay = jnp.where(swap, a, d)
    by = jnp.where(swap, b, e)
    cy0 = jnp.where(swap, c0, f0)

    ax_safe = jnp.where(jnp.abs(ax) < 1e-8, 1e-8, ax)
    al = ay / ax_safe                      # |al| <= 1 by the swap choice
    be = by - al * bx
    ga = cy0 - al * cx0

    # Pass 1 (vertical): tmp[v, x] = src2[al*x + be*v + ga, x].
    # The signed per-column shift al*(x-xc) becomes a non-negative shift of
    # a front-padded array (shifts of one sign compose exactly under clamp);
    # the tent resample then reads padded coordinates q + smax.
    xs = jnp.arange(size, dtype=jnp.float32)
    xc = (size - 1) / 2.0
    sigma = al[:, None] * (xs[None, :] - xc)                    # [n, size]
    sigma = jnp.clip(sigma, -float(smax), float(smax)) + float(smax)
    v = jnp.arange(out_h, dtype=jnp.float32)
    q1 = be[:, None] * v[None, :] + (ga + al * xc)[:, None]
    t1 = _tent_matrix(q1, size + smax)                          # [n,out_h,S+m]
    tmp = _scanline_pass(_edge_pad_front(src2, smax, axis=1), t1, sigma,
                         smax)                                  # [n,V,S,c]

    # Pass 2 (horizontal): out[v, u] = tmp[v, ax*u + bx*v + cx0] — run in
    # the transposed layout [n, x, v, c] so it is the same axis-1 scanline
    # pass (shift along x, varying per lane v).
    yc = (out_h - 1) / 2.0
    tau = bx[:, None] * (v[None, :] - yc)                       # [n, out_h]
    tau = jnp.clip(tau, -float(smax), float(smax)) + float(smax)
    u = jnp.arange(out_w, dtype=jnp.float32)
    q2 = ax[:, None] * u[None, :] + (cx0 + bx * yc)[:, None]
    t2 = _tent_matrix(q2, size + smax)                          # [n,out_w,S+m]
    tmp_t = jnp.transpose(tmp, (0, 2, 1, 3))                    # [n,S,V,c]
    out = _scanline_pass(_edge_pad_front(tmp_t, smax, axis=1), t2, tau,
                         smax)                                  # [n,U,V,c]
    return jnp.transpose(out, (0, 2, 1, 3))


_RESAMPLE_MATS: dict = {}


def _upfirdn1d_matrix(l_in: int, f: np.ndarray, up: int, down: int,
                      p0: int, p1: int, gain: float) -> np.ndarray:
    """Dense [out, l_in] matrix of one 1-D upfirdn pass (zero-stuff by `up`,
    pad (p0, p1), correlate with gain*f[::-1], stride `down`) — the exact
    math of ops/upfirdn2d.py::_axis_upfirdn_shift as a matrix."""
    taps = int(f.shape[0])
    fy = f[::-1] * gain
    stuffed = l_in * up
    total = stuffed + p0 + p1
    out_len = (total - taps) // down + 1
    m = np.zeros((out_len, l_in), np.float32)
    for k in range(taps):
        for j in range(out_len):
            idx = j * down + k - p0
            if 0 <= idx < stuffed and idx % up == 0:
                m[j, idx // up] += fy[k]
    return m


def _geom_resample_mats(size: int, margin: int,
                        hz: np.ndarray) -> tuple:
    """(B_up [2(size+2*margin), size], B_dn [size, 2*size]) static matrices
    folding reflect-pad + 2x sym6 upsample, and 2x sym6 downsample, each
    along ONE axis — so the ADA geometric resamples become four batched
    matmuls on the MXU instead of pad+depthwise-conv passes."""
    key = (size, margin, hz.tobytes())
    hit = _RESAMPLE_MATS.get(key)
    if hit is not None:
        return hit
    taps = int(hz.shape[0])
    lp = size + 2 * margin
    # reflect-pad operator [lp, size]
    idx = np.pad(np.arange(size), margin, mode="reflect")
    pmat = np.zeros((lp, size), np.float32)
    pmat[np.arange(lp), idx] = 1.0
    # per-axis gain sqrt(up_x*up_y) = 2 (ops/upfirdn2d.py:209,248)
    b_up = _upfirdn1d_matrix(lp, hz, up=2, down=1,
                             p0=taps // 2, p1=(taps - 1) // 2,
                             gain=2.0) @ pmat
    b_dn = _upfirdn1d_matrix(2 * size, hz, up=1, down=2,
                             p0=(taps - 1) // 2, p1=(taps - 2) // 2,
                             gain=1.0)
    # Cache numpy (not device arrays): a device constant born inside one jit
    # trace must not be reused in another (tracer leak).
    _RESAMPLE_MATS[key] = (b_up, b_dn)
    return _RESAMPLE_MATS[key]


def bilinear_sample(images: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Gather-based bilinear sampling, NHWC.  gx/gy are pixel coordinates
    into images; out-of-range clamps (callers pre-pad with reflection).

    The four corner reads are FLAT 1-D gathers (row-major index) — TPU
    lowers multi-dimensional gathers to enormous unrolled code (the 2-D
    indexed form alone pushed the 256px train step past the TPU program
    size limit), while single-axis gathers stay compact."""
    n, h, w, c = images.shape
    oh, ow = gx.shape[-2], gx.shape[-1]
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
    # Weights from the *clipped* corners so boundary samples stay exact.
    wx = jnp.clip(gx - x0.astype(gx.dtype), 0.0, 1.0)[..., None]
    wy = jnp.clip(gy - y0.astype(gy.dtype), 0.0, 1.0)[..., None]

    # TPU gathers are index-rate bound (~1 element/index): the naive 4-corner
    # form costs 4*N*OH*OW indices (measured 152 ms for the 256px ADA warp).
    # Pre-stack the 2x2 neighborhood as channels (cheap shifted copies, pure
    # elementwise) and fetch the whole patch with ONE gather -> 4x fewer
    # indices, and the corner lerp becomes elementwise math.
    p00 = images[:, :h - 1, :w - 1, :]
    p01 = images[:, :h - 1, 1:, :]
    p10 = images[:, 1:, :w - 1, :]
    p11 = images[:, 1:, 1:, :]
    patch = jnp.concatenate([p00, p01, p10, p11], axis=-1)   # [n,h-1,w-1,4c]
    flat = patch.reshape(n, (h - 1) * (w - 1), 4 * c)

    idx = (y0 * (w - 1) + x0).reshape(n, -1)                 # [n, oh*ow]
    g = jnp.take_along_axis(flat, idx[..., None], axis=1)
    g = g.reshape(n, oh, ow, 4, c)
    v00, v01, v10, v11 = g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@augmentations.add_to_registry("sg2_ada")
class AugmentPipe:
    """The full ADA pipe (reference: augmentations.py:120-433)."""

    def __init__(self,
                 xflip=0.0, rotate90=0.0, xint=0.0, xint_max=0.125,
                 scale=0.0, rotate=0.0, aniso=0.0, xfrac=0.0,
                 scale_std=0.2, rotate_max=1.0, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0.0, contrast=0.0, lumaflip=0.0, hue=0.0,
                 saturation=0.0, brightness_std=0.2, contrast_std=0.5,
                 hue_max=1.0, saturation_std=1.0,
                 imgfilter=0.0, imgfilter_bands=(1.0, 1.0, 1.0, 1.0),
                 imgfilter_std=1.0,
                 noise=0.0, cutout=0.0, noise_std=0.1, cutout_size=0.5,
                 debug_percentile: Optional[float] = None,
                 warp_impl: str = "twopass",
                 warp_dtype: str = "bfloat16"):
        self.xflip = float(xflip)
        self.rotate90 = float(rotate90)
        self.xint = float(xint)
        self.xint_max = float(xint_max)
        self.scale = float(scale)
        self.rotate = float(rotate)
        self.aniso = float(aniso)
        self.xfrac = float(xfrac)
        self.scale_std = float(scale_std)
        self.rotate_max = float(rotate_max)
        self.aniso_std = float(aniso_std)
        self.xfrac_std = float(xfrac_std)
        self.brightness = float(brightness)
        self.contrast = float(contrast)
        self.lumaflip = float(lumaflip)
        self.hue = float(hue)
        self.saturation = float(saturation)
        self.brightness_std = float(brightness_std)
        self.contrast_std = float(contrast_std)
        self.hue_max = float(hue_max)
        self.saturation_std = float(saturation_std)
        self.imgfilter = float(imgfilter)
        self.imgfilter_bands = tuple(float(b) for b in imgfilter_bands)
        self.imgfilter_std = float(imgfilter_std)
        self.noise = float(noise)
        self.cutout = float(cutout)
        self.noise_std = float(noise_std)
        self.cutout_size = float(cutout_size)
        self.debug_percentile = debug_percentile
        if warp_impl not in ("twopass", "gather"):
            raise ValueError(f"warp_impl must be twopass|gather: {warp_impl}")
        self.warp_impl = warp_impl
        # bf16 halves the warp's HBM traffic and runs its matmuls at native
        # MXU rate; position math stays f32 (see affine_warp_2pass).  The D
        # this pipe feeds runs its conv blocks in bf16 at these resolutions
        # anyway (num_fp16_res), so augmentation at bf16 costs no precision
        # the model would have kept.  Only used by the twopass path.
        if warp_dtype not in ("bfloat16", "float32"):
            raise ValueError(f"warp_dtype must be bfloat16|float32: "
                             f"{warp_dtype}")
        self.warp_dtype = jnp.bfloat16 if warp_dtype == "bfloat16" \
            else jnp.float32

        self.hz_geom = setup_filter(WAVELETS["sym6"])
        self.hz_fbank = jnp.asarray(_filter_bank(), jnp.float32)

    # ----------------------------------------------------- random primitives

    def _uniform(self, key, shape, lo, hi, percentile_of=None):
        if self.debug_percentile is not None:
            return jnp.full(shape, lo + (hi - lo) * self.debug_percentile,
                            jnp.float32)
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)

    def _randint(self, key, shape, n):
        if self.debug_percentile is not None:
            return jnp.full(shape, int(self.debug_percentile * n), jnp.int32)
        return jax.random.randint(key, shape, 0, n)

    def _lognormal(self, key, shape, std):
        if self.debug_percentile is not None:
            # Reference debug convention: exp2(erfinv(2q-1) * std) — erfinv
            # WITHOUT the sqrt(2) of a true normal percentile
            # (augmentations.py:233 etc.).
            from scipy.special import erfinv
            return jnp.full(shape, float(2 ** (
                erfinv(2 * self.debug_percentile - 1) * std)), jnp.float32)
        return jnp.exp2(jax.random.normal(key, shape, jnp.float32) * std)

    def _normal(self, key, shape, std):
        if self.debug_percentile is not None:
            # Reference debug convention: erfinv(2q-1) * std (no sqrt(2)).
            from scipy.special import erfinv
            return jnp.full(shape, float(
                erfinv(2 * self.debug_percentile - 1) * std), jnp.float32)
        return jax.random.normal(key, shape, jnp.float32) * std

    def _gate(self, key, shape, prob):
        """Bernoulli(p * op_strength) mask."""
        if self.debug_percentile is not None:
            return jnp.broadcast_to(self.debug_percentile < prob, shape)
        return jax.random.uniform(key, shape, jnp.float32) < prob

    # ------------------------------------------------------------------ main

    def __call__(self, images: jax.Array, key: jax.Array, p) -> jax.Array:
        n, h, w, c = images.shape
        p = jnp.asarray(p, jnp.float32)
        keys = list(jax.random.split(key, 36))
        images = images.astype(jnp.float32)

        # ---------------- pixel blitting + geometric as one inverse homography
        G_inv = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        any_geom = any(v > 0 for v in (self.xflip, self.rotate90, self.xint,
                                       self.scale, self.rotate, self.aniso,
                                       self.xfrac))
        if any_geom:
            if self.xflip > 0:
                i = self._randint(keys.pop(), (n,), 2).astype(jnp.float32)
                i = jnp.where(self._gate(keys.pop(), (n,), self.xflip * p),
                              i, 0.0)
                G_inv = G_inv @ jax.vmap(scale2d_inv)(1.0 - 2.0 * i,
                                                      jnp.ones((n,)))
            if self.rotate90 > 0:
                i = self._randint(keys.pop(), (n,), 4).astype(jnp.float32)
                i = jnp.where(self._gate(keys.pop(), (n,), self.rotate90 * p),
                              i, 0.0)
                G_inv = G_inv @ jax.vmap(rotate2d_inv)(-np.pi / 2 * i)
            if self.xint > 0:
                t = self._uniform(keys.pop(), (n, 2), -self.xint_max,
                                  self.xint_max)
                t = jnp.where(self._gate(keys.pop(), (n, 1), self.xint * p),
                              t, 0.0)
                G_inv = G_inv @ jax.vmap(translate2d_inv)(
                    jnp.round(t[:, 0] * w), jnp.round(t[:, 1] * h))
            if self.scale > 0:
                s = self._lognormal(keys.pop(), (n,), self.scale_std)
                s = jnp.where(self._gate(keys.pop(), (n,), self.scale * p),
                              s, 1.0)
                G_inv = G_inv @ jax.vmap(scale2d_inv)(s, s)
            p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - self.rotate * p, 0.0, 1.0))
            if self.rotate > 0:
                theta = self._uniform(keys.pop(), (n,),
                                      -np.pi * self.rotate_max,
                                      np.pi * self.rotate_max)
                theta = jnp.where(self._gate(keys.pop(), (n,), p_rot),
                                  theta, 0.0)
                G_inv = G_inv @ jax.vmap(rotate2d_inv)(-theta)
            if self.aniso > 0:
                s = self._lognormal(keys.pop(), (n,), self.aniso_std)
                s = jnp.where(self._gate(keys.pop(), (n,), self.aniso * p),
                              s, 1.0)
                G_inv = G_inv @ jax.vmap(scale2d_inv)(s, 1.0 / s)
            if self.rotate > 0:
                theta = self._uniform(keys.pop(), (n,),
                                      -np.pi * self.rotate_max,
                                      np.pi * self.rotate_max)
                theta = jnp.where(self._gate(keys.pop(), (n,), p_rot),
                                  theta, 0.0)
                if self.debug_percentile is not None:
                    # Reference zeroes the POST-rotation in debug mode
                    # (augmentations.py:257-258) so pre+post don't cancel.
                    theta = jnp.zeros_like(theta)
                G_inv = G_inv @ jax.vmap(rotate2d_inv)(-theta)
            if self.xfrac > 0:
                t = self._normal(keys.pop(), (n, 2), self.xfrac_std)
                t = jnp.where(self._gate(keys.pop(), (n, 1), self.xfrac * p),
                              t, 0.0)
                G_inv = G_inv @ jax.vmap(translate2d_inv)(t[:, 0] * w,
                                                          t[:, 1] * h)
            images = self._execute_geom(images, G_inv)

        # ------------------------------------------------- color transforms
        any_color = any(v > 0 for v in (self.brightness, self.contrast,
                                        self.lumaflip, self.hue,
                                        self.saturation))
        if any_color:
            C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
            v = jnp.asarray([1, 1, 1, 0], jnp.float32) / np.sqrt(3)
            if self.brightness > 0:
                b = self._normal(keys.pop(), (n,), self.brightness_std)
                b = jnp.where(self._gate(keys.pop(), (n,),
                                         self.brightness * p), b, 0.0)
                C = jax.vmap(lambda bb: translate3d(bb, bb, bb))(b) @ C
            if self.contrast > 0:
                cs = self._lognormal(keys.pop(), (n,), self.contrast_std)
                cs = jnp.where(self._gate(keys.pop(), (n,),
                                          self.contrast * p), cs, 1.0)
                C = jax.vmap(lambda s: scale3d(s, s, s))(cs) @ C
            if self.lumaflip > 0:
                i = self._randint(keys.pop(), (n,), 2).astype(jnp.float32)
                i = jnp.where(self._gate(keys.pop(), (n,),
                                         self.lumaflip * p), i, 0.0)
                house = jnp.eye(4) - 2.0 * jnp.outer(v, v)
                C = jnp.where(i[:, None, None] > 0.5, house[None],
                              jnp.eye(4)[None]) @ C
            if self.hue > 0 and c > 1:
                theta = self._uniform(keys.pop(), (n,), -np.pi * self.hue_max,
                                      np.pi * self.hue_max)
                theta = jnp.where(self._gate(keys.pop(), (n,), self.hue * p),
                                  theta, 0.0)
                C = jax.vmap(lambda t: rotate3d(v, t))(theta) @ C
            if self.saturation > 0 and c > 1:
                s = self._lognormal(keys.pop(), (n,), self.saturation_std)
                s = jnp.where(self._gate(keys.pop(), (n,),
                                         self.saturation * p), s, 1.0)
                vv = jnp.outer(v, v)
                C = (vv[None] + (jnp.eye(4) - vv)[None] *
                     s[:, None, None]) @ C
            images = self._execute_color(images, C)

        # --------------------------------------------- image-space filtering
        if self.imgfilter > 0:
            images = self._execute_imgfilter(images, keys.pop(), keys.pop(), p)

        # ------------------------------------------------- noise and cutout
        if self.noise > 0:
            if self.debug_percentile is not None:
                # Reference debug: sigma = erfinv(q) * std
                # (augmentations.py:408-409), NOT |ppf(q)| * std.
                from scipy.special import erfinv
                sigma = jnp.full((n,), float(erfinv(self.debug_percentile)
                                             * self.noise_std), jnp.float32)
            else:
                sigma = jnp.abs(self._normal(keys.pop(), (n,),
                                             self.noise_std))
            sigma = jnp.where(self._gate(keys.pop(), (n,), self.noise * p),
                              sigma, 0.0)
            nz = jax.random.normal(keys.pop(), images.shape, jnp.float32)
            images = images + nz * sigma[:, None, None, None]
        if self.cutout > 0:
            size = self.cutout_size
            center = self._uniform(keys.pop(), (n, 2), 0.0, 1.0)
            use = self._gate(keys.pop(), (n, 1, 1, 1), self.cutout * p)
            cx = center[:, 0][:, None, None, None]
            cy = center[:, 1][:, None, None, None]
            coord_x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            coord_y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            mask_x = (jnp.abs(coord_x[None, None, :, None] - cx) >= size / 2)
            mask_y = (jnp.abs(coord_y[None, :, None, None] - cy) >= size / 2)
            mask = jnp.logical_or(mask_x, mask_y)
            mask = jnp.where(use, mask, True)
            images = images * mask.astype(images.dtype)

        return images

    # ------------------------------------------------------------ executors

    def _execute_geom(self, images: jax.Array, G_inv: jax.Array) -> jax.Array:
        """pad(reflect, fixed margin) -> 2x upsample -> bilinear warp ->
        2x downsample (reference: augmentations.py:274-305).

        Alignment uses the exact group delay (center of mass) of the sym6
        low-pass — symlets are only *near*-symmetric, so the nominal
        half-pixel bookkeeping of the reference's grid_sample would drift by
        ~0.4px per up/down pair."""
        n, h, w, c = images.shape
        hz = self.hz_geom
        taps = int(hz.shape[0])
        # Fixed margin (static shapes for XLA).  W/4 covers the typical draw
        # of the default knobs (xint<=0.125W, xfrac sigma 0.125W, scale/aniso
        # lognormal sigma 0.2); rarer extreme samples reflect at the border,
        # the same failure mode as the reference's clamped data-dependent
        # margin (augmentations.py:283-291).  Halving the margin cuts the
        # padded/upsampled working set ~40% (the warp dominates ADA cost).
        margin = min(max(h, w) // 4, 64) + taps

        # Group delay of the convolution kernel (upfirdn flips f).
        f_conv = np.asarray(hz)[::-1]
        com = float((np.arange(taps) * f_conv).sum() / f_conv.sum())
        d_u = com - taps // 2           # up-pass delay (vs its padding)
        d_d = com - (taps - 1) // 2     # down-pass delay

        # Warp grid: warp index j represents output coordinate (j - d_d)/2
        # (so the later down-pass interpolation lands exactly on output
        # pixel centers).
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        if self.warp_impl == "twopass" and h == w:
            # reflect-pad + up2x and the final down2x as four batched MXU
            # matmuls against static band matrices (measured: the pad +
            # depthwise up/down passes were ~14 ms of the 18 ms pipe at
            # 256px; the matmul form is ~10x cheaper and its transpose
            # under AD is again a matmul).
            b_up, b_dn = _geom_resample_mats(h, margin, np.asarray(hz))
            wdt = self.warp_dtype
            prec = _prec_for(wdt)
            b_up = jnp.asarray(b_up, wdt)
            b_dn = jnp.asarray(b_dn, wdt)
            up = jnp.einsum("ri,nixc->nrxc", b_up, images.astype(wdt),
                            precision=prec)
            up = jnp.einsum("xj,nrjc->nrxc", b_up, up, precision=prec)
            # Affine coefficients of the grid->source-pixel map, i.e. the
            # expansion of px = 2*(G_inv @ ((j - d_d)/2 - c) + c + m) - d_u.
            g00, g01, g02 = G_inv[:, 0, 0], G_inv[:, 0, 1], G_inv[:, 0, 2]
            g10, g11, g12 = G_inv[:, 1, 0], G_inv[:, 1, 1], G_inv[:, 1, 2]
            c0 = (-g00 * (d_d + 2 * cx) - g01 * (d_d + 2 * cy)
                  + 2 * g02 + 2 * cx + 2 * margin - d_u)
            f0 = (-g10 * (d_d + 2 * cx) - g11 * (d_d + 2 * cy)
                  + 2 * g12 + 2 * cy + 2 * margin - d_u)
            coef = jnp.stack([g00, g01, c0, g10, g11, f0], axis=1)
            warped = affine_warp_2pass(up, coef, 2 * h, 2 * w)
            out = jnp.einsum("ri,nixc->nrxc", b_dn, warped, precision=prec)
            out = jnp.einsum("xj,nrjc->nrxc", b_dn, out, precision=prec)
            return out.astype(images.dtype)

        pad_img = jnp.pad(images, ((0, 0), (margin, margin), (margin, margin),
                                   (0, 0)), mode="reflect")
        # Upsample 2x (upfirdn2d applies the up^2 energy gain internally).
        # impl='shift': at C=3 the depthwise-conv lowering uses 3 of 128
        # vector lanes (measured 175 ms for the whole pipe at 256px); the
        # tap-shift elementwise form vectorizes over the flattened array.
        up = upfirdn2d(pad_img, hz, up=2,
                       padding=(taps // 2, (taps - 1) // 2,
                                taps // 2, (taps - 1) // 2), impl="shift")
        ox = (jnp.arange(2 * w, dtype=jnp.float32) - d_d) / 2.0 - cx
        oy = (jnp.arange(2 * h, dtype=jnp.float32) - d_d) / 2.0 - cy
        gxx, gyy = jnp.meshgrid(ox, oy)          # [2h, 2w]
        coords = jnp.stack([gxx, gyy, jnp.ones_like(gxx)], axis=-1)
        src = jnp.einsum("nij,hwj->nhwi", G_inv, coords)  # [n,2h,2w,3]
        sx = src[..., 0] / jnp.maximum(jnp.abs(src[..., 2]), 1e-8) * \
            jnp.sign(src[..., 2])
        sy = src[..., 1] / jnp.maximum(jnp.abs(src[..., 2]), 1e-8) * \
            jnp.sign(src[..., 2])
        # To upsampled-padded pixel indices (exact-delay inverse of the
        # up pass).
        px = 2.0 * (sx + cx + margin) - d_u
        py = 2.0 * (sy + cy + margin) - d_u
        warped = bilinear_sample(up, px, py)            # [n,2h,2w,c]

        # Downsample 2x back to [h, w].
        out = upfirdn2d(warped, hz, down=2,
                        padding=((taps - 1) // 2, (taps - 2) // 2,
                                 (taps - 1) // 2, (taps - 2) // 2),
                        impl="shift")
        return out

    def _execute_color(self, images: jax.Array, C: jax.Array) -> jax.Array:
        n, h, w, c = images.shape
        if c == 3:
            M = C[:, :3, :3]
            t = C[:, :3, 3]
            return jnp.einsum("nij,nhwj->nhwi", M, images) + t[:, None, None, :]
        if c == 1:
            # Grayscale: project color matrix onto luma
            # (reference: augmentations.py:366-368).
            M = jnp.mean(C[:, :3, :3], axis=(1, 2))[:, None, None, None]
            t = jnp.mean(C[:, :3, 3], axis=1)[:, None, None, None]
            return images * M + t
        return images

    def _execute_imgfilter(self, images, k_t, k_gate, p):
        """Per-image amplified band filtering
        (reference: augmentations.py:376-404)."""
        n, h, w, c = images.shape
        num_bands = self.hz_fbank.shape[0]
        assert len(self.imgfilter_bands) == num_bands
        # Expected power spectrum: white in each band.
        expected = jnp.asarray([10, 1, 1, 1], jnp.float32) / 13.0

        # Sequential per-band power normalization, accumulated
        # multiplicatively — the reference's exact gain recipe
        # (augmentations.py:385-394); a single joint normalization gives a
        # DIFFERENT overall gain when several bands fire.
        g = jnp.ones((n, num_bands), jnp.float32)
        tk = jax.random.split(k_t, num_bands)
        gk = jax.random.split(k_gate, num_bands)
        ones = jnp.ones((n, num_bands), jnp.float32)
        for i, strength in enumerate(self.imgfilter_bands):
            ti = self._lognormal(tk[i], (n,), self.imgfilter_std)
            ti = jnp.where(self._gate(gk[i], (n,),
                                      self.imgfilter * p * strength), ti, 1.0)
            if self.debug_percentile is not None and strength <= 0:
                ti = jnp.ones_like(ti)   # reference: augmentations.py:387
            t = ones.at[:, i].set(ti)
            t = t / jnp.sqrt(jnp.sum(expected[None] * jnp.square(t), axis=1,
                                     keepdims=True))
            g = g * t
        # Per-image combined filter: [n, taps]
        hz_prime = jnp.einsum("nb,bt->nt", g, self.hz_fbank)
        taps = hz_prime.shape[1]
        pad = taps // 2

        # Depthwise per-image separable conv: fold batch into channels.
        x = jnp.transpose(images, (1, 2, 0, 3)).reshape(1, h, w, n * c)
        fy = jnp.tile(hz_prime[:, None, :, None], (1, c, 1, 1)).reshape(
            n * c, taps)
        # vertical pass
        ky = jnp.transpose(fy, (1, 0))[:, None, None, :]   # [taps,1,1,n*c]
        x = jnp.pad(x, ((0, 0), (pad, pad - (1 - taps % 2)), (0, 0), (0, 0)),
                    mode="reflect")
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n * c)
        # horizontal pass
        kx = jnp.transpose(fy, (1, 0))[None, :, None, :]
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad - (1 - taps % 2)), (0, 0)),
                    mode="reflect")
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n * c)
        return jnp.transpose(x.reshape(h, w, n, c), (2, 0, 1, 3))


# Named augpipe presets (reference: stylegan2ada/train.py:271-283 — properly
# registered here, fixing SURVEY.md §2.1 quirk (a)).
AUGPIPE_SPECS = {
    "blit": dict(xflip=1, rotate90=1, xint=1),
    "geom": dict(scale=1, rotate=1, aniso=1, xfrac=1),
    "color": dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    "filter": dict(imgfilter=1),
    "noise": dict(noise=1),
    "cutout": dict(cutout=1),
    "bg": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
               xfrac=1),
    "bgc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                saturation=1),
    "bgcf": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                 xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                 saturation=1, imgfilter=1),
    "bgcfn": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                  xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1, imgfilter=1, noise=1),
    "bgcfnc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                   xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                   saturation=1, imgfilter=1, noise=1, cutout=1),
}
