"""Core-op unit tests: XLA implementations vs independent numpy oracles,
including gradients and grad-of-grad (needed by R1/PPL regularizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_big_gan_tpu.ops import (bias_act, conv2d_resample, downsample2d,
                                   filter2d, modulated_conv2d, setup_filter,
                                   upfirdn2d, upsample2d)
from style_big_gan_tpu.ops.bias_act import activation_funcs

from oracles import conv2d_np, conv_transpose2d_np, upfirdn2d_np

RNG = np.random.RandomState(0)


def rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


# ---------------------------------------------------------------- bias_act

@pytest.mark.parametrize("act", sorted(activation_funcs.keys()))
def test_bias_act_matches_numpy(act):
    x = rand(4, 8, 8, 6)
    b = rand(6)
    spec = activation_funcs[act]
    y = bias_act(jnp.asarray(x), jnp.asarray(b), act=act)
    ref = np.asarray(x) + b.reshape(1, 1, 1, -1)
    fns = {
        "linear": lambda v: v,
        "relu": lambda v: np.maximum(v, 0),
        "lrelu": lambda v: np.where(v >= 0, v, 0.2 * v),
        "tanh": np.tanh,
        "sigmoid": lambda v: 1 / (1 + np.exp(-v)),
        "elu": lambda v: np.where(v >= 0, v, np.exp(v) - 1),
        "selu": lambda v: 1.0507009873554805 * np.where(
            v >= 0, v, 1.6732632423543772 * (np.exp(v) - 1)),
        "softplus": lambda v: np.log1p(np.exp(v)),
        "swish": lambda v: v / (1 + np.exp(-v)),
    }
    ref = fns[act](ref) * spec.def_gain
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=5e-4)


def test_bias_act_clamp_and_gain():
    x = jnp.asarray(rand(2, 5))
    y = bias_act(x, act="linear", gain=3.0, clamp=0.5)
    np.testing.assert_allclose(np.asarray(y),
                               np.clip(np.asarray(x) * 3.0, -0.5, 0.5), rtol=1e-6)


def test_bias_act_second_order_grad():
    b = jnp.asarray(rand(3))
    x = jnp.asarray(rand(4, 3))

    def f(x):
        return jnp.sum(bias_act(x, b, act="swish") ** 2)

    g = jax.grad(f)(x)
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(h)).all()


# ---------------------------------------------------------------- upfirdn2d

@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 0), (1, 1, 2), (2, 1, 1), (1, 2, 1), (2, 2, 3),
    (1, 1, (1, 2, 0, 3)), (2, 1, (-1, 2, 1, -1)),
])
@pytest.mark.parametrize("sep", [False, True])
def test_upfirdn2d_vs_oracle(up, down, pad, sep):
    x = rand(2, 8, 8, 3)
    taps = rand(4) ** 2 + 0.1
    f = taps if sep else np.outer(taps, taps)
    y = upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                  padding=pad, gain=1.5)
    ref = upfirdn2d_np(x, f, up=up, down=down, padding=pad, gain=1.5)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_upfirdn2d_flip_filter():
    x = rand(1, 6, 6, 1)
    f = rand(3, 3)
    y = upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=1, flip_filter=True)
    ref = upfirdn2d_np(x, f, padding=(1, 1, 1, 1), flip_filter=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_setup_filter_normalizes_and_gains():
    # 4 taps < 8 -> non-separable outer product (reference heuristic,
    # upfirdn2d.py:104-106).
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(np.sum(np.asarray(f)), 1.0, rtol=1e-6)
    f8 = setup_filter([1, 2, 3, 4, 4, 3, 2, 1])
    assert f8.shape == (8,)
    f2 = setup_filter([1, 2, 1], separable=False, gain=4.0)
    assert f2.shape == (3, 3)
    np.testing.assert_allclose(np.sum(np.asarray(f2)), 4.0, rtol=1e-6)


def test_up_down_roundtrip_shapes():
    x = jnp.asarray(rand(2, 16, 16, 4))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (2, 32, 32, 4)
    down = downsample2d(up, f)
    assert down.shape == (2, 16, 16, 4)
    fl = filter2d(x, f)
    assert fl.shape == x.shape


def test_upsample2d_dc_gain():
    # A constant image must stay (approximately) constant under up/down.
    x = jnp.ones((1, 8, 8, 1))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, 0], 1.0, rtol=1e-4)


def test_upfirdn2d_gradients():
    x = jnp.asarray(rand(1, 5, 5, 2))
    f = setup_filter([1, 2, 1])

    def loss(x):
        return jnp.sum(upsample2d(x, f) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    gg = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(x)
    assert np.isfinite(np.asarray(gg)).all()


# ---------------------------------------------------------------- conv2d_resample

def test_conv2d_resample_plain():
    x = rand(2, 8, 8, 3)
    w = rand(3, 3, 3, 5)
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), padding=1)
    ref = conv2d_np(x, w, padding=1)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    assert y.shape == (2, 8, 8, 5)


def test_conv2d_resample_up2_matches_transpose_then_filter():
    # Oracle: conv_transpose(stride 2, flipped-weight convolution) then FIR
    # with gain 4 and the pads the reference derives — output is exactly 2x.
    x = rand(2, 6, 6, 3)
    w = rand(3, 3, 3, 4)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), jnp.asarray(f),
                        up=2, padding=1, flip_weight=False)
    assert y.shape == (2, 12, 12, 4)
    t = conv_transpose2d_np(x, w, stride=2, flip_weight=False)  # 13x13
    ref = upfirdn2d_np(t, f, padding=(1, 1, 1, 1), gain=4)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_conv2d_resample_down2():
    x = rand(2, 8, 8, 3)
    w = rand(3, 3, 3, 4)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), jnp.asarray(f),
                        down=2, padding=1)
    assert y.shape == (2, 4, 4, 4)
    # Oracle: FIR with the adjusted pads (p + (fw-down+1)//2, p + (fw-down)//2
    # = 2, 2 here), then strided conv.
    filt = upfirdn2d_np(x, f, padding=(2, 2, 2, 2))
    ref = conv2d_np(filt, w, stride=2, padding=0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_conv2d_resample_1x1_up_shape():
    x = rand(1, 4, 4, 2)
    w = rand(1, 1, 2, 3)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), jnp.asarray(f),
                        up=2, flip_weight=False)
    assert y.shape == (1, 8, 8, 3)


# ---------------------------------------------------------------- modulated conv

def modconv_oracle(x, w, s, demodulate):
    """Per-sample materialized weights — the definition (generators.py:43-100)."""
    n = x.shape[0]
    kh, kw, ci, co = w.shape
    out = []
    for i in range(n):
        wi = w * s[i].reshape(1, 1, ci, 1)
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wi.astype(np.float64) ** 2, axis=(0, 1, 2)) + 1e-8)
            wi = wi * d.reshape(1, 1, 1, co)
        out.append(conv2d_np(x[i:i + 1], wi, padding=kh // 2))
    return np.concatenate(out, 0)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv2d_vs_oracle(demodulate):
    x = rand(3, 8, 8, 4)
    w = rand(3, 3, 4, 6)
    s = rand(3, 4) * 0.5 + 1.0
    y = modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                         padding=1, demodulate=demodulate)
    ref = modconv_oracle(x, w, s, demodulate)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_modulated_conv2d_noise_and_grad():
    x = jnp.asarray(rand(2, 4, 4, 3))
    w = jnp.asarray(rand(3, 3, 3, 5))
    s = jnp.asarray(rand(2, 3))
    noise = jnp.asarray(rand(2, 4, 4, 1))

    def loss(w):
        return jnp.sum(modulated_conv2d(x, w, s, noise=noise, padding=1) ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape and np.isfinite(np.asarray(g)).all()


def test_modulated_conv2d_up2_shape():
    x = jnp.asarray(rand(2, 8, 8, 4))
    w = jnp.asarray(rand(3, 3, 4, 6))
    s = jnp.asarray(rand(2, 4))
    f = setup_filter([1, 3, 3, 1])
    y = modulated_conv2d(x, w, s, up=2, padding=1, resample_filter=f,
                         flip_weight=False)
    assert y.shape == (2, 16, 16, 6)


@pytest.mark.parametrize("up,down,pad", [(1, 1, 2), (2, 1, 1), (1, 2, 1)])
def test_upfirdn2d_impl_equivalence(up, down, pad):
    """'shift' (tap-loop), 'conv' (depthwise) and 'matmul' (band-matrix
    MXU) paths must agree — incl. rank-1 2-D filters, which 'matmul'
    decomposes into two axis passes."""
    x = jnp.asarray(rand(2, 9, 9, 5))
    for sep in [True, False]:
        taps = rand(4) ** 2 + 0.1
        f = jnp.asarray(taps if sep else np.outer(taps, taps))
        a = upfirdn2d(x, f, up=up, down=down, padding=pad, impl="conv")
        for other in ("shift", "matmul"):
            b = upfirdn2d(x, f, up=up, down=down, padding=pad, impl=other)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=other)


def test_upfirdn2d_matmul_full_rank_falls_back():
    """A non-rank-1 2-D filter silently uses the conv path — identical
    result."""
    x = jnp.asarray(rand(1, 7, 7, 3))
    f = jnp.asarray(rand(3, 3) + np.eye(3))   # full rank
    a = upfirdn2d(x, f, up=2, down=1, padding=1, impl="conv")
    b = upfirdn2d(x, f, up=2, down=1, padding=1, impl="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_upfirdn2d_matmul_gradients_match_conv():
    """The band-matmul path must be AD-equivalent to the conv path (the
    synthesis ladder differentiates through every resample)."""
    x = jnp.asarray(rand(1, 6, 6, 2))
    f = jnp.asarray(np.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0)

    def loss(impl):
        def fn(x):
            y = upfirdn2d(x, f, up=2, padding=(1, 1), impl=impl)
            return jnp.sum(jnp.sin(y) * y)
        return fn

    ga = jax.grad(loss("conv"))(x)
    gb = jax.grad(loss("matmul"))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4,
                               atol=1e-6)
    # second order too (R1/PPL paths)
    ha = jax.grad(lambda x: jnp.sum(jax.grad(loss("conv"))(x) ** 2))(x)
    hb = jax.grad(lambda x: jnp.sum(jax.grad(loss("matmul"))(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-4,
                               atol=1e-6)
