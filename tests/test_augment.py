"""ADA pipeline tests: identity at p=0, op semantics, differentiability
(incl. grad-of-grad through the pipe, needed inside R1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_big_gan_tpu.augment.ada import (AUGPIPE_SPECS, AugmentPipe,
                                           bilinear_sample)

KEY = jax.random.PRNGKey(0)


def rand_img(n=2, res=16, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(n, res, res, c),
                       jnp.float32)


def smooth_img(n=2, res=16, c=3):
    """Low-frequency content: the geometric resampling (2x sym6 up/down, a
    half-band pair) is only near-lossless below Nyquist — same as the
    reference pipeline — so geometric identity tests use smooth images."""
    i = np.arange(res)
    xx, yy = np.meshgrid(i, i)
    base = np.sin(xx / res * 2 * np.pi) + np.cos(yy / res * 2 * np.pi)
    img = np.stack([base + 0.1 * k for k in range(c)], axis=-1)
    return jnp.asarray(np.tile(img[None], (n, 1, 1, 1)), jnp.float32)


def test_identity_when_p_zero():
    pipe = AugmentPipe(**AUGPIPE_SPECS["bgc"])
    x = smooth_img()
    y = pipe(x, KEY, p=0.0)
    # Geometric path resamples even at p=0 (identity warp): near-exact on
    # sub-Nyquist content.
    np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2],
                               np.asarray(x)[:, 2:-2, 2:-2], atol=0.05)


def test_identity_color_noise_cutout_p_zero():
    pipe = AugmentPipe(brightness=1, contrast=1, lumaflip=1, hue=1,
                       saturation=1, noise=1, cutout=1)
    x = rand_img()
    y = pipe(x, KEY, p=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_xflip_debug_percentile():
    # debug_percentile=0.9: gate (0.9 < p*1) False at p=0.5 -> no flip;
    # at p=1 -> flip with i=floor(0.9*2)=1.
    pipe = AugmentPipe(xflip=1, debug_percentile=0.9)
    x = smooth_img()
    y_none = pipe(x, KEY, p=0.5)
    y_flip = pipe(x, KEY, p=1.0)
    np.testing.assert_allclose(np.asarray(y_none)[:, 2:-2, 2:-2],
                               np.asarray(x)[:, 2:-2, 2:-2], atol=0.05)
    np.testing.assert_allclose(np.asarray(y_flip)[:, 2:-2, 2:-2],
                               np.asarray(x)[:, :, ::-1, :][:, 2:-2, 2:-2],
                               atol=0.05)


def test_rot90_debug_percentile():
    pipe = AugmentPipe(rotate90=1, debug_percentile=0.3)
    x = smooth_img()
    # i = floor(0.3*4) = 1 -> one 90-degree rotation when gated on (0.3 < p)
    y = pipe(x, KEY, p=1.0)
    expected = np.rot90(np.asarray(x), k=1, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2],
                               expected[:, 2:-2, 2:-2], atol=0.05)


def test_brightness_shift():
    pipe = AugmentPipe(brightness=1, brightness_std=0.5, debug_percentile=0.9)
    x = rand_img()
    y = pipe(x, KEY, p=1.0)
    from scipy.special import erfinv
    # Reference debug convention: erfinv(2q-1)*std (augmentations.py:320)
    shift = erfinv(2 * 0.9 - 1) * 0.5
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + shift,
                               atol=1e-4)


def test_contrast_scale():
    pipe = AugmentPipe(contrast=1, contrast_std=0.5, debug_percentile=0.75)
    x = rand_img()
    y = pipe(x, KEY, p=1.0)
    from scipy.special import erfinv
    scale = 2 ** (erfinv(2 * 0.75 - 1) * 0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * scale,
                               atol=1e-4)


def test_cutout_zeroes_region():
    pipe = AugmentPipe(cutout=1, debug_percentile=0.5)
    x = jnp.ones((1, 16, 16, 3))
    y = np.asarray(pipe(x, KEY, p=1.0))
    # cutout center at (0.5, 0.5), size 0.5 -> central 8x8 region zeroed
    assert np.allclose(y[0, 6:10, 6:10, :], 0.0)
    assert np.allclose(y[0, :2, :, :], 1.0)


def test_noise_adds_variance():
    pipe = AugmentPipe(noise=1, noise_std=0.5, debug_percentile=0.8)
    x = jnp.zeros((2, 16, 16, 3))
    y = np.asarray(pipe(x, KEY, p=1.0))
    assert y.std() > 0.05


def test_imgfilter_runs_and_preserves_shape():
    pipe = AugmentPipe(imgfilter=1)
    x = rand_img()
    y = pipe(x, jax.random.PRNGKey(3), p=1.0)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_geom_differentiable_second_order():
    pipe = AugmentPipe(**AUGPIPE_SPECS["bgc"])
    x = smooth_img(n=1, res=8)

    def f(x):
        return jnp.sum(pipe(x, KEY, p=0.7) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_p_is_traceable():
    pipe = AugmentPipe(xflip=1, brightness=1)
    x = rand_img()

    @jax.jit
    def run(x, p):
        return pipe(x, KEY, p)

    y1 = run(x, jnp.asarray(0.0))
    y2 = run(x, jnp.asarray(0.9))   # no recompile, same trace
    assert y1.shape == y2.shape


def test_bilinear_sample_exact_on_grid():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 2), jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0), indexing="ij")
    out = bilinear_sample(img, gx[None], gy[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_twopass_warp_matches_gather():
    """The TPU-native 2-pass scanline warp must agree with the exact bilinear
    gather on bandlimited content across the transform families ADA draws
    (rotation incl. the 45-degree swap boundary, iso/aniso scale, translate,
    and compositions).  Borders excluded: the impls clamp off-array samples
    differently."""
    from style_big_gan_tpu.augment.ada import rotate2d_inv, scale2d_inv, \
        translate2d_inv

    res = 64
    i = np.arange(res)
    xx, yy = np.meshgrid(i, i)
    base = (np.sin(xx / res * 4 * np.pi) * np.cos(yy / res * 6 * np.pi)
            + np.cos((xx + 2 * yy) / res * 2 * np.pi))
    x = jnp.asarray(np.tile(base[None, :, :, None], (1, 1, 1, 3)), jnp.float32)

    pg = AugmentPipe(warp_impl="gather")
    pt = AugmentPipe(warp_impl="twopass", warp_dtype="float32")
    cases = [
        np.asarray(rotate2d_inv(-np.deg2rad(d)))
        for d in (10, 45, 60, 170, -45, -135)
    ] + [
        np.asarray(scale2d_inv(s, s)) for s in (0.6, 1.7)
    ] + [
        np.asarray(scale2d_inv(0.7, 1 / 0.7)),
        np.asarray(translate2d_inv(5.3, -2.7)),
        np.asarray(rotate2d_inv(-np.pi / 6) @ scale2d_inv(1.4, 1.4)),
    ]
    for G in cases:
        Gj = jnp.asarray(G, jnp.float32)[None]
        yg = np.asarray(pg._execute_geom(x, Gj))
        yt = np.asarray(pt._execute_geom(x, Gj))
        d = np.abs(yg - yt)[:, 10:-10, 10:-10]
        assert d.max() < 0.25 and d.mean() < 0.03, (G, d.max(), d.mean())


def test_twopass_warp_exact_cases():
    """Integer translations, axis-aligned scales, flips and quarter turns go
    through the 2-pass warp losslessly (tent taps land on integers)."""
    from style_big_gan_tpu.augment.ada import rotate2d_inv, scale2d_inv, \
        translate2d_inv

    x = rand_img(n=2, res=32, seed=3)
    pg = AugmentPipe(warp_impl="gather")
    pt = AugmentPipe(warp_impl="twopass", warp_dtype="float32")
    for G in [np.asarray(translate2d_inv(3.0, -5.0)),
              np.asarray(scale2d_inv(-1.0, 1.0)),       # xflip
              np.asarray(rotate2d_inv(np.pi / 2)),      # quarter turn
              np.asarray(rotate2d_inv(np.pi))]:
        Gj = jnp.asarray(G, jnp.float32)[None].repeat(2, 0)
        yg = np.asarray(pg._execute_geom(x, Gj))
        yt = np.asarray(pt._execute_geom(x, Gj))
        np.testing.assert_allclose(yt, yg, atol=1e-4)


def test_pallas_warp_backend_matches_jnp():
    """The fused Pallas scanline kernel (interpret mode on CPU) must agree
    with the jnp cascade+einsum path through the full geometric execute."""
    from style_big_gan_tpu.augment import ada as ada_mod
    from style_big_gan_tpu.augment.ada import rotate2d_inv, scale2d_inv

    x = smooth_img(n=2, res=16)
    pipe = AugmentPipe(warp_impl="twopass", warp_dtype="float32")
    G = jnp.asarray(
        np.asarray(rotate2d_inv(-0.4) @ scale2d_inv(1.2, 0.9)),
        jnp.float32)[None].repeat(2, 0)
    try:
        ada_mod.set_warp_pass_backend("jnp")
        y_jnp = np.asarray(pipe._execute_geom(x, G))
        ada_mod.set_warp_pass_backend("pallas")
        y_pal = np.asarray(pipe._execute_geom(x, G))
    finally:
        ada_mod.set_warp_pass_backend("auto")
    np.testing.assert_allclose(y_pal, y_jnp, rtol=1e-4, atol=1e-4)


def test_twopass_warp_bf16_close_to_f32():
    """The default bf16 warp stays within bf16 rounding of the f32 warp
    (position math is f32 in both; only image values and lerp weights
    quantize)."""
    from style_big_gan_tpu.augment.ada import rotate2d_inv
    x = smooth_img(n=2, res=32)
    p32 = AugmentPipe(warp_impl="twopass", warp_dtype="float32")
    p16 = AugmentPipe(warp_impl="twopass", warp_dtype="bfloat16")
    G = jnp.asarray(np.asarray(rotate2d_inv(-0.5)), jnp.float32)[None]
    G = G.repeat(2, 0)
    y32 = np.asarray(p32._execute_geom(x, G))
    y16 = np.asarray(p16._execute_geom(x, G))
    assert np.abs(y32 - y16).max() < 0.05


def test_augpipe_specs_complete():
    for name in ["blit", "geom", "color", "filter", "noise", "cutout", "bg",
                 "bgc", "bgcf", "bgcfn", "bgcfnc"]:
        assert name in AUGPIPE_SPECS
        AugmentPipe(**AUGPIPE_SPECS[name])   # constructible
