"""Numerical parity vs the PyTorch reference implementation.

Builds the reference StyleGAN2 generator/discriminator (torch CPU, ref op
impls) from /root/reference, converts its weights with
tools/import_reference.py, and compares forward outputs against this
framework's NHWC/JAX models on identical inputs — the strongest available
check that the TPU rebuild matches the reference's math (SURVEY.md §7:
"validate output parity against pretrained nets").

Skipped when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference checkout not available", allow_module_level=True)
torch = pytest.importorskip("torch")

sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "stylegan2ada"))

# The reference imports omegaconf (absent here) only for registry schemas;
# inject a minimal stand-in so its model modules import.
if "omegaconf" not in sys.modules:
    import types

    shim = types.ModuleType("omegaconf")
    shim.MISSING = "???"

    class _OmegaConf:
        @staticmethod
        def structured(x):
            return x

        @staticmethod
        def merge(*a):
            return a[-1]

    shim.OmegaConf = _OmegaConf
    sys.modules["omegaconf"] = shim

# The reference's schema builder passes mutable defaults to make_dataclass,
# which Python >= 3.11 rejects; wrap them in default_factory transparently.
import dataclasses as _dc

_orig_make_dataclass = _dc.make_dataclass


def _unhashable(v):
    return getattr(type(v), "__hash__", None) is None


def _tolerant_make_dataclass(name, fields, **kw):
    fixed = []
    for f in fields:
        if isinstance(f, tuple) and len(f) == 3:
            default = f[2]
            if isinstance(default, _dc.Field):
                if default.default is not _dc.MISSING and \
                        _unhashable(default.default):
                    fixed.append((f[0], f[1], _dc.field(
                        default_factory=lambda v=default.default: v)))
                    continue
            elif _unhashable(default):
                fixed.append((f[0], f[1],
                              _dc.field(default_factory=lambda v=default: v)))
                continue
        fixed.append(f)
    return _orig_make_dataclass(name, fixed, **kw)


_dc.make_dataclass = _tolerant_make_dataclass

import jax
import jax.numpy as jnp

from style_big_gan_tpu import registries
from style_big_gan_tpu.tools.import_reference import (
    convert_sg2_discriminator, convert_sg2_generator, torch_state_to_numpy)

registries._import_all()

CFG = dict(z_dim=32, w_dim=32, c_dim=0, img_resolution=32, img_channels=3)
CH = dict(channel_base=1024, channel_max=64)


def _build_reference_g():
    from train_parts import generators as ref_gen
    torch.manual_seed(0)
    from style_big_gan_tpu.utils.misc import EasyDict
    return ref_gen.Generator(
        **CFG, mapping_kwargs=EasyDict(num_layers=2),
        synthesis_kwargs=EasyDict(**CH, num_fp16_res=0,
                                  block_kwargs=EasyDict(
                                      layer_kwargs=EasyDict())))


def _build_reference_d():
    from train_parts import discriminators as ref_disc
    torch.manual_seed(1)
    cfg = {k: v for k, v in CFG.items() if k not in ("z_dim", "w_dim")}
    return ref_disc.Discriminator(
        **cfg, **CH, architecture="resnet", block_kwargs={},
        epilogue_kwargs={"mbstd_group_size": 2, "mbstd_num_channels": 1})


@pytest.fixture(scope="module")
def ref_g():
    try:
        return _build_reference_g().eval()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference generator unavailable: {e}")


@pytest.fixture(scope="module")
def ref_d():
    try:
        return _build_reference_d().eval()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference discriminator unavailable: {e}")


def test_generator_forward_parity(ref_g):
    state = torch_state_to_numpy(ref_g)
    params, moving, noise = convert_sg2_generator(state)

    G = registries.generators["sg2_classic"](
        **CFG, **CH, architecture="skip", mapping_kwargs={"num_layers": 2})
    z_np = np.random.RandomState(0).randn(2, 32).astype(np.float32)

    with torch.no_grad():
        ref_img = ref_g(torch.from_numpy(z_np), None,
                        noise_mode="const").numpy()          # NCHW
    variables = {"params": params, "moving": moving, "noise": noise}
    img = G.apply(variables, jnp.asarray(z_np), None, noise_mode="const",
                  rngs={"noise": jax.random.PRNGKey(0)})     # NHWC
    img_nchw = np.transpose(np.asarray(img), (0, 3, 1, 2))
    np.testing.assert_allclose(img_nchw, ref_img, rtol=2e-3, atol=2e-3)


def test_mapping_parity(ref_g):
    state = torch_state_to_numpy(ref_g)
    params, moving, noise = convert_sg2_generator(state)
    G = registries.generators["sg2_classic"](
        **CFG, **CH, mapping_kwargs={"num_layers": 2})
    z_np = np.random.RandomState(1).randn(4, 32).astype(np.float32)
    with torch.no_grad():
        ref_ws = ref_g.mapping(torch.from_numpy(z_np), None).numpy()
    ws = G.apply({"params": params, "moving": moving, "noise": noise},
                 jnp.asarray(z_np), None, method=G.map_ws)
    np.testing.assert_allclose(np.asarray(ws), ref_ws, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# SG2 parity above 32px: the up/down resample filter paths only activate
# with deeper block stacks (VERDICT r1 task 5c).


@pytest.mark.parametrize("res", [64, 128])
def test_generator_forward_parity_highres(res):
    cfg = dict(z_dim=16, w_dim=16, c_dim=0, img_resolution=res,
               img_channels=3)
    ch = dict(channel_base=2048, channel_max=32)
    from train_parts import generators as ref_gen
    from style_big_gan_tpu.utils.misc import EasyDict
    torch.manual_seed(res)
    ref = ref_gen.Generator(
        **cfg, mapping_kwargs=EasyDict(num_layers=2),
        synthesis_kwargs=EasyDict(**ch, num_fp16_res=0,
                                  block_kwargs=EasyDict(
                                      layer_kwargs=EasyDict()))).eval()
    state = torch_state_to_numpy(ref)
    params, moving, noise = convert_sg2_generator(state)
    G = registries.generators["sg2_classic"](
        **cfg, **ch, architecture="skip", mapping_kwargs={"num_layers": 2})
    z_np = np.random.RandomState(res).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ref_img = ref(torch.from_numpy(z_np), None,
                      noise_mode="const").numpy()
    img = G.apply({"params": params, "moving": moving, "noise": noise},
                  jnp.asarray(z_np), None, noise_mode="const",
                  rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.transpose(np.asarray(img), (0, 3, 1, 2)),
                               ref_img, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("res", [64, 128])
def test_discriminator_forward_parity_highres(res):
    cfg = dict(c_dim=0, img_resolution=res, img_channels=3)
    ch = dict(channel_base=2048, channel_max=32)
    from train_parts import discriminators as ref_disc
    torch.manual_seed(res + 1)
    ref = ref_disc.Discriminator(
        **cfg, **ch, architecture="resnet", block_kwargs={},
        epilogue_kwargs={"mbstd_group_size": 2,
                         "mbstd_num_channels": 1}).eval()
    params = convert_sg2_discriminator(torch_state_to_numpy(ref))
    D = registries.discriminators["sg2_classic"](
        **cfg, **ch, architecture="resnet",
        epilogue_kwargs={"mbstd_group_size": 2, "mbstd_num_channels": 1})
    x_np = np.random.RandomState(res).randn(2, 3, res, res).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np), None).numpy()
    logits = D.apply({"params": params},
                     jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))), None)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=5e-3,
                               atol=5e-3)


# ---------------------------------------------------------------------------
# BigGAN discriminator parity (VERDICT r1 task 5b).  Full-G parity is N/A
# (this framework fixes the reference's broken shared-embed wiring,
# models/biggan.py docstring); the D stack — SN convs, preactivation
# resblocks, self-attention, projection head — is unchanged and converts.


def test_biggan_discriminator_forward_parity():
    from style_big_gan_tpu.tools.import_reference import \
        convert_biggan_discriminator
    try:
        from train_parts import discriminators as ref_disc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference biggan unavailable: {e}")
    torch.manual_seed(5)
    # 64px with D_attn='32': exercises attention after block 0.
    ref = ref_disc.BigGanDiscriminator(
        img_resolution=64, D_ch=8, n_classes=10, c_dim=10,
        D_attn="32").eval()
    params, spectral = convert_biggan_discriminator(
        torch_state_to_numpy(ref))

    D = registries.discriminators["big_gan"](
        D_ch=8, c_dim=10, img_resolution=64, D_attn="32", n_classes=10)
    x_np = np.random.RandomState(5).randn(4, 3, 64, 64).astype(np.float32)
    c_np = np.eye(10, dtype=np.float32)[[0, 3, 7, 9]]
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np),
                      torch.from_numpy(c_np)).numpy()
    out = D.apply({"params": params, "spectral": spectral},
                  jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))),
                  jnp.asarray(c_np), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3,
                               atol=2e-3)


def test_biggan_dblock_parity():
    """Single preactivation DBlock with downsample, eval mode."""
    from biggan import layers as ref_layers
    from style_big_gan_tpu.models.biggan import DBlock
    from style_big_gan_tpu.tools.import_reference import (_l2n, _t_conv)
    import functools
    torch.manual_seed(6)
    which_conv = functools.partial(ref_layers.SNConv2d, kernel_size=3,
                                   padding=1)
    ref = ref_layers.DBlock(
        in_channels=8, out_channels=16, which_conv=which_conv, wide=True,
        preactivation=True, activation=torch.nn.ReLU(inplace=False),
        downsample=torch.nn.AvgPool2d(2)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, spectral = {}, {}
    for lyr in ("conv1", "conv2", "conv_sc"):
        params[lyr] = {"kernel": _t_conv(state[f"{lyr}.weight"]),
                       "bias": state[f"{lyr}.bias"]}
        spectral[lyr] = {"sn": {"u": state[f"{lyr}.u0"].reshape(1, -1)}}
    blk = DBlock(in_channels=8, out_channels=16, wide=True,
                 preactivation=True, downsample=True)
    x_np = np.random.RandomState(6).randn(2, 8, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np)).numpy()
    out = blk.apply({"params": params, "spectral": spectral},
                    jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))),
                    update_stats=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# ADA pipe golden parity (VERDICT r1 task 5a).  debug_percentile pins every
# random draw to the same deterministic value in both implementations
# (reference: augmentations.py:185-431); the additive-noise op stays random
# even in debug mode, so it is excluded.


def _ref_augpipe(**spec):
    from train_parts import augmentations as ref_aug
    return ref_aug.AugmentPipe(**spec)


def _smooth_images(n=2, res=32, c=3):
    """Low-frequency test images: the geometric comparison tolerates the
    documented sub-pixel alignment difference (docs/ada_warp.md), which on
    white noise would alias into large per-pixel error."""
    y, x = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                       indexing="ij")
    imgs = []
    rnd = np.random.RandomState(7)
    for i in range(n):
        a, b, ph = rnd.rand(3)
        img = np.stack([np.sin(2 * np.pi * ((a + 1) * x + (b + 1) * y + ph
                                            + 0.13 * k))
                        for k in range(c)], axis=-1)
        imgs.append(img)
    return np.stack(imgs).astype(np.float32)   # NHWC in [-1, 1]


def _run_both(spec, q, images_nhwc, **jax_kw):
    from style_big_gan_tpu.augment.ada import AugmentPipe
    ref = _ref_augpipe(**spec)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(
            np.transpose(images_nhwc, (0, 3, 1, 2))),
            debug_percentile=q).numpy()
    ours = AugmentPipe(**spec, debug_percentile=q, **jax_kw)
    out = ours(jnp.asarray(images_nhwc), jax.random.PRNGKey(0), p=1.0)
    return np.transpose(np.asarray(out), (0, 3, 1, 2)), ref_out


@pytest.mark.parametrize("q", [0.1, 0.35, 0.6, 0.9])
def test_ada_color_parity_exact(q):
    spec = dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    ours, ref = _run_both(spec, q, _smooth_images())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("q", [0.2, 0.5, 0.8])
def test_ada_cutout_parity_exact(q):
    ours, ref = _run_both(dict(cutout=1), q, _smooth_images())
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("q", [0.15, 0.5, 0.85])
def test_ada_imgfilter_parity(q):
    ours, ref = _run_both(dict(imgfilter=1), q, _smooth_images())
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("q", [0.3, 0.7])
def test_ada_geometric_parity_within_tolerance(q):
    """Full blit+geom chain.  Ours warps with exact sym6 group-delay
    alignment where the reference uses nominal half-pixel bookkeeping
    (docs/ada_warp.md) — agreement is sub-pixel, not bitwise; assert a
    tight interior-pixel envelope on smooth images."""
    spec = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                xfrac=1)
    ours, ref = _run_both(spec, q, _smooth_images(res=32),
                          warp_impl="gather", warp_dtype="float32")
    inner = (slice(None), slice(None), slice(4, -4), slice(4, -4))
    err = np.abs(ours[inner] - ref[inner]).max()
    assert err < 0.08, f"geom parity err {err}"


@pytest.mark.parametrize("q", [0.3, 0.7])
def test_ada_blit_parity(q):
    """Blit-only ops (flip / rot90 / integer translate).  The residual is
    the reference's own ~0.4px filter-delay drift (sym6 is only NEAR-
    symmetric; ours aligns on the exact group delay, see
    augment/ada.py::_execute_geom docstring) — the same envelope as the
    general warp, measured ~0.05 on smooth images."""
    ours, ref = _run_both(dict(xflip=1, rotate90=1, xint=1), q,
                          _smooth_images(res=32),
                          warp_impl="gather", warp_dtype="float32")
    inner = (slice(None), slice(None), slice(4, -4), slice(4, -4))
    err = np.abs(ours[inner] - ref[inner]).max()
    assert err < 0.08, f"blit parity err {err}"


def test_discriminator_forward_parity(ref_d):
    state = torch_state_to_numpy(ref_d)
    params = convert_sg2_discriminator(state)
    dcfg = {k: v for k, v in CFG.items() if k not in ("z_dim", "w_dim")}
    D = registries.discriminators["sg2_classic"](
        **dcfg, **CH, architecture="resnet",
        epilogue_kwargs={"mbstd_group_size": 2, "mbstd_num_channels": 1})
    x_np = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_d(torch.from_numpy(x_np), None).numpy()
    logits = D.apply({"params": params},
                     jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))), None)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-3,
                               atol=2e-3)
