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
# TF-legacy import (reference: stylegan2ada/legacy.py:109-297).  No TF
# pickles exist in this environment, so the test SYNTHESIZES one: the
# reference torch G/D state is inverse-mapped to the TF variable naming +
# layouts, wrapped in the legacy pickle structure, and pushed through
# load_tf_network_pkl + convert_tf_* — forward parity against the torch
# net closes the loop.


def _torch_g_to_tf_vars(ref_g):
    """Inverse of legacy.py:172-202: torch G state -> TF variables dict."""
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    g_vars, m_vars, s_vars = [], [], []
    m_vars += [(f"Dense{i}/weight", sd[f"mapping.fc{i}.weight"].T)
               for i in range(2)]
    m_vars += [(f"Dense{i}/bias", sd[f"mapping.fc{i}.bias"])
               for i in range(2)]
    g_vars.append(("dlatent_avg", sd["mapping.w_avg"]))

    def t_conv(w, flip=False):
        w = np.transpose(w, (2, 3, 1, 0))   # OIHW -> HWIO
        return w[::-1, ::-1] if flip else w

    s_vars.append(("4x4/Const/const", sd["synthesis.b4.const"][None]))
    res = int(ref_g.img_resolution)
    for r in [4] + [2 ** k for k in range(3, int(np.log2(res)) + 1)]:
        b = f"synthesis.b{r}"
        tfb = f"{r}x{r}"
        layers = [("conv1", "Conv", 0)] if r == 4 else \
            [("conv0", "Conv0_up", 2 * int(np.log2(r)) - 5),
             ("conv1", "Conv1", 2 * int(np.log2(r)) - 4)]
        for ours, tfn, nidx in layers:
            flip = tfn.endswith("_up")
            s_vars.append((f"{tfb}/{tfn}/weight",
                           t_conv(sd[f"{b}.{ours}.weight"], flip)))
            s_vars.append((f"{tfb}/{tfn}/bias", sd[f"{b}.{ours}.bias"]))
            s_vars.append((f"{tfb}/{tfn}/noise_strength",
                           sd[f"{b}.{ours}.noise_strength"]))
            s_vars.append((f"{tfb}/{tfn}/mod_weight",
                           sd[f"{b}.{ours}.affine.weight"].T))
            s_vars.append((f"{tfb}/{tfn}/mod_bias",
                           sd[f"{b}.{ours}.affine.bias"] - 1.0))
            s_vars.append((f"noise{nidx}",
                           sd[f"{b}.{ours}.noise_const"][None, None]))
        s_vars.append((f"{tfb}/ToRGB/weight", t_conv(sd[f"{b}.torgb.weight"])))
        s_vars.append((f"{tfb}/ToRGB/bias", sd[f"{b}.torgb.bias"]))
        s_vars.append((f"{tfb}/ToRGB/mod_weight",
                       sd[f"{b}.torgb.affine.weight"].T))
        s_vars.append((f"{tfb}/ToRGB/mod_bias",
                       sd[f"{b}.torgb.affine.bias"] - 1.0))
        if f"{b}.skip.weight" in sd:
            s_vars.append((f"{tfb}/Skip/weight",
                           t_conv(sd[f"{b}.skip.weight"], flip=True)))
    return g_vars, m_vars, s_vars


def test_tf_legacy_generator_import(ref_g, tmp_path):
    import pickle as pkl
    import sys
    import types
    from style_big_gan_tpu.tools.import_reference import (
        convert_tf_generator, load_tf_network_pkl)

    g_vars, m_vars, s_vars = _torch_g_to_tf_vars(ref_g)
    static_kwargs = dict(latent_size=32, dlatent_size=32, label_size=0,
                         resolution=32, num_channels=3, fmap_base=512,
                         fmap_max=64, mapping_layers=2)

    # Fabricate a genuine legacy pickle: register a fake
    # dnnlib.tflib.network.Network class so pickle writes the same GLOBAL +
    # NEWOBJ + BUILD opcodes a real TF pickle has, then REMOVE the fake
    # modules before loading — load_tf_network_pkl's find_class remapping
    # is what gets exercised.
    state = dict(version=4, static_kwargs=static_kwargs,
                 variables=g_vars,
                 components={"mapping": dict(variables=m_vars,
                                             components={}),
                             "synthesis": dict(variables=s_vars,
                                               components={})})

    class Network:  # stands in for dnnlib.tflib.network.Network
        pass

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    fake_mods = {"dnnlib.tflib.network": types.ModuleType(
        "dnnlib.tflib.network")}
    fake_mods["dnnlib.tflib.network"].Network = Network
    saved = {k: sys.modules.get(k) for k in fake_mods}
    sys.modules.update(fake_mods)
    try:
        def make_net():
            n = Network()
            n.__dict__.update(state)
            return n

        path = str(tmp_path / "legacy.pkl")
        with open(path, "wb") as f:
            pkl.dump((make_net(), make_net(), make_net()), f)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    nets = load_tf_network_pkl(path)
    assert nets is not None
    init_kwargs, variables = convert_tf_generator(nets[2])
    assert init_kwargs["img_resolution"] == 32
    assert init_kwargs["channel_base"] == 1024

    G = registries.generators["sg2_classic"](
        z_dim=init_kwargs["z_dim"], w_dim=init_kwargs["w_dim"],
        c_dim=init_kwargs["c_dim"],
        img_resolution=init_kwargs["img_resolution"],
        img_channels=init_kwargs["img_channels"],
        channel_base=init_kwargs["channel_base"],
        channel_max=init_kwargs["channel_max"],
        architecture=init_kwargs["architecture"],
        mapping_kwargs=init_kwargs["mapping_kwargs"])
    z_np = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    with torch.no_grad():
        ref_img = ref_g(torch.from_numpy(z_np), None,
                        noise_mode="const").numpy()
    img = G.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                  jnp.asarray(z_np), None, noise_mode="const",
                  rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.transpose(np.asarray(img), (0, 3, 1, 2)),
                               ref_img, rtol=2e-3, atol=2e-3)


def test_tf_legacy_discriminator_import(ref_d):
    from style_big_gan_tpu.tools.import_reference import \
        convert_tf_discriminator
    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}

    def t_conv(w):
        return np.transpose(w, (2, 3, 1, 0))

    variables = []
    res = 32
    r = res
    while r >= 8:
        b = f"b{r}"
        variables += [(f"{r}x{r}/FromRGB/weight",
                       t_conv(sd[f"{b}.fromrgb.weight"])),
                      (f"{r}x{r}/FromRGB/bias", sd[f"{b}.fromrgb.bias"])] \
            if f"{b}.fromrgb.weight" in sd else []
        variables += [
            (f"{r}x{r}/Conv0/weight", t_conv(sd[f"{b}.conv0.weight"])),
            (f"{r}x{r}/Conv0/bias", sd[f"{b}.conv0.bias"]),
            (f"{r}x{r}/Conv1_down/weight", t_conv(sd[f"{b}.conv1.weight"])),
            (f"{r}x{r}/Conv1_down/bias", sd[f"{b}.conv1.bias"]),
        ]
        if f"{b}.skip.weight" in sd:
            variables.append((f"{r}x{r}/Skip/weight",
                              t_conv(sd[f"{b}.skip.weight"])))
        r //= 2
    variables += [
        ("4x4/Conv/weight", t_conv(sd["b4.conv.weight"])),
        ("4x4/Conv/bias", sd["b4.conv.bias"]),
        ("4x4/Dense0/weight", sd["b4.fc.weight"].T),
        ("4x4/Dense0/bias", sd["b4.fc.bias"]),
        ("Output/weight", sd["b4.out.weight"].T),
        ("Output/bias", sd["b4.out.bias"]),
    ]
    tf_d = {"version": 4, "variables": variables, "components": {},
            "static_kwargs": dict(label_size=0, resolution=32,
                                  num_channels=3, architecture="resnet",
                                  fmap_base=512, fmap_max=64,
                                  mbstd_group_size=2)}
    init_kwargs, d_variables = convert_tf_discriminator(tf_d)
    D = registries.discriminators["sg2_classic"](
        c_dim=0, img_resolution=32, img_channels=3,
        channel_base=init_kwargs["channel_base"],
        channel_max=init_kwargs["channel_max"], architecture="resnet",
        epilogue_kwargs={"mbstd_group_size": 2, "mbstd_num_channels": 1})
    x_np = np.random.RandomState(4).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_d(torch.from_numpy(x_np), None).numpy()
    logits = D.apply(jax.tree_util.tree_map(jnp.asarray, d_variables),
                     jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))), None)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-3,
                               atol=2e-3)


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


def test_import_cli_roundtrip(ref_g, tmp_path, monkeypatch):
    """tools.import_reference CLI: reference pickle -> run dir loadable by
    tools.loader, forward-parity-checked against the live torch net."""
    import sys

    from style_big_gan_tpu.tools import import_reference as ir
    from style_big_gan_tpu.tools import loader

    # A persistence-style pickle: meta dict carrying init kwargs + state
    # (what reference torch_utils/persistence.py embeds per object).
    init_kwargs = dict(CFG, mapping_kwargs=dict(num_layers=2),
                       synthesis_kwargs=dict(**CH, num_fp16_res=0,
                                             architecture="skip"))
    meta = dict(type="class",
                class_name="train_parts.generators.Generator",
                state=dict(state_dict=ref_g.state_dict(),
                           init_kwargs=init_kwargs))
    src = tmp_path / "ref.pkl"
    torch.save({"G_ema": meta}, str(src))

    out = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_reference", "--src", str(src), "--out-dir", str(out)])
    ir.main()

    G, g_vars, opts = loader.load_generator(str(out))
    assert opts["model_meta"]["resolution"] == CFG["img_resolution"]
    z_np = np.random.RandomState(7).randn(2, 32).astype(np.float32)
    with torch.no_grad():
        ref_img = ref_g(torch.from_numpy(z_np), None,
                        noise_mode="const").numpy()
    img = G.apply(g_vars, jnp.asarray(z_np), None, noise_mode="const",
                  rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.transpose(np.asarray(img), (0, 3, 1, 2)),
                               ref_img, rtol=2e-3, atol=2e-3)


def test_biggan_gblock_parity():
    """Single GBlock with upsample, SN convs and class-conditional BN
    (vector-conditioning ccbn with SNLinear gains), eval mode
    (reference: biggan/layers.py:278-329,375-408)."""
    import functools

    from biggan import layers as ref_layers
    from style_big_gan_tpu.models.biggan import GBlock
    from style_big_gan_tpu.tools.import_reference import _l2n, _t_conv

    torch.manual_seed(8)
    cdim, cin, cout = 6, 8, 16
    which_conv = functools.partial(ref_layers.SNConv2d, kernel_size=3,
                                   padding=1)
    which_bn = functools.partial(
        ref_layers.ccbn,
        which_linear=functools.partial(ref_layers.SNLinear, bias=False),
        input_size=cdim)
    ref = ref_layers.GBlock(
        in_channels=cin, out_channels=cout, which_conv=which_conv,
        which_bn=which_bn, activation=torch.nn.ReLU(inplace=False),
        upsample=torch.nn.Upsample(scale_factor=2)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params, spectral, stats = {}, {}, {}
    for lyr in ("conv1", "conv2", "conv_sc"):
        params[lyr] = {"kernel": _t_conv(state[f"{lyr}.weight"]),
                       "bias": state[f"{lyr}.bias"]}
        spectral[lyr] = {"sn": {"u": state[f"{lyr}.u0"].reshape(1, -1)}}
    for bn in ("bn1", "bn2"):
        params[bn] = {
            "gain": {"kernel": state[f"{bn}.gain.weight"].T},
            "bias": {"kernel": state[f"{bn}.bias.weight"].T}}
        spectral[bn] = {
            "gain": {"sn": {"u": state[f"{bn}.gain.u0"].reshape(1, -1)}},
            "bias": {"sn": {"u": state[f"{bn}.bias.u0"].reshape(1, -1)}}}
        stats[bn] = {"mean": state[f"{bn}.stored_mean"],
                     "var": state[f"{bn}.stored_var"]}

    blk = GBlock(in_channels=cin, out_channels=cout, upsample=True,
                 use_sn=True, n_classes=0)
    rnd = np.random.RandomState(8)
    x_np = rnd.randn(2, cin, 8, 8).astype(np.float32)
    y_np = rnd.randn(2, cdim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np), torch.from_numpy(y_np)).numpy()
    out = blk.apply({"params": params, "spectral": spectral,
                     "batch_stats": stats},
                    jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))),
                    jnp.asarray(y_np), train=False, update_stats=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


def test_biggan_attention_parity():
    """SA-GAN non-local block vs the reference (biggan/layers.py:144-169):
    SN 1x1 convs, max-pooled phi/g, softmax attention, gamma gate."""
    from biggan import layers as ref_layers
    from style_big_gan_tpu.models.attention import SelfAttention
    from style_big_gan_tpu.tools.import_reference import _t_conv

    torch.manual_seed(9)
    ch = 16
    ref = ref_layers.Attention(ch).eval()
    with torch.no_grad():
        ref.gamma.fill_(0.7)    # non-zero so the attention path matters
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params, spectral = {"gamma": np.float32(0.7)}, {}
    for lyr in ("theta", "phi", "g", "o"):
        params[lyr] = {"kernel": _t_conv(state[f"{lyr}.weight"])}
        spectral[lyr] = {"sn": {"u": state[f"{lyr}.u0"].reshape(1, -1)}}

    att = SelfAttention(ch, use_sn=True)
    x_np = np.random.RandomState(9).randn(2, ch, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np)).numpy()
    out = att.apply({"params": params, "spectral": spectral},
                    jnp.asarray(np.transpose(x_np, (0, 2, 3, 1))),
                    update_stats=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


def test_biggan_generator_forward_parity_unshared():
    """Full BigGAN G forward parity in the G_shared=False / hier=False mode
    — the conditioning wiring that works upstream (the shared-embed mode is
    broken in the reference and deliberately fixed here, so full-G parity
    is only defined for this mode).  Eval-mode, converted via
    convert_biggan_generator (reference: generators.py:756-937)."""
    from train_parts import generators as ref_gen
    from style_big_gan_tpu.tools.import_reference import \
        convert_biggan_generator

    torch.manual_seed(10)
    ncls, zdim, ch = 6, 24, 8
    ref = ref_gen.BigGAnGenerator(
        G_ch=ch, z_dim=zdim, c_dim=ncls, n_classes=ncls, img_resolution=32,
        G_attn="16", G_shared=False, hier=False).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, spectral, stats = convert_biggan_generator(state)

    G = registries.generators["big_gan"](
        G_ch=ch, z_dim=zdim, c_dim=ncls, n_classes=ncls, img_resolution=32,
        img_channels=3, G_attn="16", G_shared=False, hier=False)
    rnd = np.random.RandomState(10)
    z_np = rnd.randn(2, zdim).astype(np.float32)
    c_np = np.eye(ncls, dtype=np.float32)[rnd.randint(0, ncls, 2)]
    with torch.no_grad():
        ref_img = ref(torch.from_numpy(z_np), torch.from_numpy(c_np)).numpy()
    img = G.apply({"params": params, "spectral": spectral,
                   "batch_stats": stats},
                  jnp.asarray(z_np), jnp.asarray(c_np), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(img), (0, 3, 1, 2)),
                               ref_img, rtol=2e-4, atol=2e-4)


def test_import_cli_roundtrip_biggan(tmp_path, monkeypatch):
    """Importer CLI auto-detects BigGAN pickles and the imported run dir
    re-renders the reference output through tools.loader."""
    import sys

    from train_parts import generators as ref_gen
    from style_big_gan_tpu.tools import import_reference as ir
    from style_big_gan_tpu.tools import loader

    torch.manual_seed(11)
    ncls, zdim, ch = 4, 16, 8
    init_kwargs = dict(G_ch=ch, z_dim=zdim, c_dim=ncls, n_classes=ncls,
                       img_resolution=32, G_attn="0", G_shared=False,
                       hier=False)
    ref = ref_gen.BigGAnGenerator(**init_kwargs).eval()
    meta = dict(type="class",
                class_name="train_parts.generators.BigGAnGenerator",
                state=dict(state_dict=ref.state_dict(),
                           init_kwargs=init_kwargs))
    src = tmp_path / "ref_biggan.pkl"
    torch.save({"G_ema": meta}, str(src))

    out = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_reference", "--src", str(src), "--out-dir", str(out)])
    ir.main()

    G, g_vars, opts = loader.load_generator(str(out))
    assert opts["gen"]["generator"] == "big_gan"
    rnd = np.random.RandomState(11)
    z_np = rnd.randn(2, zdim).astype(np.float32)
    c_np = np.eye(ncls, dtype=np.float32)[rnd.randint(0, ncls, 2)]
    with torch.no_grad():
        ref_img = ref(torch.from_numpy(z_np), torch.from_numpy(c_np)).numpy()
    img = G.apply(g_vars, jnp.asarray(z_np), jnp.asarray(c_np), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(img), (0, 3, 1, 2)),
                               ref_img, rtol=2e-4, atol=2e-4)


def test_import_cli_transfer_payload(ref_g, ref_d, tmp_path, monkeypatch):
    """A full reference snapshot (G, D, G_ema) imports into a payload the
    trainer's transfer-learning resume path consumes: live G and D params
    land under params_g / params_d (reference: trainers.py:342-369)."""
    import sys

    from style_big_gan_tpu.tools import import_reference as ir
    from style_big_gan_tpu.utils import checkpoint as ckpt

    init_kwargs = dict(CFG, mapping_kwargs=dict(num_layers=2),
                       synthesis_kwargs=dict(**CH, num_fp16_res=0,
                                             architecture="skip"))

    def g_meta(g):
        return dict(type="class",
                    class_name="train_parts.generators.Generator",
                    state=dict(state_dict=g.state_dict(),
                               init_kwargs=init_kwargs))

    g_live = _build_reference_g().eval()
    with torch.no_grad():                    # distinct weights from ref_g
        for p in g_live.parameters():
            p.add_(0.05 * torch.randn_like(p))
    d_meta = dict(type="class",
                  class_name="train_parts.discriminators.Discriminator",
                  state=dict(state_dict=ref_d.state_dict(), init_kwargs={}))
    src = tmp_path / "full.pkl"
    torch.save({"G": g_meta(g_live), "D": d_meta, "G_ema": g_meta(ref_g)},
               str(src))

    out = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_reference", "--src", str(src), "--out-dir", str(out)])
    ir.main()

    payload = ckpt.load_pytree_raw(
        os.path.join(str(out), "network-snapshot-000000.msgpack"))
    assert "params_d" in payload and payload["params_d"]
    # live G != EMA G in the payload (distinct weight sets imported)
    w_live = payload["params_g"]["mapping"]["fc0"]["weight"]
    w_ema = payload["params_g_ema"]["mapping"]["fc0"]["weight"]
    assert not np.allclose(np.asarray(w_live), np.asarray(w_ema))
    # the D params match the reference state dict
    ref_sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    b4_fc = np.asarray(payload["params_d"]["b4"]["fc"]["weight"])
    assert b4_fc.shape[::-1] == ref_sd["b4.fc.weight"].shape


def test_trainer_resumes_from_imported_reference_snapshot(
        ref_g, ref_d, tmp_path, monkeypatch):
    """Full migration path: reference pickle -> importer CLI -> the real
    trainer transfer-learns from the imported snapshot
    (reference: trainers.py:342-369 resume semantics)."""
    import io
    import json
    import sys
    import zipfile

    import PIL.Image

    from style_big_gan_tpu.arguments import load_config
    from style_big_gan_tpu.tools import import_reference as ir

    init_kwargs = dict(CFG, mapping_kwargs=dict(num_layers=2),
                       synthesis_kwargs=dict(**CH, num_fp16_res=0,
                                             architecture="skip"))
    g_meta = dict(type="class",
                  class_name="train_parts.generators.Generator",
                  state=dict(state_dict=ref_g.state_dict(),
                             init_kwargs=init_kwargs))
    d_meta = dict(type="class",
                  class_name="train_parts.discriminators.Discriminator",
                  state=dict(state_dict=ref_d.state_dict(), init_kwargs={}))
    src = tmp_path / "full.pkl"
    torch.save({"G": g_meta, "D": d_meta, "G_ema": g_meta}, str(src))
    imported = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_reference", "--src", str(src), "--out-dir", str(imported)])
    ir.main()
    snap = os.path.join(str(imported), "network-snapshot-000000.msgpack")

    # tiny unlabeled dataset
    zpath = tmp_path / "tiny.zip"
    rnd = np.random.RandomState(0)
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(16):
            buf = io.BytesIO()
            PIL.Image.fromarray(
                (rnd.rand(32, 32, 3) * 255).astype("uint8")).save(
                buf, format="png")
            z.writestr(f"img{i:05d}.png", buf.getvalue())

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(argv=[
        "exp.name=migrate", f"data.dataset_path={zpath}",
        "datasets_args.image_folder.use_labels=false",
        "gen.kimg=0.016", "gen.batch=8", "gen.batch_device=8",
        "log.kimg_per_tick=1", "log.metrics=[]", "log.sample_grid=[2,2]",
        f"log.output={tmp_path}/logs", "perf.devices=1",
        "dataloaders_args.basic.num_workers=1",
        f"trans.resume={snap}",
        "aug.augpipe=color", "gen.d_reg_interval=2",
        # match the reference net's geometry so every leaf transfers
        "gens_args.sg2_classic.z_dim=32", "gens_args.sg2_classic.w_dim=32",
        "gens_args.sg2_classic.channel_base=1024",
        "gens_args.sg2_classic.channel_max=64",
        "gens_args.sg2_classic.mapping_kwargs.num_layers=2",
        "discs_args.sg2_classic.channel_base=1024",
        "discs_args.sg2_classic.channel_max=64",
        "discs_args.sg2_classic.epilogue_kwargs.mbstd_group_size=2",
    ], yaml_path=os.path.join(cfg_dir, "sg2ada.yaml"))
    trainer = registries.trainers[str(cfg.exp.trainer)]()
    trainer.setup_arguments(cfg)
    trainer.setup_logs()
    trainer.setup_mesh()
    trainer.init_params()
    trainer.setup_dataset()
    trainer.setup_networks()

    # the imported reference weights actually landed in the trainer
    ref_fc0 = ref_g.state_dict()["mapping.fc0.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(trainer.params_g["mapping"]["fc0"]["weight"]), ref_fc0,
        rtol=0, atol=0)

    trainer.setup_augmentations()
    trainer.setup_training_phases()
    trainer.training_loop()
    with open(os.path.join(trainer.run_dir, "stats.jsonl")) as f:
        last = [json.loads(l) for l in f][-1]
    assert np.isfinite(last["Loss/D/loss"])
    trainer.logger.close()


def test_biggan_standing_stats_parity_mybn():
    """Standing-statistics BN vs the reference myBN
    (biggan/layers.py:212-255): accumulation mode (sums + counter, divide at
    eval) and running-average mode must both match the reference bit-close.
    The reference reuses one buffer pair for both modes; this build keeps
    separate standing sums beside the running averages (eval picks standing
    whenever any accumulation happened), so each mode is tested on a fresh
    module exactly as the reference uses them."""
    from biggan import layers as ref_layers
    from style_big_gan_tpu.models.biggan import _AffineBN, reset_standing_stats

    ch = 6
    rnd = np.random.RandomState(21)
    batches = [(rnd.randn(4, ch, 5, 5) * (i + 1.0) + 0.3 * i)
               .astype(np.float32) for i in range(3)]
    x_eval = rnd.randn(4, ch, 5, 5).astype(np.float32)
    gain = torch.ones(1, ch, 1, 1)
    bias = torch.zeros(1, ch, 1, 1)

    def to_nhwc(a):
        return jnp.asarray(np.transpose(a, (0, 2, 3, 1)))

    def to_nchw(a):
        return np.transpose(np.asarray(a), (0, 3, 1, 2))

    # --- accumulation mode ---------------------------------------------
    ref = ref_layers.myBN(ch, eps=1e-5, momentum=0.1)
    ref.accumulate_standing = True
    ref.reset_stats()   # the accumulation protocol: reset, then accumulate
    ref.train()
    bn = _AffineBN(ch)
    variables = bn.init(jax.random.PRNGKey(0), to_nhwc(batches[0]), True)
    for xb in batches:
        with torch.no_grad():
            ref(torch.from_numpy(xb), gain, bias)
        _, upd = bn.apply(variables, to_nhwc(xb), True, True, True,
                          mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
    assert float(variables["batch_stats"]["standing_count"]) == 3.0
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_eval), gain, bias).numpy()
    out = bn.apply(variables, to_nhwc(x_eval), False)
    np.testing.assert_allclose(to_nchw(out), ref_out, rtol=1e-4, atol=1e-5)

    # reset (reference reset_stats, :229-233): eval falls back to the
    # running averages (still at init values here: mean 0, var 1).
    variables = {**variables,
                 "batch_stats": reset_standing_stats(variables["batch_stats"])}
    out_reset = bn.apply(variables, to_nhwc(x_eval), False)
    expect = x_eval / np.sqrt(1.0 + 1e-5)
    np.testing.assert_allclose(to_nchw(out_reset), expect, rtol=1e-4,
                               atol=1e-5)

    # --- running-average mode -------------------------------------------
    ref2 = ref_layers.myBN(ch, eps=1e-5, momentum=0.1)
    ref2.train()
    variables = bn.init(jax.random.PRNGKey(0), to_nhwc(batches[0]), True)
    for xb in batches:
        with torch.no_grad():
            ref2(torch.from_numpy(xb), gain, bias)
        _, upd = bn.apply(variables, to_nhwc(xb), True, True, False,
                          mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
    ref2.eval()
    with torch.no_grad():
        ref_out2 = ref2(torch.from_numpy(x_eval), gain, bias).numpy()
    out2 = bn.apply(variables, to_nhwc(x_eval), False)
    np.testing.assert_allclose(to_nchw(out2), ref_out2, rtol=1e-4, atol=1e-5)


def test_biggan_generator_standing_stats_accumulation():
    """accumulate_standing_stats refreshes every BN's standing sums in a
    full BigGAN G (reference G args mybn/accumulate_standing,
    generators.py:762,791-793): counters land at num_batches, eval output
    changes to the standing statistics, and a reset restores the
    running-average behavior."""
    from style_big_gan_tpu.models.biggan import (accumulate_standing_stats,
                                                 reset_standing_stats)

    ncls, zdim, ch = 4, 16, 8
    G = registries.generators["big_gan"](
        G_ch=ch, z_dim=zdim, c_dim=ncls, n_classes=ncls, img_resolution=32,
        img_channels=3, G_attn="16", G_shared=False, hier=False)
    rnd = np.random.RandomState(3)
    z = jnp.asarray(rnd.randn(2, zdim).astype(np.float32))
    c = jnp.asarray(np.eye(ncls, dtype=np.float32)[rnd.randint(0, ncls, 2)])
    variables = G.init(jax.random.PRNGKey(1), z, c)

    out_running = G.apply(variables, z, c, train=False)
    new_vars = accumulate_standing_stats(G, dict(variables),
                                         jax.random.PRNGKey(2),
                                         num_batches=4, batch_size=8)
    counts = [np.asarray(v) for path, v in
              jax.tree_util.tree_flatten_with_path(
                  new_vars["batch_stats"])[0]
              if "standing_count" in str(path)]
    assert counts and all(float(cv) == 4.0 for cv in counts)
    out_standing = G.apply(new_vars, z, c, train=False)
    assert not np.allclose(np.asarray(out_standing), np.asarray(out_running),
                           atol=1e-4)
    # params/spectral untouched by accumulation
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables["params"], new_vars["params"])

    reset_vars = {**new_vars,
                  "batch_stats": reset_standing_stats(new_vars["batch_stats"])}
    out_reset = G.apply(reset_vars, z, c, train=False)
    np.testing.assert_allclose(np.asarray(out_reset), np.asarray(out_running),
                               rtol=1e-5, atol=1e-6)
