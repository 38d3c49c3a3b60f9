"""Native JAX VGG16-LPIPS: embedding contract, LPIPS identities, converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_big_gan_tpu.metrics.vgg16_jax import (
    VGG16LPIPS, VGG16LPIPSJaxDetector, convert_torch_vgg16, load_params_npz,
    preprocess, random_params)


@pytest.fixture(scope="module")
def params():
    return random_params(seed=0, res=64)


def test_embedding_shape_and_identity(params):
    model = VGG16LPIPS()
    x = preprocess(jnp.zeros((2, 64, 64, 3), jnp.uint8), size=64)
    e = model.apply(params, x)
    assert e.ndim == 2 and e.shape[0] == 2
    assert np.isfinite(np.asarray(e)).all()
    # identical inputs -> zero LPIPS distance
    d = np.sum((np.asarray(e[0]) - np.asarray(e[1])) ** 2)
    assert d == 0.0


def test_lpips_distance_positive_for_different_images(params):
    det = VGG16LPIPSJaxDetector(params=params, size=64)
    rnd = np.random.RandomState(0)
    a = (rnd.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    b = (rnd.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    ea, eb = det(a), det(b)
    assert ea.shape == eb.shape
    assert np.sum((ea - eb) ** 2) > 0


def test_embedding_differentiable(params):
    """The projector backprops through the embedding."""
    model = VGG16LPIPS()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32) * 2 - 1

    def loss(x):
        return jnp.sum(model.apply(params, x) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_registered_detector():
    from style_big_gan_tpu.metrics.metric_utils import _DETECTORS
    assert "vgg16_lpips" in _DETECTORS


def test_converter_torchvision_naming(tmp_path):
    torch = pytest.importorskip("torch")
    rnd = np.random.RandomState(0)
    # torchvision vgg16 features indices of the 13 convs
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    sd = {}
    for i, (ci, co) in zip(conv_idx, chans):
        sd[f"features.{i}.weight"] = torch.tensor(
            rnd.randn(co, ci, 3, 3).astype(np.float32))
        sd[f"features.{i}.bias"] = torch.tensor(
            rnd.randn(co).astype(np.float32))
    src = str(tmp_path / "vgg.pth")
    out = str(tmp_path / "vgg.npz")
    torch.save(sd, src)
    params = convert_torch_vgg16(src, out_path=out)
    p = params["params"]
    assert p["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert p["conv5_3"]["kernel"].shape == (3, 3, 512, 512)
    assert p["lin0"].shape == (64,) and p["lin4"].shape == (512,)
    # round-trips and actually runs
    loaded = load_params_npz(out)
    e = VGG16LPIPS().apply(loaded, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(e)).all()


def test_converter_richzhang_naming(tmp_path):
    torch = pytest.importorskip("torch")
    rnd = np.random.RandomState(1)
    # richzhang slices: slice1: convs at 0,2; slice2: 5,7; slice3: 10,12,14;
    # slice4: 17,19,21; slice5: 24,26,28 (indices within nn.Sequential).
    layout = {1: [(0, 3, 64), (2, 64, 64)],
              2: [(5, 64, 128), (7, 128, 128)],
              3: [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
              4: [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
              5: [(24, 512, 512), (26, 512, 512), (28, 512, 512)]}
    sd = {}
    for g, convs in layout.items():
        for idx, ci, co in convs:
            sd[f"net.slice{g}.{idx}.weight"] = torch.tensor(
                rnd.randn(co, ci, 3, 3).astype(np.float32))
            sd[f"net.slice{g}.{idx}.bias"] = torch.tensor(
                rnd.randn(co).astype(np.float32))
    for i, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            rnd.rand(1, c, 1, 1).astype(np.float32))
    src = str(tmp_path / "lpips.pth")
    torch.save(sd, src)
    params = convert_torch_vgg16(src)
    p = params["params"]
    assert p["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert p["conv4_1"]["kernel"].shape == (3, 3, 256, 512)
    # lins stored in sqrt-space: torch LPIPS weights multiply SQUARED diffs,
    # the embedding scales features by sqrt(w) so ||e0-e1||^2 == LPIPS.
    lin0_src = np.sqrt(np.abs(sd["lin0.model.1.weight"].numpy()).reshape(-1))
    np.testing.assert_allclose(np.asarray(p["lin0"]), lin0_src, rtol=1e-6)


def test_arch_parity_vs_torch_oracle_random_weights(tmp_path):
    """Weights-independent graph parity (VERDICT r2 #4): torch LPIPS-VGG
    twin with random weights -> richzhang-named state_dict -> converter ->
    the flax port must produce the same LPIPS embedding, so the squared-L2
    distances (PPL / projector losses) agree across frameworks."""
    import torch
    from torch_detector_oracles import TorchVGG16LPIPS

    model = TorchVGG16LPIPS(seed=0)
    src = str(tmp_path / "lpips_sd.pt")
    torch.save(model.state_dict_richzhang(), src)
    params = convert_torch_vgg16(src)

    rnd = np.random.RandomState(2)
    x = (rnd.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        e_t = model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    e_j = np.asarray(VGG16LPIPS().apply(params, jnp.asarray(x)))
    assert e_j.shape == e_t.shape
    # Embedding layouts differ (NCHW vs NHWC flatten); distances are the
    # contract, and per-tap norms must agree exactly.
    np.testing.assert_allclose(np.sum(e_j ** 2, axis=1),
                               np.sum(e_t ** 2, axis=1), rtol=1e-4)
    d_j = float(np.sum((e_j[0] - e_j[1]) ** 2))
    d_t = float(np.sum((e_t[0] - e_t[1]) ** 2))
    np.testing.assert_allclose(d_j, d_t, rtol=1e-4)


def test_lpips_embedding_matches_torch_lpips_formula():
    """Golden identity: ||e0-e1||^2 must equal the explicit LPIPS formula
    sum_l mean_hw sum_c w_lc * (n0 - n1)^2 with the ORIGINAL (non-sqrt)
    weights — guards the sqrt-space storage convention end to end."""
    rnd = np.random.RandomState(3)
    params = random_params(seed=0, res=32)
    # Fake "torch-space" lin weights w; store sqrt(w) as the module expects.
    p = dict(params["params"])
    w_orig = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        w = rnd.rand(c).astype(np.float32)
        w_orig[i] = w
        p[f"lin{i}"] = jnp.asarray(np.sqrt(w))
    params = {"params": p}

    x0 = jnp.asarray(rnd.rand(1, 32, 32, 3) * 2 - 1, jnp.float32)
    x1 = jnp.asarray(rnd.rand(1, 32, 32, 3) * 2 - 1, jnp.float32)
    model = VGG16LPIPS()
    e0, e1 = model.apply(params, x0), model.apply(params, x1)
    dist_embed = float(np.sum((np.asarray(e0) - np.asarray(e1)) ** 2))

    # Explicit formula on unit-normalized taps.
    import flax.linen as nn
    from style_big_gan_tpu.metrics.vgg16_jax import (_SHIFT, _SCALE, _TAPS,
                                                     _VGG_PLAN)

    def taps(x):
        x = (x - _SHIFT) / _SCALE
        out = []
        for item in _VGG_PLAN:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            name, ch = item
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name).apply(
                {"params": params["params"][name]}, x))
            if name in _TAPS:
                out.append(x)
        return out

    dist_formula = 0.0
    for i, (t0, t1) in enumerate(zip(taps(x0), taps(x1))):
        n0 = t0 / jnp.sqrt(jnp.sum(t0 ** 2, -1, keepdims=True) + 1e-10)
        n1 = t1 / jnp.sqrt(jnp.sum(t1 ** 2, -1, keepdims=True) + 1e-10)
        sq = (n0 - n1) ** 2 * jnp.asarray(w_orig[i])
        dist_formula += float(jnp.mean(jnp.sum(sq, -1)))
    np.testing.assert_allclose(dist_embed, dist_formula, rtol=1e-4)
