"""Native JAX FID-inception: structure, detector contract, converter."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_big_gan_tpu.metrics.inception_jax import (
    InceptionV3FID, InceptionV3JaxDetector, convert_torch_inception,
    load_params_npz, preprocess, random_params)


@pytest.fixture(scope="module")
def params():
    return random_params(seed=0)


def test_feature_and_logits_shapes(params):
    model = InceptionV3FID()
    x = preprocess(jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert x.shape == (2, 299, 299, 3)
    feat, logits = model.apply(params, x, return_logits=True)
    assert feat.shape == (2, 2048)
    assert logits.shape == (2, 1008)
    assert np.isfinite(np.asarray(feat)).all()


def test_detector_contract(params):
    det = InceptionV3JaxDetector(params=params)
    imgs = (np.random.RandomState(0).rand(3, 32, 32, 3) * 255).astype(
        np.uint8)
    feat = det(imgs)
    assert feat.shape == (3, 2048) and feat.dtype == np.float32
    logits = det(imgs, return_logits=True)
    assert logits.shape == (3, 1008)
    # grayscale input is tiled to RGB
    assert det(imgs[..., :1]).shape == (3, 2048)


def test_registered_in_metric_registry(params):
    from style_big_gan_tpu.metrics.metric_utils import _DETECTORS
    assert "inception_v3_jax" in _DETECTORS


def test_block_output_channels(params):
    """The Mixed-block channel ladder must match the FID inception
    (reference detector architecture): 5b:256 5c:288 5d:288 6a:768 ...
    7b:2048 7c:2048."""
    expected = {"Mixed_5b": 256, "Mixed_5c": 288, "Mixed_5d": 288,
                "Mixed_6a": 768, "Mixed_6b": 768, "Mixed_6e": 768,
                "Mixed_7a": 1280, "Mixed_7b": 2048, "Mixed_7c": 2048}
    model = InceptionV3FID()
    x = preprocess(jnp.zeros((1, 299, 299, 3), jnp.uint8))
    _, intermediates = model.apply(
        params, x, capture_intermediates=True, mutable=["intermediates"])
    inter = intermediates["intermediates"]
    for name, ch in expected.items():
        out = inter[name]["__call__"][0]
        assert out.shape[-1] == ch, (name, out.shape)


def test_param_count_matches_inception_v3(params):
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    # torchvision InceptionV3 trunk + 1008-way fc with BN folded:
    # 21.8M conv/fc weights (BN stats fold away).
    assert 21_000_000 < n < 26_000_000, n


def test_arch_parity_vs_torch_oracle_random_weights(tmp_path):
    """Weights-independent end-to-end graph parity (VERDICT r2 #4): a torch
    twin of the FID-inception architecture with RANDOM weights (random BN
    stats too, so folding is non-trivial) -> state_dict -> converter -> the
    flax port must produce the same features and logits.  This proves the
    architecture + converter are correct; the weights-gated golden test
    below covers real numerics when a weights file exists."""
    import torch
    from torch_detector_oracles import (TorchInceptionV3FID,
                                        randomize_inception_)

    model = randomize_inception_(TorchInceptionV3FID(), seed=0)
    src = str(tmp_path / "incep_sd.pt")
    torch.save(model.state_dict(), src)
    params = convert_torch_inception(src)

    rnd = np.random.RandomState(1)
    x = (rnd.rand(2, 299, 299, 3) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        f_t, l_t = model(torch.tensor(x.transpose(0, 3, 1, 2)),
                         return_logits=True)
    f_j, l_j = InceptionV3FID().apply(params, jnp.asarray(x),
                                      return_logits=True)
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(l_j), l_t.numpy(), rtol=2e-3,
                               atol=2e-3)


def test_preprocess_matches_torch_interpolate():
    """jax preprocess (bilinear, no antialias, half-pixel centers) must
    match torch F.interpolate(mode='bilinear', align_corners=False) — the
    resize convention of the FID ports."""
    import torch
    import torch.nn.functional as F
    imgs = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(
        np.uint8)
    got = np.asarray(preprocess(jnp.asarray(imgs)))
    t = torch.tensor(imgs.transpose(0, 3, 1, 2).astype(np.float32))
    want = F.interpolate(t, size=(299, 299), mode="bilinear",
                         align_corners=False)
    want = (want / 127.5 - 1.0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


_INCEPTION_PT = os.environ.get("SBG_INCEPTION_PT",
                               "/root/weights/inception-2015-12-05.pt")


@pytest.mark.skipif(not os.path.isfile(_INCEPTION_PT),
                    reason="real inception weights not in this image; set "
                           "SBG_INCEPTION_PT to run the golden parity check")
def test_jax_port_matches_torchscript_golden():
    """Golden numerics: the native flax port fed by converted weights must
    match the NVlabs TorchScript detector on one batch (VERDICT r1 task 10;
    the north-star 'FID within 5%' rests on this).  Runs iff a weights file
    is present — see BASELINE.md 'Real-detector verification' for the full
    recipe."""
    import tempfile
    from style_big_gan_tpu.metrics.inception import InceptionV3Detector
    from style_big_gan_tpu.tools.convert_detector import main as convert_main
    with tempfile.TemporaryDirectory() as td:
        npz = f"{td}/inception.npz"
        convert_main(["--kind", "inception", "--src", _INCEPTION_PT,
                      "--out", npz])
        jax_det = InceptionV3JaxDetector(npz)
        ts_det = InceptionV3Detector(_INCEPTION_PT)
        imgs = (np.random.RandomState(0).rand(8, 299, 299, 3) * 255
                ).astype(np.uint8)
        f_jax = jax_det(imgs)
        f_ts = ts_det(imgs)
        # cosine similarity per item > 0.999 and small relative L2
        for a, b in zip(f_jax, f_ts):
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.999, cos
        rel = np.linalg.norm(f_jax - f_ts) / np.linalg.norm(f_ts)
        assert rel < 0.01, rel


def test_converter_folds_bn(tmp_path):
    """BN folding: conv weight scaled by gamma/sqrt(var+eps), bias
    beta - mean*scale, OIHW -> HWIO; npz round trip."""
    torch = pytest.importorskip("torch")
    rnd = np.random.RandomState(0)
    w = rnd.randn(32, 3, 3, 3).astype(np.float32)
    gamma = rnd.rand(32).astype(np.float32) + 0.5
    beta = rnd.randn(32).astype(np.float32)
    mean = rnd.randn(32).astype(np.float32)
    var = rnd.rand(32).astype(np.float32) + 0.1
    sd = {
        "Conv2d_1a_3x3.conv.weight": torch.tensor(w),
        "Conv2d_1a_3x3.bn.weight": torch.tensor(gamma),
        "Conv2d_1a_3x3.bn.bias": torch.tensor(beta),
        "Conv2d_1a_3x3.bn.running_mean": torch.tensor(mean),
        "Conv2d_1a_3x3.bn.running_var": torch.tensor(var),
        "fc.weight": torch.tensor(rnd.randn(1008, 2048).astype(np.float32)),
        "fc.bias": torch.tensor(rnd.randn(1008).astype(np.float32)),
    }
    src = str(tmp_path / "sd.pt")
    out = str(tmp_path / "conv.npz")
    torch.save(sd, src)
    params = convert_torch_inception(src, out_path=out)

    scale = gamma / np.sqrt(var + 1e-3)
    w_want = np.transpose(w * scale[:, None, None, None], (2, 3, 1, 0))
    b_want = beta - mean * scale
    got = params["params"]["Conv2d_1a_3x3"]["conv"]
    np.testing.assert_allclose(np.asarray(got["kernel"]), w_want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["bias"]), b_want, rtol=1e-5)
    assert params["params"]["fc"]["kernel"].shape == (2048, 1008)

    loaded = load_params_npz(out)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]),
        w_want, rtol=1e-6)
