"""Model zoo tests: shapes, dtypes, state collections, spectral norm math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.models.layers import (FullyConnectedLayer,
                                             MappingNetwork,
                                             MinibatchStdLayer)
from style_big_gan_tpu.models.spectral_norm import SNDense, power_iteration

registries._import_all()

TINY_SG2 = dict(z_dim=32, w_dim=32, img_resolution=32, channel_base=512,
                channel_max=64, mapping_kwargs={"num_layers": 2})


def test_fully_connected_equalized_lr():
    fc = FullyConnectedLayer(8)
    x = jnp.ones((2, 4))
    vars_ = fc.init(jax.random.PRNGKey(0), x)
    y = fc.apply(vars_, x)
    assert y.shape == (2, 8)
    # runtime scale: output = x @ (w / sqrt(fan_in)); check magnitude sane
    w = vars_["params"]["weight"]
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x @ w) / np.sqrt(4), rtol=1e-5)


def test_mapping_network_truncation_and_w_avg():
    m = MappingNetwork(z_dim=16, c_dim=0, w_dim=16, num_ws=4, num_layers=2)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    vars_ = m.init(jax.random.PRNGKey(0), z, None)
    ws, mut = m.apply(vars_, z, None, update_emas=True, mutable=["moving"])
    assert ws.shape == (8, 4, 16)
    assert not np.allclose(np.asarray(mut["moving"]["w_avg"]), 0.0)
    # truncation_psi=0 => all ws equal w_avg
    vars2 = {"params": vars_["params"], "moving": mut["moving"]}
    ws_t = m.apply(vars2, z, None, truncation_psi=0.0)
    np.testing.assert_allclose(
        np.asarray(ws_t), np.broadcast_to(
            np.asarray(mut["moving"]["w_avg"]), ws_t.shape), atol=1e-5)


def test_minibatch_std_layer():
    layer = MinibatchStdLayer(group_size=2, num_channels=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6))
    y = layer.apply({}, x)
    assert y.shape == (4, 8, 8, 7)
    # identical samples -> zero std channel
    x0 = jnp.tile(x[:1], (4, 1, 1, 1))
    y0 = layer.apply({}, x0)
    np.testing.assert_allclose(np.asarray(y0[..., -1]), 0.0, atol=1e-3)


def test_sg2_generator_forward():
    G = registries.generators["sg2_classic"](c_dim=0, img_channels=3,
                                             **TINY_SG2)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    vars_ = G.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(2)}, z, None)
    img = G.apply(vars_, z, None, rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (2, 32, 32, 3)
    assert img.dtype == jnp.float32
    assert np.isfinite(np.asarray(img)).all()
    # w exposure for style mixing / PPL
    ws = G.apply(vars_, z, None, method=G.map_ws)
    assert ws.shape == (2, G.num_ws, 32)
    img2 = G.apply(vars_, ws, method=G.synthesize,
                   rngs={"noise": jax.random.PRNGKey(3)})
    assert img2.shape == img.shape


def test_sg2_generator_bf16_blocks():
    G = registries.generators["sg2_classic"](c_dim=0, img_channels=3,
                                             num_fp16_res=2, conv_clamp=256,
                                             **TINY_SG2)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    vars_ = G.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(2)}, z, None)
    img = G.apply(vars_, z, None, rngs={"noise": jax.random.PRNGKey(3)})
    assert img.dtype == jnp.float32           # ToRGB accumulates in fp32
    assert np.isfinite(np.asarray(img)).all()


def test_sg2_discriminator_forward():
    D = registries.discriminators["sg2_classic"](
        c_dim=0, img_resolution=32, img_channels=3, channel_base=512,
        channel_max=64, epilogue_kwargs={"mbstd_group_size": 2})
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    vars_ = D.init({"params": jax.random.PRNGKey(0)}, img, None)
    logits = D.apply(vars_, img, None)
    assert logits.shape == (4, 1)


def test_sg2_conditional_discriminator():
    D = registries.discriminators["sg2_classic"](
        c_dim=10, img_resolution=32, img_channels=3, channel_base=512,
        channel_max=64, epilogue_kwargs={"mbstd_group_size": 2})
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    c = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 10)
    vars_ = D.init({"params": jax.random.PRNGKey(0)}, img, c)
    logits = D.apply(vars_, img, c)
    assert logits.shape == (4, 1)


def test_sg2_attention_variant():
    G = registries.generators["sg2_classic"](c_dim=0, img_channels=3,
                                             attentions=[16], **TINY_SG2)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    vars_ = G.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(2)}, z, None)
    assert "spectral" in vars_  # SN attention carries power-iteration state
    img = G.apply(vars_, z, None, rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (2, 32, 32, 3)


def test_dcgan_forward():
    G = registries.generators["cnn32_dcgan"](z_dim=100)
    D = registries.discriminators["cnn32_dcgan"]()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    gv = G.init(jax.random.PRNGKey(0), z)
    img, _ = G.apply(gv, z, mutable=["batch_stats"])
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0
    dv = D.init(jax.random.PRNGKey(0), img)
    logits, _ = D.apply(dv, img, mutable=["batch_stats"])
    assert logits.shape == (2, 1)


def test_resnet_gan_forward():
    for gname, dname in [("res32_sngan", "res32_sngan"),
                         ("res32_wgan", "res32_wgan")]:
        G = registries.generators[gname](z_dim=128)
        D = registries.discriminators[dname]()
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
        gv = G.init(jax.random.PRNGKey(0), z)
        img, _ = G.apply(gv, z, mutable=["batch_stats"])
        assert img.shape == (2, 32, 32, 3)
        dv = D.init(jax.random.PRNGKey(0), img)
        if "spectral" in dv:
            logits, _ = D.apply(dv, img, mutable=["spectral"])
        else:
            logits = D.apply(dv, img)
        assert logits.shape == (2, 1)
        if gname == "res32_sngan":
            assert "spectral" in dv


def test_spectral_norm_power_iteration_converges():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 24))
    true_sv = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    us = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    for _ in range(50):
        svs, us, _ = power_iteration(w, us, num_itrs=1)
    assert abs(float(svs[0]) - true_sv) / true_sv < 1e-3


def test_sn_dense_updates_u():
    layer = SNDense(8)
    x = jnp.ones((2, 4))
    vars_ = layer.init(jax.random.PRNGKey(0), x)
    y, mut = layer.apply(vars_, x, True, mutable=["spectral"])
    assert y.shape == (2, 8)
    u0 = np.asarray(vars_["spectral"]["sn"]["u"])
    u1 = np.asarray(mut["spectral"]["sn"]["u"])
    assert not np.allclose(u0, u1)


def test_biggan_forward():
    G = registries.generators["big_gan"](G_ch=8, z_dim=16, c_dim=10,
                                         img_resolution=32, G_shared=False)
    D = registries.discriminators["big_gan"](D_ch=8, c_dim=10,
                                             img_resolution=32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    c = jax.nn.one_hot(jnp.array([3, 7]), 10)
    gv = G.init({"params": jax.random.PRNGKey(0)}, z, c)
    img, _ = G.apply(gv, z, c, mutable=["batch_stats", "spectral"])
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0
    dv = D.init({"params": jax.random.PRNGKey(0)}, img, c)
    logits, _ = D.apply(dv, img, c, mutable=["spectral"])
    assert logits.shape == (2, 1)


def test_biggan_shared_hier():
    G = registries.generators["big_gan"](G_ch=8, z_dim=20, c_dim=10,
                                         img_resolution=32, G_shared=True,
                                         hier=True, shared_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 20))
    c = jax.nn.one_hot(jnp.array([3, 7]), 10)
    gv = G.init({"params": jax.random.PRNGKey(0)}, z, c)
    img, _ = G.apply(gv, z, c, mutable=["batch_stats", "spectral"])
    assert img.shape == (2, 32, 32, 3)


def test_freeze_d_stops_gradients():
    D = registries.discriminators["sg2_classic"](
        c_dim=0, img_resolution=32, img_channels=3, channel_base=512,
        channel_max=64, freeze_layers=2,
        epilogue_kwargs={"mbstd_group_size": 2})
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    vars_ = D.init({"params": jax.random.PRNGKey(0)}, img, None)

    def loss(params):
        return jnp.sum(D.apply({"params": params}, img, None) ** 2)

    grads = jax.grad(loss)(vars_["params"])
    # b32 fromrgb (layer 0) and conv0 (layer 2? depends) — at least the very
    # first layer must have zero grads.
    g0 = grads["b32"]["fromrgb"]["weight"]
    assert np.allclose(np.asarray(g0), 0.0)
