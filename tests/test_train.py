"""Loss engine + step tests: loss formulas, regularizer math (incl.
grad-of-grad), one full jitted G/D step on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.augment.controller import AdaController
from style_big_gan_tpu.train.state import create_train_state
from style_big_gan_tpu.train.steps import StepBuilder

registries._import_all()


# ------------------------------------------------------------------ losses

def test_loss_formulas():
    losses = registries.losses
    real = jnp.asarray([1.0, 2.0])
    fake = jnp.asarray([-1.0, 0.5])

    sp = lambda v: np.log1p(np.exp(v))
    np.testing.assert_allclose(
        float(losses["bcew"]().calc_loss(real, fake)),
        np.mean(sp(-np.asarray(real))) + np.mean(sp(np.asarray(fake))),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["hinge"]().calc_loss(real, fake)),
        np.mean(np.maximum(0, 1 - np.asarray(real))) +
        np.mean(np.maximum(0, 1 + np.asarray(fake))), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["wasserstein"]().calc_loss(real, fake)),
        np.mean(np.asarray(fake)) - np.mean(np.asarray(real)), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["softplus"]().calc_loss(fake)),   # G mode
        np.mean(sp(-np.asarray(fake))), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["hinge"]().calc_loss(fake)), -np.mean(np.asarray(fake)),
        rtol=1e-5)


# ----------------------------------------------------- tiny training setup

def tiny_setup(loss_arch="base", loss="bcew", gen_regs=(), dis_regs=(),
               accum=1, fuse_d_reg=False):
    # base_width shrinks the DCGAN ladder to micro widths: these tests
    # cover step MACHINERY (rng split order, optimizer wiring, reg
    # windows), not model capacity — XLA:CPU compile+run time at the
    # real 1024-wide ladder dominated this file's wall time.
    G = registries.generators["cnn32_dcgan"](z_dim=16, base_width=64)
    D = registries.discriminators["cnn32_dcgan"](base_width=64)
    arch = registries.losses_arch[loss_arch]() if loss_arch == "base" else \
        registries.losses_arch[loss_arch](style_mixing_prob=0.5)
    gen_reg_objs = [registries.generator_regs[n]() for n in gen_regs]
    dis_reg_objs = [registries.discriminator_regs[n]() for n in dis_regs]
    arch.initialize(G, D, registries.losses[loss](), gen_reg_objs,
                    dis_reg_objs, None)

    z = jnp.zeros((2, 16))
    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img)
    from style_big_gan_tpu.train.loss_arch import split_vars
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.adam(1e-3)
    state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds, tx, tx,
                               gen_regs=gen_reg_objs)
    steps = StepBuilder(arch, tx, tx, z_dim=16, num_accum_rounds=accum,
                        fuse_d_reg=fuse_d_reg, donate=False)
    return steps, state


def _leaf_changed(a, b):
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_g_and_d_steps_update_params():
    steps, state = tiny_setup()
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    c = jnp.zeros((4, 0))
    state2, stats = steps.d_step(state, real, c, c)
    assert _leaf_changed(state.params_d, state2.params_d)
    assert not _leaf_changed(state.params_g, state2.params_g)
    assert np.isfinite(stats["Loss/D/loss"])
    state3, stats_g = steps.g_step(state2, c, 0.99)
    assert _leaf_changed(state2.params_g, state3.params_g)
    assert np.isfinite(stats_g["Loss/G/loss"])
    # EMA moved toward new params
    assert _leaf_changed(state2.params_g_ema, state3.params_g_ema)
    assert int(state3.step) == 1


def test_ema_beta_semantics():
    """beta is the retention of the old average: use_ema=False must yield
    beta=0 so G_ema tracks G exactly (a 1.0 here froze G_ema at init and
    every snapshot/metric of EMA-less configs evaluated a random net), and
    with EMA on, g_step with beta=0 must copy params into the EMA."""
    from style_big_gan_tpu.train.trainer import BaseTrainer
    t = BaseTrainer.__new__(BaseTrainer)
    from style_big_gan_tpu.utils.misc import EasyDict
    t.args = EasyDict(use_ema=False, ema_kimg=10, ema_rampup=None,
                      batch_size=64)
    assert t._ema_beta(10_000) == 0.0
    t.args.use_ema = True
    assert 0.0 < t._ema_beta(10_000) < 1.0

    steps, state = tiny_setup()
    c = jnp.zeros((4, 0))
    state2, _ = steps.g_step(state, c, 0.0)       # beta=0 -> exact copy
    for a, b in zip(jax.tree_util.tree_leaves(state2.params_g),
                    jax.tree_util.tree_leaves(state2.params_g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_single_round():
    # same total batch, 1 round vs 2 rounds -> same grads (deterministic rng
    # differences only through per-round keys; disable noise by using D step
    # whose loss is deterministic given z — so compare loss stats instead)
    steps1, state1 = tiny_setup(accum=1)
    steps2, state2 = tiny_setup(accum=2)
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    c = jnp.zeros((4, 0))
    s1, stats1 = steps1.d_step(state1, real, c, c)
    s2, stats2 = steps2.d_step(state2, real, c, c)
    assert np.isfinite(stats2["Loss/D/loss"])
    # Not bit-identical (different z per round) but same magnitude scale.
    assert abs(float(stats1["Loss/D/loss"]) -
               float(stats2["Loss/D/loss"])) < 2.0


def test_d_reg_step_r1():
    steps, state = tiny_setup(dis_regs=("r1",))
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    c = jnp.zeros((4, 0))
    state2, stats = steps.d_reg_step(state, real, c, c)
    assert "Loss/r1_penalty" in stats
    assert np.isfinite(stats["Loss/r1_penalty"])
    assert _leaf_changed(state.params_d, state2.params_d)


def test_d_reg_step_grad_pen_under_accumulation():
    """grad_pen needs fakes inside the lazy Dreg phase; with
    num_accum_rounds > 1 the memory-lean path generates them per
    microbatch round inside the round scan (StepBuilder._d_reg_update,
    fake_img=None + d_reg_needs_fake — the 1024px HBM regime)."""
    steps, state = tiny_setup(dis_regs=("grad_pen",), accum=2)
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3),
                       jnp.float32)
    c = jnp.zeros((4, 0))
    state2, stats = steps.d_reg_step(state, real, c, c)
    assert np.isfinite(stats["Loss/D/grad_pen"])
    assert _leaf_changed(state.params_d, state2.params_d)
    assert not _leaf_changed(state.params_g, state2.params_g)


def test_d_reg_step_grad_pen():
    steps, state = tiny_setup(dis_regs=("grad_pen",))
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    c = jnp.zeros((4, 0))
    state2, stats = steps.d_reg_step(state, real, c, c)
    assert np.isfinite(stats["Loss/D/grad_pen"])


def test_fused_d_reg():
    steps, state = tiny_setup(dis_regs=("r1",), fuse_d_reg=True)
    real = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    c = jnp.zeros((4, 0))
    _, stats = steps.d_step(state, real, c, c)
    assert "Loss/r1_penalty" in stats and "Loss/D/loss" in stats


def test_r1_math_linear_d():
    """R1 penalty on a linear D equals gamma/2 * ||w||^2 per sample."""
    from style_big_gan_tpu.train.loss_arch import BasicLossArch

    class LinD:
        def apply(self, vars_, img, c, mutable=None):
            w = vars_["params"]["w"]
            out = jnp.sum(img * w, axis=(1, 2, 3), keepdims=False)[:, None]
            return (out, {}) if mutable else out

    arch = BasicLossArch()
    arch.initialize(None, LinD(), registries.losses["bcew"](), [], [], None)
    reg = registries.discriminator_regs["r1"](r1_gamma=4.0)
    w = jnp.asarray(np.random.RandomState(0).randn(8, 8, 3), jnp.float32)
    real = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3), jnp.float32)
    loss, stats = reg.calc_reg(arch, {"w": w}, {}, None, real,
                               None, None, jax.random.PRNGKey(0), None)
    expected = 2.0 * float(jnp.sum(w * w))   # gamma/2 * ||grad||^2, grad = w
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_ppl_reg_env_knobs(monkeypatch):
    """SBG_PPL_DTYPE=bf16 / SBG_PPL_REMAT=1 (perf-experiment switches,
    BASELINE.md round-5) produce finite penalties close to the f32 path."""
    G = registries.generators["sg2_classic"](
        z_dim=16, w_dim=16, img_resolution=16, channel_base=256,
        channel_max=32, mapping_kwargs={"num_layers": 1})
    arch = registries.losses_arch["sg2"](style_mixing_prob=0.0)
    arch.initialize(G, None, registries.losses["softplus"](), [], [], None)
    reg = registries.generator_regs["ppl"]()
    z = jnp.zeros((4, 16))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z, None)
    from style_big_gan_tpu.train.loss_arch import split_vars
    pg, gs = split_vars(gv)
    zr = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)

    def run():
        loss, _, st = reg.calc_reg(arch, pg, gs, zr, None,
                                   jax.random.PRNGKey(2),
                                   {"pl_mean": jnp.zeros(())})
        return float(loss), float(st["pl_mean"])

    base_loss, base_mean = run()
    monkeypatch.setenv("SBG_PPL_REMAT", "1")
    remat_loss, remat_mean = run()
    np.testing.assert_allclose(remat_loss, base_loss, rtol=1e-5)
    np.testing.assert_allclose(remat_mean, base_mean, rtol=1e-5)
    monkeypatch.setenv("SBG_PPL_REMAT", "0")
    monkeypatch.setenv("SBG_PPL_DTYPE", "bf16")
    bf_loss, bf_mean = run()
    assert np.isfinite(bf_loss) and bf_mean > 0.0
    np.testing.assert_allclose(bf_mean, base_mean, rtol=0.1)


def test_ppl_reg_with_sg2():
    G = registries.generators["sg2_classic"](
        z_dim=16, w_dim=16, img_resolution=16, channel_base=256,
        channel_max=32, mapping_kwargs={"num_layers": 1})
    arch = registries.losses_arch["sg2"](style_mixing_prob=0.0)
    arch.initialize(G, None, registries.losses["softplus"](), [], [], None)
    reg = registries.generator_regs["ppl"]()
    z = jnp.zeros((4, 16))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z, None)
    from style_big_gan_tpu.train.loss_arch import split_vars
    pg, gs = split_vars(gv)
    zr = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    loss, stats, new_state = reg.calc_reg(
        arch, pg, gs, zr, None, jax.random.PRNGKey(2),
        {"pl_mean": jnp.zeros(())})
    assert np.isfinite(float(loss))
    assert float(new_state["pl_mean"]) > 0.0
    # differentiable wrt G params (double backward)
    g = jax.grad(lambda p: reg.calc_reg(arch, p, gs, zr, None,
                                        jax.random.PRNGKey(2),
                                        {"pl_mean": jnp.zeros(())})[0])(pg)
    assert np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(g)[0])).all()


def test_sg2_loss_arch_style_mixing():
    G = registries.generators["sg2_classic"](
        z_dim=16, w_dim=16, img_resolution=16, channel_base=256,
        channel_max=32, mapping_kwargs={"num_layers": 1})
    arch = registries.losses_arch["sg2"](style_mixing_prob=1.0)
    arch.initialize(G, None, registries.losses["softplus"](), [], [], None)
    z = jnp.zeros((2, 16))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z, None)
    img, ws = arch.run_G_ws(gv, jnp.asarray(
        np.random.RandomState(0).randn(2, 16), jnp.float32), None,
        jax.random.PRNGKey(5))
    assert img.shape == (2, 16, 16, 3)
    # with prob 1, later ws rows must differ from row 0 (mixed)
    ws = np.asarray(ws)
    assert not np.allclose(ws[:, 0], ws[:, -1])


def test_sg2_fused_dmain_matches_split():
    """SG2LossArch.d_main fuses fake+real into one ADA pass + one D forward
    with an mbstd-aligned chunk interleave; it must match the base split
    path bit-for-bit in loss and to float precision in grads."""
    from style_big_gan_tpu.augment.ada import AUGPIPE_SPECS, AugmentPipe
    from style_big_gan_tpu.train.loss_arch import LossArchBase, split_vars

    G = registries.generators["sg2_classic"](
        z_dim=16, w_dim=16, img_resolution=32, channel_base=1024,
        channel_max=32, mapping_kwargs={"num_layers": 1})
    D = registries.discriminators["sg2_classic"](
        c_dim=0, img_resolution=32, channel_base=1024, channel_max=32,
        epilogue_kwargs={"mbstd_group_size": 4, "mbstd_num_channels": 1})
    arch = registries.losses_arch["sg2"](style_mixing_prob=0.0)
    arch.initialize(G, D, registries.losses["softplus"](), [], [],
                    AugmentPipe(**AUGPIPE_SPECS["bgc"],
                                warp_dtype="float32"))
    z = jnp.zeros((8, 16))
    img0 = jnp.zeros((8, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z, None)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img0, None)
    _, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    rnd = np.random.RandomState(0)
    fake = jnp.asarray(rnd.randn(8, 32, 32, 3), jnp.float32)
    real = jnp.asarray(rnd.randn(8, 32, 32, 3), jnp.float32)
    c = jnp.zeros((8, 0), jnp.float32)
    key = jax.random.PRNGKey(7)
    p = jnp.float32(0.0)    # ADA deterministic at p=0: exact comparison

    loss_f, (stats_f, _) = arch.d_main(pd, ds, fake, real, c, c, key, p)
    loss_s, (stats_s, _) = LossArchBase.d_main(arch, pd, ds, fake, real,
                                               c, c, key, p)
    np.testing.assert_allclose(float(loss_f), float(loss_s), rtol=1e-5)
    for k in stats_f:
        np.testing.assert_allclose(np.asarray(stats_f[k]),
                                   np.asarray(stats_s[k]), rtol=1e-4,
                                   atol=1e-6)
    gf = jax.grad(lambda q: arch.d_main(q, ds, fake, real, c, c, key,
                                        p)[0])(pd)
    gsx = jax.grad(lambda q: LossArchBase.d_main(arch, q, ds, fake, real,
                                                 c, c, key, p)[0])(pd)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gsx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=5e-6)
    # Gating: tiny/non-dividing batches must fall back to the split path.
    assert not arch._mbstd_concat_exact(2)
    assert arch._mbstd_concat_exact(4) and arch._mbstd_concat_exact(8)


def test_ada_controller():
    c = AdaController(target=0.6, interval=4, kimg=500, batch_size=64)
    for _ in range(4):
        c.observe(1.0)    # D too confident -> increase p
    p = c.adjust(0.0)
    assert p > 0
    for _ in range(4):
        c.observe(0.0)    # below target -> decrease p (clamped at 0)
    p2 = c.adjust(p)
    assert p2 < p
    assert c.adjust(0.0) is None  # no observations -> no-op


def test_device_normalize_matches_host():
    """The hot loop ships uint8 and normalizes ON DEVICE (trainer.py::
    _normalize_u8); it must equal the host-side normalize_images exactly
    (reference conversion: trainers.py:716)."""
    from style_big_gan_tpu.data.dataloader import normalize_images
    from style_big_gan_tpu.train.trainer import (_DeviceBatchPrefetcher,
                                                 _normalize_u8)
    u8 = np.random.RandomState(0).randint(0, 256, (2, 3, 8, 8, 3),
                                          dtype=np.uint8)
    dev = np.asarray(_normalize_u8(jnp.asarray(u8)))
    # XLA may fuse /127.5 as *(1/127.5): tolerate 1-ULP differences.
    np.testing.assert_allclose(dev, normalize_images(u8), atol=2e-7, rtol=0)
    assert dev.dtype == np.float32

    # Prefetcher: order-preserving, exception surfaces in the consumer.
    it = iter(range(5))

    def make():
        v = next(it)
        if v == 3:
            raise RuntimeError("boom")
        return v

    p = _DeviceBatchPrefetcher(make)
    assert [p.get(), p.get(), p.get()] == [0, 1, 2]
    try:
        p.get()
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    p.close()
