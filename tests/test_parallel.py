"""SPMD tests on the 8-device CPU mesh: sharded training steps produce
identical results to single-device, cross-replica BN is global, TP sharding
rules apply, the dryrun_multichip entry works."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from style_big_gan_tpu import registries
from style_big_gan_tpu.parallel import mesh as mesh_lib

registries._import_all()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = mesh_lib.make_mesh(8, model_parallel=1)
    assert dict(mesh1.shape) == {"data": 8, "model": 1}


def test_shard_batch_places_on_data_axis():
    mesh = mesh_lib.make_mesh(8)
    x = np.random.randn(16, 4, 4, 3).astype(np.float32)
    (xs,) = mesh_lib.shard_batch(mesh, (x,))
    assert xs.sharding.spec[0] == "data"
    np.testing.assert_allclose(np.asarray(xs), x)


def test_infer_param_sharding_tp():
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    tree = {"big": jnp.zeros((256, 512)), "small": jnp.zeros((4, 4)),
            "vec": jnp.zeros((128,))}
    sh = mesh_lib.infer_param_sharding(tree, mesh, min_size=1024)
    assert sh["big"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_infer_state_sharding_named_targets():
    """The trainer/dryrun rule: mapping FC kernels and the widest conv
    kernels shard by NAME (below TP_MIN_SHARD_SIZE); optimizer-moment
    leaves follow their parameter because the param path is embedded in
    theirs; odd out-channels and small unnamed leaves replicate."""
    P = jax.sharding.PartitionSpec
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    state = {
        "params_g": {
            "mapping": {"fc0": {"weight": jnp.zeros((64, 64))}},
            "synthesis": {"b8": {"conv0": {"weight": jnp.zeros((3, 3, 128, 128))},
                                 "torgb": {"weight": jnp.zeros((1, 1, 128, 3))}}},
        },
        "opt_g": {"mu": {"mapping": {"fc0": {"weight": jnp.zeros((64, 64))}}}},
        "step": jnp.zeros((), jnp.int32),
    }
    sh = mesh_lib.infer_state_sharding(state, mesh)
    g = sh["params_g"]
    assert g["mapping"]["fc0"]["weight"].spec == P(None, "model")
    assert g["synthesis"]["b8"]["conv0"]["weight"].spec == \
        P(None, None, None, "model")          # widest conv (128 out)
    assert g["synthesis"]["b8"]["torgb"]["weight"].spec == P()  # 3 % 2 != 0
    assert sh["opt_g"]["mu"]["mapping"]["fc0"]["weight"].spec == \
        P(None, "model")                      # moments follow the param
    assert sh["step"].spec == P()
    # Pure-DP mesh: everything replicates.
    mesh_dp = mesh_lib.make_mesh(8, model_parallel=1)
    sh_dp = mesh_lib.infer_state_sharding(state, mesh_dp)
    assert all(s.spec == P()
               for s in jax.tree_util.tree_leaves(sh_dp))


def test_batchnorm_is_cross_replica_under_sharding():
    """BN statistics must be *global* over a sharded batch — the SyncBN
    replacement (SURVEY.md §2.6)."""
    mesh = mesh_lib.make_mesh(8)

    def bn_mean(x):
        return jnp.mean(x, axis=(0, 1, 2))

    x = np.random.RandomState(0).randn(16, 4, 4, 8).astype(np.float32)
    (xs,) = mesh_lib.shard_batch(mesh, (x,))
    out = jax.jit(bn_mean)(xs)
    np.testing.assert_allclose(np.asarray(out), x.mean(axis=(0, 1, 2)),
                               rtol=1e-5)


def test_ccbn_cross_replica_on_real_layer():
    """The actual BigGAN CCBN layer (train mode, batch_stats mutable) on an
    8-way-sharded batch must produce the same normalized output AND the same
    updated running stats as unsharded — real SyncBN semantics (reference:
    biggan/sync_batchnorm/batchnorm.py:38-159), not just a bare mean."""
    from style_big_gan_tpu.models.biggan import CCBN

    layer = CCBN(channels=16, use_sn=False)
    rnd = np.random.RandomState(0)
    x = rnd.randn(16, 4, 4, 16).astype(np.float32)
    y = rnd.randn(16, 8).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(y))

    def fwd(v, x, y):
        return layer.apply(v, x, y, train=True, update_stats=True,
                           mutable=["batch_stats"])

    out_ref, mut_ref = jax.jit(fwd)(variables, jnp.asarray(x), jnp.asarray(y))

    mesh = mesh_lib.make_mesh(8)
    vs = mesh_lib.replicate_tree(mesh, variables)
    xs, ys = mesh_lib.shard_batch(mesh, (x, y))
    out_sh, mut_sh = jax.jit(fwd)(vs, xs, ys)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_biggan_bn_cross_replica_on_real_layer():
    """Same for the plain BigGANBN wrapper (flax BatchNorm path)."""
    from style_big_gan_tpu.models.biggan import BigGANBN

    layer = BigGANBN(channels=8)
    rnd = np.random.RandomState(1)
    x = rnd.randn(16, 4, 4, 8).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def fwd(v, x):
        return layer.apply(v, x, train=True, mutable=["batch_stats"])

    out_ref, mut_ref = jax.jit(fwd)(variables, jnp.asarray(x))
    mesh = mesh_lib.make_mesh(8)
    vs = mesh_lib.replicate_tree(mesh, variables)
    (xs,) = mesh_lib.shard_batch(mesh, (x,))
    out_sh, mut_sh = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_spectral_norm_u_update_consistent_under_sharding():
    """SN power-iteration u vectors update from the (replicated) weight, so
    the post-forward u state must be identical with a sharded batch."""
    from style_big_gan_tpu.models.spectral_norm import SNDense

    layer = SNDense(12)
    rnd = np.random.RandomState(2)
    x = rnd.randn(16, 6).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def fwd(v, x):
        return layer.apply(v, x, True, mutable=["sn"])

    out_ref, mut_ref = jax.jit(fwd)(variables, jnp.asarray(x))
    mesh = mesh_lib.make_mesh(8)
    vs = mesh_lib.replicate_tree(mesh, variables)
    (xs,) = mesh_lib.shard_batch(mesh, (x,))
    out_sh, mut_sh = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(mut_ref),
                    jax.tree_util.tree_leaves(mut_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_sharded_step_matches_single_device():
    """d_step gradients with batch sharded over 8 devices == unsharded."""
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    G = registries.generators["cnn32_dcgan"](z_dim=8, base_width=64)
    D = registries.discriminators["cnn32_dcgan"](base_width=64)
    arch = registries.losses_arch["base"]()
    arch.initialize(G, D, registries.losses["bcew"](), [], [], None)
    z = jnp.zeros((2, 8))
    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img)
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.sgd(0.1)

    real = np.random.RandomState(0).randn(16, 32, 32, 3).astype(np.float32)
    c = np.zeros((16, 0), np.float32)

    def run(shard: bool):
        state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds,
                                   tx, tx)
        if shard:
            mesh = mesh_lib.make_mesh(8)
            steps = StepBuilder(arch, tx, tx, z_dim=8, donate=False,
                                data_sharding=mesh_lib.batch_sharding(mesh, 2))
            state = mesh_lib.replicate_tree(mesh, state)
            batch = mesh_lib.shard_batch(mesh, (real, c, c))
        else:
            steps = StepBuilder(arch, tx, tx, z_dim=8, donate=False)
            batch = (jnp.asarray(real), jnp.asarray(c), jnp.asarray(c))
        s2, stats = steps.d_step(state, *batch)
        return jax.device_get(s2.params_d), jax.device_get(stats)

    p1, st1 = run(False)
    p8, st8 = run(True)
    np.testing.assert_allclose(st1["Loss/D/loss"], st8["Loss/D/loss"],
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        # atol covers XLA:CPU picking different conv codegen for the
        # per-device batch shape (16 vs 2), amplified through BN rsqrt.
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4)


def test_tp_sharded_step_matches_replicated():
    """Tensor-parallel param placement (infer_param_sharding over a
    data x model mesh — the rule the real trainer applies when
    perf.model_parallel > 1) must not change the numbers."""
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    G = registries.generators["cnn32_dcgan"](z_dim=8, base_width=64)
    D = registries.discriminators["cnn32_dcgan"](base_width=64)
    arch = registries.losses_arch["base"]()
    arch.initialize(G, D, registries.losses["bcew"](), [], [], None)
    z = jnp.zeros((2, 8))
    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img)
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.sgd(0.1)

    real = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    c = np.zeros((8, 0), np.float32)

    def run(model_parallel: int):
        mesh = mesh_lib.make_mesh(4, model_parallel=model_parallel)
        state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds,
                                   tx, tx)
        if model_parallel > 1:
            # The EXACT placement rule + threshold the trainer applies
            # (named targets; TP_MIN_SHARD_SIZE).
            state = mesh_lib.apply_shardings(
                state, mesh_lib.infer_state_sharding(state, mesh))
        else:
            state = mesh_lib.replicate_tree(mesh, state)
        steps = StepBuilder(arch, tx, tx, z_dim=8, donate=False,
                            data_sharding=mesh_lib.batch_sharding(mesh, 2))
        batch = mesh_lib.shard_batch(mesh, (real, c, c))
        s2, stats = steps.d_step(state, *batch)
        s3, gstats = steps.g_step(s2, batch[2], 0.0)
        return (jax.device_get(s3.params_d), jax.device_get(s3.params_g),
                jax.device_get({**stats, **gstats}))

    pd1, pg1, st1 = run(1)
    pd2, pg2, st2 = run(2)
    np.testing.assert_allclose(st1["Loss/D/loss"], st2["Loss/D/loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(st1["Loss/G/loss"], st2["Loss/G/loss"],
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves((pd1, pg1)),
                    jax.tree_util.tree_leaves((pd2, pg2))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4)


def test_tp_cycle_step_matches_replicated():
    """The scanned steps-per-dispatch cycle under a data x model mesh
    (stacked-batch sharding + TP param placement) matches the DP-only run."""
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    G = registries.generators["cnn32_dcgan"](z_dim=8, base_width=64)
    D = registries.discriminators["cnn32_dcgan"](base_width=64)
    arch = registries.losses_arch["base"]()
    arch.initialize(G, D, registries.losses["bcew"](), [], [], None)
    z = jnp.zeros((2, 8))
    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img)
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.sgd(0.1)

    # one scanned window: two+ chained updates amplify float divergence
    # between the DP and TP programs chaotically (bcew + sgd 0.1)
    k = 1
    reals = np.random.RandomState(0).randn(k, 8, 32, 32, 3).astype(np.float32)
    cs = np.zeros((k, 8, 0), np.float32)
    betas = np.full((k,), 0.5, np.float32)

    def run(model_parallel: int):
        mesh = mesh_lib.make_mesh(4, model_parallel=model_parallel)
        state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds,
                                   tx, tx)
        if model_parallel > 1:
            # The EXACT placement rule + threshold the trainer applies
            # (named targets; TP_MIN_SHARD_SIZE).
            state = mesh_lib.apply_shardings(
                state, mesh_lib.infer_state_sharding(state, mesh))
        else:
            state = mesh_lib.replicate_tree(mesh, state)
        steps = StepBuilder(arch, tx, tx, z_dim=8, donate=False,
                            data_sharding=mesh_lib.batch_sharding(mesh, 2))
        batch = mesh_lib.shard_stacked_batch(mesh, (reals, cs, cs))
        s2, stats, _ = steps.cycle_step(state, *batch,
                                        jnp.asarray(betas))
        return (jax.device_get(s2.params_d), jax.device_get(s2.params_g),
                jax.device_get(stats))

    pd1, pg1, st1 = run(1)
    pd2, pg2, st2 = run(2)
    np.testing.assert_allclose(st1["Loss/D/loss"], st2["Loss/D/loss"],
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves((pd1, pg1)),
                    jax.tree_util.tree_leaves((pd2, pg2))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_tp_cycle_sg2_paper_width_matches_replicated():
    """TP2 equivalence at paper256 CHANNEL WIDTHS (channel_base 16384,
    channel_max 512 — the widths the flagship config trains; reference
    train.py:157,178) on the real SG2 G/D, through the scanned cycle_step,
    placed by the trainer's infer_state_sharding rule.  Resolution is 16px
    so the CPU mesh compiles in test time — TP shards channels, not pixels,
    so the sharded matmul shapes are the paper-width ones."""
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    res, zw = 16, 512
    G = registries.generators["sg2_classic"](
        z_dim=zw, w_dim=zw, c_dim=0, img_resolution=res,
        channel_base=16384, channel_max=512,
        mapping_kwargs={"num_layers": 2})
    D = registries.discriminators["sg2_classic"](
        c_dim=0, img_resolution=res, channel_base=16384, channel_max=512,
        epilogue_kwargs={"mbstd_group_size": 2})
    arch = registries.losses_arch["sg2"](style_mixing_prob=0.0)
    arch.initialize(G, D, registries.losses["softplus"](), [], [], None)

    z = jnp.zeros((2, zw))
    img = jnp.zeros((2, res, res, 3))
    gv = G.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, z, None)
    dv = D.init({"params": jax.random.PRNGKey(2)}, img, None)
    pg, gs = split_vars(gv)
    pd, ds = split_vars(dv)
    tx = optax.sgd(0.05)

    k = 1
    reals = np.random.RandomState(0).randn(k, 4, res, res, 3).astype(
        np.float32)
    cs = np.zeros((k, 4, 0), np.float32)
    betas = np.full((k,), 0.5, np.float32)

    def run(model_parallel: int):
        mesh = mesh_lib.make_mesh(4, model_parallel=model_parallel)
        state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds,
                                   tx, tx)
        if model_parallel > 1:
            shardings = mesh_lib.infer_state_sharding(state, mesh)
            # the named targets actually fire at these widths
            specs = jax.tree_util.tree_leaves(
                shardings, is_leaf=lambda x: hasattr(x, "spec"))
            assert any("model" in str(s.spec) for s in specs)
            state = mesh_lib.apply_shardings(state, shardings)
        else:
            state = mesh_lib.replicate_tree(mesh, state)
        steps = StepBuilder(arch, tx, tx, z_dim=zw, donate=False,
                            data_sharding=mesh_lib.batch_sharding(mesh, 2))
        batch = mesh_lib.shard_stacked_batch(mesh, (reals, cs, cs))
        s2, stats, _ = steps.cycle_step(state, *batch, jnp.asarray(betas))
        return jax.device_get(stats)

    st1 = run(1)
    st2 = run(2)
    np.testing.assert_allclose(st1["Loss/D/loss"], st2["Loss/D/loss"],
                               rtol=2e-3)
    np.testing.assert_allclose(st1["Loss/G/loss"], st2["Loss/G/loss"],
                               rtol=2e-3)
