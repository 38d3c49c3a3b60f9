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


def test_sharded_step_matches_single_device():
    """d_step gradients with batch sharded over 8 devices == unsharded."""
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    G = registries.generators["cnn32_dcgan"](z_dim=8)
    D = registries.discriminators["cnn32_dcgan"]()
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


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
