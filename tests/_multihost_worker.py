"""Worker for the 2-process multi-host test (run by test_multihost.py).

Each process: 2 fake CPU devices, `jax.distributed.initialize` against a
local coordinator — the runnable equivalent of the reference's NCCL
file-rendezvous workers (reference: train_parts/trainers.py:479-496).
Emits one JSON blob of observations for the parent to assert on.
"""

import json
import os
import sys


def main():
    coord, rank, nproc, outfile = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=rank)

    import numpy as np
    import jax.numpy as jnp
    import optax

    out = {
        "rank": rank,
        "process_count": jax.process_count(),
        "device_count": len(jax.devices()),
        "local_device_count": jax.local_device_count(),
    }

    # 1. Per-host sampler shards are disjoint + covering
    #    (reference: misc.py:109-140 round-robin `idx % num_replicas`).
    from style_big_gan_tpu.data.dataloader import infinite_sampler
    it = infinite_sampler(16, shard=rank, num_shards=nproc, shuffle=False)
    out["sampler_head"] = [next(it) for _ in range(8)]

    # 2. Metric feature gather: every process ends with the FULL stats
    #    (reference rank-interleaved gather, metric_utils.py:96-106).
    from style_big_gan_tpu.metrics.metric_utils import (MetricOptions,
                                                        _shard_gather)
    gather = _shard_gather(MetricOptions(shard=rank, num_shards=nproc))
    assert gather is not None
    feats = (np.arange(8, dtype=np.float32).reshape(4, 2)
             + 100.0 * rank)
    full = gather(feats)
    out["gather_shape"] = list(full.shape)
    out["gather_sum"] = float(full.sum())
    out["gather_rank_major"] = bool(full[0, 0] == 0.0 and
                                    full[4, 0] == 100.0)

    # 3. One real train step over the global 2-host x 2-device mesh, same
    #    data/seeds as the single-process run the parent compares against.
    from style_big_gan_tpu import registries
    registries._import_all()
    from style_big_gan_tpu.parallel import mesh as mesh_lib
    from style_big_gan_tpu.train.loss_arch import split_vars
    from style_big_gan_tpu.train.state import create_train_state
    from style_big_gan_tpu.train.steps import StepBuilder

    mesh = mesh_lib.make_mesh(4, 1)
    G = registries.generators["cnn32_dcgan"](z_dim=32, base_width=64)
    D = registries.discriminators["cnn32_dcgan"](base_width=64)
    arch = registries.losses_arch["base"]()
    arch.initialize(G, D, registries.losses["bcew"](), [], [], None)

    z = jnp.zeros((4, 32), jnp.float32)
    img = jnp.zeros((4, 32, 32, 3), jnp.float32)
    g_vars = G.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, None)
    d_vars = D.init({"params": jax.random.PRNGKey(2)}, img, None)
    pg, gs = split_vars(g_vars)
    pd, ds = split_vars(d_vars)
    tx = optax.adam(2e-3)
    state = create_train_state(jax.random.PRNGKey(3), pg, gs, pd, ds, tx, tx)

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    rep = mesh_lib.replicated(mesh)
    state = jax.tree_util.tree_map(
        lambda x: to_global(x, rep) if hasattr(x, "ndim") else x, state)

    rnd = np.random.RandomState(0)
    real = rnd.randn(4, 32, 32, 3).astype(np.float32)
    c = np.zeros((4, 0), np.float32)
    bsh = mesh_lib.batch_sharding(mesh, 4)
    csh = mesh_lib.batch_sharding(mesh, 2)
    real_d = to_global(real, bsh)
    c_d = to_global(c, csh)

    steps = StepBuilder(arch, tx, tx, z_dim=32, num_accum_rounds=1,
                        donate=False,
                        data_sharding=mesh_lib.batch_sharding(mesh, 2))
    state, d_stats = steps.d_step(state, real_d, c_d, c_d)
    state, g_stats = steps.g_step(state, c_d, 0.99)
    out["stats"] = {k: float(v) for k, v in {**d_stats, **g_stats}.items()}

    with open(outfile, "w") as f:
        json.dump(out, f)
    print(f"worker {rank} done")


if __name__ == "__main__":
    main()
