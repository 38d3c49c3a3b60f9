"""Real 2-process multi-host run on the CPU backend (VERDICT r2 #5).

Launches two OS processes that `jax.distributed.initialize` against a local
coordinator (2 fake devices each -> a 4-device global mesh), then asserts:

* per-host sampler shards are disjoint and covering,
* the metric `_shard_gather` returns FULL stats on BOTH processes,
* a 2-host x 2-device train step produces stats identical across hosts and
  equal to the same step run single-process on a 4-device mesh.

Reference counterparts: NCCL file-rendezvous workers
(train_parts/trainers.py:479-496), InfiniteSampler rank sharding
(torch_utils/misc.py:109-140), rank-interleaved metric gather
(metrics/metric_utils.py:96-106).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_and_gather(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs, outs = [], []
    for rank in range(2):
        outfile = str(tmp_path / f"rank{rank}.json")
        outs.append(outfile)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)           # worker sets its own (2 dev)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             coord, str(rank), "2", outfile],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    r0, r1 = [json.load(open(o)) for o in outs]
    for r in (r0, r1):
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["local_device_count"] == 2

    # Sampler: disjoint, covering, round-robin (shuffle off -> exact).
    assert r0["sampler_head"] == [0, 2, 4, 6, 8, 10, 12, 14]
    assert r1["sampler_head"] == [1, 3, 5, 7, 9, 11, 13, 15]

    # Gather: both processes hold the FULL feature set, rank-major.
    for r in (r0, r1):
        assert r["gather_shape"] == [8, 2]
        assert r["gather_rank_major"]
    want_sum = float(np.arange(8).sum() * 2 + 100.0 * 8)
    assert abs(r0["gather_sum"] - want_sum) < 1e-4
    assert r0["gather_sum"] == r1["gather_sum"]

    # Train-step stats agree across hosts bit-for-bit...
    assert set(r0["stats"]) == set(r1["stats"]) and len(r0["stats"]) >= 4
    for k in r0["stats"]:
        assert r0["stats"][k] == r1["stats"][k], k

    # ... and match the SAME step run single-process on a 4-device mesh
    # (this test process: 8 fake devices, mesh uses 4).
    import jax
    import jax.numpy as jnp
    import optax
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
    state = mesh_lib.replicate_tree(mesh, state)
    rnd = np.random.RandomState(0)
    real = rnd.randn(4, 32, 32, 3).astype(np.float32)
    c = np.zeros((4, 0), np.float32)
    real_d, c_d = mesh_lib.shard_batch(mesh, (real, c))
    steps = StepBuilder(arch, tx, tx, z_dim=32, num_accum_rounds=1,
                        donate=False,
                        data_sharding=mesh_lib.batch_sharding(mesh, 2))
    state, d_stats = steps.d_step(state, real_d, c_d, c_d)
    state, g_stats = steps.g_step(state, c_d, 0.99)
    single = {k: float(v) for k, v in {**d_stats, **g_stats}.items()}
    for k, v in single.items():
        np.testing.assert_allclose(r0["stats"][k], v, rtol=1e-4, atol=1e-5,
                                   err_msg=k)
