"""Assert that a BigGAN run's snapshot eval used STANDING, not running,
BN statistics (reference myBN accumulate_standing, biggan/layers.py:212-255).

Given a run dir trained with ``ema.standing_stats: true``, this tool loads
the latest (or named) snapshot and verifies, with hard assertions:

1. every BN layer's ``standing_count`` > 0 — the trainer's pre-snapshot
   refresh (`trainer._refresh_standing_stats`) actually ran and the saved
   payload carries the accumulated sums;
2. the standing moments DIFFER from the running averages (they are computed
   from different distributions: fresh G_ema forwards vs momentum EMAs of
   training batches);
3. an eval-mode forward with the snapshot as-is differs from the same
   forward with the standing sums zeroed out (which falls back to running
   averages) — i.e. the eval path consumed the standing stats.

Usage:
    python -m style_big_gan_tpu.tools.verify_standing_stats \
        --run-dir logs/00000-biggan32drive [--snapshot name.msgpack]

Exits 0 with a PASS report, non-zero on any failed assertion.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu.tools.loader import load_generator


def verify(run_dir: str, snapshot=None) -> dict:
    G, g_vars, opts = load_generator(run_dir, snapshot)
    bs = g_vars.get("batch_stats")
    if not bs:
        raise AssertionError("snapshot has no batch_stats collection "
                             "(not a BN generator?)")

    counts, mean_deltas = [], []

    def walk(tree):
        if not isinstance(tree, dict):
            return
        if "standing_count" in tree:
            counts.append(float(np.asarray(tree["standing_count"])))
            cnt = max(counts[-1], 1.0)
            s_mean = np.asarray(tree["standing_mean"]) / cnt
            r_mean = np.asarray(tree["mean"])
            mean_deltas.append(float(np.max(np.abs(s_mean - r_mean))))
        for v in tree.values():
            walk(v)

    walk(bs)
    assert counts, "no standing_count variables found in the snapshot"
    assert all(c > 0 for c in counts), (
        f"standing_count == 0 in {sum(c == 0 for c in counts)}/{len(counts)} "
        f"BN layers — the pre-snapshot refresh did not run")
    assert max(mean_deltas) > 1e-6, (
        "standing means are identical to running means — the accumulation "
        "is not producing distinct statistics")

    # Eval forward with standing stats vs with them zeroed (running-average
    # fallback, models/biggan.py::_bn_moments eval branch).
    from style_big_gan_tpu.models.biggan import reset_standing_stats
    z_dim = int(getattr(G, "z_dim", 128))
    c_dim = int(getattr(G, "c_dim", 0))
    z = jax.random.normal(jax.random.PRNGKey(0), (8, z_dim), jnp.float32)
    c = (jax.nn.one_hot(jnp.arange(8) % max(c_dim, 1), c_dim)
         if c_dim > 0 else jnp.zeros((8, 0), jnp.float32))
    img_standing = np.asarray(G.apply(g_vars, z, c, train=False))
    g_run = dict(g_vars)
    g_run["batch_stats"] = reset_standing_stats(g_vars["batch_stats"])
    img_running = np.asarray(G.apply(g_run, z, c, train=False))
    out_delta = float(np.max(np.abs(img_standing - img_running)))
    assert out_delta > 1e-5, (
        f"eval output identical with and without standing sums "
        f"(max delta {out_delta:.2e}) — eval is not consuming them")

    return dict(bn_layers=len(counts), standing_count=counts[0],
                max_mean_delta=max(mean_deltas), eval_output_delta=out_delta)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", required=True)
    p.add_argument("--snapshot", default=None)
    args = p.parse_args(argv)
    r = verify(args.run_dir, args.snapshot)
    print(f"PASS: {r['bn_layers']} BN layers carry standing sums "
          f"(count={r['standing_count']:.0f} accumulation batches); "
          f"standing vs running mean max|Δ|={r['max_mean_delta']:.4g}; "
          f"eval output max|Δ| standing-vs-running="
          f"{r['eval_output_delta']:.4g} — snapshot eval used STANDING "
          f"statistics.")


if __name__ == "__main__":
    main()
