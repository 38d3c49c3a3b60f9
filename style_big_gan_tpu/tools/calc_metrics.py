"""Standalone metric calculation on a snapshot.

Rebuild of reference stylegan2ada/calc_metrics.py:28-190 — no process spawn
or NCCL rendezvous: one SPMD process, jitted G rollouts.

    python -m style_big_gan_tpu.tools.calc_metrics \
        --run-dir logs/00000-run --metrics fid50k_full,is50k \
        --data data/cifar10.zip [--detector fake_v1|inception_v3 \
        --detector-path inception-2015-12-05.pt]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np


def calc_metrics(run_dir: str, metric_names: List[str], data: Optional[str],
                 detector: str = "fake_v1",
                 detector_path: Optional[str] = None,
                 snapshot: Optional[str] = None, batch: int = 64,
                 seed: int = 0, num_items: Optional[int] = None):
    import inspect

    import jax
    import jax.numpy as jnp
    from style_big_gan_tpu import registries
    from style_big_gan_tpu.metrics import metric_main
    from style_big_gan_tpu.tools.loader import (images_to_uint8_device,
                                                load_generator)
    from style_big_gan_tpu.utils import checkpoint as ckpt

    G, g_vars, opts = load_generator(run_dir, snapshot)

    ds_name = opts["data"]["dataset"]
    ds_kwargs = dict(opts["datasets_args"][ds_name])
    ds_kwargs["path"] = data or opts["data"]["dataset_path"]
    dataset = registries.datasets[ds_name](**ds_kwargs)

    z_dim = int(getattr(G, "z_dim", 128))
    c_dim = int(getattr(G, "c_dim", 0))
    has_trunc = "truncation_psi" in inspect.signature(
        type(G).__call__).parameters

    @jax.jit
    def run(z, c):
        kwargs = dict(rngs={"noise": jax.random.PRNGKey(0)})
        if has_trunc:
            return G.apply(g_vars, z, c, noise_mode="const", **kwargs)
        return G.apply(g_vars, z, c, train=False, **kwargs)

    def g_sampler(batch_size, rng, **_kw):
        z = jnp.asarray(rng.randn(batch_size, z_dim), jnp.float32)
        if c_dim > 0:
            idx = rng.randint(len(dataset), size=batch_size)
            c = jnp.asarray(np.stack([dataset.get_label(int(i))
                                      for i in idx]), jnp.float32)
        else:
            c = jnp.zeros((batch_size, 0), jnp.float32)
        return images_to_uint8_device(run(z, c))

    g_kwargs = {}
    if any(m.startswith("ppl") for m in metric_names):
        from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler
        g_kwargs["ppl_sampler"] = PPLSampler(G, g_vars, dataset=dataset)

    results = {}
    for metric in metric_names:
        if not metric_main.is_valid_metric(metric):
            print(f"Unknown metric {metric}; valid: "
                  f"{metric_main.list_valid_metrics()}")
            continue
        res = metric_main.calc_metric(
            metric, G=g_sampler, G_kwargs=g_kwargs, dataset=dataset,
            dataset_kwargs=ds_kwargs,
            detector=detector, detector_path=detector_path,
            batch_size=batch, rng_seed=seed, num_items=num_items,
            # Multi-host runs shard feature extraction per process and
            # gather per batch (metric_utils._shard_gather).
            shard=jax.process_index(), num_shards=jax.process_count(),
            cache_dir=os.path.join(run_dir, "metric-cache"))
        metric_main.report_metric(res, run_dir=run_dir)
        results.update(res.results)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--metrics", default="fid50k_full")
    p.add_argument("--data", default=None)
    p.add_argument("--detector", default="fake_v1")
    p.add_argument("--detector-path", default=None)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num-items", type=int, default=None,
                   help="override each metric's sample budget "
                        "(smoke runs / parity checks)")
    a = p.parse_args(argv)
    calc_metrics(a.run_dir, a.metrics.split(","), a.data, a.detector,
                 a.detector_path, a.snapshot, a.batch,
                 num_items=a.num_items)


if __name__ == "__main__":
    main()
