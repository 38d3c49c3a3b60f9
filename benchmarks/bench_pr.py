#!/usr/bin/env python
"""Wall time of the Precision/Recall kNN manifold test at the registered
pr50k3_full budget (200k real x 50k gen, 2048-D VGG features) on the local
chip — the part of the metric that round 2 ran on host numpy (VERDICT r2
weak #4) and metrics/knn.py now runs as jitted tiled MXU programs.

    python benchmarks/bench_pr.py [--real 200000] [--gen 50000] [--dim 2048]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real", type=int, default=200_000)
    p.add_argument("--gen", type=int, default=50_000)
    p.add_argument("--dim", type=int, default=2048)
    args = p.parse_args()

    from style_big_gan_tpu.metrics import knn

    rnd = np.random.RandomState(0)
    real = rnd.randn(args.real, args.dim).astype(np.float32)
    gen = rnd.randn(args.gen, args.dim).astype(np.float32)

    t0 = time.time()
    radii_real = knn.knn_radii_sq(real)
    t1 = time.time()
    radii_gen = knn.knn_radii_sq(gen)
    t2 = time.time()
    precision = float(knn.manifold_hits(gen, real, radii_real).mean())
    t3 = time.time()
    recall = float(knn.manifold_hits(real, gen, radii_gen).mean())
    t4 = time.time()
    print(f"radii(real {args.real}): {t1 - t0:.1f}s   "
          f"radii(gen {args.gen}): {t2 - t1:.1f}s   "
          f"hits(precision): {t3 - t2:.1f}s   hits(recall): {t4 - t3:.1f}s")
    print(f"total kNN wall: {t4 - t0:.1f}s   "
          f"precision={precision:.4f} recall={recall:.4f}")


if __name__ == "__main__":
    main()
