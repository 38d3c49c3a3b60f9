#!/usr/bin/env python
"""Data-loader throughput: C++ pipeline (native/dataio.cpp) vs the Python
threaded loader, at a given resolution.

The C++ pipeline exists for the 512px+ regime where decode bytes quadruple
per resolution step and the Python path (PIL decode under GIL-released
zlib) becomes the training bottleneck (round-3 verdict Weak #5).

    python benchmarks/bench_loader.py --data data/ellipses512.zip \
        --batch 16 --batches 40 --workers 3
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(loader_name: str, path: str, batch: int, batches: int,
        workers: int) -> float:
    from style_big_gan_tpu import registries
    registries._import_all()
    from style_big_gan_tpu.data.dataset import ImageFolderDataset

    ds = ImageFolderDataset(path=path, use_labels=True)
    loader = registries.dataloaders[loader_name](num_workers=workers,
                                                 prefetch=4)
    it = loader(ds, batch_size=batch, seed=0)
    next(it)                      # warm: threads up, first decode done
    t0 = time.time()
    n = 0
    for _ in range(batches):
        imgs, _ = next(it)
        n += imgs.shape[0]
    dt = time.time() - t0
    if hasattr(it, "close"):
        it.close()
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/ellipses512.zip")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--workers", type=int, default=3)
    a = p.parse_args()

    from style_big_gan_tpu.data.native_loader import native_available
    rows = {}
    rows["basic"] = run("basic", a.data, a.batch, a.batches, a.workers)
    if native_available():
        rows["native"] = run("native", a.data, a.batch, a.batches, a.workers)
    for name, rate in rows.items():
        print(f"{name:>8}: {rate:9.1f} imgs/sec decode+assemble")
    if "native" in rows:
        print(f"native/basic speedup: {rows['native'] / rows['basic']:.2f}x")


if __name__ == "__main__":
    main()
