"""Shared benchmark helpers.

The sync idiom matters: `block_until_ready` can return early through the
axon tunnel (see bench_ops.py history), so completion is forced by fetching
one element of the output to the host.  All benchmark scripts must time
through these helpers so a future fix lands everywhere at once.
"""

from __future__ import annotations

import time

import numpy as np


def sync(out):
    """Force completion of `out` (any pytree of device arrays)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Average seconds per call of fn(*args), host-synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters
