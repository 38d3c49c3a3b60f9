"""Checkpointing: msgpack pytree snapshots + JSON run options.

Replaces the reference's source-embedding pickles
(reference: torch_utils/persistence.py, trainers.py:636-656) with the durable
part of that idea: parameters/EMA/optimizer pytrees serialized with
flax.serialization, and the *config* needed to reconstruct the modules saved
as JSON next to them (config-reconstruct instead of code pickling).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    data = flax.serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def load_pytree_raw(path: str) -> Any:
    """Load without a template (returns nested dicts of numpy arrays)."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.msgpack_restore(data)


def save_json(path: str, obj: Dict) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=str)


def load_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def snapshot_name(cur_nimg: int) -> str:
    """network-snapshot-NNNNNN naming (reference: trainers.py:639)."""
    return f"network-snapshot-{cur_nimg // 1000:06d}.msgpack"


def copy_params_and_buffers(src_tree: Any, dst_tree: Any,
                            require_all: bool = False) -> Any:
    """Name-matched partial load for transfer learning
    (reference: torch_utils/misc.py:153-160).  Copies every leaf of src whose
    path exists in dst with the same shape; returns updated dst."""
    flat_src = dict(_flatten("", src_tree))
    missing = []

    def visit(path, leaf):
        if path in flat_src and np.shape(flat_src[path]) == np.shape(leaf):
            return jax.numpy.asarray(flat_src[path], dtype=leaf.dtype) \
                if hasattr(leaf, "dtype") else flat_src[path]
        missing.append(path)
        return leaf

    out = _map_with_path("", dst_tree, visit)
    if require_all and missing:
        raise ValueError(f"Missing params in source: {missing[:10]}...")
    return out


def _flatten(prefix, tree):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(f"{prefix}/{k}", v)
    else:
        yield prefix, tree


def _map_with_path(prefix, tree, fn):
    if isinstance(tree, dict):
        return {k: _map_with_path(f"{prefix}/{k}", v, fn)
                for k, v in tree.items()}
    return fn(prefix, tree)
