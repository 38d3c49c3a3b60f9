"""General small utilities.

TPU-native re-implementation of the helper layer of the reference framework
(reference: utils.py:9-76, stylegan2ada/dnnlib/util.py:40-150,
stylegan2ada/torch_utils/misc.py:80-103).  All tensor work is jax.numpy.
"""

from __future__ import annotations

import collections.abc
from typing import Any, Iterable, Mapping

import jax.numpy as jnp
import numpy as np


class EasyDict(dict):
    """dict with attribute access (reference: dnnlib/util.py:40-53)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def flatten_dict(d: Mapping, parent_key: str = "", sep: str = ".") -> dict:
    """Flatten nested mappings to dotted keys (reference: utils.py:9-18,
    fixed for py>=3.10 where collections.MutableMapping was removed)."""
    items = []
    for k, v in d.items():
        new_key = parent_key + sep + str(k) if parent_key else str(k)
        if isinstance(v, collections.abc.MutableMapping):
            items.extend(flatten_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def closest_power_of_two(n: int) -> int:
    """Largest power of two <= n (reference: utils.py:21-26)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return 1 << (int(n).bit_length() - 1)


def is_power_of_two(n: int) -> bool:
    return n >= 1 and (n & (n - 1)) == 0


def assert_shape(x, ref_shape: Iterable) -> None:
    """Assert tensor shape, None entries are wildcards
    (reference: torch_utils/misc.py:80-93)."""
    shape = tuple(x.shape)
    ref_shape = tuple(ref_shape)
    if len(shape) != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {len(shape)}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(shape, ref_shape)):
        if ref_size is None:
            continue
        if size != ref_size:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def nan_to_num(x, nan: float = 0.0, posinf: float | None = None,
               neginf: float | None = None):
    """Scrub NaN/Inf (reference: torch_utils/misc.py:46-56)."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def format_time(seconds: float) -> str:
    """Human-readable duration (reference: dnnlib/util.py:139-150)."""
    s = int(np.rint(seconds))
    if s < 60:
        return f"{s}s"
    if s < 60 * 60:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 24 * 60 * 60:
        return f"{s // (60 * 60)}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // (24 * 60 * 60)}d {(s // (60 * 60)) % 24:02d}h {(s // 60) % 60:02d}m"


def tree_size(tree) -> int:
    """Total number of elements in a pytree of arrays."""
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def tree_bytes(tree) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))
