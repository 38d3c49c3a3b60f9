"""Minimal structured-config engine (OmegaConf-workalike, dependency-free).

The reference's config UX (reference: arguments.py:146-158) is: a structured
default tree derived from dataclasses, deep-merged with a YAML file, then with
CLI ``a.b.c=value`` dotlist overrides (CLI wins).  omegaconf is not in this
image, so this module provides the same semantics on PyYAML + dataclasses:

    cfg = structured(ArgsDataclass)       # defaults (MISSING = '???')
    cfg = merge(cfg, load(yaml_path))
    cfg = merge(cfg, from_dotlist(sys.argv[1:]))

ConfigNode is a dict with attribute access, so downstream code reads
``config.gen.batch`` exactly as with OmegaConf.
"""

from __future__ import annotations

import dataclasses
import io
from typing import Any, Iterable, List, Mapping, Optional

import yaml

MISSING: Any = "???"


class ConfigNode(dict):
    """Nested dict with attribute access."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        import copy
        return ConfigNode({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _to_node(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return ConfigNode({f.name: _to_node(getattr(obj, f.name))
                           for f in dataclasses.fields(obj)})
    if isinstance(obj, Mapping):
        return ConfigNode({k: _to_node(v) for k, v in obj.items()})
    if isinstance(obj, tuple):
        return [_to_node(v) for v in obj]
    if isinstance(obj, list):
        return [_to_node(v) for v in obj]
    return obj


def structured(cls_or_obj: Any) -> ConfigNode:
    """Dataclass (or instance) -> ConfigNode of defaults."""
    obj = cls_or_obj() if isinstance(cls_or_obj, type) else cls_or_obj
    return _to_node(obj)


def create(d: Optional[Mapping] = None) -> ConfigNode:
    return _to_node(dict(d or {}))


def load(path: str) -> ConfigNode:
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    return _to_node(data)


def loads(text: str) -> ConfigNode:
    return _to_node(yaml.safe_load(io.StringIO(text)) or {})


def merge(base: Any, *others: Any) -> ConfigNode:
    """Deep merge; later wins.  Lists are replaced, not concatenated
    (OmegaConf behavior)."""
    out = _to_node(base) if not isinstance(base, ConfigNode) else _copy(base)
    for other in others:
        _merge_into(out, _to_node(other) if not isinstance(other, ConfigNode)
                    else other)
    return out


def _copy(node: Any) -> Any:
    if isinstance(node, dict):
        return ConfigNode({k: _copy(v) for k, v in node.items()})
    if isinstance(node, list):
        return [_copy(v) for v in node]
    return node


def _merge_into(dst: ConfigNode, src: Mapping) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, Mapping):
            _merge_into(dst[k], v)
        else:
            dst[k] = _copy(_to_node(v))


def _parse_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def from_dotlist(argv: Iterable[str]) -> ConfigNode:
    """['a.b=1', 'c=[1,2]'] -> nested ConfigNode."""
    root = ConfigNode()
    for item in argv:
        if "=" not in item:
            raise ValueError(f"Override '{item}' is not of the form key=value")
        key, _, raw = item.partition("=")
        node = root
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, ConfigNode())
        node[parts[-1]] = _to_node(_parse_value(raw))
    return root


def select(cfg: ConfigNode, dotted: str, default: Any = None) -> Any:
    node: Any = cfg
    for p in dotted.split("."):
        if not isinstance(node, Mapping) or p not in node:
            return default
        node = node[p]
    return node


def to_container(cfg: Any) -> Any:
    if isinstance(cfg, dict):
        return {k: to_container(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [to_container(v) for v in cfg]
    return cfg


def to_yaml(cfg: Any) -> str:
    return yaml.safe_dump(to_container(cfg), sort_keys=False)


def missing_keys(cfg: Any, prefix: str = "") -> List[str]:
    """Paths whose value is still MISSING ('???')."""
    out: List[str] = []
    if isinstance(cfg, dict):
        for k, v in cfg.items():
            out += missing_keys(v, f"{prefix}{k}.")
    elif cfg == MISSING:
        out.append(prefix[:-1])
    return out
