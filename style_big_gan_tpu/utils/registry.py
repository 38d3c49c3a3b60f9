"""Name -> class registries with config schemas auto-derived from signatures.

This is the backbone of the framework's plug-in system (reference:
utils.py:79-146): registering a class under a name also derives an
OmegaConf-structured dataclass from its ``__init__`` signature, so every
registered generator / discriminator / loss / dataset automatically gets a
YAML/CLI config group with the right defaults — no hand-written schema.

Written from scratch for the TPU build; same observable behavior:
  * defaults in the signature become config defaults,
  * parameters without defaults become ``MISSING`` (must be provided),
  * mutable defaults (dict/list) become ``default_factory`` fields,
  * ``self`` / ``*args`` / ``**kwargs`` and explicitly skipped names are dropped.
"""

from __future__ import annotations

import dataclasses
import inspect
import typing
from typing import Any, Callable, Dict, List, Optional, Tuple, Type

from style_big_gan_tpu.utils.conf import MISSING

# Parameter names that are runtime objects, never config values.  Classes may
# extend this per-registration via ``skip_args``.
_DEFAULT_SKIP = ("self", "key", "rng", "rngs", "mesh", "params",
                 # flax.linen.Module dataclass plumbing:
                 "parent", "name")


def _field_type(default: Any, annotation: Any) -> Any:
    """Pick an OmegaConf-compatible field type."""
    if annotation is not inspect.Parameter.empty and annotation is not None:
        # OmegaConf structured configs accept typing generics and primitives.
        if annotation in (int, float, str, bool, Any):
            return annotation
        origin = typing.get_origin(annotation)
        if origin in (list, tuple, dict):
            return annotation
        if annotation is type(None):
            return Optional[Any]
        # Fall through for exotic annotations -> infer from default.
    if default is MISSING or default is inspect.Parameter.empty or default is None:
        return Any
    if isinstance(default, bool):
        return bool
    if isinstance(default, int):
        return int
    if isinstance(default, float):
        return float
    if isinstance(default, str):
        return str
    if isinstance(default, (list, tuple)):
        return List[Any]
    if isinstance(default, dict):
        return Dict[str, Any]
    return Any


def make_dataclass_from_init(cls: type, name: str,
                             skip_args: Tuple[str, ...] = ()) -> type:
    """Derive a dataclass schema from ``cls.__init__`` (or ``cls`` if it is a
    function).  Mirrors reference utils.py:88-119 semantics."""
    if inspect.isclass(cls) and dataclasses.is_dataclass(cls):
        # Dataclasses (incl. flax modules): use field metadata directly so
        # default_factory fields keep working.
        skip = set(_DEFAULT_SKIP) | set(skip_args)
        fields = []
        for f in dataclasses.fields(cls):
            if f.name in skip or not f.init:
                continue
            ftype = _field_type(
                f.default if f.default is not dataclasses.MISSING else MISSING,
                f.type)
            if f.default_factory is not dataclasses.MISSING:
                fields.append((f.name, ftype,
                               dataclasses.field(default_factory=f.default_factory)))
            elif f.default is not dataclasses.MISSING:
                if isinstance(f.default, (dict, list)):
                    fields.append((f.name, ftype, dataclasses.field(
                        default_factory=lambda d=f.default: type(d)(d))))
                elif isinstance(f.default, tuple):
                    fields.append((f.name, List[Any], dataclasses.field(
                        default_factory=lambda d=f.default: list(d))))
                else:
                    fields.append((f.name, ftype, f.default))
            else:
                fields.append((f.name, ftype, MISSING))
        return dataclasses.make_dataclass(name, fields)
    fn = cls.__init__ if inspect.isclass(cls) else cls
    sig = inspect.signature(fn)
    skip = set(_DEFAULT_SKIP) | set(skip_args)
    fields = []
    for pname, param in sig.parameters.items():
        if pname in skip:
            continue
        if param.kind in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD):
            continue
        default = param.default
        ftype = _field_type(default, param.annotation)
        if default is inspect.Parameter.empty:
            fields.append((pname, ftype, MISSING))
        elif isinstance(default, (dict, list)):
            fields.append((pname, ftype,
                           dataclasses.field(default_factory=lambda d=default: type(d)(d))))
        elif isinstance(default, tuple):
            fields.append((pname, List[Any],
                           dataclasses.field(default_factory=lambda d=default: list(d))))
        else:
            fields.append((pname, ftype, default))
    return dataclasses.make_dataclass(name, fields)


def make_dataclass_from_classes(mapping: Dict[str, type], name: str = "Schema") -> type:
    """One field per registered name, each typed by its derived schema
    (reference: utils.py:121-128)."""
    fields = []
    for key, schema in mapping.items():
        fields.append((key, schema, dataclasses.field(default_factory=schema)))
    return dataclasses.make_dataclass(name, fields)


def make_dataclass_from_args(mapping: Dict[str, Any], name: str = "Args") -> type:
    """Build a dataclass whose fields are pre-built dataclass *instances*
    (reference: utils.py:130-137)."""
    fields = []
    for key, value in mapping.items():
        fields.append((key, type(value), dataclasses.field(default_factory=lambda v=value: v)))
    return dataclasses.make_dataclass(name, fields)


class ClassRegistry:
    """Decorator-driven registry (reference: utils.py:79-146).

    Usage::

        generators = ClassRegistry()

        @generators.add_to_registry("dcgan")
        class DCGANGenerator: ...

        G = generators["dcgan"](**kwargs)
        schema = generators.make_schema()   # dataclass: one group per name
    """

    def __init__(self) -> None:
        self.classes: Dict[str, type] = {}
        self.args_schema: Dict[str, type] = {}

    def add_to_registry(self, name: str, skip_args: Tuple[str, ...] = ()) -> Callable:
        def decorator(cls):
            if name in self.classes:
                raise KeyError(f"'{name}' already registered")
            self.classes[name] = cls
            self.args_schema[name] = make_dataclass_from_init(
                cls, f"{name}_args", skip_args=skip_args)
            return cls
        return decorator

    def register_function(self, name: str, skip_args: Tuple[str, ...] = ()) -> Callable:
        """Register a plain function (for losses etc.)."""
        return self.add_to_registry(name, skip_args=skip_args)

    def __getitem__(self, name: str) -> type:
        try:
            return self.classes[name]
        except KeyError:
            raise KeyError(
                f"Unknown name '{name}'. Registered: {sorted(self.classes)}") from None

    def __contains__(self, name: str) -> bool:
        return name in self.classes

    def __iter__(self):
        return iter(self.classes)

    def keys(self):
        return self.classes.keys()

    def items(self):
        return self.classes.items()

    def make_schema(self, name: str = "Schema") -> type:
        return make_dataclass_from_classes(self.args_schema, name)
