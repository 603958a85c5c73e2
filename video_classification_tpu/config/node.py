"""A yacs-compatible configuration node.

The reference config surface is built on yacs (`/root/reference/config/defaults.py:2`).
yacs is not part of this image, and the rebuild owns its config layer anyway, so this is
a from-scratch implementation of the subset of the yacs ``CfgNode`` API the framework
uses: attribute access, ``clone``, ``merge_from_file``, ``merge_from_other_cfg``,
``merge_from_list``, ``freeze``/``defrost``, and ``dump``.

Semantics intentionally matched to yacs:
  * merging an unknown key raises ``KeyError`` (guards against config typos);
  * merged values are type-checked against the default's type, with the yacs
    exceptions (int <-> float promotion, str <-> None);
  * lists are replaced wholesale, not concatenated.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml

_VALID_SCALAR_TYPES = (bool, int, float, str, type(None))


def _check_value(value: Any, full_key: str) -> Any:
    if isinstance(value, dict):
        return CfgNode({k: _check_value(v, f"{full_key}.{k}") for k, v in value.items()})
    if isinstance(value, CfgNode):
        return value
    if isinstance(value, (list, tuple)):
        return [
            _check_value(v, f"{full_key}[{i}]") for i, v in enumerate(value)
        ]
    if not isinstance(value, _VALID_SCALAR_TYPES):
        raise ValueError(
            f"Invalid config value type {type(value)} for key {full_key!r}; "
            f"allowed: dict/list/{_VALID_SCALAR_TYPES}"
        )
    return value


def _coerce(replacement: Any, original: Any, full_key: str) -> Any:
    """Type-check a merged value against the default, with yacs-style casts."""
    if original is None or replacement is None:
        return replacement
    o_type, r_type = type(original), type(replacement)
    if o_type is r_type:
        return replacement
    # yacs casting rules: int -> float allowed, tuple <-> list allowed.
    if o_type is float and r_type is int:
        return float(replacement)
    if o_type is int and r_type is float and float(int(replacement)) == replacement:
        return int(replacement)
    if o_type in (list, tuple) and r_type in (list, tuple):
        return list(replacement)
    # PyYAML parses unquoted "5e-4" as str; accept numeric strings for numeric keys.
    if o_type in (int, float) and r_type is str:
        try:
            num = float(replacement)
        except ValueError:
            pass
        else:
            return int(num) if o_type is int and num == int(num) else num
    raise ValueError(
        f"Type mismatch for key {full_key!r}: default is {o_type.__name__}, "
        f"replacement is {r_type.__name__} ({replacement!r})"
    )


class CfgNode(dict):
    """Nested attribute-style config dictionary (yacs-compatible subset)."""

    _FROZEN = "__frozen__"

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init_dict:
            for k, v in init_dict.items():
                super().__setitem__(k, _check_value(v, k))

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Attempted to set {name} on a frozen CfgNode")
        super().__setitem__(name, _check_value(value, name))

    def __setitem__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise KeyError(f"Attempted to set {name} on a frozen CfgNode")
        super().__setitem__(name, _check_value(value, name))

    # -- freezing ------------------------------------------------------------
    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def freeze(self) -> None:
        self._set_frozen(True)

    def defrost(self) -> None:
        self._set_frozen(False)

    def _set_frozen(self, frozen: bool) -> None:
        object.__setattr__(self, CfgNode._FROZEN, frozen)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_frozen(frozen)

    # -- cloning / merging ----------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            dict.__setitem__(node, k, copy.deepcopy(v, memo))
        return node

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_into(other, self, [])

    def merge_from_file(self, filename) -> None:
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self.merge_from_other_cfg(CfgNode(loaded))

    def merge_from_list(self, opts: List[Any]) -> None:
        if len(opts) % 2 != 0:
            raise ValueError(f"Override list has odd length: {opts}")
        for full_key, value in zip(opts[0::2], opts[1::2]):
            keys = full_key.split(".")
            node = self
            for sub in keys[:-1]:
                if sub not in node:
                    raise KeyError(f"Non-existent key: {full_key}")
                node = node[sub]
            leaf = keys[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent key: {full_key}")
            if isinstance(value, str):
                value = yaml.safe_load(value)
            dict.__setitem__(node, leaf, _coerce(value, node[leaf], full_key))

    # -- serialization ---------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        def convert(v):
            if isinstance(v, CfgNode):
                return {k: convert(x) for k, x in v.items()}
            if isinstance(v, list):
                return [convert(x) for x in v]
            return v

        return convert(self)

    def dump(self, **kwargs) -> str:
        return yaml.safe_dump(self.to_dict(), **kwargs)

    def __str__(self) -> str:
        return self.dump()

    def __repr__(self) -> str:
        return f"CfgNode({dict.__repr__(self)})"


def _merge_into(src: CfgNode, dst: CfgNode, key_path: List[str]) -> None:
    for key, src_val in src.items():
        full_key = ".".join(key_path + [key])
        if key not in dst:
            raise KeyError(f"Non-existent config key: {full_key}")
        dst_val = dst[key]
        if isinstance(src_val, CfgNode):
            if not isinstance(dst_val, CfgNode):
                raise ValueError(f"Cannot merge dict into non-dict key {full_key!r}")
            _merge_into(src_val, dst_val, key_path + [key])
        else:
            dict.__setitem__(dst, key, _coerce(src_val, dst_val, full_key))
