"""Config system: YAML with flattened top-level sections + CLI ``--opts`` overrides.

Behavioral parity with the reference config loader (reference
utils/config.py:11-147): the YAML's top-level sections (DATA / MODEL /
Distributed / ...) are flattened into a single attribute namespace, and
``--opts key value ...`` pairs are merged on top with ``literal_eval``-based
type coercion against the existing value's type.
"""

from __future__ import annotations

import copy
from ast import literal_eval
from typing import Any, Dict, List, Optional

import yaml


class CfgNode(dict):
    """A dict subclass exposing keys as attributes.

    Missing attribute reads return ``None`` so feature-flag lookups like
    ``cfg.use_cls_head`` work without every config spelling out every flag
    (the reference guards these with ``hasattr``; returning None keeps the
    same truthiness semantics with less noise).
    """

    def __init__(self, init_dict: Optional[Dict[str, Any]] = None):
        init_dict = {} if init_dict is None else init_dict
        super().__init__(init_dict)
        for k, v in self.items():
            if isinstance(v, dict):
                self[k] = CfgNode(v)

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        if name.startswith("__"):
            raise AttributeError(name)
        return None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def clone(self) -> "CfgNode":
        return CfgNode(copy.deepcopy(dict(self)))

    def __str__(self) -> str:
        def _indent(s, num_spaces):
            lines = s.split("\n")
            first = lines.pop(0)
            rest = "\n".join(" " * num_spaces + line for line in lines)
            return first + ("\n" + rest if rest else "")

        r = ""
        s = []
        for k, v in sorted(self.items()):
            sep = "\n" if isinstance(v, CfgNode) else " "
            attr_str = f"{k}:{sep}{v}"
            s.append(_indent(attr_str, 2))
        return r + "\n".join(s)


def load_cfg(cfg_path: str) -> CfgNode:
    """Load a YAML config and flatten top-level sections into one namespace."""
    with open(cfg_path, "r") as f:
        cfg_from_file = yaml.safe_load(f)

    cfg: Dict[str, Any] = {}
    for section in cfg_from_file or {}:
        body = cfg_from_file[section]
        if isinstance(body, dict):
            for k, v in body.items():
                cfg[k] = v
        else:
            cfg[section] = body
    return CfgNode(cfg)


# Back-compat spelling used by some CLIs.
load_cfg_from_cfg_file = load_cfg


def _decode_value(value: str) -> Any:
    """Decode a CLI string into a python object (literal_eval, else str)."""
    if not isinstance(value, str):
        return value
    try:
        return literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(replacement: Any, original: Any, key: str) -> Any:
    """Coerce ``replacement`` to the type of ``original`` where sensible."""
    original_type = type(original)
    if original is None or isinstance(replacement, original_type):
        return replacement

    casts = [(tuple, list), (list, tuple), (int, float), (float, int),
             (str, type(None))]
    for from_type, to_type in casts:
        if isinstance(replacement, from_type) and isinstance(original, to_type):
            return to_type(replacement) if to_type is not type(None) else replacement
    if isinstance(original, bool) and isinstance(replacement, (int, str)):
        if isinstance(replacement, str):
            low = replacement.lower()
            if low in ("true", "false"):
                return low == "true"
        return bool(replacement)
    if isinstance(original, str):
        return str(replacement)
    raise ValueError(
        f"Type mismatch ({original_type} vs {type(replacement)}) for key {key}: "
        f"{original} vs {replacement}")


def merge_cfg_from_list(cfg: CfgNode, cfg_list: List[str]) -> CfgNode:
    """Merge ``--opts key value ...`` pairs into a config."""
    assert len(cfg_list) % 2 == 0, f"--opts must come in pairs, got {cfg_list}"
    new_cfg = cfg.clone()
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        subkey = full_key.split(".")[-1]
        value = _decode_value(v)
        if subkey in cfg:
            value = _coerce(value, cfg[subkey], subkey)
        new_cfg[subkey] = value
    return new_cfg
