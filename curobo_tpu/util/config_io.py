"""YAML config IO helpers.

Parity: reference `curobo/_src/util/config_io.py` (load/write/merge).
"""

from __future__ import annotations

import os
from typing import Optional

import yaml


def load_yaml(path_or_dict):
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict, "r") as f:
        return yaml.safe_load(f)


def write_yaml(data: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=None, sort_keys=False)


def merge_dict_a_into_b(a: dict, b: dict) -> dict:
    """Recursively merge ``a`` on top of ``b`` (a wins), returning ``b``."""
    for k, v in a.items():
        if isinstance(v, dict) and isinstance(b.get(k), dict):
            merge_dict_a_into_b(v, b[k])
        else:
            b[k] = v
    return b
