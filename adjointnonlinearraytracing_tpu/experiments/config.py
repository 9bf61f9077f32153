"""YAML experiment-config loader with the default/override schema.

The reference ships YAML files (data/params-*.yaml) with a ``default:``
section and named experiment-override sections, but the loader lived outside
the repo (SURVEY.md §2.2).  This module owns it: ``load_params(path, name)``
returns ``default`` deep-merged with the named section, as a plain dict that
the experiment drivers consume with ``params.get(...)`` just like the
reference drivers do.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def experiment_names(path: str) -> List[str]:
    """All named override sections in the file (everything but 'default')."""
    doc = load_yaml(path)
    return [k for k in doc.keys() if k != "default"]


def load_params(path: str, name: Optional[str] = None) -> Dict[str, Any]:
    """default section merged with the named override section.

    ``name=None`` returns just the defaults.  Override values win; nested
    dicts merge recursively.
    """
    doc = load_yaml(path)
    params = copy.deepcopy(doc.get("default", {}) or {})
    if name is not None:
        if name not in doc:
            raise KeyError(
                f"experiment {name!r} not in {path}; available: "
                f"{experiment_names(path)}")
        _merge(params, doc[name] or {})
    params.setdefault("exp_name", name or "default")
    return params


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> None:
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _merge(base[k], v)
        else:
            base[k] = v
