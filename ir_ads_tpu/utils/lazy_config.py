"""Python-based lazy configuration (reference detectron2 LazyConfig /
detrex get_config — config/lazy.py:25-161, instantiate.py).

Config files are plain python modules; any top-level dict / L(...) node is
configuration.  ``L(callable)(**kwargs)`` builds a deferred-construction
node; ``instantiate`` recursively constructs the object DAG; dotted CLI
overrides (``a.b.c=value``) mutate the tree before instantiation.

Example config file:

    from ir_ads_tpu.utils.lazy_config import L
    from ir_ads_tpu.models.cmnext import CMNeXt
    model = L(CMNeXt)(backbone="SwinTransformer-B", num_classes=40)
    train = dict(max_iter=60000, lr=2e-4)

    # load + override
    cfg = load_py_config("cfg.py", ["train.lr=1e-4", "model.num_classes=25"])
    model = instantiate(cfg["model"])
"""

from __future__ import annotations

import ast
import importlib.util
import uuid
from typing import Any, Callable, Dict, List, Optional, Sequence


class LazyCall:
    """Deferred call node: stores target + kwargs, constructed by
    instantiate()."""

    def __init__(self, target: Callable):
        if not callable(target):
            raise TypeError(f"L() target must be callable, got {target!r}")
        self._target = target

    def __call__(self, **kwargs) -> Dict[str, Any]:
        return {"_target_": self._target, **kwargs}


L = LazyCall


def instantiate(node: Any) -> Any:
    """Recursively build the object DAG (d2 instantiate semantics)."""
    if isinstance(node, dict):
        built = {k: instantiate(v) for k, v in node.items() if k != "_target_"}
        if "_target_" in node:
            return node["_target_"](**built)
        return built
    if isinstance(node, (list, tuple)):
        out = [instantiate(v) for v in node]
        return type(node)(out) if isinstance(node, tuple) else out
    return node


def load_py_config(
    path: str, overrides: Optional[Sequence[str]] = None
) -> Dict[str, Any]:
    """Execute a python config file; top-level non-dunder variables become
    the config dict.  Apply ``a.b.c=value`` overrides afterwards."""
    spec = importlib.util.spec_from_file_location(
        f"_ir_ads_cfg_{uuid.uuid4().hex}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = {
        k: v
        for k, v in vars(mod).items()
        if not k.startswith("_") and not callable(v) or isinstance(v, LazyCall)
    }
    # keep dicts/lists/scalars and lazy nodes; drop modules/classes
    cfg = {
        k: v
        for k, v in cfg.items()
        if isinstance(v, (dict, list, tuple, int, float, str, bool))
        or v is None
    }
    for ov in overrides or []:
        apply_override(cfg, ov)
    return cfg


def apply_override(cfg: Dict[str, Any], override: str) -> None:
    """``a.b.c=value`` with python-literal values (d2 LazyConfig
    apply_overrides)."""
    if "=" not in override:
        raise ValueError(f"override must be key=value, got {override!r}")
    key, _, raw = override.partition("=")
    try:
        value = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        value = raw  # bare string
    parts = key.strip().split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            node[p] = {}
        node = node[p]
    node[parts[-1]] = value
