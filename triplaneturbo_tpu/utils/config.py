"""Config system: YAML ∪ CLI-dotlist → nested attribute-dicts → dataclasses.

Rebuilds the surface of the reference's OmegaConf pipeline
(/root/reference/threestudio/utils/config.py:104-128) without OmegaConf:

- :func:`load_config` merges a YAML file, dotlist overrides
  (``system.loss.lambda_sdf=0.1``) and kwargs, then resolves ``${...}``
  interpolations and the custom resolvers the reference registers
  (``rmspace``, ``cmaxgt0``, ... threestudio/utils/config.py:11-27).
- :func:`parse_structured` instantiates a typed dataclass from a dict,
  ignoring unknown keys only when the dataclass opts in.
"""

from __future__ import annotations

import dataclasses
import os
import re
from datetime import datetime
from typing import Any, Dict, List, Optional, Union

import yaml


class DotDict(dict):
    """dict with attribute access; nested dicts are wrapped on the fly."""

    def __getattr__(self, k: str) -> Any:
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict) and not isinstance(v, DotDict):
            v = DotDict(v)
            self[k] = v
        return v

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def __deepcopy__(self, memo):
        import copy

        return DotDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return DotDict({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _parse_value(s: str) -> Any:
    """Parse a CLI override value with YAML semantics."""
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if v is None and s.strip() not in ("", "null", "~", "None"):
        return s
    # yaml parses "- x" style block sequences; CLI/resolver args never mean that
    if isinstance(v, (list, dict)) and not s.strip().startswith(("[", "{")):
        return s
    return v


def merge_dicts(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotlist(cfg: Dict, dotlist: List[str]) -> Dict:
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"Override '{item}' is not of the form key.path=value")
        key, value = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"Cannot override non-dict node at '{p}' in '{key}'")
        node[parts[-1]] = _parse_value(value)
    return cfg


# --- resolvers (reference: threestudio/utils/config.py:11-27) ---------------


def _resolver_rmspace(s: str, sub: str = "-") -> str:
    return re.sub(r"\s+", sub, str(s).strip())


def _resolver_basename(p: str) -> str:
    return os.path.splitext(os.path.basename(str(p)))[0]


_RESOLVERS = {
    "rmspace": _resolver_rmspace,
    "basename": _resolver_basename,
    "cmaxgt0": lambda v: max(float(v), 0.0) > 0,
    "not": lambda v: not v,
    "add": lambda a, b: float(a) + float(b),
    "sub": lambda a, b: float(a) - float(b),
    "mul": lambda a, b: float(a) * float(b),
    "div": lambda a, b: float(a) / float(b),
    "idiv": lambda a, b: int(a) // int(b),
}

_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")


def _lookup(root: Dict, path: str) -> Any:
    node: Any = root
    for p in path.split("."):
        if isinstance(node, dict):
            node = node[p]
        else:
            node = getattr(node, p)
    return node


def _resolve_expr(expr: str, root: Dict) -> Any:
    expr = expr.strip()
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        name = name.strip()
        if name in _RESOLVERS:
            args = [a.strip() for a in argstr.split(",")] if argstr else []
            args = [
                _lookup(root, a) if re.fullmatch(r"[A-Za-z_][\w.]*", a) and _has_path(root, a) else _parse_value(a)
                for a in args
            ]
            return _RESOLVERS[name](*args)
    return _lookup(root, expr)


def _has_path(root: Dict, path: str) -> bool:
    try:
        _lookup(root, path)
        return True
    except (KeyError, AttributeError, TypeError):
        return False


def resolve_interpolations(cfg: Dict, root: Optional[Dict] = None, _depth: int = 0) -> Dict:
    """Resolve ``${path}`` and ``${resolver:args}`` interpolations in place."""
    if root is None:
        root = cfg
    if _depth > 8:
        return cfg

    changed = [False]

    def resolve_str(s: str) -> Any:
        m = _INTERP_RE.fullmatch(s.strip())
        if m:
            v = _resolve_expr(m.group(1), root)
            changed[0] = True
            return v

        def sub(mm):
            changed[0] = True
            return str(_resolve_expr(mm.group(1), root))

        out = _INTERP_RE.sub(sub, s)
        return out

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            return type(node)({k: walk(v) for k, v in node.items()})
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str) and "${" in node:
            return resolve_str(node)
        return node

    out = walk(cfg)
    if changed[0]:
        return resolve_interpolations(out, out, _depth + 1)
    return out


def load_config(
    path_or_dict: Union[str, Dict],
    cli_args: Optional[List[str]] = None,
    n_devices: int = 1,
    **kwargs,
) -> DotDict:
    """Load config = YAML ∪ dotlist ∪ kwargs, resolve interpolations.

    Mirrors the reference `load_config` (threestudio/utils/config.py:104-114):
    injects ``n_devices`` (the reference's ``n_gpus``) and a timestamp, and
    computes the trial directory name.
    """
    if isinstance(path_or_dict, str):
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = dict(path_or_dict)
    # single-inheritance base configs: __base__: path.yaml
    base_path = cfg.pop("__base__", None)
    if base_path:
        with open(base_path) as f:
            base = yaml.safe_load(f) or {}
        base.pop("__base__", None)
        cfg = merge_dicts(base, cfg)
    if cli_args:
        cfg = apply_dotlist(cfg, list(cli_args))
    if kwargs:
        cfg = merge_dicts(cfg, kwargs)
    cfg.setdefault("n_devices", n_devices)
    cfg.setdefault("timestamp", datetime.now().strftime("@%Y%m%d-%H%M%S"))
    cfg = resolve_interpolations(cfg)
    cfg = _wrap(cfg)
    cfg.setdefault("name", "default")
    cfg.setdefault("tag", "")
    cfg.setdefault("exp_root_dir", "outputs")
    cfg.setdefault("seed", 0)
    trial_name = f"{cfg.tag}{cfg.timestamp}" if cfg.get("use_timestamp", True) else cfg.tag
    cfg.setdefault("trial_name", trial_name)
    cfg.setdefault("exp_dir", os.path.join(cfg.exp_root_dir, cfg.name))
    cfg.setdefault("trial_dir", os.path.join(cfg.exp_dir, cfg.trial_name))
    return cfg


def parse_structured(cls, cfg: Optional[Union[Dict, DotDict]] = None, strict: bool = False):
    """Instantiate dataclass ``cls`` from dict ``cfg``.

    Equivalent of the reference `parse_structured`
    (threestudio/utils/config.py:126-128). Unknown keys raise when
    ``strict`` else warn-and-drop, so experiment YAMLs can carry extra keys.
    """
    cfg = dict(cfg or {})
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(cfg) - names
    if unknown and strict:
        raise ValueError(f"Unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {k: v for k, v in cfg.items() if k in names}
    # YAML sequences arrive as lists; coerce to tuple where the dataclass
    # field is Tuple-annotated (keeps runtime types honest under the
    # --typecheck jaxtyping/typeguard hook)
    try:
        import typing

        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    for k, v in list(kwargs.items()):
        hint = hints.get(k)
        if (typing.get_origin(hint) is tuple or hint is tuple) and isinstance(v, list):
            kwargs[k] = tuple(v)
        elif dataclasses.is_dataclass(hint) and isinstance(v, dict):
            kwargs[k] = parse_structured(hint, v, strict=strict)
    return cls(**kwargs)


def config_to_primitive(cfg: Any) -> Any:
    if isinstance(cfg, dict):
        return {k: config_to_primitive(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [config_to_primitive(v) for v in cfg]
    if dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return cfg


def dump_config(path: str, cfg: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config_to_primitive(cfg), f, sort_keys=False)
