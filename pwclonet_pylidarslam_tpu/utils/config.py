"""Config system: dataclass trees ← YAML files ← CLI ``a.b.c=value`` overrides.

Replaces the reference's Hydra stack (``config/`` YAML tree + ConfigStore
registrations + ``ObjectLoaderEnum`` factories, SURVEY §2.8 "Config system")
with a dependency-free loader:

- any (frozen or mutable) dataclass tree can be built from a nested dict;
- YAML file + ``key.path=value`` override strings compose left to right;
- unknown keys raise with the valid field names (typo safety);
- the resolved config is dumped back to YAML in the run dir, with the git
  hash, like the reference persists (``odometry_runner.py:101-111``).
"""

from __future__ import annotations

import dataclasses
import subprocess
from typing import Any, Dict, List, Optional, Type, TypeVar, get_args, get_origin

T = TypeVar("T")


def _convert_scalar(value: str) -> Any:
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    if value.lower() in ("null", "none"):
        return None
    return value


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build a dataclass tree from a nested dict (strict on unknown keys)."""
    if not dataclasses.is_dataclass(cls):
        return data  # leaf passthrough
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(
                f"{cls.__name__} has no field {key!r}; valid: {sorted(fields)}"
            )
        ftype = fields[key].type
        ftype_cls = ftype if isinstance(ftype, type) else None
        if isinstance(value, dict):
            # resolve the nested dataclass type from the field default
            default = fields[key].default
            if dataclasses.is_dataclass(default):
                base = dataclasses.asdict(default)
                base.update(value)
                kwargs[key] = from_dict(type(default), _merge_nested(default, value))
            elif fields[key].default_factory is not dataclasses.MISSING:  # type: ignore
                default = fields[key].default_factory()  # type: ignore
                kwargs[key] = from_dict(type(default), _merge_nested(default, value))
            elif ftype_cls and dataclasses.is_dataclass(ftype_cls):
                kwargs[key] = from_dict(ftype_cls, value)
            else:
                kwargs[key] = value
        elif isinstance(value, list) and ftype_cls is tuple:
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = tuple(value) if isinstance(value, list) and "Tuple" in str(ftype) else value
    return cls(**kwargs)


def _merge_nested(default_obj, override: Dict[str, Any]) -> Dict[str, Any]:
    base = {}
    for f in dataclasses.fields(default_obj):
        v = getattr(default_obj, f.name)
        base[f.name] = v if not dataclasses.is_dataclass(v) else v
    out = dict(base)
    for k, v in override.items():
        if (
            k in out
            and dataclasses.is_dataclass(out[k])
            and isinstance(v, dict)
        ):
            out[k] = from_dict(type(out[k]), _merge_nested(out[k], v))
        else:
            out[k] = v
    # re-flatten dataclass values to stay constructible
    return {
        k: (v if not dataclasses.is_dataclass(v) or isinstance(v, type) else v)
        for k, v in out.items()
    }


def apply_overrides(data: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` strings onto a nested dict (Hydra-CLI style)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like key.path=value")
        path, value = ov.split("=", 1)
        keys = path.split(".")
        node = data
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = _convert_scalar(value)
    return data


def load_config(
    cls: Type[T],
    yaml_path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> T:
    import yaml

    data: Dict[str, Any] = {}
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
    if overrides:
        data = apply_overrides(data, overrides)
    return from_dict(cls, data)


def dump_config(config: Any, path: str):
    """Persist the resolved config + git hash (ref odometry_runner.py:101-111)."""
    import yaml

    def clean(obj):
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return {f.name: clean(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        if isinstance(obj, (list, tuple)):
            return [clean(x) for x in obj]
        if isinstance(obj, (int, float, str, bool)) or obj is None:
            return obj
        return repr(obj)

    payload = {"config": clean(config), "git_hash": git_hash()}
    with open(path, "w") as f:
        yaml.safe_dump(payload, f, sort_keys=False)


def git_hash() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"
