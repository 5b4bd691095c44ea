"""Minimal dataclass CLI: presets + dot-path overrides.

Replaces the reference's tyro dependency (trainer.py:76-95) with a small
self-contained parser supporting the same usage patterns:

    python -m gs_init_tpu.trainer default --data_dir ... --mdi.predictor=metric3d
    python -m gs_init_tpu.trainer mcmc --strategy.cap_max=3700000

Typed casting through dataclass field introspection mirrors the reference's
``cast_value`` (nerfbaselines_integration/method.py:45-94).
"""
from __future__ import annotations

import dataclasses
import typing
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _cast_value(tp, value: str):
    origin = typing.get_origin(tp)
    args = typing.get_args(tp)
    if origin is typing.Union:
        errs = []
        for a in args:
            if a is type(None):
                if value.lower() in ("none", "null"):
                    return None
                continue
            try:
                return _cast_value(a, value)
            except (ValueError, TypeError) as e:  # try next union member
                errs.append(e)
        raise ValueError(f"cannot cast {value!r} to {tp}: {errs}")
    if origin is typing.Literal:
        for a in args:
            if str(a) == value:
                return a
            try:
                if type(a)(value) == a:
                    return a
            except (ValueError, TypeError):
                pass
        raise ValueError(f"{value!r} not in literal {args}")
    if origin in (list, List):
        items = [v for v in value.strip("[]").split(",") if v != ""]
        return [_cast_value(args[0] if args else str, v.strip()) for v in items]
    if origin in (tuple, Tuple):
        items = [v for v in value.strip("()[]").split(",") if v != ""]
        if args and args[-1] is Ellipsis:
            return tuple(_cast_value(args[0], v.strip()) for v in items)
        return tuple(_cast_value(a, v.strip()) for a, v in zip(args, items))
    if tp is bool or tp == "bool":
        if value.lower() in ("true", "1", "yes", "on"):
            return True
        if value.lower() in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"bad bool {value!r}")
    if tp is int:
        return int(value)
    if tp is float:
        return float(value)
    if tp is str:
        return value
    if tp is object or tp is Any:
        return value
    if dataclasses.is_dataclass(tp):
        raise ValueError(f"cannot assign scalar to dataclass field {tp}")
    return tp(value)


def _field_type(obj, name: str):
    for f in dataclasses.fields(obj):
        if f.name == name:
            tp = f.type
            if isinstance(tp, str):
                # Resolve postponed annotations against the module namespace.
                import sys

                mod = sys.modules[type(obj).__module__]
                tp = eval(tp, vars(typing) | vars(mod) | {"typing": typing})  # noqa: S307
            return tp
    raise AttributeError(f"{type(obj).__name__} has no field {name!r}")


def set_by_path(cfg, path: str, value: str) -> None:
    """Set ``cfg.a.b.c = cast(value)`` given dot path ``a.b.c``."""
    parts = path.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    tp = _field_type(obj, parts[-1])
    setattr(obj, parts[-1], _cast_value(tp, value))


def apply_overrides(cfg, overrides: Dict[str, str]):
    for k, v in overrides.items():
        set_by_path(cfg, k, v)
    return cfg


def parse_cli(
    argv: Sequence[str],
    presets: Dict[str, Any],
    default_preset: Optional[str] = None,
):
    """Parse ``[preset] --key=value --key value ...`` into a config object."""
    argv = list(argv)
    preset = default_preset
    if argv and not argv[0].startswith("-"):
        preset = argv.pop(0)
    if preset is None or preset not in presets:
        raise SystemExit(
            f"usage: <preset> [--key=value ...]; presets: {sorted(presets)}"
        )
    import copy

    cfg = copy.deepcopy(presets[preset])
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument {arg!r}")
        key = arg[2:]
        if "=" in key:
            key, value = key.split("=", 1)
        else:
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                i += 1
                value = argv[i]
            else:
                value = "true"  # bare flag
        set_by_path(cfg, key.replace("-", "_"), value)
        i += 1
    return cfg
