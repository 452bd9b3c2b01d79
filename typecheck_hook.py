"""Runtime type-check decorator behind ``launch.py --typecheck``.

Rebuilds the reference's QA hook (/root/reference/launch.py:132-135:
``install_import_hook("threestudio", "typeguard.typechecked")``) for this
environment: the installed typeguard 2.x crashes on Python 3.12 whenever a
checked annotation is a NamedTuple (its ForwardRef evaluation predates the
3.12 ``recursive_guard`` keyword-only change), which would make every
function returning RasterOut/TeacherBundle/etc. raise spuriously. This
decorator runs the same per-argument + return-value typeguard checks but
skips annotations typeguard itself cannot evaluate, while still raising on
genuine mismatches.

Lives at the repo root (NOT inside triplaneturbo_tpu/) so jaxtyping's import
hook does not instrument the checker with itself.
"""

from __future__ import annotations

import functools
import inspect
import typing

import typeguard

_SKIP_KINDS = (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)


def _is_namedtuple_cls(t) -> bool:
    return isinstance(t, type) and issubclass(t, tuple) and hasattr(t, "_fields")


_UNION_ORIGINS = {typing.Union}
try:
    import types as _types

    _UNION_ORIGINS.add(_types.UnionType)  # py3.10+ `X | None`
except AttributeError:  # pragma: no cover
    pass


def _check(name: str, value, hint) -> None:
    if hint is typing.Any:
        return
    origin = typing.get_origin(hint)
    if origin in _UNION_ORIGINS:
        # typeguard's union handler swallows its own py3.12 NamedTuple crash
        # as "member did not match", so unions are walked here instead
        members = typing.get_args(hint)
        for m in members:
            if m is type(None):
                if value is None:
                    return
                continue
            try:
                _check(name, value, m)
                return
            except TypeError:
                continue
        raise TypeError(f"type of {name} must be one of {members}; got {type(value)}")
    if _is_namedtuple_cls(hint):
        # shallow isinstance only: typeguard's per-field NamedTuple walk is
        # the code path broken on py3.12
        if not isinstance(value, hint):
            raise TypeError(f"type of {name} must be {hint}; got {type(value)}")
        return
    try:
        typeguard.check_type(name, value, hint)
    except (NameError, RecursionError):
        return  # unresolvable forward ref — unverifiable, not a mismatch
    except TypeError as e:
        msg = str(e)
        if "ForwardRef._evaluate" in msg or "recursive_guard" in msg:
            return  # the py3.12 typeguard-2.x NamedTuple bug — skip
        raise


def typechecked(fn):
    """typeguard.typechecked equivalent tolerant of unverifiable annotations."""
    if not callable(fn) or isinstance(fn, type):
        return fn
    try:
        sig = inspect.signature(fn)
        hints = typing.get_type_hints(fn)
    except Exception:
        return fn
    if not hints:
        return fn
    checkable = {
        name
        for name, p in sig.parameters.items()
        if p.kind not in _SKIP_KINDS and name in hints
    }

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            bound = sig.bind(*args, **kwargs)
        except TypeError:
            return fn(*args, **kwargs)  # surface python's own error
        for name in checkable:
            if name in bound.arguments:
                _check(f'argument "{name}"', bound.arguments[name], hints[name])
        result = fn(*args, **kwargs)
        if "return" in hints and hints["return"] is not type(None):
            _check("the return value", result, hints["return"])
        return result

    return wrapper
