"""TriplaneTurbo-TPU: a TPU-native (JAX/XLA/Pallas) text-to-3D framework.

A from-scratch rebuild of the capabilities of theEricMa/TriplaneTurbo
(CVPR 2025, "Progressive Rendering Distillation") designed TPU-first:

- all compute-path code is functional JAX under ``jit``/``pjit`` with static
  shapes (fixed-capacity mesh buffers, fixed samples-per-ray);
- hot kernels (triplane sampling, marching cubes, ray marching, rasterization,
  hash encoding) are jitted XLA or Pallas;
- distribution is expressed once through ``jax.sharding.Mesh`` + NamedSharding
  (reference used NCCL DDP: /root/reference threestudio/utils/misc.py:122-138).

The string registry mirrors the decoupling role of the reference registry
(/root/reference/threestudio/__init__.py:5-32): YAML config names resolve to
component classes at runtime so the experiment layer stays plugin-shaped.
"""

import logging
from typing import Any, Callable, Dict

__version__ = "0.1.0"

__modules__: Dict[str, Any] = {}


def register(name: str) -> Callable:
    """Class decorator: register a component under a string name.

    Registered names are resolved from YAML configs by :func:`find`, which is
    how the launcher assembles data/system/geometry/renderer/guidance stacks
    without import-order coupling.
    """

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"Module '{name}' already registered as {__modules__[name]}")
        __modules__[name] = cls
        return cls

    return decorator


def find(name: str) -> Any:
    """Resolve a registered component class by name.

    Supports the ``"base:mixin"`` dynamic-subclass syntax of the reference
    registry (threestudio/__init__.py:18-32): ``find("a:b")`` builds a new
    class inheriting from both registered classes.
    """
    if ":" in name:
        main, sub = name.split(":", 1)
        main_cls, sub_cls = find(main), find(sub)
        return type(f"{main_cls.__name__}_{sub_cls.__name__}", (main_cls, sub_cls), {})
    if name not in __modules__:
        # lazily import built-in components so `find` works without the caller
        # importing every subpackage first
        _load_builtin_modules()
    if name not in __modules__:
        raise KeyError(f"No module registered under '{name}'. Known: {sorted(__modules__)}")
    return __modules__[name]


_BUILTINS_LOADED = False


def _load_builtin_modules() -> None:
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True
    # import for registration side effects
    from . import data as _data  # noqa: F401
    from .models import background as _bg  # noqa: F401
    from .models import exporters as _exp  # noqa: F401
    from .models import geometry as _geo  # noqa: F401
    from .models import guidance as _gui  # noqa: F401
    from .models import materials as _mat  # noqa: F401
    from .models import prompt_processors as _pp  # noqa: F401
    from .models import renderers as _ren  # noqa: F401
    from . import systems as _sys  # noqa: F401


_logger = logging.getLogger("triplaneturbo_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("[%(levelname)s] %(name)s: %(message)s"))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)


def info(msg: str, *args) -> None:
    _logger.info(msg, *args)


def warn(msg: str, *args) -> None:
    _logger.warning(msg, *args)


def debug(msg: str, *args) -> None:
    _logger.debug(msg, *args)
