"""Small host-side utilities: rank discovery, dtype policy, path helpers.

TPU-native replacements for the reference's torch.distributed helpers
(/root/reference/threestudio/utils/misc.py:18-29,122-138): rank comes from
``jax.process_index()``; barriers are XLA collectives via
``multihost_utils.sync_global_devices``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def get_device_count() -> int:
    return jax.device_count()


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_host(x: Any, src: int = 0) -> Any:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.broadcast_one_to_all(x, is_source=jax.process_index() == src)
    return x


_DTYPE_ALIASES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}


def parse_dtype(d) -> jnp.dtype:
    if isinstance(d, str):
        return _DTYPE_ALIASES[d]
    return d


def find_last_path(path: Optional[str]) -> Optional[str]:
    """Resolve a literal 'LAST' token in a path to the newest matching dir.

    Same contract as the reference (threestudio/utils/misc.py:146-164).
    """
    if path is None or "LAST" not in path:
        return path
    path = path.replace(" ", "_")
    base_dir_prefix, suffix = path.split("LAST", 1)
    base_dir = os.path.dirname(base_dir_prefix)
    prefix = os.path.split(base_dir_prefix)[-1]
    base_dir_prefix = os.path.join(base_dir, prefix)
    candidates = sorted(
        (os.path.join(base_dir, d) for d in os.listdir(base_dir)),
        reverse=True,
    )
    for c in candidates:
        if c.startswith(base_dir_prefix) and os.path.exists(c + suffix):
            return c + suffix
    raise FileNotFoundError(path)


def cleanup() -> None:
    """Drop XLA live buffers cache (reference analog frees tcnn temp memory)."""
    import gc

    gc.collect()
