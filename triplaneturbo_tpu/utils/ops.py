"""Tensor-op utilities (the threestudio/utils/ops.py analog).

Ports of the reference helpers that remain on benchmarked or training paths:
``SpecifyGradient`` (inject precomputed image grads, threestudio/utils/
ops.py:68-83), ``chunk_batch`` (memory chunking :127-191 — dim-0 and the
custom dim-1 variant from custom/triplaneturbo/models/renderers/
utils.py:50-117), ``binary_cross_entropy`` (:459-463),
``perpendicular_component`` (:595-605) and ``validate_empty_rays``'s dense
analog (static shapes never produce empty ray buffers; kept for API parity).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@jax.custom_vjp
def specify_gradient(x: jax.Array, grad: jax.Array) -> jax.Array:
    """Forward: a connected zero-like scalar; backward: inject ``grad`` as
    d(out)/d(x) — the reference's auto_grad guidance path
    (richdreamer_mvdream_stablediffusion_asd_guidance.py:702-755)."""
    return jnp.zeros((), x.dtype)


def _sg_fwd(x, grad):
    return jnp.zeros((), x.dtype), grad


def _sg_bwd(grad, g):
    return (g * grad, jnp.zeros_like(grad))


specify_gradient.defvjp(_sg_fwd, _sg_bwd)


def chunk_batch(fn: Callable, chunk_size: int, x: jax.Array, *args, axis: int = 0, **kwargs):
    """Apply ``fn`` over chunks of ``x`` along ``axis`` via lax.map.

    TPU-native chunking: fixed chunk count, padded tail, results
    concatenated — replaces the reference's Python-loop chunk_batch.
    ``chunk_size <= 0`` calls ``fn`` directly (reference behavior).
    """
    if chunk_size <= 0:
        return fn(x, *args, **kwargs)
    n = x.shape[axis]
    if n <= chunk_size:
        return fn(x, *args, **kwargs)
    x = jnp.moveaxis(x, axis, 0)
    n_chunks = (n + chunk_size - 1) // chunk_size
    pad = n_chunks * chunk_size - n
    xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    xp = xp.reshape((n_chunks, chunk_size) + x.shape[1:])

    def body(xc):
        return fn(jnp.moveaxis(xc, 0, axis) if axis else xc, *args, **kwargs)

    out = jax.lax.map(body, xp)
    out = out.reshape((-1,) + out.shape[2:])[:n]
    return jnp.moveaxis(out, 0, axis) if axis else out


def safe_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """x / ||x|| with a backward that is exact for ||x|| >= eps and ZERO
    (not NaN) at x == 0.

    ``x / jnp.maximum(jnp.linalg.norm(x), eps)`` still NaNs in backward at
    exactly-zero rows: d||x||/dx = x/||x|| is 0/0 there, and a zero cotangent
    times a NaN partial is NaN — the masked-pixel trap (non-hit rasterizer
    pixels interpolate to exact zeros, padded mesh slots are exact zeros,
    SDF gradients vanish identically outside the contracted box). Keeping
    eps INSIDE the sqrt makes d sqrt(max(s, eps^2))/ds = 0 at s = 0, so
    masked zero rows give clean zero gradients. This single pattern was the
    root cause of the full-size step-1 NaN (every background pixel poisoned
    the whole geometry gradient through the normal map)."""
    s = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(s, eps * eps))


def binary_cross_entropy(inputs: jax.Array, targets: jax.Array, eps: float = 0.0) -> jax.Array:
    x = jnp.clip(inputs, 1e-7, 1 - 1e-7)
    return -(targets * jnp.log(x) + (1 - targets) * jnp.log(1 - x)).mean()


def perpendicular_component(x: jax.Array, y: jax.Array) -> jax.Array:
    """Component of x orthogonal to y, batched over dim 0 (ops.py:595-605)."""
    proj = (x * y).sum(axis=tuple(range(1, x.ndim)), keepdims=True)
    norm = (y * y).sum(axis=tuple(range(1, x.ndim)), keepdims=True)
    return x - proj / jnp.maximum(norm, 1e-8) * y


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return (a * b).sum(-1, keepdims=True)
