"""Fused attention Pallas kernel (TPU): no materialized score matrix in HBM.

The joint 6-plane / 4-view self-attention runs at up to 6144 tokens
(SURVEY §5.7); a plain matmul+softmax graph writes the [H, L, L] score tensor
to HBM (~0.4-0.8 GB of traffic per block at L=6144). This kernel keeps each
(batch*head, q-tile) row block entirely in VMEM: scores for a 256-row tile
against the full K are only L*256*4 bytes (~6 MB at L=6144), so softmax and
the PV matmul fuse without round trips — the replacement for the reference's
xFormers/SDPA acceleration (SURVEY §2.6 #8).

Forward is Pallas; backward (training) recomputes with the plain einsum math
via custom_vjp — inference-critical today, training still correct.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_TILE = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # blocks carry a leading length-1 batch-head dim: [1, TILE/L, D]
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / (d**0.5))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q/k/v: [BH, L, D] -> [BH, L, D]."""
    BH, L, D = q.shape
    Lk = k.shape[1]
    tile = min(_Q_TILE, L)
    pad = (-L) % tile
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    n_tiles = q.shape[1] // tile

    out = pl.pallas_call(
        _attn_kernel,
        grid=(BH, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)
    return out[:, :L]


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused softmax attention over [BH, L, D] tensors (no causal mask)."""
    return _fused_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _fused_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    # recompute-based backward with the standard attention gradients
    q, k, v = res
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    s = jnp.einsum("bld,bkd->blk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("blk,bld->bkd", p, g32)
    dp = jnp.einsum("bld,bkd->blk", g32, v32)
    tmp = (dp * p).sum(-1, keepdims=True)
    ds = p * (dp - tmp)
    dq = jnp.einsum("blk,bkd->bld", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("blk,bld->bkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)


def _vmem_ok(L: int, Lk: int, D: int) -> bool:
    tile = min(_Q_TILE, L)
    # f32 working set: scores [tile, Lk] + k/v [Lk, D] + q/o [tile, D]
    bytes_needed = 4 * (tile * Lk + 2 * Lk * D + 2 * tile * D)
    return bytes_needed < 12 * 1024 * 1024


def attention(q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: bool = True) -> jax.Array:
    """Dispatch: Pallas fused kernel on TPU when the shape fits VMEM, plain
    einsum otherwise. q/k/v: [B, L, H, D] -> [B, L, H, D]."""
    B, L, H, D = q.shape
    Lk = k.shape[1]

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if use_pallas and on_tpu and D % 64 == 0 and _vmem_ok(L, Lk, D) and L >= 128:
        qf = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
        kf = jnp.moveaxis(k, 2, 1).reshape(B * H, Lk, D)
        vf = jnp.moveaxis(v, 2, 1).reshape(B * H, Lk, D)
        of = fused_attention(qf, kf, vf)
        return jnp.moveaxis(of.reshape(B, H, L, D), 1, 2)

    scale = 1.0 / (D**0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
