"""Fused FLASH attention Pallas kernel (TPU): no materialized score matrix.

The joint 6-plane / 4-view self-attention runs at up to 6144 tokens
(SURVEY §5.7); a plain matmul+softmax graph writes the [H, L, L] score tensor
to HBM (~0.4-0.8 GB of traffic per block at L=6144). This kernel streams KV
tiles through VMEM with an online softmax (running max / normalizer / output
accumulator in scratch), so VMEM use is O(q_tile * kv_tile) regardless of
sequence length — the previous whole-K-in-VMEM variant overflowed the 16 MB
scoped VMEM at v1 scale (batch-head 10 x 6144 tokens) once Mosaic
double-buffered the K/V blocks. Replacement for the reference's
xFormers/SDPA acceleration (SURVEY §2.6 #8).

Forward is Pallas; backward (training) recomputes with the plain einsum math
via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_TILE = 256
_KV_TILE = 1024
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, n_kv: int, kv_tile: int, lk: int, scale: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [Tq, D]
    k = k_ref[0].astype(jnp.float32)  # [Tk, D]
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Tq, Tk]
    # mask padded keys (zero-padded K rows would otherwise score 0, not -inf)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kv_tile
    s = jnp.where(key_idx < lk, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # [Tq, 1] (all lanes carry the same value)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # rescale factor for previous state
    e = jnp.exp(s - m_new)  # [Tq, Tk]

    l_new = l_ref[:, :1] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        e, v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kv - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q/k/v: [BH, L, D] -> [BH, L, D]."""
    BH, L, D = q.shape
    Lk = k.shape[1]
    tile = min(_Q_TILE, L)
    kv_tile = min(_KV_TILE, Lk)
    pad_q = (-L) % tile
    pad_k = (-Lk) % kv_tile
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    n_tiles = q.shape[1] // tile
    n_kv = k.shape[1] // kv_tile

    kern = functools.partial(
        _flash_kernel, n_kv=n_kv, kv_tile=kv_tile, lk=Lk, scale=1.0 / (D**0.5)
    )
    out = pl.pallas_call(
        kern,
        grid=(BH, n_tiles, n_kv),
        in_specs=[
            pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_tile, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_tile, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),  # running max
            pltpu.VMEM((tile, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((tile, D), jnp.float32),  # output accumulator
        ],
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


def attention(q: jax.Array, k: jax.Array, v: jax.Array, use_pallas: bool = True) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU, plain einsum otherwise.
    q/k/v: [B, L, H, D] -> [B, L, H, D]."""
    B, L, H, D = q.shape
    Lk = k.shape[1]

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if use_pallas and on_tpu and D % 64 == 0 and L >= 128:
        qf = jnp.moveaxis(q, 2, 1).reshape(B * H, L, D)
        kf = jnp.moveaxis(k, 2, 1).reshape(B * H, Lk, D)
        vf = jnp.moveaxis(v, 2, 1).reshape(B * H, Lk, D)
        of = fused_attention(qf, kf, vf)
        return jnp.moveaxis(of.reshape(B, H, L, D), 1, 2)

    scale = 1.0 / (D**0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
