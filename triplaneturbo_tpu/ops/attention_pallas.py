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

Forward is Pallas; backward (training) is the standard streaming flash
backward — two Pallas kernels (dq; dk/dv) that recompute probability tiles
from the saved per-row logsumexp, so no [L, L] score matrix is ever
materialized in either direction (the einsum backward used ~0.4 GB of HBM
temps per student self-attention layer at v1 scale).
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


def _flash_kernel_stats(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                        *, n_kv: int, kv_tile: int, lk: int, scale: float):
    """Forward + per-row logsumexp output (saved for the flash backward)."""
    _flash_kernel(
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
        n_kv=n_kv, kv_tile=kv_tile, lk=lk, scale=scale,
    )
    j = pl.program_id(2)

    @pl.when(j == n_kv - 1)
    def _emit_lse():
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


def _fused_attention_fwd_impl(q: jax.Array, k: jax.Array, v: jax.Array,
                              return_stats: bool = False):
    """q/k/v: [BH, L, D] -> [BH, L, D] (+ lse [BH, L] when return_stats)."""
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

    in_specs = [
        pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_tile, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_tile, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((tile, 128), jnp.float32),  # running max
        pltpu.VMEM((tile, 128), jnp.float32),  # running normalizer
        pltpu.VMEM((tile, D), jnp.float32),  # output accumulator
    ]
    if return_stats:
        kern = functools.partial(
            _flash_kernel_stats, n_kv=n_kv, kv_tile=kv_tile, lk=Lk, scale=1.0 / (D**0.5)
        )
        out, lse = pl.pallas_call(
            kern,
            grid=(BH, n_tiles, n_kv),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((BH, q.shape[1], 128), jnp.float32),
            ),
            scratch_shapes=scratch,
        )(q, k, v)
        return out[:, :L], lse[:, :L, 0]

    kern = functools.partial(
        _flash_kernel, n_kv=n_kv, kv_tile=kv_tile, lk=Lk, scale=1.0 / (D**0.5)
    )
    out = pl.pallas_call(
        kern,
        grid=(BH, n_tiles, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
    )(q, k, v)
    return out[:, :L]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref,
                         dq_acc, *, n_kv: int, kv_tile: int, lk: int, scale: float):
    """dq for one q-tile, streaming over kv-tiles (j = fastest grid dim)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)  # [Tq, D]
    k = k_ref[0].astype(jnp.float32)  # [Tk, D]
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)  # [Tq, D]
    lse = lse_ref[0][:, :1]  # [Tq, 1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Tq, Tk]
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kv_tile
    p = jnp.where(key_idx < lk, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tq, Tk]
    ds = p * (dp - delta)
    dq_acc[:] = dq_acc[:] + jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(j == n_kv - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkdv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                           dk_ref, dv_ref, dk_acc, dv_acc,
                           *, n_q: int, kv_tile: int, lk: int, scale: float):
    """dk/dv for one kv-tile, streaming over q-tiles (i = fastest grid dim).

    Padded q rows need no mask: their cotangent g is zero-padded, so
    dv += pᵀg gets nothing, and ds = p (dp - delta) = p (0 - 0) = 0."""
    i = pl.program_id(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)  # [Tq, D]
    k = k_ref[0].astype(jnp.float32)  # [Tk, D]
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Tq, Tk]
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kv_tile
    p = jnp.where(key_idx < lk, jnp.exp(s - lse), 0.0)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # pᵀ g -> [Tk, D]
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # dsᵀ q -> [Tk, D]

    @pl.when(i == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g):
    """Streaming flash backward: [BH, L, D] grads without an [L, L] temp."""
    BH, L, D = q.shape
    Lk = k.shape[1]
    tile = min(_Q_TILE, L)
    kv_tile = min(_KV_TILE, Lk)
    pad_q = (-L) % tile
    pad_k = (-Lk) % kv_tile
    scale = 1.0 / (D**0.5)

    # delta_i = sum_d dO_i O_i (the softmax-jacobian row term), lane-broadcast
    delta = (g.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1)  # [BH, L]
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pad_q)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_q)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    lse_b = jnp.broadcast_to(lse[..., None], lse.shape + (128,))
    delta_b = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
    n_q = q.shape[1] // tile
    n_kv = k.shape[1] // kv_tile

    q_spec = pl.BlockSpec((1, tile, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kv_tile, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, n_kv=n_kv, kv_tile=kv_tile, lk=Lk, scale=scale),
        grid=(BH, n_q, n_kv),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((tile, D), jnp.float32)],
    )(q, k, v, g, lse_b, delta_b)

    # swap grid roles: kv-tile is the revisited block, q-tile streams
    q_spec2 = pl.BlockSpec((1, tile, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, kv_tile, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, tile, 128), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkdv_kernel, n_q=n_q, kv_tile=kv_tile, lk=Lk, scale=scale),
        grid=(BH, n_kv, n_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=(kv_spec2, kv_spec2),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_tile, D), jnp.float32),
            pltpu.VMEM((kv_tile, D), jnp.float32),
        ],
    )(q, k, v, g, lse_b, delta_b)
    return dq[:, :L], dk[:, :Lk], dv[:, :Lk]


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused softmax attention over [BH, L, D] tensors (no causal mask)."""
    return _fused_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    o, lse = _fused_attention_fwd_impl(q, k, v, return_stats=True)
    return o, (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g)


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
