"""Multiresolution hash-grid encoding (tiny-cuda-nn replacement, SURVEY §2.6 #5).

Instant-NGP-style encoding as pure gather+lerp XLA: L levels of geometrically
growing resolution, each with a hashed feature table, trilinearly
interpolated and concatenated. Used by the hypernet environment-map
background (/root/reference/custom/triplaneturbo/models/background/
multi_prompt_neural_environment_hashgrid_map_background.py:24-31: 8 levels x
2 features, 2^19 table, base res 4, growth 1.8114 -> 256).

TPU-specific design (the naive translation spends the whole backward in
colliding scatter-adds — measured ~840 ms at the v1 recipe's mesh-branch
pixel count, benchmarks/render_bisect_r4_bgexp.txt):

- Levels whose dense grid fits the table use dense (collision-free) indexing,
  matching tcnn's grid_index (tiny-cuda-nn hashes only when
  (res+1)^3 > hashmap_size). With the default config that is levels 0-5;
  only the two finest levels hash.
- Dense levels are sampled through a PACKED cell table: the 8 corner rows of
  every cell are materialized side by side ((res+1)^3 x 8F, edge-clamped like
  the corner clip), so each query is ONE row gather instead of eight, and the
  autodiff backward is one 8F-row scatter per query plus slice adjoints.
  Random row-gathers on v5e cost ~10 ns each regardless of row width
  (CLAUDE.md), so this cuts both directions ~8x on those levels.
- Hashed levels go through a custom VJP whose table gradient is a plain XLA
  scatter-add. Two scatter-free alternatives (global sort + segment sums via
  cumsum differences; sort + sorted-hint scatter) were implemented and
  measured on the v5e at the production query count
  (benchmarks/microbench_hashgrid_r5.txt, 262k queries / 16.8M updates):
  scatter 232 ms, sorted_scatter 239 ms, sort 405 ms fwd+bwd — the plain
  scatter strictly dominates, so the losers were deleted (r5; they live in
  git history before this commit if ever needed at other scales).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)

# corner offsets, x fastest (8, 3)
_OFFSETS = tuple(
    (dx, dy, dz) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 8
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 4
    per_level_scale: float = 1.8114473285278132

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def resolutions(self) -> tuple:
        return tuple(
            max(int(math.floor(self.base_resolution * self.per_level_scale**lvl)), 1)
            for lvl in range(self.n_levels)
        )

    def is_dense(self, res: int) -> bool:
        return (res + 1) ** 3 <= (1 << self.log2_hashmap_size)


def _corner_weights(x: jax.Array, res: int) -> jax.Array:
    """Trilinear corner weights, (N, 8), corner order = _OFFSETS."""
    pos = x * res
    frac = (pos - jnp.floor(pos)).astype(jnp.float32)
    off = jnp.asarray(_OFFSETS, dtype=jnp.float32)  # (8, 3)
    return jnp.prod(
        off[None] * frac[:, None, :] + (1.0 - off[None]) * (1.0 - frac[:, None, :]),
        axis=-1,
    )


def _level_indices_weights(x: jax.Array, res: int, T: int, dense: bool):
    """Per-corner rows + weights for one level: idx (N, 8) int32 in [0, T)."""
    pos = x * res
    p0 = jnp.floor(pos).astype(jnp.int32)
    off = jnp.asarray(_OFFSETS, dtype=jnp.int32)  # (8, 3)
    corner = jnp.clip(p0[:, None, :] + off[None], 0, res)  # (N, 8, 3)
    if dense:
        stride = res + 1
        idx = corner[..., 0] + stride * (corner[..., 1] + stride * corner[..., 2])
    else:
        c = corner.astype(jnp.uint32)
        h = (
            c[..., 0] * jnp.uint32(_PRIMES[0])
            ^ c[..., 1] * jnp.uint32(_PRIMES[1])
            ^ c[..., 2] * jnp.uint32(_PRIMES[2])
        ) % jnp.uint32(T)
        idx = h.astype(jnp.int32)
    return idx, _corner_weights(x, res)


def _encode_fwd_core(table_flat: jax.Array, x: jax.Array, cfg: HashGridConfig):
    """Naive gather-per-corner forward (the reference semantics; kept as the
    autodiff oracle for tests and as the hashed-level primal)."""
    T = 1 << cfg.log2_hashmap_size
    F = table_flat.shape[-1]
    feats = []
    for lvl, res in enumerate(cfg.resolutions):
        idx, w = _level_indices_weights(x, res, T, cfg.is_dense(res))
        rows = table_flat[idx + lvl * T]  # (N, 8, F)
        feats.append(jnp.sum(rows * w[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1).reshape(x.shape[0], cfg.n_output_dims)


# ----------------------------------------------------------------------
# dense levels: packed-cell sampling (autodiff-native)
# ----------------------------------------------------------------------


def _pack_dense_level(level_rows: jax.Array, res: int) -> jax.Array:
    """(T, F) level rows -> ((res+1)^3, 8F) packed cell table.

    Cell p0 holds the 8 corner rows f[clip(p0+off, 0, res)] side by side
    (edge padding reproduces the corner clip exactly)."""
    s = res + 1
    F = level_rows.shape[-1]
    g = level_rows[: s**3].reshape(s, s, s, F)  # [z, y, x, F]
    p = jnp.pad(g, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    slots = [p[dz : dz + s, dy : dy + s, dx : dx + s] for (dx, dy, dz) in _OFFSETS]
    return jnp.concatenate(slots, axis=-1).reshape(s**3, 8 * F)


def _dense_level_encode(level_rows: jax.Array, x: jax.Array, res: int):
    """One packed row-gather per query for a dense level -> (N, F)."""
    s = res + 1
    F = level_rows.shape[-1]
    packed = _pack_dense_level(level_rows, res)
    pos = x * res
    p0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res)
    cell = p0[..., 0] + s * (p0[..., 1] + s * p0[..., 2])  # (N,)
    rows = packed[cell].reshape(-1, 8, F)
    w = _corner_weights(x, res)
    return jnp.sum(rows * w[..., None], axis=1)


# ----------------------------------------------------------------------
# hashed levels: custom VJP with selectable table-gradient strategy
# ----------------------------------------------------------------------


def _hashed_levels(cfg: HashGridConfig):
    return [
        (lvl, res)
        for lvl, res in enumerate(cfg.resolutions)
        if not cfg.is_dense(res)
    ]


def _hashed_indices_weights(x: jax.Array, cfg: HashGridConfig):
    """(N, Lh, 8) rows into the flattened (L*T, F) table + weights."""
    T = 1 << cfg.log2_hashmap_size
    idxs, ws = [], []
    for lvl, res in _hashed_levels(cfg):
        idx, w = _level_indices_weights(x, res, T, False)
        idxs.append(idx + lvl * T)
        ws.append(w)
    return jnp.stack(idxs, axis=1), jnp.stack(ws, axis=1)


def _table_grad_scatter(g_lvl, idx, w, shape):
    """Plain XLA scatter-add of all corner updates (measured-best on v5e —
    see module docstring)."""
    upd = (w[..., None] * g_lvl[:, :, None, :]).reshape(-1, shape[1])
    return jnp.zeros(shape, jnp.float32).at[idx.reshape(-1)].add(upd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hashed_encode(table: jax.Array, x: jax.Array, cfg: HashGridConfig):
    """Hashed levels only: table (L, T, F), x (N, 3) -> (N, Lh, F)."""
    L, T, F = table.shape
    idx, w = _hashed_indices_weights(x, cfg)  # (N, Lh, 8)
    rows = table.reshape(L * T, F)[idx]  # (N, Lh, 8, F)
    return jnp.sum(rows * w[..., None], axis=2)


def _hashed_encode_fwd(table, x, cfg):
    return _hashed_encode(table, x, cfg), (table, x)


def _hashed_encode_bwd(cfg, res, g):
    table, x = res
    L, T, F = table.shape
    idx, w = _hashed_indices_weights(x, cfg)  # (N, Lh, 8)
    g_lvl = g.astype(jnp.float32)  # (N, Lh, F)

    d_flat = _table_grad_scatter(g_lvl, idx, w, (L * T, F))
    d_table = d_flat.reshape(L, T, F).astype(table.dtype)

    # d_x: differentiate the lerp weights (the table rows are linear taps)
    rows = table.reshape(L * T, F)[idx]  # (N, Lh, 8, F)
    gr = jnp.sum(rows * g_lvl[:, :, None, :], axis=-1)  # (N, Lh, 8) = dL/dw
    d_x = jnp.zeros_like(x)
    off = jnp.asarray(_OFFSETS, dtype=jnp.float32)  # (8, 3)
    for li, (lvl, r) in enumerate(_hashed_levels(cfg)):
        pos = x * r
        frac = (pos - jnp.floor(pos)).astype(jnp.float32)  # (N, 3)
        lin = off[None] * frac[:, None, :] + (1.0 - off[None]) * (
            1.0 - frac[:, None, :]
        )  # (N, 8, 3) per-dim lerp factors
        dlin = 2.0 * off[None] - 1.0  # d lerp / d frac, (1, 8, 3)
        for d in range(3):
            others = [j for j in range(3) if j != d]
            dw = dlin[..., d] * lin[..., others[0]] * lin[..., others[1]]
            d_x = d_x.at[:, d].add(jnp.sum(gr[:, li, :] * dw, axis=-1) * r)
    return d_table, d_x.astype(x.dtype)


_hashed_encode.defvjp(_hashed_encode_fwd, _hashed_encode_bwd)


def hashgrid_encode(table: jax.Array, x: jax.Array, cfg: HashGridConfig):
    """table (L, T, F), x (N, 3) in [0,1] -> (N, L*F)."""
    hashed = dict(
        zip(
            [lvl for lvl, _ in _hashed_levels(cfg)],
            jnp.moveaxis(_hashed_encode(table, x, cfg), 1, 0),
        )
    ) if _hashed_levels(cfg) else {}
    feats = []
    for lvl, res in enumerate(cfg.resolutions):
        if cfg.is_dense(res):
            feats.append(_dense_level_encode(table[lvl], x, res))
        else:
            feats.append(hashed[lvl])
    return jnp.concatenate(feats, axis=-1).reshape(x.shape[0], cfg.n_output_dims)


class HashGridEncoding(nn.Module):
    """x in [0,1]^3 -> [N, L*F] features."""

    cfg: HashGridConfig = HashGridConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        T = 1 << c.log2_hashmap_size
        table = self.param(
            "table",
            lambda k, s: jax.random.uniform(k, s, minval=-1e-4, maxval=1e-4),
            (c.n_levels, T, c.n_features_per_level),
        )
        return hashgrid_encode(table, x, c)
