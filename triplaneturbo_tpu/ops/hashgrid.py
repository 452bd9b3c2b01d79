"""Multiresolution hash-grid encoding (tiny-cuda-nn replacement, SURVEY §2.6 #5).

Instant-NGP-style encoding as pure gather+lerp XLA: L levels of geometrically
growing resolution, each with a hashed feature table, trilinearly
interpolated and concatenated. Used by the hypernet environment-map
background (/root/reference/custom/triplaneturbo/models/background/
multi_prompt_neural_environment_hashgrid_map_background.py:24-31: 8 levels x
2 features, 2^19 table, base res 4, growth 1.8114 -> 256).

Two TPU-specific deviations from a naive translation, both matching or
approximating tcnn's own behavior:

- Levels whose dense grid fits the table use dense (collision-free) indexing
  instead of the spatial hash, exactly like tcnn's grid_index (tiny-cuda-nn
  uses the hash only when (res+1)^3 > hashmap_size).
- The table gradient is a custom VJP. The trilinear-corner scatter-add is the
  dominant cost of the training-time background backward on TPU (measured
  ~840 ms for 16.8M colliding updates at the v1 recipe's mesh-branch pixel
  count, benchmarks/render_bisect_r4_bgexp.txt); XLA's scatter serializes
  colliding updates, and coarse levels collide massively (level 0 has 125
  distinct rows). `HashGridConfig.grad_mode` selects the strategy:
  "scatter" (plain XLA scatter-add), "sorted_scatter" (one global sort of
  (row, update) pairs, then a scatter-add with the sorted hint), or "sort"
  (fully scatter-free: sort, segment sums via cumsum differences, two
  unique-index placement scatters). All are exact; the numeric results
  differ only by f32 summation order.
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
    # table-gradient strategy: "scatter" | "sorted_scatter" | "sort"
    # (see module docstring; default picked by tools/microbench_hashgrid.py)
    grad_mode: str = "scatter"

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def resolutions(self) -> tuple:
        return tuple(
            max(int(math.floor(self.base_resolution * self.per_level_scale**lvl)), 1)
            for lvl in range(self.n_levels)
        )


def _level_indices_weights(x: jax.Array, res: int, T: int):
    """Corner rows + trilinear weights for one level.

    x: (N, 3) in [0, 1]. Returns idx (N, 8) int32 in [0, T), w (N, 8) f32.
    Dense indexing when the level's grid fits the table (tcnn grid_index
    parity), spatial hash otherwise.
    """
    pos = x * res
    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - p0).astype(jnp.float32)

    off = jnp.asarray(_OFFSETS, dtype=jnp.int32)  # (8, 3)
    corner = jnp.clip(p0[:, None, :] + off[None], 0, res)  # (N, 8, 3)

    if (res + 1) ** 3 <= T:
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

    offf = off.astype(jnp.float32)  # (8, 3)
    w = jnp.prod(
        offf[None] * frac[:, None, :] + (1.0 - offf[None]) * (1.0 - frac[:, None, :]),
        axis=-1,
    )  # (N, 8)
    return idx, w


def _flat_indices_weights(x: jax.Array, cfg: HashGridConfig):
    """(N, L, 8) rows into the flattened (L*T, F) table + weights."""
    T = 1 << cfg.log2_hashmap_size
    idxs, ws = [], []
    for lvl, res in enumerate(cfg.resolutions):
        idx, w = _level_indices_weights(x, res, T)
        idxs.append(idx + lvl * T)
        ws.append(w)
    return jnp.stack(idxs, axis=1), jnp.stack(ws, axis=1)


def _encode_fwd_core(table_flat: jax.Array, x: jax.Array, cfg: HashGridConfig):
    idx, w = _flat_indices_weights(x, cfg)  # (N, L, 8)
    rows = table_flat[idx]  # (N, L, 8, F)
    feats = jnp.sum(rows * w[..., None], axis=2)  # (N, L, F)
    return feats.reshape(x.shape[0], cfg.n_output_dims)


def _table_grad_scatter(g_lvl, idx, w, shape):
    """Plain XLA scatter-add of all corner updates (baseline)."""
    upd = (w[..., None] * g_lvl[:, :, None, :]).reshape(-1, shape[1])
    return jnp.zeros(shape, g_lvl.dtype).at[idx.reshape(-1)].add(upd)


def _sorted_updates(g_lvl, idx, w, F):
    upd = (w[..., None] * g_lvl[:, :, None, :]).reshape(-1, F)
    keys = idx.reshape(-1)
    sort_ops = jax.lax.sort(
        (keys,) + tuple(upd[:, f] for f in range(F)), num_keys=1
    )
    return sort_ops[0], jnp.stack(sort_ops[1:], axis=-1).astype(jnp.float32)


def _table_grad_sort(g_lvl, idx, w, shape):
    """Scatter-free table gradient: sort updates by row, then recover each
    row's segment sum as a difference of two inclusive-cumsum reads placed by
    two UNIQUE-index scatters (no collision handling, no gathers).

    grad[t] = csum[end_t] - (csum[start_t] - vals[start_t]); every table row
    is one contiguous run after the sort, so end/start positions are unique
    per row. Non-boundary positions are masked to an out-of-bounds index and
    dropped.
    """
    S, F = shape
    skeys, svals = _sorted_updates(g_lvl, idx, w, F)
    csum = jnp.cumsum(svals, axis=0)  # (M, F)
    change = skeys[1:] != skeys[:-1]
    is_end = jnp.concatenate([change, jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), change])
    out = jnp.zeros(shape, jnp.float32)
    out = out.at[jnp.where(is_end, skeys, S)].add(
        csum, mode="drop", unique_indices=True
    )
    out = out.at[jnp.where(is_start, skeys, S)].add(
        svals - csum, mode="drop", unique_indices=True
    )
    return out.astype(g_lvl.dtype)


def _table_grad_sorted_scatter(g_lvl, idx, w, shape):
    """Sort, then one plain scatter-add with the sorted-indices hint (lets
    XLA's lowering segment the colliding updates)."""
    skeys, svals = _sorted_updates(g_lvl, idx, w, shape[1])
    out = jnp.zeros(shape, jnp.float32)
    return out.at[skeys].add(svals, indices_are_sorted=True).astype(g_lvl.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode(table: jax.Array, x: jax.Array, cfg: HashGridConfig):
    """table (L, T, F), x (N, 3) in [0,1] -> (N, L*F)."""
    L, T, F = table.shape
    return _encode_fwd_core(table.reshape(L * T, F), x, cfg)


def _hashgrid_encode_fwd(table, x, cfg):
    return hashgrid_encode(table, x, cfg), (table, x)


def _hashgrid_encode_bwd(cfg, res, g):
    table, x = res
    L, T, F = table.shape
    idx, w = _flat_indices_weights(x, cfg)  # (N, L, 8)
    g_lvl = g.reshape(-1, L, F)

    if cfg.grad_mode == "sort":
        d_flat = _table_grad_sort(g_lvl, idx, w, (L * T, F))
    elif cfg.grad_mode == "sorted_scatter":
        d_flat = _table_grad_sorted_scatter(g_lvl, idx, w, (L * T, F))
    else:
        d_flat = _table_grad_scatter(g_lvl, idx, w, (L * T, F))
    d_table = d_flat.reshape(L, T, F)

    # d_x: differentiate the lerp weights (exact; linear in table rows)
    rows = table.reshape(L * T, F)[idx]  # (N, L, 8, F)
    gr = jnp.sum(rows * g_lvl[:, :, None, :], axis=-1)  # (N, L, 8) = dL/dw
    d_x = jnp.zeros_like(x)
    off = jnp.asarray(_OFFSETS, dtype=jnp.float32)  # (8, 3)
    for lvl, r in enumerate(cfg.resolutions):
        pos = x * r
        p0 = jnp.floor(pos)
        frac = (pos - p0).astype(jnp.float32)  # (N, 3)
        lin = off[None] * frac[:, None, :] + (1.0 - off[None]) * (
            1.0 - frac[:, None, :]
        )  # (N, 8, 3) per-dim lerp factors
        dlin = 2.0 * off[None] - 1.0  # d lerp / d frac, (1, 8, 3)
        for d in range(3):
            others = [j for j in range(3) if j != d]
            dw = dlin[..., d] * lin[..., others[0]] * lin[..., others[1]]
            d_x = d_x.at[:, d].add(jnp.sum(gr[:, lvl, :] * dw, axis=-1) * r)
    return d_table, d_x.astype(x.dtype)


hashgrid_encode.defvjp(_hashgrid_encode_fwd, _hashgrid_encode_bwd)


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
