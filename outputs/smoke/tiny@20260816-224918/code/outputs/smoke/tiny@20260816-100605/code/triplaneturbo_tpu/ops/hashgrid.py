"""Multiresolution hash-grid encoding (tiny-cuda-nn replacement, SURVEY §2.6 #5).

Instant-NGP-style encoding as pure gather+lerp XLA: L levels of geometrically
growing resolution, each with a hashed feature table, trilinearly
interpolated and concatenated. Used by the hypernet environment-map
background (/root/reference/custom/triplaneturbo/models/background/
multi_prompt_neural_environment_hashgrid_map_background.py:24-31: 8 levels x
2 features, 2^19 table, base res 4, growth 1.8114 -> 256).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


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
        feats = []
        for level in range(c.n_levels):
            import math

            res = max(int(math.floor(c.base_resolution * c.per_level_scale**level)), 1)
            pos = x * res
            p0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - p0

            level_feats = 0.0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        corner = p0 + jnp.asarray([dx, dy, dz])
                        corner = jnp.clip(corner, 0, res).astype(jnp.uint32)
                        h = (
                            corner[..., 0] * jnp.uint32(_PRIMES[0])
                            ^ corner[..., 1] * jnp.uint32(_PRIMES[1])
                            ^ corner[..., 2] * jnp.uint32(_PRIMES[2])
                        ) % jnp.uint32(T)
                        h = h.astype(jnp.int32)
                        w = (
                            jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                            * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                            * jnp.where(dz, frac[..., 2], 1 - frac[..., 2])
                        )
                        level_feats = level_feats + table[level, h] * w[..., None]
            feats.append(level_feats)
        return jnp.concatenate(feats, axis=-1)
