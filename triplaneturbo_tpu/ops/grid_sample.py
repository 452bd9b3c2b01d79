"""Bilinear grid sampling as pure gather+lerp XLA.

TPU-native replacement for both the reference's ``F.grid_sample`` call
(/root/reference/triplaneturbo_executable/utils/general_utils.py:62-65) and its
custom CUDA double-backward extension
(/root/reference/custom/triplaneturbo/extern/grid_sample_gradfix/, 667 LoC of
CUDA): the reference needed hand-written second derivatives because analytic
SDF normals (themselves ``autograd.grad`` outputs) are back-propagated through
rendering losses. Here the op is ordinary differentiable JAX, so ``jax.grad``
composes to any order for free (SURVEY.md §2.6 #1).

Semantics match ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)``:
  * grid values in [-1, 1]; ``grid[..., 0]`` indexes width, ``[..., 1]`` height;
  * align_corners=False: pixel centers at ``(-1 + (2*i+1)/size)``;
  * zeros padding: out-of-bounds corner taps contribute zero.

Layout is NHWC (TPU-friendly: channel dim last so the gather feeds matmuls
without transposes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(features: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample ``features`` at normalized ``grid`` locations.

    Args:
      features: ``[N, H, W, C]`` feature maps.
      grid: ``[N, M, 2]`` sample locations in [-1, 1], (x, y) order.

    Returns:
      ``[N, M, C]`` sampled features (zeros outside the map).
    """
    N, H, W, C = features.shape
    x, y = grid[..., 0], grid[..., 1]

    # unnormalize (align_corners=False)
    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    # lerp weights
    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        # validity before clipping (zeros padding)
        valid = (
            (ix_ >= 0) & (ix_ <= W - 1) & (iy_ >= 0) & (iy_ <= H - 1)
        )
        xi = jnp.clip(ix_, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(iy_, 0, H - 1).astype(jnp.int32)
        flat = features.reshape(N, H * W, C)
        idx = yi * W + xi  # [N, M]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(features.dtype)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)

    w00 = (wy0 * wx0)[..., None]
    w01 = (wy0 * wx1)[..., None]
    w10 = (wy1 * wx0)[..., None]
    w11 = (wy1 * wx1)[..., None]

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def pack_2x2(features: jax.Array) -> jax.Array:
    """Pack each 2x2 neighborhood into one row: [N,H,W,C] -> [N,H+1,W+1,4C].

    packed[j, i] = (f[j-1,i-1], f[j-1,i], f[j,i-1], f[j,i]) with zero padding
    outside — exactly the four corner taps of a bilinear query whose floor
    cell is (j-1, i-1). One row gather then replaces the four per-corner
    gathers of :func:`grid_sample_2d`; random row-gathers on v5e cost ~10 ns
    each regardless of row width, so this quarters the dominant cost of
    point sampling (see CLAUDE.md "reduce gather COUNT").
    """
    P = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H1, W1 = features.shape[1] + 1, features.shape[2] + 1
    return jnp.concatenate(
        [
            P[:, :H1, :W1],
            P[:, :H1, 1:],
            P[:, 1:, :W1],
            P[:, 1:, 1:],
        ],
        axis=-1,
    )


def grid_sample_2d_packed(packed: jax.Array, grid: jax.Array) -> jax.Array:
    """grid_sample_2d on a :func:`pack_2x2`-packed map — ONE gather/point.

    Exact same semantics (align_corners=False, zeros padding): border zeros
    are baked into the packed map, so no per-corner masks are needed; points
    whose whole 2x2 cell is outside are masked as a unit.
    """
    N, H1, W1, C4 = packed.shape
    H, W, C = H1 - 1, W1 - 1, C4 // 4
    x, y = grid[..., 0], grid[..., 1]

    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = (ix - ix0)[..., None]
    wy1 = (iy - iy0)[..., None]

    # cell row (iy0+1, ix0+1); in [0,H]x[0,W] whenever any corner is valid
    j = iy0 + 1.0
    i = ix0 + 1.0
    valid = (i >= 0) & (i <= W) & (j >= 0) & (j <= H)
    ji = jnp.clip(j, 0, H).astype(jnp.int32) * W1 + jnp.clip(i, 0, W).astype(
        jnp.int32
    )
    rows = jnp.take_along_axis(
        packed.reshape(N, H1 * W1, C4), ji[..., None], axis=1
    ) * valid[..., None].astype(packed.dtype)
    v00, v01, v10, v11 = (
        rows[..., :C],
        rows[..., C : 2 * C],
        rows[..., 2 * C : 3 * C],
        rows[..., 3 * C :],
    )
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    return v00 * (wy0 * wx0) + v01 * (wy0 * wx1) + v10 * (wy1 * wx0) + v11 * (
        wy1 * wx1
    )


def grid_sample_3d(features: jax.Array, grid: jax.Array) -> jax.Array:
    """Trilinear sample of a voxel grid, same conventions as 2D.

    Args:
      features: ``[N, D, H, W, C]``.
      grid: ``[N, M, 3]`` in [-1, 1], (x, y, z) with x->W, y->H, z->D.

    Returns:
      ``[N, M, C]``.
    """
    N, D, H, W, C = features.shape
    x, y, z = grid[..., 0], grid[..., 1], grid[..., 2]

    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5
    iz = ((z + 1.0) * D - 1.0) * 0.5

    ix0, iy0, iz0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    fx, fy, fz = ix - ix0, iy - iy0, iz - iz0

    flat = features.reshape(N, D * H * W, C)

    def gather(zi_, yi_, xi_):
        valid = (
            (xi_ >= 0) & (xi_ <= W - 1)
            & (yi_ >= 0) & (yi_ <= H - 1)
            & (zi_ >= 0) & (zi_ <= D - 1)
        )
        xi = jnp.clip(xi_, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi_, 0, H - 1).astype(jnp.int32)
        zi = jnp.clip(zi_, 0, D - 1).astype(jnp.int32)
        idx = (zi * H + yi) * W + xi
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(features.dtype)

    out = 0.0
    for dz, wz in ((iz0, 1.0 - fz), (iz0 + 1.0, fz)):
        for dy, wy in ((iy0, 1.0 - fy), (iy0 + 1.0, fy)):
            for dx, wx in ((ix0, 1.0 - fx), (ix0 + 1.0, fx)):
                out = out + gather(dz, dy, dx) * (wz * wy * wx)[..., None]
    return out
