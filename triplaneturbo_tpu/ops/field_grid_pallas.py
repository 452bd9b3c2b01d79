"""Fused triplane-grid field evaluation: one Pallas kernel for the dense
marching-cubes grid.

Replaces the XLA composition in ``TriplaneField.forward_field_grid``
(broadcast-sum of three resampled planes -> two bias-free VanillaMLPs for
SDF and deformation, reference sd_dual_triplanes.py:332-350 +
models/networks.py:23-62) with a single kernel. Two structural tricks make
this MXU-shaped:

* the MLPs are BIAS-FREE, so the first layer distributes over the triplane
  sum: ``relu((xy+xz+zy) @ W1) = relu(xy@W1 + xz@W1 + zy@W1)`` — the three
  per-plane products are [R², C]x[C, 128] matmuls precomputed in XLA for
  ~0.3 GFLOP, and the kernel never materializes the [R³, C] feature grid
  (the XLA path's dominant HBM traffic);
* the SDF net and the deformation net share their input, so their second
  layers fuse into one block-diagonal [128, 128] matmul and their output
  layers into one [128, 4] — the kernel is one full-width MXU matmul per
  tile plus broadcasts.

HBM traffic ≈ outputs only (sdf + deformation, 67 MB at R=160) versus
~3.5 GB of intermediates for the unfused path; measured 55 ms -> ~5 ms.

Backward (training: gradients flow into the planes and both MLPs, damped by
sdf_grad_shrink) uses a custom VJP whose backward recomputes the reference
XLA expression — numerically identical to differentiating the unfused path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Backward-pass slab count of fused_field_grid (see _bwd): the recompute is
# partitioned into this many x-slabs to bound peak HBM temps; any value with
# identical gradients (falls back to 1 whole-grid slab when it does not
# divide R). 8 bounds the R=160 training backward's recompute temps to
# ~0.25 GB. Read at trace time; tools/probe_render_mem.py overrides it to
# compare decompositions (gradient equality across values is locked by
# tests/test_field_grid_pallas.py).
BWD_SLABS = 8


def _kernel(a_xy_ref, a_xz_ref, a_zy_ref, w2_ref, w3t_ref, bias_ref,
            sdf_ref, def_ref, *, k_dim: int):
    # blocks: a_xy [TI, TJ, H], a_xz [TI, K, H], a_zy [TJ, K, H], w3t [8, H]
    ti = a_xy_ref.shape[0]
    tj = a_xy_ref.shape[1]
    hdim = a_xy_ref.shape[2]
    h1 = (
        a_xy_ref[:][:, :, None, :]
        + a_xz_ref[:][:, None, :, :]
        + a_zy_ref[:][None, :, :, :]
    )  # [TI, TJ, K, H]
    h1 = jnp.maximum(h1, 0.0)
    h1f = h1.reshape(ti * tj * k_dim, hdim)
    h2 = jnp.maximum(
        jnp.dot(h1f, w2_ref[:], preferred_element_type=jnp.float32), 0.0
    )  # [M, H]

    # outputs via lane reductions (avoids a [., 4]-lane matmul + relayout)
    def head(c):
        return (h2 * w3t_ref[c, :][None, :]).sum(axis=-1).reshape(ti, tj, k_dim)

    # sphere SDF bias on world coordinates (shifted_sdf, sphere branch):
    # precomputed in XLA (Mosaic cannot lower leading-dim iota) and streamed
    # in as a block — one extra 4-byte read per output point.
    sdf_ref[:] = head(0) + bias_ref[:]
    def_ref[0] = head(1)
    def_ref[1] = head(2)
    def_ref[2] = head(3)


def _pallas_forward(a_xy, a_xz, a_zy, w2blk, w3t, radius, bias_r,
                    tile_i=4, tile_j=8, interpret=False):
    # tile_j sits in a sublane position (a_xy block [TI, TJ, H]) and must be
    # a multiple of 8; tile_i is always a leading dim, any size works
    R, _, H = a_xy.shape
    assert R % tile_i == 0 and R % tile_j == 0, (R, tile_i, tile_j)
    grid = (R // tile_i, R // tile_j)

    world = jnp.linspace(-radius, radius, R, dtype=jnp.float32)
    g = jnp.stack(jnp.meshgrid(world, world, world, indexing="ij"), axis=-1)
    bias_grid = jnp.linalg.norm(g, axis=-1) - bias_r  # [R, R, R]

    kern = functools.partial(_kernel, k_dim=R)
    sdf, deform = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, tile_j, H), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, R, H), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, R, H), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, tile_j, R), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_i, tile_j, R), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_i, tile_j, R), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, R, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R, R, R), jnp.float32),
        ],
        interpret=interpret,
    )(a_xy, a_xz, a_zy, w2blk, w3t, bias_grid)
    return sdf, deform


def _reference_slab(m_xy_s, m_xz_s, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
                    radius, bias_r, concat, world_x):
    """Unfused XLA expression for an x-SLAB of the grid.

    m_xy_s/m_xz_s: [R, S, C] (x restricted to the slab), m_zy: [R, R, C];
    world_x: [S] world x-coordinates of the slab. Returns (sdf [S, R, R],
    deform [3, S, R, R]).
    """
    R = m_zy.shape[0]
    S = m_xy_s.shape[1]
    xy = jnp.swapaxes(m_xy_s, 0, 1)[:, :, None, :]  # [S, y, 1, C]
    xz = jnp.swapaxes(m_xz_s, 0, 1)[:, None, :, :]  # [S, 1, z, C]
    zy = m_zy[None, :, :, :]  # [1, y, z, C]
    if concat:
        C = m_zy.shape[-1]
        feat = jnp.concatenate(
            [
                jnp.broadcast_to(xy, (S, R, R, C)),
                jnp.broadcast_to(xz, (S, R, R, C)),
                jnp.broadcast_to(zy, (S, R, R, C)),
            ],
            axis=-1,
        )
    else:
        feat = xy + xz + zy
    f = feat.reshape(-1, feat.shape[-1])

    def mlp(x, w1, w2, w3):
        h = jnp.maximum(x @ w1, 0.0)
        h = jnp.maximum(h @ w2, 0.0)
        return h @ w3

    sdf = mlp(f, w1s, w2s, w3s)[:, 0].reshape(S, R, R)
    deform = mlp(f, w1d, w2d, w3d).reshape(S, R, R, 3)
    world = jnp.linspace(-radius, radius, R)
    g = jnp.stack(
        jnp.meshgrid(world_x, world, world, indexing="ij"), axis=-1
    )
    sdf = sdf + jnp.linalg.norm(g, axis=-1) - bias_r
    return sdf, jnp.moveaxis(deform, -1, 0)


def _reference_field_grid(m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
                          radius, bias_r, concat):
    """The unfused XLA expression (ground truth + VJP recompute path)."""
    R = m_xy.shape[0]
    world = jnp.linspace(-radius, radius, R)
    sdf, deform = _reference_slab(
        m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
        radius, bias_r, concat, world,
    )
    return sdf, deform


def _prep(m_xy, m_xz, m_zy, w1s, w1d, w2s, w2d, w3s, w3d, concat):
    """Fold layer 1 into the plane resamples; build block-diagonal W2/W3."""
    H = w2s.shape[0] + w2d.shape[0]  # 128
    if concat:
        C = m_xy.shape[-1]
        w1s_p = (w1s[:C], w1s[C:2 * C], w1s[2 * C:])
        w1d_p = (w1d[:C], w1d[C:2 * C], w1d[2 * C:])
    else:
        w1s_p = (w1s, w1s, w1s)
        w1d_p = (w1d, w1d, w1d)
    # pre-transposed layouts: a_xy [x, y, H], a_xz [x, z, H], a_zy [y, z, H]
    a_xy = jnp.einsum("yxc,ch->xyh", m_xy,
                      jnp.concatenate([w1s_p[0], w1d_p[0]], axis=1))
    a_xz = jnp.einsum("zxc,ch->xzh", m_xz,
                      jnp.concatenate([w1s_p[1], w1d_p[1]], axis=1))
    a_zy = jnp.einsum("yzc,ch->yzh", m_zy,
                      jnp.concatenate([w1s_p[2], w1d_p[2]], axis=1))
    z12 = jnp.zeros((w2s.shape[0], w2d.shape[1]), jnp.float32)
    z21 = jnp.zeros((w2d.shape[0], w2s.shape[1]), jnp.float32)
    w2blk = jnp.block([[w2s, z12], [z21, w2d]])  # [H, H]
    w3 = jnp.block([
        [w3s, jnp.zeros((w3s.shape[0], 3), jnp.float32)],
        [jnp.zeros((w3d.shape[0], 1), jnp.float32), w3d],
    ])  # [H, 4]
    w3t = jnp.pad(w3.T, ((0, 4), (0, 0)))  # [8, H], rows = output channels
    return a_xy, a_xz, a_zy, w2blk, w3t


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12)
)
def fused_field_grid(m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
                     radius: float, bias_r: float, concat: bool,
                     interpret: bool = False):
    """SDF + deformation on the dense grid, fused.

    Args:
      m_xy/m_xz/m_zy: resampled planes [R, R, C] indexed [v, u] as produced
        by ``sample_triplane_on_grid``'s axis resample (u = 2nd plane axis).
      w1s/w2s/w3s: sdf VanillaMLP kernels ([Cin,64],[64,64],[64,1]).
      w1d/w2d/w3d: deformation net kernels ([Cin,64],[64,64],[64,3]).
      concat: geo_interpolate v2 (concat) vs v1 (sum).

    Returns (sdf [R,R,R], deform [3,R,R,R]) in fp32, axis order (x, y, z).
    """
    a_xy, a_xz, a_zy, w2blk, w3blk = _prep(
        m_xy, m_xz, m_zy, w1s, w1d, w2s, w2d, w3s, w3d, concat
    )
    return _pallas_forward(a_xy, a_xz, a_zy, w2blk, w3blk, radius, bias_r,
                           interpret=interpret)


def _fwd(m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
         radius, bias_r, concat, interpret):
    out = fused_field_grid(m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d,
                           radius, bias_r, concat, interpret)
    return out, (m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d)


def _bwd(radius, bias_r, concat, interpret, res, g):
    """Backward = recompute the unfused expression in x-SLABS.

    A whole-grid recompute materializes [R³, 128] fp32 intermediates (~2 GB
    at R=160) inside the training backward; slabbing bounds the recompute
    peak to R/n_slabs of that while producing identical gradients (the slabs
    partition the output and every parameter gradient is a sum over points).
    """
    m_xy, m_xz, m_zy, w1s, w2s, w3s, w1d, w2d, w3d = res
    g_sdf, g_def = g
    R = m_xy.shape[0]
    n_slabs = BWD_SLABS if R % BWD_SLABS == 0 else 1
    S = R // n_slabs
    world = jnp.linspace(-radius, radius, R)

    grads = None
    for s in range(n_slabs):
        sl = slice(s * S, (s + 1) * S)

        def f(mxy_s, mxz_s, mzy, a, b, c, d, e, h):
            return _reference_slab(
                mxy_s, mxz_s, mzy, a, b, c, d, e, h,
                radius, bias_r, concat, world[sl],
            )

        _, vjp = jax.vjp(
            f, m_xy[:, sl], m_xz[:, sl], m_zy, w1s, w2s, w3s, w1d, w2d, w3d
        )
        d = vjp((g_sdf[sl], g_def[:, sl]))
        if grads is None:
            grads = [
                jnp.zeros_like(m_xy), jnp.zeros_like(m_xz), d[2],
                d[3], d[4], d[5], d[6], d[7], d[8],
            ]
        else:
            grads[2] = grads[2] + d[2]
            for i in range(3, 9):
                grads[i] = grads[i] + d[i]
        grads[0] = grads[0].at[:, sl].set(d[0])
        grads[1] = grads[1].at[:, sl].set(d[1])
    return tuple(grads)


fused_field_grid.defvjp(_fwd, _bwd)
