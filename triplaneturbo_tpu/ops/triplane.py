"""Triplane feature fetch: plane rotation, projection and bilinear sampling.

Behavioral rebuild of the EG3D-style sampling path of the reference
(/root/reference/triplaneturbo_executable/utils/general_utils.py:62-110 and
custom/triplaneturbo/models/geometry/utils.py:111-161), designed TPU-first:

* plane projection is direct coordinate indexing (the reference bmm's with
  inverse plane bases; the three bases are involutions so the projections are
  simply (x,y), (x,z), (z,y) — no 3x3 matmuls needed);
* sampling is the AD-composable gather+lerp of :mod:`.grid_sample` (the
  reference dispatched to a CUDA grad² kernel when grads were required);
* layout is channels-last: space caches are ``[B, P, H, W, C]``.

Plane order convention (identical to the reference): within a 3-plane group,
index 0 is the XY plane, 1 the XZ plane, 2 the ZY plane; a 6-plane dual cache
stacks [geo_xy, geo_xz, geo_zy, tex_xy, tex_xz, tex_zy].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_2d, grid_sample_2d_packed, pack_2x2


def rotate_planes(space_cache: jax.Array, mode: Optional[str] = "v1") -> jax.Array:
    """Rotate plane feature maps to the generator's image convention.

    Matches the reference ``interpolate_encodings`` pre-rotation
    (triplaneturbo_executable/models/geometry/sd_dual_triplanes.py:213-250):
    v1: xy plane transposed (H<->W), xz plane rotated 180°, zy plane rotated
    90° clockwise. v2 differs only in the xy plane (row-wise flip).

    Args:
      space_cache: ``[B, P, H, W, C]`` with P % 3 == 0; plane index ``p % 3``
        selects the xy/xz/zy role.
      mode: None (no-op), "v1" or "v2".
    """
    if mode is None:
        return space_cache
    if mode not in ("v1", "v2"):
        raise ValueError(f"Unknown rotate_planes mode {mode}")
    B, P, H, W, C = space_cache.shape
    assert P % 3 == 0, "plane axis must be a multiple of 3"

    xy = space_cache[:, 0::3]
    xz = space_cache[:, 1::3]
    zy = space_cache[:, 2::3]

    if mode == "v1":
        xy_r = jnp.swapaxes(xy, 2, 3)  # transpose H/W
    else:  # v2: flip along W
        xy_r = jnp.flip(xy, axis=3)
    # rot90 k=2 over (H, W): flip both
    xz_r = jnp.flip(xz, axis=(2, 3))
    # rot90 k=-1 (clockwise) over (H, W): out[i, j] = in[H-1-j, i]
    zy_r = jnp.flip(jnp.swapaxes(zy, 2, 3), axis=3)

    out = jnp.stack([xy_r, xz_r, zy_r], axis=2)  # [B, P//3, 3, H', W', C]
    return out.reshape(B, P, *xy_r.shape[2:])


def project_onto_planes(coordinates: jax.Array) -> jax.Array:
    """Project 3D points onto the three canonical planes.

    Equivalent to the reference's inverse-plane-basis bmm
    (general_utils.py:68-81) with the EG3D bugfixed bases, which reduce to
    plain coordinate selection: plane0 -> (x, y), plane1 -> (x, z),
    plane2 -> (z, y).

    Args:
      coordinates: ``[..., 3]``.

    Returns:
      ``[..., 3, 2]`` per-plane 2D coordinates, (u, v) = (grid x, grid y).
    """
    x, y, z = coordinates[..., 0], coordinates[..., 1], coordinates[..., 2]
    p0 = jnp.stack([x, y], axis=-1)
    p1 = jnp.stack([x, z], axis=-1)
    p2 = jnp.stack([z, y], axis=-1)
    return jnp.stack([p0, p1, p2], axis=-2)


def sample_from_planes(
    plane_features: jax.Array,
    coordinates: jax.Array,
    interpolate_feat: Optional[str] = "v1",
    box_warp: float = 2.0,
) -> jax.Array:
    """Fetch per-point features from a 3-plane cache.

    Matches reference ``sample_from_planes`` (general_utils.py:84-103):
    scale coords by 2/box_warp, project onto planes, bilinearly sample each
    plane, then v1: sum over planes -> [N, M, C]; v2: concat -> [N, M, 3C].

    Args:
      plane_features: ``[N, 3, H, W, C]``.
      coordinates: ``[N, M, 3]`` world coords (typically in [-1, 1]).
    """
    N, n_planes, H, W, C = plane_features.shape
    assert n_planes == 3
    M = coordinates.shape[1]

    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(coords)  # [N, M, 3, 2]
    proj = jnp.swapaxes(proj, 1, 2)  # [N, 3, M, 2]

    # one packed row-gather per (plane, point) instead of four corner
    # gathers: random row-gathers dominate point sampling on v5e
    feats = grid_sample_2d_packed(
        pack_2x2(plane_features.reshape(N * 3, H, W, C)),
        proj.reshape(N * 3, M, 2),
    ).reshape(N, 3, M, C)

    if interpolate_feat in (None, "v1"):
        return feats.sum(axis=1)
    if interpolate_feat == "v2":
        return jnp.moveaxis(feats, 1, 2).reshape(N, M, 3 * C)
    raise ValueError(f"Unknown interpolate_feat {interpolate_feat}")


def sample_from_quaplanes(
    plane_features: jax.Array,  # [N, 4, H, W, C]
    coordinates: jax.Array,  # [N, M, 3]
    interpolate_feat: Optional[str] = "v1",
    box_warp: float = 2.0,
) -> jax.Array:
    """Quaplane variant: xy + xz + front-zy + back-zy planes.

    Behavioral rebuild of the reference's experimental quaplane sampler
    (custom/triplaneturbo/models/geometry/utils.py:165-211): plane bases give
    projections (x,y), (x,z), (z,y), (z,y); the two zy copies are blended as
    front (x>0) / back (x<0) features — hard select (None) or linear alpha
    (v1). Returns [N, M, 3C].
    """
    N, n_planes, H, W, C = plane_features.shape
    assert n_planes == 4
    M = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    projs = jnp.stack(
        [
            jnp.stack([x, y], -1),
            jnp.stack([x, z], -1),
            jnp.stack([z, y], -1),
            jnp.stack([z, y], -1),
        ],
        axis=1,
    )  # [N, 4, M, 2]
    feats = grid_sample_2d_packed(
        pack_2x2(plane_features.reshape(N * 4, H, W, C)),
        projs.reshape(N * 4, M, 2),
    ).reshape(N, 4, M, C)
    xy, xz, zy_front, zy_back = feats[:, 0], feats[:, 1], feats[:, 2], feats[:, 3]
    if interpolate_feat in (None, "none"):
        front = (x > 0)[..., None]
        zy = jnp.where(front, zy_front, zy_back)
    elif interpolate_feat == "v1":
        a_front = (0.5 + 0.5 * x)[..., None]
        zy = a_front * zy_front + (1.0 - a_front) * zy_back
    else:
        raise ValueError(f"Unknown quaplane interpolate_feat {interpolate_feat}")
    return jnp.concatenate([xy, xz, zy], axis=-1)


def sample_from_hplanes(
    plane_features: jax.Array,  # [N, 3, H, W, C]
    coordinates: jax.Array,
    interpolate_feat: Optional[str] = "v1",
    box_warp: float = 2.0,
) -> jax.Array:
    """H-plane variant: one side (xz) plane + front/back zy planes.

    Rebuild of sample_from_Hplanes (geometry/utils.py:213-362) for the
    full variant set: None (hard front/back select -> 2C), v1 (linear
    front/back alpha -> 2C), v2 (side weighted by 1-|y|, front/back by x ->
    3C), v3 (trapezoid front/back masks with 0.5 thresholds -> 3C), v4
    (v3's trapezoid alphas but summed over planes -> C), v5 (linear alphas
    summed -> C), v6 (learned per-plane sigmoid alpha from the last feature
    channel, summed -> C-1), v7 (v6's learned alpha plus v5's linear bias ->
    C-1).
    """
    N, n_planes, H, W, C = plane_features.shape
    assert n_planes == 3
    M = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    projs = jnp.stack(
        [
            jnp.stack([x, z], -1),
            jnp.stack([z, y], -1),
            jnp.stack([z, y], -1),
        ],
        axis=1,
    )
    feats = grid_sample_2d_packed(
        pack_2x2(plane_features.reshape(N * 3, H, W, C)),
        projs.reshape(N * 3, M, 2),
    ).reshape(N, 3, M, C)
    side, front_f, back_f = feats[:, 0], feats[:, 1], feats[:, 2]
    xe = x[..., None]
    if interpolate_feat in (None, "none"):
        fb = jnp.where((x > 0)[..., None], front_f, back_f)
        return jnp.concatenate([side, fb], axis=-1)
    if interpolate_feat == "v1":
        a = 0.5 + 0.5 * xe
        fb = a * front_f + (1.0 - a) * back_f
        return jnp.concatenate([side, fb], axis=-1)
    if interpolate_feat == "v2":
        a_side = 1.0 - jnp.abs(y)[..., None]
        a_front = 0.5 + 0.5 * xe
        a_back = 0.5 - 0.5 * xe
        return jnp.concatenate(
            [side * a_side, front_f * a_front, back_f * a_back], axis=-1
        )
    def trapezoid(thres):
        a_hi = 1.0 - (xe - thres) / (1.0 - thres)
        a_lo = (xe + 1.0) / (thres + 1.0)
        return jnp.where(xe > thres, a_hi, a_lo)

    if interpolate_feat == "v3":
        return jnp.concatenate(
            [side, front_f * trapezoid(0.5), back_f * trapezoid(-0.5)], axis=-1
        )
    if interpolate_feat == "v4":
        return side + front_f * trapezoid(0.5) + back_f * trapezoid(-0.5)
    if interpolate_feat == "v5":
        return side + front_f * (0.5 + 0.5 * xe) + back_f * (0.5 - 0.5 * xe)
    if interpolate_feat == "v6":
        alpha = jax.nn.sigmoid(feats[..., -1:])  # [N, 3, M, 1]
        return (feats[..., :-1] * alpha).sum(axis=1)
    if interpolate_feat == "v7":
        zeros = jnp.zeros_like(xe)
        bias = jnp.stack(
            [zeros, 0.5 + 0.5 * xe, 0.5 - 0.5 * xe], axis=1
        )  # [N, 3, M, 1]
        alpha = jax.nn.sigmoid(feats[..., -1:]) + bias
        return (feats[..., :-1] * alpha).sum(axis=1)
    raise ValueError(f"Hplane interpolate_feat {interpolate_feat} not implemented")


def get_trilinear_feature(points: jax.Array, voxel: jax.Array) -> jax.Array:
    """Trilinear fetch from a dense voxel grid (geometry/utils.py:364-376).

    points: [N, M, 3] in [-1, 1]; voxel: [N, D, H, W, C] -> [N, M, C].
    """
    from .grid_sample import grid_sample_3d

    return grid_sample_3d(voxel, points)


def bilinear_interp_matrix(out_coords: jax.Array, in_size: int) -> jax.Array:
    """Dense ``[n_out, in_size]`` bilinear interpolation matrix.

    Row r reproduces ``grid_sample`` semantics (align_corners=False, zeros
    padding) for normalized coordinate ``out_coords[r]`` along an axis of
    ``in_size`` texels: at most two taps, border rows sum < 1 (zeros pad).

    This is the no-gather fast path for sampling planes on a REGULAR grid:
    the matmul ``A_v @ plane @ A_u^T`` equals per-point bilinear fetches but
    runs on the MXU (SURVEY §2.6 #1 perf note).
    """
    n = out_coords.shape[0]
    ix = ((out_coords + 1.0) * in_size - 1.0) * 0.5
    i0 = jnp.floor(ix)
    w1 = ix - i0
    w0 = 1.0 - w1
    cols = jnp.arange(in_size)[None, :]
    m0 = (cols == i0[:, None].astype(jnp.int32)) & (i0[:, None] >= 0) & (i0[:, None] <= in_size - 1)
    i1 = i0 + 1
    m1 = (cols == i1[:, None].astype(jnp.int32)) & (i1[:, None] >= 0) & (i1[:, None] <= in_size - 1)
    return m0 * w0[:, None] + m1 * w1[:, None]


def resample_triplane_axes(
    planes: jax.Array,  # [3, H, W, C] rotated geo planes (xy, xz, zy)
    coords: jax.Array,  # [R] normalized grid coords in [-1, 1] (per axis)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Axis-resample the three planes onto the regular grid coordinates.

    Returns (m_xy [y,x,C], m_xz [z,x,C], m_zy [y,z,C]) such that the dense
    triplane feature is ``m_xy[j,i] ? m_xz[k,i] ? m_zy[j,k]`` (sum for v1,
    concat for v2) — the shared front half of :func:`sample_triplane_on_grid`
    and the fused TPU field kernel (ops.field_grid_pallas).
    """
    H, W = planes.shape[1], planes.shape[2]
    Av = bilinear_interp_matrix(coords, H)  # rows index the v (height) axis
    Au = bilinear_interp_matrix(coords, W)

    def resample(p):  # [H, W, C] -> [R, R, C] indexed [v, u]
        return jnp.einsum("vh,hwc,uw->vuc", Av, p, Au)

    return resample(planes[0]), resample(planes[1]), resample(planes[2])


def sample_triplane_on_grid(
    planes: jax.Array,  # [3, H, W, C] rotated geo planes (xy, xz, zy)
    coords: jax.Array,  # [R] normalized grid coords in [-1, 1] (per axis)
    interpolate_feat: str = "v1",
) -> jax.Array:
    """Triplane features for the full regular grid, gather-free.

    Exactly equivalent to ``sample_from_planes`` evaluated at the dense
    meshgrid of ``coords`` (axis order x, y, z), but built from three tiny
    axis-resamples + broadcasts: feat[i,j,k] = XY[j,i] + XZ[k,i] + ZY[j,k]
    (v1 sum) — no random memory access, MXU-only.

    Returns [R, R, R, C] (v1) or [R, R, R, 3C] (v2 concat, order xy|xz|zy).
    """
    m_xy, m_xz, m_zy = resample_triplane_axes(planes, coords)
    # m_xy [y, x, C], m_xz [z, x, C], m_zy [y, z, C]

    xy = jnp.swapaxes(m_xy, 0, 1)[:, :, None, :]  # [x, y, 1, C]
    xz = jnp.swapaxes(m_xz, 0, 1)[:, None, :, :]  # [x, 1, z, C]
    zy = m_zy[None, :, :, :]  # [1, y, z, C]
    if interpolate_feat in (None, "v1"):
        return xy + xz + zy
    if interpolate_feat == "v2":
        R = coords.shape[0]
        C = planes.shape[-1]
        return jnp.concatenate(
            [
                jnp.broadcast_to(xy, (R, R, R, C)),
                jnp.broadcast_to(xz, (R, R, R, C)),
                jnp.broadcast_to(zy, (R, R, R, C)),
            ],
            axis=-1,
        )
    raise ValueError(f"Unknown interpolate_feat {interpolate_feat}")


def scale_tensor(dat, inp_scale, tgt_scale):
    """Affine rescale from ``inp_scale`` range to ``tgt_scale`` range.

    Same contract as the reference helper (general_utils.py:12-25); scales may
    be 2-tuples or ``[2, D]`` arrays (e.g. a bbox).
    """
    if inp_scale is None:
        inp_scale = (0, 1)
    if tgt_scale is None:
        tgt_scale = (0, 1)
    dat = (dat - inp_scale[0]) / (inp_scale[1] - inp_scale[0])
    return dat * (tgt_scale[1] - tgt_scale[0]) + tgt_scale[0]


def contract_to_unisphere(x: jax.Array, bbox: jax.Array, unbounded: bool = False) -> jax.Array:
    """Rescale points from bbox to [-1, 1]^3 (general_utils.py:27-39).

    The unbounded branch smoothly contracts far-field points; TriplaneTurbo
    always runs bounded.
    """
    if not unbounded:
        return scale_tensor(x, bbox, (-1, 1))
    x = scale_tensor(x, bbox, (-1, 1))
    x = x * 2 - 1
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mask = (mag[..., 0] > 1)[..., None]
    contracted = (2 - 1 / jnp.maximum(mag, 1e-8)) * (x / jnp.maximum(mag, 1e-8))
    x = jnp.where(mask, contracted, x)
    return x / 4 + 0.5
