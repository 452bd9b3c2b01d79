"""Camera math: ray generation, projection/MVP matrices, spherical rigs.

Rebuild of the reference camera utilities
(/root/reference/threestudio/utils/ops.py:194-392) in JAX/numpy. OpenGL
camera convention (x right, y up, -z forward); world convention follows the
reference data module (+z up, cameras parameterized by elevation/azimuth,
custom/triplaneturbo/data/multiview_multiprompt_dualrender_multistep_v2.py:224-340).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_ray_directions(
    H: int, W: int, fovy: jax.Array, use_pixel_centers: bool = True
) -> jax.Array:
    """Per-pixel camera-frame ray directions for a batch of fovy values.

    fovy: [B] in radians. Returns [B, H, W, 3] (unnormalized, -z forward).
    """
    center = 0.5 if use_pixel_centers else 0.0
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + center,
        jnp.arange(H, dtype=jnp.float32) + center,
        indexing="xy",
    )
    focal = 0.5 * H / jnp.tan(0.5 * fovy)  # [B]
    cx, cy = W / 2.0, H / 2.0
    dirs = jnp.stack(
        [
            (i[None] - cx) / focal[:, None, None],
            -(j[None] - cy) / focal[:, None, None],
            -jnp.ones((1, H, W)) * jnp.ones_like(focal)[:, None, None],
        ],
        axis=-1,
    )
    return dirs


def get_rays(
    directions: jax.Array,  # [B, H, W, 3] camera frame
    c2w: jax.Array,  # [B, 4, 4]
    keepdim: bool = True,
    normalize: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    rays_d = jnp.einsum("bhwc,bkc->bhwk", directions, c2w[:, :3, :3])
    rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    if normalize:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if not keepdim:
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
    return rays_o, rays_d


def camera_to_world(
    elevation: jax.Array,  # [B] radians
    azimuth: jax.Array,  # [B] radians
    distance: jax.Array,  # [B]
    center: Optional[jax.Array] = None,  # [B, 3]
    up_world: Tuple[float, float, float] = (0.0, 0.0, 1.0),
) -> jax.Array:
    """Spherical camera -> c2w [B, 4, 4] (lookat center, +z world up;
    data module v2 :273-316)."""
    B = elevation.shape[0]
    pos = jnp.stack(
        [
            distance * jnp.cos(elevation) * jnp.cos(azimuth),
            distance * jnp.cos(elevation) * jnp.sin(azimuth),
            distance * jnp.sin(elevation),
        ],
        axis=-1,
    )
    if center is None:
        center = jnp.zeros((B, 3))
    up = jnp.broadcast_to(jnp.asarray(up_world), (B, 3))
    lookat = center - pos
    lookat = lookat / jnp.linalg.norm(lookat, axis=-1, keepdims=True)
    right = jnp.cross(lookat, up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    up2 = jnp.cross(right, lookat)
    # OpenGL c2w: columns = [right, up, -forward, position]
    rot = jnp.stack([right, up2, -lookat], axis=-1)  # [B, 3, 3]
    c2w = jnp.concatenate([rot, pos[..., None]], axis=-1)  # [B, 3, 4]
    bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1, 4))
    return jnp.concatenate([c2w, bottom], axis=1)


def get_projection_matrix(fovy: jax.Array, aspect: float, near: float, far: float) -> jax.Array:
    """OpenGL perspective projection [B, 4, 4] (threestudio/utils/ops.py:346-365:
    row-1 negated so rasterized images are y-down)."""
    B = fovy.shape[0]
    f = 1.0 / jnp.tan(fovy / 2.0)
    proj = jnp.zeros((B, 4, 4))
    proj = proj.at[:, 0, 0].set(f / aspect)
    proj = proj.at[:, 1, 1].set(-f)
    proj = proj.at[:, 2, 2].set(-(far + near) / (far - near))
    proj = proj.at[:, 2, 3].set(-2.0 * far * near / (far - near))
    proj = proj.at[:, 3, 2].set(-1.0)
    return proj


def camera_rig_np(
    elevation_deg,
    azimuth_deg,
    radius,
    fovy_deg,
    aspect: float = 1.0,
    near: float = 0.01,
    far: float = 100.0,
    up_world=(0.0, 0.0, 1.0),
):
    """Host-side (NumPy, float64) twin of camera_to_world + projection + mvp
    for CONSTANT camera rigs, returned as float32 ndarray [B, 4, 4].

    Use this — not the traced jnp path — whenever the rig is a compile-time
    constant (eval turntables, fixed validation cameras). Measured on this
    environment's backends: XLA's compile-time constant folder corrupts
    constant camera math that is expressed as traced ops — the batched LU of
    ``jnp.linalg.inv`` folds unpivoted (NaN at azimuth 2π on TPU and CPU),
    and the tunneled TPU backend's folder additionally NaNs
    ``camera_to_world`` itself on the last batch element. A NumPy-computed
    rig embeds as a literal, which no folding pass can touch."""
    import numpy as np

    elev = np.deg2rad(np.asarray(elevation_deg, np.float64))
    azim = np.deg2rad(np.asarray(azimuth_deg, np.float64))
    dist = np.broadcast_to(np.asarray(radius, np.float64), elev.shape)
    B = elev.shape[0]
    pos = np.stack(
        [
            dist * np.cos(elev) * np.cos(azim),
            dist * np.cos(elev) * np.sin(azim),
            dist * np.sin(elev),
        ],
        axis=-1,
    )
    up = np.broadcast_to(np.asarray(up_world, np.float64), (B, 3))
    lookat = -pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    right = np.cross(lookat, up)
    right = right / np.linalg.norm(right, axis=-1, keepdims=True)
    up2 = np.cross(right, lookat)
    R = np.stack([right, up2, -lookat], axis=-1)  # [B, 3, 3] columns
    # rigid inverse: w2c = (R^T, -R^T t)
    Rt = np.swapaxes(R, -1, -2)
    w2c = np.zeros((B, 4, 4))
    w2c[:, :3, :3] = Rt
    w2c[:, :3, 3] = -np.einsum("bij,bj->bi", Rt, pos)
    w2c[:, 3, 3] = 1.0
    f = 1.0 / np.tan(np.deg2rad(np.asarray(fovy_deg, np.float64)) / 2.0)
    f = np.broadcast_to(f, (B,))
    proj = np.zeros((B, 4, 4))
    proj[:, 0, 0] = f / aspect
    proj[:, 1, 1] = -f  # y-down images (threestudio/utils/ops.py:346-365)
    proj[:, 2, 2] = -(far + near) / (far - near)
    proj[:, 2, 3] = -2.0 * far * near / (far - near)
    proj[:, 3, 2] = -1.0
    return np.einsum("bij,bjk->bik", proj, w2c).astype(np.float32)


def rigid_inverse(c2w: jax.Array) -> jax.Array:
    """Analytic inverse of a rigid transform [..., 4, 4]: (R, t)⁻¹ = (Rᵀ, -Rᵀt).

    NOT a micro-optimization of ``jnp.linalg.inv``: general LU on a
    camera-to-world matrix is numerically fragile when the rotation has
    near-zero entries (axis-aligned azimuths like 90°/180°/270°/360° produce
    |sin| ~ 1e-7 float32 residues), and XLA's compile-time constant folder
    evaluates the batched inverse of constant camera rigs through an
    unpivoted path — measured on both TPU and CPU backends producing NaN
    (azimuth 2π) and silently-garbage finite inverses (azimuth π/2: camera
    placed inside the mesh) for the kire eval rig. The analytic form is
    exact for orthonormal R, constant-folds safely, and avoids the LU
    custom call entirely."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -(Rt @ t)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], c2w.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def get_mvp_matrix(c2w: jax.Array, proj: jax.Array) -> jax.Array:
    """[B, 4, 4] model-view-projection = proj @ inverse(c2w).

    The inverse is the analytic rigid inverse (see :func:`rigid_inverse` for
    why general LU is wrong here)."""
    w2c = rigid_inverse(c2w)
    return jnp.einsum("bij,bjk->bik", proj, w2c)


def mvdream_normalize_camera(c2w: jax.Array) -> jax.Array:
    """Translate cameras onto the unit sphere and flatten to 16-d conditioning
    (extern/mvdream/camera_utils.py:5-27)."""
    pos = c2w[:, :3, 3]
    norm = jnp.linalg.norm(pos, axis=-1, keepdims=True)
    new_pos = pos / jnp.maximum(norm, 1e-8)
    out = c2w.at[:, :3, 3].set(new_pos)
    return out.reshape(out.shape[0], 16)
