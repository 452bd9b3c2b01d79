"""Eval-view mesh rendering: the in-framework kire replacement.

The reference renders exported OBJs with the kiuikit `kire` OpenGL/CUDA
viewer over a GPU subprocess pool (/root/reference/evaluation/
mesh_visualize.py:38-91: 4 azimuths, elevation -15°, 512², front +y).
TPU-native: render with our own rasterizer — same camera rig, no subprocesses
(SURVEY §2.6 #10).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rasterize import antialias, interpolate, rasterize
from ..utils.camera import camera_rig_np
from ..utils.mesh import Mesh


def kire_normalize_mesh(
    v_pos: jnp.ndarray,
    v_mask: Optional[jnp.ndarray] = None,
    bound: float = 0.9,
) -> jnp.ndarray:
    """kiui.mesh.Mesh.load auto-resize: center the mesh and scale so the
    largest axis extent fills [-bound, bound] (kiuikit defaults resize=True,
    bound=0.9). kire applies this on OBJ load, so the eval framing is
    size-invariant — required for CLIP-score parity with the reference
    (mesh_visualize.py renders through kire)."""
    if v_mask is not None:
        big = jnp.where(v_mask[:, None], v_pos, -jnp.inf)
        small = jnp.where(v_mask[:, None], v_pos, jnp.inf)
        vmax, vmin = big.max(axis=0), small.min(axis=0)
    else:
        vmax, vmin = v_pos.max(axis=0), v_pos.min(axis=0)
    center = (vmax + vmin) / 2
    scale = 2.0 * bound / jnp.maximum(jnp.max(vmax - vmin), 1e-8)
    out = (v_pos - center) * scale
    return jnp.where(v_mask[:, None], out, 0.0) if v_mask is not None else out


def kire_camera_rig(n_views: int = 4, elevation_deg: float = -15.0, radius: float = 3.0, fovy_deg: float = 50.0):
    """The mesh_visualize camera rig, [n_views, 4, 4] mvp.

    CLI-pinned values (reference evaluation/mesh_visualize.py:38-41):
    4 azimuths, elevation -15°, 512², front +y (view 0 = azimuth 90°, see the
    `(azi - 90) % 360` rename at :31-34). Remaining values are kiuikit's
    kire defaults (kiui/render.py argparse): radius=3, fovy=50°, with the
    OrbitCamera near=0.01. Meshes must be kire-normalized first
    (:func:`kire_normalize_mesh`).

    Computed host-side in NumPy (``camera_rig_np``): this rig is a constant
    inside the jitted renderer, and on this environment's backends XLA's
    compile-time constant folder corrupts constant camera math expressed as
    traced ops (NaN mvp at azimuth 2π → view 3 rendered empty in every eval
    grid, garbage inverse at π/2 → camera inside the mesh). A NumPy literal
    cannot be folded wrong."""
    azim = np.linspace(0, 360, n_views, endpoint=False) + 90.0  # front +y
    elev = np.full(n_views, elevation_deg)
    return jnp.asarray(
        camera_rig_np(elev, azim, radius, fovy_deg, 1.0, 0.01, 100.0)
    )


import functools


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_views", "height", "width", "elevation_deg", "bg_color",
        "lambertian", "faces_per_tile",
    ),
)
def _render_views_jit(
    v_pos, t_pos_idx, v_mask, t_mask, v_rgb,
    *, n_views, height, width, elevation_deg, bg_color, lambertian, faces_per_tile,
):
    mesh = Mesh(v_pos=v_pos, t_pos_idx=t_pos_idx, v_mask=v_mask, t_mask=t_mask)
    mvp = kire_camera_rig(n_views, elevation_deg)
    v_pos = kire_normalize_mesh(mesh.v_pos, mesh.v_mask)
    v_nrm = mesh.vertex_normals()
    bg = jnp.ones((height, width, 3)) * jnp.asarray(bg_color)

    vh = jnp.concatenate([v_pos, jnp.ones_like(v_pos[:, :1])], axis=-1)

    def one_view(_, mvp_v):
        # scan (not a Python loop): the per-view rasterize graph is large at
        # 512² and unrolling 4 copies OOM-kills the memory-capped remote
        # compile helper (CLAUDE.md) — scanning compiles the body once
        clip = vh @ mvp_v.T
        # span-4 binning + global big-face list: kire-normalized MC meshes
        # project to ~1 px triangles at 512² (160³ grid, bound 0.9, radius-3
        # rig), so 4 tiles per axis covers the bulk; the rare image-sized
        # triangle (test geometry, imported OBJs) goes to the big-face list
        # every tile tests. Raising max_span instead costs F·span² sort
        # entries — span=H/16 put 201M pairs into lax.sort and OOM-killed
        # the memory-capped remote compile helper.
        rast = rasterize(
            clip, mesh.t_pos_idx, mesh.t_mask, height, width,
            faces_per_tile=faces_per_tile, max_span=4, big_face_cap=256,
        )
        rgb = interpolate(v_rgb, rast, mesh.t_pos_idx)
        if lambertian:
            nrm = interpolate(v_nrm, rast, mesh.t_pos_idx)
            # headlight along the camera ray: shade by |n·view|
            cam_dir = -mvp_v[2, :3] / jnp.linalg.norm(mvp_v[2, :3])
            lam = jnp.abs((nrm * cam_dir).sum(-1, keepdims=True))
            rgb = rgb * (0.3 + 0.7 * lam)
        img = jnp.where(rast.mask[..., None], rgb, bg)
        return None, antialias(img, rast, bg)

    _, frames = jax.lax.scan(one_view, None, mvp)
    return jnp.clip(frames, 0.0, 1.0)


def render_mesh_views(
    mesh: Mesh,
    n_views: int = 4,
    height: int = 512,
    width: int = 512,
    elevation_deg: float = -15.0,
    bg_color=(1.0, 1.0, 1.0),
    lambertian: bool = True,
    faces_per_tile: int = 2048,
) -> jnp.ndarray:
    """Render vertex-colored mesh turntable views, [V, H, W, 3] in [0,1].

    Simple headlight-Lambertian shading like kire's default view mode.
    Applies kire's load-time mesh normalization (bound 0.9) before the rig.
    ONE jitted program per (capacity, resolution) signature: eager op-by-op
    execution is pathological over the tunneled backend (~200 ms per
    dispatch round trip), and fixed-capacity mesh buffers make the compiled
    program reusable across every mesh of the same export config.
    """
    v_rgb = mesh.v_rgb if mesh.v_rgb is not None else jnp.ones_like(mesh.v_pos) * 0.7
    return _render_views_jit(
        mesh.v_pos, mesh.t_pos_idx, mesh.v_mask, mesh.t_mask, v_rgb,
        n_views=n_views, height=height, width=width,
        elevation_deg=float(elevation_deg), bg_color=tuple(bg_color),
        lambertian=lambertian, faces_per_tile=faces_per_tile,
    )
