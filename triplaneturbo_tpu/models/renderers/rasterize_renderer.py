"""Generative-space mesh rasterize renderer (first renderer of the dual pair).

Rebuild of ``generative-space-mesh-rasterize-renderer``
(/root/reference/custom/triplaneturbo/models/renderers/
generative_space_mesh_rasterize_renderer.py:106-536): per space-cache item,
evaluate the SDF/deformation field on a dense grid, damp its gradients
(sdf_grad_shrink/def_grad_shrink = 0.001), extract a mesh (InstantMesh-style
center/border forcing when the field has no crossing), rasterize each view,
interpolate depth/normals/positions, query the texture field at pixel
positions, compose with the (hypernet) background, and antialias.

TPU-native differences (documented):
  * fixed-capacity meshes + masked rasterization instead of dynamic topology;
  * depth is the interpolated clip-space w (= camera-axis distance) — the
    reference interpolates clip z, which for its near/far equals w up to a
    tiny affine factor (:152-156);
  * the texture MLP runs on all pixels with masking rather than a gathered
    visible subset (static shapes; same math where mask=1);
  * antialias is the screen-space edge blend of ops/rasterize.py (reference
    damps these gradients by 1000x anyway).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

import triplaneturbo_tpu as ttt

from ...ops.isosurface import extract_isosurface, force_field_crossing
from ...utils.ops import safe_normalize
from ...ops.rasterize import RasterOut, antialias, interpolate, rasterize
from ...utils.mesh import Mesh


@dataclass
class RasterizeRendererConfig:
    radius: float = 1.0
    isosurface_resolution: int = 160
    sdf_grad_shrink: float = 0.001
    def_grad_shrink: float = 0.001
    enable_bg_rays: bool = True
    normal_direction: str = "camera"
    # sized for "mc" output rates; double both for "mt"
    max_verts: int = 98304
    max_faces: int = 196608
    # "mc" matches the reference's diso DiffMC (marching cubes) topology
    isosurface_method: str = "mc"
    field_chunk: int = 262144
    tile: int = 16
    faces_per_tile: int = 1024
    # MC triangles are ~one grid cell (< 3 px at 256²/R128), so a face bbox
    # straddles at most 2 tiles per axis; binning cost scales with span², and
    # n_span_overflow counts (and the trainer logs) any violation.
    max_span: int = 2
    isosurface_deformable_grid: bool = True


@ttt.register("generative-space-mesh-rasterize-renderer")
class GenerativeSpaceMeshRasterizeRenderer:
    """Stateless functional renderer; field/background closures carry params."""

    def __init__(self, cfg: RasterizeRendererConfig = None):
        self.cfg = cfg or RasterizeRendererConfig()

    # -- isosurface ---------------------------------------------------------

    def isosurface(
        self,
        space_cache: jax.Array,  # [Bsc, 6, H, W, C]
        forward_field: Callable,  # (points [B, N, 3], cache [B,...]) -> (sdf, deform)
        sdf_grad_shrink: Optional[float] = None,
        def_grad_shrink: Optional[float] = None,
        forward_field_grid: Optional[Callable] = None,  # (cache [1,...], R) fast path
    ):
        """Extract one fixed-capacity mesh per space-cache item
        (reference isosurface :428-536)."""
        cfg = self.cfg
        R = cfg.isosurface_resolution
        sgs = cfg.sdf_grad_shrink if sdf_grad_shrink is None else sdf_grad_shrink
        dgs = cfg.def_grad_shrink if def_grad_shrink is None else def_grad_shrink
        Bsc = space_cache.shape[0]

        lin = jnp.linspace(-1.0, 1.0, R)
        grid = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
        n = grid.shape[0]
        chunk = min(cfg.field_chunk, n)
        n_chunks = (n + chunk - 1) // chunk
        pad = n_chunks * chunk - n
        grid_p = jnp.pad(grid, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

        meshes = []
        for i in range(Bsc):
            cache_i = space_cache[i : i + 1]

            if forward_field_grid is not None:
                sdf, deform = forward_field_grid(cache_i, R)
                sdf = sdf.reshape(-1)
                if deform is None:
                    deform = jnp.zeros((n, 3), sdf.dtype)
            else:
                def eval_chunk(pts):
                    sdf_, deform_ = forward_field(pts[None], cache_i)
                    if deform_ is None:
                        deform_ = jnp.zeros_like(pts)[None]
                    return sdf_[0, :, 0], deform_[0]

                sdf, deform = jax.lax.map(eval_chunk, grid_p)
                sdf = sdf.reshape(-1)[:n]
                deform = deform.reshape(-1, 3)[:n]

            # gradient damping (:449-465; reference reuses sdf_grad_shrink for
            # the deformation term — behavior preserved via dgs default)
            sdf = sgs * sdf + (1.0 - sgs) * jax.lax.stop_gradient(sdf)
            deform = dgs * deform + (1.0 - dgs) * jax.lax.stop_gradient(deform)

            sdf = force_field_crossing(sdf, R)
            m = extract_isosurface(
                sdf.reshape(R, R, R),
                deform.reshape(R, R, R, 3) if cfg.isosurface_deformable_grid else None,
                method=cfg.isosurface_method,
                max_verts=cfg.max_verts,
                max_faces=cfg.max_faces,
            )
            mesh = Mesh(
                v_pos=m.verts * 2.0 - 1.0,  # [0,1] -> world [-1,1]
                t_pos_idx=m.faces,
                v_mask=m.vert_mask,
                t_mask=m.face_mask,
            )
            meshes.append(mesh)
        return meshes

    # -- forward ------------------------------------------------------------

    def __call__(
        self,
        mvp_mtx: jax.Array,  # [B, 4, 4]
        camera_positions: jax.Array,  # [B, 3]
        space_cache: jax.Array,  # [Bsc, ...]
        forward_field: Callable,
        export_fn: Callable,  # (points [B, N, 3], cache) -> features [B, N, C]
        material_fn: Callable,  # features -> rgb
        background_fn: Callable,  # (dirs [B,H,W,3], text_embed) -> rgb
        height: int,
        width: int,
        text_embed: Optional[jax.Array] = None,
        rays_d_rasterize: Optional[jax.Array] = None,
        camera_distances: Optional[jax.Array] = None,
        c2w: Optional[jax.Array] = None,
        render_rgb: bool = True,
        sdf_grad_shrink: Optional[float] = None,
        def_grad_shrink: Optional[float] = None,
        forward_field_grid: Optional[Callable] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        B = mvp_mtx.shape[0]
        Bsc = space_cache.shape[0]
        nv_per = B // Bsc

        meshes = self.isosurface(
            space_cache, forward_field, sdf_grad_shrink, def_grad_shrink,
            forward_field_grid=forward_field_grid,
        )

        outs = []
        for i, mesh in enumerate(meshes):
            vn = mesh.vertex_normals()
            sl = slice(i * nv_per, (i + 1) * nv_per)
            views = []
            for v in range(nv_per):
                vi = i * nv_per + v
                vh = jnp.concatenate([mesh.v_pos, jnp.ones_like(mesh.v_pos[:, :1])], axis=-1)
                v_clip = vh @ mvp_mtx[vi].T
                rast = rasterize(
                    v_clip, mesh.t_pos_idx, mesh.t_mask, height, width,
                    tile=cfg.tile, faces_per_tile=cfg.faces_per_tile,
                    max_span=cfg.max_span,
                )
                views.append((v_clip, rast))

            mask = jnp.stack([r.mask for _, r in views]).astype(jnp.float32)[..., None]
            # depth: interpolated clip w == camera-axis distance
            depth = jnp.stack(
                [interpolate(vc[:, 3:4], r, mesh.t_pos_idx) for vc, r in views]
            )
            gb_normal = jnp.stack(
                [interpolate(vn, r, mesh.t_pos_idx) for _, r in views]
            )
            # safe_normalize: non-hit pixels interpolate to EXACT zeros; the
            # max(norm, eps) form NaNs their backward (utils/ops.py)
            gb_normal = safe_normalize(gb_normal)
            gb_pos = jnp.stack(
                [interpolate(mesh.v_pos, r, mesh.t_pos_idx) for _, r in views]
            )

            out: Dict[str, Any] = {}
            # antialiased opacity
            zeros = jnp.zeros_like(mask)
            mask_aa = jnp.stack(
                [antialias(mask[v], views[v][1], zeros[v]) for v in range(nv_per)]
            )
            out["opacity"] = mask_aa
            out["depth"] = depth

            if camera_distances is not None:
                far = camera_distances[sl].reshape(-1, 1, 1, 1) + jnp.sqrt(3.0)
                near = camera_distances[sl].reshape(-1, 1, 1, 1) - jnp.sqrt(3.0)
                disparity = (far - jnp.minimum(depth, far)) / (far - near)
                disparity = jnp.clip(disparity, 0.0, 1.0) * mask
                out["disparity"] = disparity

            out["comp_normal"] = ((gb_normal + 1.0) / 2.0) * mask  # in [0,1]

            if cfg.normal_direction == "camera" and c2w is not None:
                # rigid c2w: inverse rotation = transpose (see camera.rigid_inverse)
                w2c_rot = jnp.swapaxes(c2w[sl][:, :3, :3], -1, -2)
                n_cam = jnp.einsum("vhwc,vkc->vhwk", gb_normal, w2c_rot)
                n_cam = n_cam * jnp.asarray([-1.0, 1.0, 1.0])
                n_cam = safe_normalize(n_cam)
                n_cam01 = (n_cam + 1.0) / 2.0
                bg_n = jnp.ones_like(n_cam01) * jnp.asarray([0.5, 0.5, 1.0])
                bg_w = jnp.ones_like(n_cam01)
                out["comp_normal_cam_vis"] = n_cam01 * mask + bg_n * (1 - mask)
                out["comp_normal_cam_vis_white"] = n_cam01 * mask + bg_w * (1 - mask)

            if render_rgb:
                pts = gb_pos.reshape(1, -1, 3)
                n_pts = pts.shape[1]
                cache_i = space_cache[i : i + 1]
                if cfg.field_chunk and n_pts > cfg.field_chunk:
                    # chunked + rematted per-pixel feature eval: bounds the
                    # backward-pass MLP temps to one chunk (same memory knob
                    # as the grid eval above / volume renderer field_chunk)
                    ch = cfg.field_chunk
                    n_ch = (n_pts + ch - 1) // ch
                    pad = n_ch * ch - n_pts
                    pts_c = jnp.moveaxis(
                        jnp.pad(pts, ((0, 0), (0, pad), (0, 0))).reshape(1, n_ch, ch, 3),
                        1, 0,
                    )
                    feats = jax.lax.map(
                        jax.checkpoint(lambda p: export_fn(p, cache_i)), pts_c
                    )
                    feats = jnp.moveaxis(feats, 0, 1).reshape(1, n_ch * ch, -1)[:, :n_pts]
                else:
                    feats = export_fn(pts, cache_i)
                feats = feats.reshape(nv_per, height, width, -1)
                rgb_fg = material_fn(feats)
                if rays_d_rasterize is not None and cfg.enable_bg_rays:
                    view_dirs = rays_d_rasterize[sl]
                else:
                    cam = camera_positions[sl][:, None, None, :]
                    view_dirs = gb_pos - cam
                    view_dirs = safe_normalize(view_dirs)
                te = text_embed[i : i + 1] if text_embed is not None else None
                rgb_bg = background_fn(view_dirs, te)
                gb_rgb = rgb_bg * (1 - mask) + rgb_fg * mask
                gb_rgb_aa = jnp.stack(
                    [antialias(gb_rgb[v], views[v][1], rgb_bg[v]) for v in range(nv_per)]
                )
                out["comp_rgb"] = gb_rgb_aa
                out["comp_rgb_bg"] = rgb_bg

            out["mesh"] = mesh
            outs.append(out)

        merged: Dict[str, Any] = {}
        for k in outs[0]:
            if k == "mesh":
                merged[k] = [o[k] for o in outs]
            else:
                merged[k] = jnp.concatenate([o[k] for o in outs], axis=0)
        return merged
