"""UV-atlas OBJ+MTL export: the fmt=obj-mtl path without xatlas.

The reference bakes albedo into a UV texture via xatlas unwrap + nvdiffrast
UV rasterization + cv2 TELEA inpainting (custom/triplaneturbo/models/
exporters/multiprompt_mesh_exporter.py:57-141). Neither xatlas nor a GPU
rasterizer exists here, so this uses a per-face grid atlas (each triangle
gets its own chart cell — no seams to inpaint, at the cost of chart-boundary
texel waste) and bakes the texture by evaluating the color source at
texel-interpolated 3D surface positions. Fully deterministic, no native deps.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Tuple

import numpy as np


def per_face_uv_atlas(n_faces: int, tex_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """UV coordinates for a per-face grid atlas.

    Each face maps to half of a square cell; cells tile the texture. Returns
    (uvs [n_faces, 3, 2], cell edge in texels).
    """
    cells = int(math.ceil(math.sqrt(n_faces / 2)))
    cell = tex_size / cells
    pad = 1.0 / tex_size  # one-texel inset against bleeding
    uvs = np.zeros((n_faces, 3, 2), np.float32)
    for i in range(n_faces):
        c = i // 2
        cy, cx = divmod(c, cells)
        x0, y0 = cx / cells + pad, cy / cells + pad
        x1, y1 = (cx + 1) / cells - pad, (cy + 1) / cells - pad
        if i % 2 == 0:  # lower-left triangle of the cell
            uvs[i] = [(x0, y0), (x1, y0), (x0, y1)]
        else:  # upper-right
            uvs[i] = [(x1, y1), (x0, y1), (x1, y0)]
    return uvs, cell


def bake_texture(
    verts: np.ndarray,  # [V, 3]
    faces: np.ndarray,  # [F, 3] (compacted, all valid)
    uvs: np.ndarray,  # [F, 3, 2]
    color_fn: Callable[[np.ndarray], np.ndarray],  # [N,3] pos -> [N,3] rgb
    tex_size: int = 1024,
    chunk: int = 262144,
) -> np.ndarray:
    """Rasterize every face's chart in UV space and bake colors at texel
    centers (the nvdiffrast-UV-rasterize + tex-MLP step, exporter :90-118)."""
    tex = np.zeros((tex_size, tex_size, 3), np.float32)

    # texel centers covered per face: rasterize the UV triangle on the grid
    positions = []
    texels = []
    for f in range(len(faces)):
        uv = uvs[f] * tex_size  # [3, 2] in texel units
        lo = np.floor(uv.min(axis=0)).astype(int)
        hi = np.ceil(uv.max(axis=0)).astype(int)
        xs = np.arange(lo[0], min(hi[0] + 1, tex_size)) + 0.5
        ys = np.arange(lo[1], min(hi[1] + 1, tex_size)) + 0.5
        if len(xs) == 0 or len(ys) == 0:
            continue
        X, Y = np.meshgrid(xs, ys)
        P = np.stack([X.ravel(), Y.ravel()], -1)
        a, b, c = uv
        d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(d) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (P[:, 0] - c[0]) + (c[0] - b[0]) * (P[:, 1] - c[1])) / d
        w1 = ((c[1] - a[1]) * (P[:, 0] - c[0]) + (a[0] - c[0]) * (P[:, 1] - c[1])) / d
        w2 = 1 - w0 - w1
        eps = -0.25  # small negative margin fills the chart inset
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not inside.any():
            continue
        W = np.stack([w0, w1, w2], -1)[inside]
        W = np.clip(W, 0, None)
        W = W / W.sum(-1, keepdims=True)
        tri = verts[faces[f]]
        positions.append(W @ tri)
        texels.append(P[inside].astype(int))
    if not positions:
        return tex
    pos = np.concatenate(positions)
    tx = np.concatenate(texels)

    colors = np.concatenate(
        [np.asarray(color_fn(pos[i : i + chunk])) for i in range(0, len(pos), chunk)]
    )
    tex[np.clip(tx[:, 1], 0, tex_size - 1), np.clip(tx[:, 0], 0, tex_size - 1)] = np.clip(
        colors, 0, 1
    )
    return tex


def export_obj_mtl(
    save_dir: str,
    name: str,
    verts: np.ndarray,
    faces: np.ndarray,
    color_fn: Callable[[np.ndarray], np.ndarray],
    tex_size: int = 1024,
) -> Tuple[str, str, str]:
    """Write model.obj + model.mtl + texture_kd.png (exporter fmt=obj-mtl)."""
    import imageio.v2 as imageio

    os.makedirs(save_dir, exist_ok=True)
    uvs, _ = per_face_uv_atlas(len(faces), tex_size)
    tex = bake_texture(verts, faces, uvs, color_fn, tex_size)

    obj_path = os.path.join(save_dir, f"{name}.obj")
    mtl_path = os.path.join(save_dir, f"{name}.mtl")
    tex_path = os.path.join(save_dir, "texture_kd.png")
    imageio.imwrite(tex_path, (tex[::-1] * 255).astype(np.uint8))  # v flipped

    lines = [f"mtllib {name}.mtl", "usemtl defaultMat"]
    for p in verts:
        lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    for f in range(len(faces)):
        for k in range(3):
            u, v = uvs[f, k]
            lines.append(f"vt {u:.6f} {v:.6f}")
    for f, tri in enumerate(faces):
        t = 3 * f
        lines.append(
            f"f {tri[0]+1}/{t+1} {tri[1]+1}/{t+2} {tri[2]+1}/{t+3}"
        )
    with open(obj_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(mtl_path, "w") as fh:
        fh.write(
            "newmtl defaultMat\nKa 1 1 1\nKd 1 1 1\nKs 0 0 0\nmap_Kd texture_kd.png\n"
        )
    return obj_path, mtl_path, tex_path
