"""Artifact I/O: OBJ meshes, image grids, video sequences.

Host-side rebuild of the reference ``SaverMixin`` surface
(/root/reference/threestudio/utils/saving.py:23-702 and the executable twin):
vertex-colored OBJ export (the benchmarked ``fmt=obj`` path,
custom/triplaneturbo/models/exporters/multiprompt_mesh_exporter.py:142-178),
RGB/grayscale image grids, and mp4/gif turntable assembly.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def _to_numpy(x):
    return np.asarray(x)


def save_obj(
    path: str,
    v_pos,
    t_pos_idx,
    v_rgb=None,
    v_nrm=None,
    v_mask=None,
    t_mask=None,
) -> str:
    """Write a (vertex-colored) OBJ. Masked/fixed-capacity buffers are
    compacted on the host: invalid vertices are dropped and faces reindexed.
    """
    v = _to_numpy(v_pos).astype(np.float32)
    f = _to_numpy(t_pos_idx).astype(np.int64)
    rgb = None if v_rgb is None else np.clip(_to_numpy(v_rgb), 0.0, 1.0)
    nrm = None if v_nrm is None else _to_numpy(v_nrm)

    # native fast path (C++ writer, ~100x faster at 500k elements); the
    # Python path below stays as the no-toolchain fallback and handles the
    # normals variant
    if nrm is None:
        from .native import write_obj_native

        if write_obj_native(
            path, v, f.astype(np.int32), rgb,
            None if v_mask is None else _to_numpy(v_mask),
            None if t_mask is None else _to_numpy(t_mask),
        ):
            return path

    if v_mask is not None:
        vm = _to_numpy(v_mask).astype(bool)
        remap = -np.ones(len(v), np.int64)
        remap[vm] = np.arange(vm.sum())
        v = v[vm]
        rgb = rgb[vm] if rgb is not None else None
        nrm = nrm[vm] if nrm is not None else None
        if t_mask is not None:
            f = f[_to_numpy(t_mask).astype(bool)]
        f = remap[f]
        f = f[(f >= 0).all(axis=1)]
    elif t_mask is not None:
        f = f[_to_numpy(t_mask).astype(bool)]

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines: List[str] = []
    if rgb is not None:
        for p, c in zip(v, rgb):
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]:.4f} {c[1]:.4f} {c[2]:.4f}")
    else:
        for p in v:
            lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    if nrm is not None:
        for n in nrm:
            lines.append(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}")
    for tri in f:
        lines.append(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def save_image_grid(path: str, images: Sequence, nrow: Optional[int] = None) -> str:
    """images: list of [H, W, 3] float [0,1] or uint8 arrays -> one grid png."""
    import imageio.v2 as imageio

    arrs = []
    for im in images:
        a = _to_numpy(im)
        if a.dtype != np.uint8:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        arrs.append(a)
    n = len(arrs)
    nrow = nrow or n
    ncol = (n + nrow - 1) // nrow
    H, W = arrs[0].shape[:2]
    grid = np.zeros((ncol * H, nrow * W, 3), np.uint8)
    for i, a in enumerate(arrs):
        r, c = divmod(i, nrow)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = a[..., :3]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, grid)
    return path


def save_video(path: str, frames: Sequence, fps: int = 30) -> str:
    """Assemble a turntable mp4/gif (reference save_img_sequence,
    saving.py:434-490)."""
    import imageio.v2 as imageio

    arrs = []
    for f in frames:
        a = _to_numpy(f)
        if a.dtype != np.uint8:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        arrs.append(a)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        imageio.mimwrite(path, arrs, fps=fps)
    except Exception:
        # fall back to gif if no ffmpeg backend
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(alt, arrs, duration=1.0 / fps)
        return alt
    return path
