"""Differentiable isosurface extraction with static shapes (TPU-native).

Replaces the reference's CUDA ``diso.DiffMC`` helper
(/root/reference/threestudio/models/isosurface.py:19-65) and the PyMCubes CPU
fallback (:71-123). TPU/XLA requires static shapes, so extraction writes into
fixed-capacity vertex/face buffers with validity masks (SURVEY.md §2.6 #4).

Algorithm: **marching tetrahedra** on the canonical 6-tet decomposition of
each grid cell (the decomposition around the main diagonal v0→v6). All case
tables are *derived programmatically at import time* from first principles
(inside/outside bit patterns + a geometric orientation check) — no opaque
copied 256-case tables. Compared to classic MC this emits ~2x triangles but
identical surfaces; a classic-MC fast path can be added later behind the same
API.

Key properties:
  * vertices are unique per global edge (7 edge classes per grid vertex:
    3 axis edges, 3 face diagonals, 1 body diagonal), so the mesh is welded
    exactly like diso's output;
  * vertex positions are differentiable w.r.t. both the SDF values (through
    the edge interpolation weight) and the per-grid-vertex deformation field
    (diso DiffMC's deformable grid, isosurface.py:53-65);
  * topology (which edges/cells are active) is data-dependent but the output
    buffers are static: inactive slots are masked.

Deformation convention: deformed grid position = (idx + deform_scale *
tanh(deformation)) / (R - 1), keeping every vertex inside its half-cell
(deform_scale<=0.5) — the tanh bounding mirrors the reference's marching-tet
helper (threestudio/models/isosurface.py:193-200).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# static table construction (numpy, import time)
# ---------------------------------------------------------------------------

# cube corners indexed by (x, y, z) bit vector
_CUBE_CORNERS = np.array(list(itertools.product((0, 1), repeat=3)), dtype=np.int32)
# (x,y,z) tuples in lexicographic order: 0:(0,0,0) 1:(0,0,1) 2:(0,1,0) ...

# global edge classes: direction vectors
EDGE_CLASS_DIRS = np.array(
    [
        [1, 0, 0],  # 0: +x
        [0, 1, 0],  # 1: +y
        [0, 0, 1],  # 2: +z
        [1, 1, 0],  # 3: xy face diagonal
        [0, 1, 1],  # 4: yz face diagonal
        [1, 0, 1],  # 5: xz face diagonal
        [1, 1, 1],  # 6: body diagonal
    ],
    dtype=np.int32,
)
_DIR_TO_CLASS = {tuple(d): i for i, d in enumerate(EDGE_CLASS_DIRS)}

# 6 tetrahedra along monotone axis paths (0,0,0) -> (1,1,1)
_AXIS_VECS = {0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1)}
_TET_CORNERS = []  # [6][4][3]
for perm in itertools.permutations((0, 1, 2)):
    p0 = np.zeros(3, np.int32)
    p1 = p0 + _AXIS_VECS[perm[0]]
    p2 = p1 + _AXIS_VECS[perm[1]]
    p3 = np.ones(3, np.int32)
    _TET_CORNERS.append(np.stack([p0, p1, p2, p3]))
_TET_CORNERS = np.stack(_TET_CORNERS)  # [6, 4, 3]

_TET_EDGE_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

# per tet, per tet-edge: global class id and base corner offset inside the cell
TET_EDGE_CLASS = np.zeros((6, 6), np.int32)
TET_EDGE_BASE = np.zeros((6, 6, 3), np.int32)
for t in range(6):
    for e, (a, b) in enumerate(_TET_EDGE_PAIRS):
        qa, qb = _TET_CORNERS[t, a], _TET_CORNERS[t, b]
        d = qb - qa
        TET_EDGE_CLASS[t, e] = _DIR_TO_CLASS[tuple(d)]
        TET_EDGE_BASE[t, e] = qa


def _build_tet_tri_table() -> Tuple[np.ndarray, np.ndarray]:
    """Derive the marching-tetrahedra triangulation for all 6 tets x 16 cases.

    Returns:
      tri_edges: [6, 16, 2, 3] int32 — tet-edge indices of up to 2 triangles
        (unused entries = 0)
      tri_count: [6, 16] int32 — number of emitted triangles (0, 1 or 2)

    Orientation: triangle normals point from the inside region (sdf < iso)
    toward the outside, computed geometrically from the canonical tet.
    """
    tri_edges = np.zeros((6, 16, 2, 3), np.int32)
    tri_count = np.zeros((6, 16), np.int32)
    edge_of = {pair: i for i, pair in enumerate(_TET_EDGE_PAIRS)}

    def edge_idx(a, b):
        return edge_of[(min(a, b), max(a, b))]

    for t in range(6):
        corners = _TET_CORNERS[t].astype(np.float64)
        midpoints = {
            i: 0.5 * (corners[a] + corners[b]) for (a, b), i in ((p, edge_of[p]) for p in _TET_EDGE_PAIRS)
        }
        for case in range(16):
            inside = [i for i in range(4) if case >> i & 1]
            outside = [i for i in range(4) if not (case >> i & 1)]
            tris = []
            if len(inside) == 1:
                a = inside[0]
                tris = [[edge_idx(a, b) for b in outside]]
            elif len(inside) == 3:
                a = outside[0]
                tris = [[edge_idx(a, b) for b in inside]]
            elif len(inside) == 2:
                a, b = inside
                c, d = outside
                # quad cycle: (a,c) -> (a,d) -> (b,d) -> (b,c)
                e_ac, e_ad, e_bd, e_bc = (
                    edge_idx(a, c),
                    edge_idx(a, d),
                    edge_idx(b, d),
                    edge_idx(b, c),
                )
                tris = [[e_ac, e_ad, e_bd], [e_ac, e_bd, e_bc]]
            if not tris:
                continue
            # orientation: normal should point inside -> outside
            in_centroid = corners[inside].mean(axis=0)
            out_centroid = corners[outside].mean(axis=0)
            want = out_centroid - in_centroid
            fixed = []
            for tri in tris:
                p0, p1, p2 = (midpoints[e] for e in tri)
                n = np.cross(p1 - p0, p2 - p0)
                if np.dot(n, want) < 0:
                    tri = [tri[0], tri[2], tri[1]]
                fixed.append(tri)
            tri_count[t, case] = len(fixed)
            for k, tri in enumerate(fixed):
                tri_edges[t, case, k] = tri
    return tri_edges, tri_count


TET_TRI_EDGES, TET_TRI_COUNT = _build_tet_tri_table()

# flattened candidate-triangle tables: each (tet, case) has exactly 2
# candidate slots; slot k valid iff k < tri_count
_CAND_VALID = (np.arange(2)[None, None, :] < TET_TRI_COUNT[..., None]).astype(np.int32)  # [6,16,2]


class ExtractedMesh(NamedTuple):
    """Fixed-capacity mesh: only the first n_verts/n_faces entries are real."""

    verts: jax.Array  # [max_verts, 3] float, normalized grid coords in [0, 1]
    faces: jax.Array  # [max_faces, 3] int32 (invalid faces point at vert 0)
    vert_mask: jax.Array  # [max_verts] bool
    face_mask: jax.Array  # [max_faces] bool
    n_verts: jax.Array  # [] int32 (clamped to capacity)
    n_faces: jax.Array  # [] int32


def marching_tets(
    sdf: jax.Array,
    deformation: Optional[jax.Array] = None,
    isovalue: float = 0.0,
    max_verts: int = 65536,
    max_faces: int = 131072,
    deform_scale: float = 0.5,
) -> ExtractedMesh:
    """Extract a welded triangle mesh from a dense SDF grid.

    Args:
      sdf: ``[R, R, R]`` level values at grid vertices (axis order x, y, z).
      deformation: optional ``[R, R, R, 3]`` raw deformation (tanh-bounded
        inside, like the reference's deformable marching cubes).
      isovalue: level-set value.
      max_verts / max_faces: static output capacities; overflow is dropped.
      deform_scale: half-cell bound on the deformation (<= 0.5).

    Returns:
      :class:`ExtractedMesh` with vertices in normalized [0, 1] coordinates
      (multiply/rescale downstream exactly like the reference helper's
      points_range handling, mesh_exporter.py:110-136).
    """
    R = sdf.shape[0]
    assert sdf.shape == (R, R, R)
    nv = R * R * R

    occ = jax.lax.stop_gradient(sdf < isovalue)  # inside
    occ_flat = occ.reshape(-1)
    sdf_flat = sdf.reshape(-1)

    idx_grid = jnp.stack(
        jnp.meshgrid(jnp.arange(R), jnp.arange(R), jnp.arange(R), indexing="ij"),
        axis=-1,
    )  # [R,R,R,3] int

    # deformed vertex positions (normalized)
    pos = idx_grid.astype(sdf.dtype)
    if deformation is not None:
        pos = pos + deform_scale * jnp.tanh(deformation)
    pos = pos / (R - 1)
    pos_flat = pos.reshape(-1, 3)

    def flat_id(ijk):
        return (ijk[..., 0] * R + ijk[..., 1]) * R + ijk[..., 2]

    # ---- global edges: 7 classes x R^3 base vertices -----------------------
    dirs = jnp.asarray(EDGE_CLASS_DIRS)  # [7, 3]
    base = idx_grid.reshape(-1, 3)  # [nv, 3]
    # endpoint ids per class: [7, nv]
    end = base[None, :, :] + dirs[:, None, :]
    in_bounds = jnp.all(end <= R - 1, axis=-1)  # [7, nv]
    end_id = flat_id(jnp.clip(end, 0, R - 1))  # [7, nv]
    base_id = flat_id(base)[None, :].repeat(7, axis=0)  # [7, nv]

    occ0 = occ_flat[base_id]
    occ1 = occ_flat[end_id]
    edge_active = in_bounds & (occ0 != occ1)  # [7, nv]

    # vertex slots by exclusive cumsum over the flattened edge table
    active_flat = edge_active.reshape(-1)
    csum = jnp.cumsum(active_flat.astype(jnp.int32))
    n_verts_total = csum[-1]
    slot_flat = jnp.where(active_flat, csum - 1, max_verts)  # OOB -> dropped
    slot_flat = jnp.where(slot_flat >= max_verts, max_verts, slot_flat)

    # interpolated positions on active edges
    s0 = sdf_flat[base_id.reshape(-1)]
    s1 = sdf_flat[end_id.reshape(-1)]
    denom = s1 - s0
    safe_denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
    tval = jnp.clip((isovalue - s0) / safe_denom, 0.0, 1.0)
    p0 = pos_flat[base_id.reshape(-1)]
    p1 = pos_flat[end_id.reshape(-1)]
    vpos = p0 + tval[:, None] * (p1 - p0)

    verts = jnp.zeros((max_verts + 1, 3), sdf.dtype).at[slot_flat].set(vpos, mode="drop")[:-1]
    vert_mask = jnp.zeros((max_verts + 1,), bool).at[slot_flat].set(active_flat, mode="drop")[:-1]

    # edge -> vertex slot lookup table [7 * nv]
    edge_vert_slot = slot_flat  # already flat in (class, base) order

    # ---- cells & tets ------------------------------------------------------
    Rc = R - 1
    cell_base = jnp.stack(
        jnp.meshgrid(jnp.arange(Rc), jnp.arange(Rc), jnp.arange(Rc), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # [nc, 3]
    nc = cell_base.shape[0]

    tet_corners = jnp.asarray(_TET_CORNERS)  # [6, 4, 3]
    # corner occupancy: [nc, 6, 4]
    corner_ids = flat_id(cell_base[:, None, None, :] + tet_corners[None, :, :, :])
    corner_occ = occ_flat[corner_ids]
    case = (
        corner_occ[..., 0] * 1
        + corner_occ[..., 1] * 2
        + corner_occ[..., 2] * 4
        + corner_occ[..., 3] * 8
    ).astype(jnp.int32)  # [nc, 6]

    # candidate triangles: [nc, 6, 2] validity + [nc, 6, 2, 3] tet-edge ids
    cand_valid = jnp.asarray(_CAND_VALID)[jnp.arange(6)[None, :], case]  # [nc, 6, 2]
    tri_edges = jnp.asarray(TET_TRI_EDGES)[jnp.arange(6)[None, :], case]  # [nc, 6, 2, 3]

    # map tet-edge id -> global edge flat index = class * nv + flat(base_cell + base_off)
    te_class = jnp.asarray(TET_EDGE_CLASS)  # [6, 6]
    te_base = jnp.asarray(TET_EDGE_BASE)  # [6, 6, 3]
    tet_ax = jnp.arange(6)[None, :, None, None]  # broadcast over [nc, 6, 2, 3]
    cls = te_class[tet_ax, tri_edges]  # [nc, 6, 2, 3]
    boff = te_base[tet_ax, tri_edges]  # [nc, 6, 2, 3, 3]
    gbase = flat_id(cell_base[:, None, None, None, :] + boff)  # [nc, 6, 2, 3]
    gedge = cls * nv + gbase

    tri_vert_slots = edge_vert_slot[gedge]  # [nc, 6, 2, 3]

    # face slots by cumsum over candidates
    cand_flat = cand_valid.reshape(-1).astype(jnp.int32)
    fcsum = jnp.cumsum(cand_flat)
    n_faces_total = fcsum[-1]
    fslot = jnp.where(cand_flat > 0, fcsum - 1, max_faces)
    fslot = jnp.where(fslot >= max_faces, max_faces, fslot)

    tri_flat = tri_vert_slots.reshape(-1, 3)
    # invalid vertex slots (== max_verts) only occur on overflow; clamp to 0
    tri_flat = jnp.where(tri_flat >= max_verts, 0, tri_flat)

    faces = (
        jnp.zeros((max_faces + 1, 3), jnp.int32).at[fslot].set(tri_flat, mode="drop")[:-1]
    )
    face_mask = (
        jnp.zeros((max_faces + 1,), bool).at[fslot].set(cand_flat > 0, mode="drop")[:-1]
    )

    return ExtractedMesh(
        verts=verts,
        faces=faces,
        vert_mask=vert_mask,
        face_mask=face_mask,
        n_verts=jnp.minimum(n_verts_total, max_verts),
        n_faces=jnp.minimum(n_faces_total, max_faces),
    )


def force_field_crossing(
    sdf: jax.Array,
    resolution: int,
) -> jax.Array:
    """Branchless empty-field fallback (InstantMesh-style center/border forcing).

    Reference behavior (generative_space_mesh_rasterize_renderer.py:481-512):
    when the SDF has no zero crossing, push the grid center below zero and the
    border above zero so extraction always yields a small central blob. Here
    it is fully vectorized/branchless so it can live inside jit.

    Args:
      sdf: ``[R**3]`` or ``[R, R, R]`` SDF values.
    Returns:
      SDF of the same shape, adjusted only when no crossing exists.
    """
    R = resolution
    flat = sdf.reshape(-1)
    has_pos = jnp.any(flat > 0)
    has_neg = jnp.any(flat < 0)
    has_crossing = has_pos & has_neg

    ijk = jnp.stack(
        jnp.meshgrid(jnp.arange(R), jnp.arange(R), jnp.arange(R), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    c = (R - 1) / 2.0
    dist2center = jnp.abs(ijk - c).max(axis=-1)
    center_mask = dist2center <= (R // 8)
    border_mask = (ijk.min(axis=-1) == 0) | (ijk.max(axis=-1) == R - 1)

    max_sdf = flat.max()
    min_sdf = flat.min()
    update = (
        center_mask.astype(flat.dtype) * (-1.0 - max_sdf)
        + border_mask.astype(flat.dtype) * (1.0 - min_sdf)
    )
    fixed = flat + update
    out = jnp.where(has_crossing, flat, fixed)
    return out.reshape(sdf.shape)
