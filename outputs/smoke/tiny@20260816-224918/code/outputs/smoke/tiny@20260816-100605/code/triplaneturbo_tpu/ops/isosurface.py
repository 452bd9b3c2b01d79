"""Differentiable isosurface extraction with static shapes (TPU-native).

Replaces the reference's CUDA ``diso.DiffMC`` helper
(/root/reference/threestudio/models/isosurface.py:19-65) and the PyMCubes CPU
fallback (:71-123). TPU/XLA requires static shapes, so extraction writes into
fixed-capacity vertex/face buffers with validity masks (SURVEY §2.6 #4).

Algorithm: **marching tetrahedra** on the canonical 6-tet decomposition of
each grid cell. All case tables are *derived programmatically at import time*
from first principles (inside/outside bit patterns + a geometric orientation
check) — no opaque copied 256-case tables.

TPU-first implementation strategy (v2, scatter-free):
  * edge activity for all 7 edge classes (3 axes, 3 face diagonals, 1 body
    diagonal) is computed by shifted XORs of the occupancy grid — pure
    elementwise ops, no gathers;
  * compaction (active edges -> vertex slots, active cells -> face slots)
    uses exclusive cumsums plus a ``searchsorted`` inverse — gather-only,
    because XLA:TPU lowers scatters to extremely slow/compile-heavy code;
  * only ``max_verts`` edges and ``max_cells`` cells are materialized, so all
    downstream math is capacity-sized, not grid-sized.

Properties kept from v1: welded vertices (unique per global edge),
differentiable vertex positions w.r.t. SDF (edge interpolation) and the
per-grid-vertex deformation field (tanh-bounded, mirroring the reference MT
helper isosurface.py:193-200); topology is stop-gradiented.
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

_AXIS_VECS = {0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1)}
_TET_CORNERS = []
for perm in itertools.permutations((0, 1, 2)):
    p0 = np.zeros(3, np.int32)
    p1 = p0 + _AXIS_VECS[perm[0]]
    p2 = p1 + _AXIS_VECS[perm[1]]
    p3 = np.ones(3, np.int32)
    _TET_CORNERS.append(np.stack([p0, p1, p2, p3]))
_TET_CORNERS = np.stack(_TET_CORNERS)  # [6, 4, 3]

_TET_EDGE_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

TET_EDGE_CLASS = np.zeros((6, 6), np.int32)
TET_EDGE_BASE = np.zeros((6, 6, 3), np.int32)
for t in range(6):
    for e, (a, b) in enumerate(_TET_EDGE_PAIRS):
        qa, qb = _TET_CORNERS[t, a], _TET_CORNERS[t, b]
        TET_EDGE_CLASS[t, e] = _DIR_TO_CLASS[tuple(qb - qa)]
        TET_EDGE_BASE[t, e] = qa


def _build_tet_tri_table() -> Tuple[np.ndarray, np.ndarray]:
    """Derive marching-tetrahedra triangulations for all 6 tets x 16 cases.

    Returns (tri_edges [6,16,2,3], tri_count [6,16]); triangle normals point
    from inside (sdf<iso) to outside, fixed by a geometric check on the
    canonical tet.
    """
    tri_edges = np.zeros((6, 16, 2, 3), np.int32)
    tri_count = np.zeros((6, 16), np.int32)
    edge_of = {pair: i for i, pair in enumerate(_TET_EDGE_PAIRS)}

    def edge_idx(a, b):
        return edge_of[(min(a, b), max(a, b))]

    for t in range(6):
        corners = _TET_CORNERS[t].astype(np.float64)
        midpoints = {
            edge_of[p]: 0.5 * (corners[p[0]] + corners[p[1]]) for p in _TET_EDGE_PAIRS
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
                e_ac, e_ad, e_bd, e_bc = (
                    edge_idx(a, c), edge_idx(a, d), edge_idx(b, d), edge_idx(b, c)
                )
                tris = [[e_ac, e_ad, e_bd], [e_ac, e_bd, e_bc]]
            if not tris:
                continue
            want = corners[outside].mean(axis=0) - corners[inside].mean(axis=0)
            fixed = []
            for tri in tris:
                p0, p1, p2 = (midpoints[e] for e in tri)
                if np.dot(np.cross(p1 - p0, p2 - p0), want) < 0:
                    tri = [tri[0], tri[2], tri[1]]
                fixed.append(tri)
            tri_count[t, case] = len(fixed)
            for k2, tri in enumerate(fixed):
                tri_edges[t, case, k2] = tri
    return tri_edges, tri_count


TET_TRI_EDGES, TET_TRI_COUNT = _build_tet_tri_table()

# flattened per-cell candidate tables indexed by a 8-bit cube case:
# cube case bit i = occupancy of cube corner i, corners ordered by
# (x, y, z) bits -> index x*4 + y*2 + z
_CUBE_CORNER_IDX = {(x, y, z): x * 4 + y * 2 + z for x in (0, 1) for y in (0, 1) for z in (0, 1)}

# per cube-case [256]: candidate triangles [12] -> (valid, 3 x (class, base_corner))
CELL_TRI_VALID = np.zeros((256, 12), np.int32)
CELL_TRI_CLASS = np.zeros((256, 12, 3), np.int32)
CELL_TRI_BASE = np.zeros((256, 12, 3), np.int32)  # cube corner index of edge base
for cube_case in range(256):
    occ8 = [(cube_case >> i) & 1 for i in range(8)]
    slot = 0
    for t in range(6):
        tet_case = 0
        for ci in range(4):
            corner = tuple(_TET_CORNERS[t, ci])
            if occ8[_CUBE_CORNER_IDX[corner]]:
                tet_case |= 1 << ci
        cnt = TET_TRI_COUNT[t, tet_case]
        for k in range(2):
            if k < cnt:
                CELL_TRI_VALID[cube_case, slot] = 1
                for v in range(3):
                    e = TET_TRI_EDGES[t, tet_case, k, v]
                    CELL_TRI_CLASS[cube_case, slot, v] = TET_EDGE_CLASS[t, e]
                    b = TET_EDGE_BASE[t, e]
                    CELL_TRI_BASE[cube_case, slot, v] = _CUBE_CORNER_IDX[tuple(b)]
            slot += 1
CELL_TRI_COUNT = CELL_TRI_VALID.sum(axis=1).astype(np.int32)

# cube corner offsets by corner index
CUBE_CORNER_OFFSETS = np.zeros((8, 3), np.int32)
for (x, y, z), i in _CUBE_CORNER_IDX.items():
    CUBE_CORNER_OFFSETS[i] = (x, y, z)


class ExtractedMesh(NamedTuple):
    """Fixed-capacity mesh: only entries with mask True are real."""

    verts: jax.Array  # [max_verts, 3] normalized grid coords in [0, 1]
    faces: jax.Array  # [max_faces, 3] int32 (invalid faces point at vert 0)
    vert_mask: jax.Array  # [max_verts] bool
    face_mask: jax.Array  # [max_faces] bool
    n_verts: jax.Array  # [] int32 (clamped to capacity)
    n_faces: jax.Array  # [] int32


def _inverse_compact(csum: jax.Array, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Scatter-free compaction inverse.

    Given an inclusive cumsum ``csum`` of a 0/1 activity mask, return
    (ids, valid): for each output slot s < capacity, the index of the s-th
    active element (via binary search), and whether it exists.
    """
    total = csum[-1]
    slots = jnp.arange(capacity, dtype=csum.dtype) + 1
    ids = jnp.searchsorted(csum, slots, side="left")
    valid = slots <= total
    ids = jnp.where(valid, ids, 0)
    return ids.astype(jnp.int32), valid


def marching_tets(
    sdf: jax.Array,
    deformation: Optional[jax.Array] = None,
    isovalue: float = 0.0,
    max_verts: int = 65536,
    max_faces: int = 131072,
    max_cells: Optional[int] = None,
    deform_scale: float = 0.5,
) -> ExtractedMesh:
    """Extract a welded triangle mesh from a dense SDF grid.

    Args:
      sdf: ``[R, R, R]`` level values at grid vertices (axis order x, y, z).
      deformation: optional ``[R, R, R, 3]`` raw deformation (tanh-bounded).
      max_verts / max_faces / max_cells: static capacities; overflow dropped.

    Returns vertices in normalized [0, 1] grid coordinates (rescale downstream
    like the reference helper, mesh_exporter.py:110-136).
    """
    R = sdf.shape[0]
    assert sdf.shape == (R, R, R)
    if max_cells is None:
        max_cells = max(max_faces // 4, 1024)
    nv = R * R * R
    f32 = sdf.dtype

    occ = jax.lax.stop_gradient(sdf < isovalue)
    sdf_flat = sdf.reshape(-1)

    # ---- edge activity: 7 shifted XORs, zero gathers ----------------------
    def shifted_neq(d):
        dx, dy, dz = (int(v) for v in d)
        a = occ[: R - dx if dx else R, : R - dy if dy else R, : R - dz if dz else R]
        b = occ[dx:, dy:, dz:]
        neq = a ^ b
        return jnp.pad(neq, ((0, dx), (0, dy), (0, dz)))

    edge_active = jnp.stack([shifted_neq(d) for d in EDGE_CLASS_DIRS])  # [7,R,R,R]
    ea_flat = edge_active.reshape(-1)

    vcsum = jnp.cumsum(ea_flat.astype(jnp.int32))  # [7*nv]
    n_verts_total = vcsum[-1]
    # per-edge vertex slot (0-based); only meaningful where active
    edge_slot = vcsum - 1

    # ---- vertex buffer (gather-only compaction) ---------------------------
    edge_ids, vert_valid = _inverse_compact(vcsum, max_verts)  # [max_verts]
    cls = edge_ids // nv
    base = edge_ids % nv
    bi = base // (R * R)
    bj = (base // R) % R
    bk = base % R
    dirs = jnp.asarray(EDGE_CLASS_DIRS)  # [7, 3]
    d = dirs[cls]
    ei = bi + d[:, 0]
    ej = bj + d[:, 1]
    ek = bk + d[:, 2]
    end = (jnp.clip(ei, 0, R - 1) * R + jnp.clip(ej, 0, R - 1)) * R + jnp.clip(ek, 0, R - 1)

    s0 = sdf_flat[base]
    s1 = sdf_flat[end]
    denom = s1 - s0
    safe = jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
    tval = jnp.clip((isovalue - s0) / safe, 0.0, 1.0)

    p0 = jnp.stack([bi, bj, bk], axis=-1).astype(f32)
    p1 = jnp.stack([ei, ej, ek], axis=-1).astype(f32)
    if deformation is not None:
        dflat = deform_scale * jnp.tanh(deformation.reshape(-1, 3))
        p0 = p0 + dflat[base]
        p1 = p1 + dflat[end]
    vpos = (p0 + tval[:, None] * (p1 - p0)) / (R - 1)
    vpos = jnp.where(vert_valid[:, None], vpos, 0.0)

    # ---- active cells ------------------------------------------------------
    Rc = R - 1
    # cube case per cell: 8 shifted occupancy slices -> 8-bit code
    case = jnp.zeros((Rc, Rc, Rc), jnp.int32)
    for idx in range(8):
        ox, oy, oz = (int(v) for v in CUBE_CORNER_OFFSETS[idx])
        sl = occ[ox : ox + Rc, oy : oy + Rc, oz : oz + Rc].astype(jnp.int32)
        case = case + (sl << idx)
    tri_count_tbl = jnp.asarray(CELL_TRI_COUNT)
    cell_tris = tri_count_tbl[case.reshape(-1)]  # [Rc^3] 0..12
    cell_active = cell_tris > 0

    ccsum = jnp.cumsum(cell_active.astype(jnp.int32))
    cell_ids, cell_valid = _inverse_compact(ccsum, max_cells)  # [max_cells]
    ccase = case.reshape(-1)[cell_ids]  # [max_cells]
    ci = cell_ids // (Rc * Rc)
    cj = (cell_ids // Rc) % Rc
    ck = cell_ids % Rc

    # ---- faces -------------------------------------------------------------
    cand_valid = jnp.asarray(CELL_TRI_VALID)[ccase] * cell_valid[:, None].astype(jnp.int32)
    fcsum = jnp.cumsum(cand_valid.reshape(-1))  # [max_cells * 12]
    n_faces_total = fcsum[-1]
    cand_ids, face_valid = _inverse_compact(fcsum, max_faces)  # [max_faces]
    f_cell = cand_ids // 12  # index into compacted cells
    f_slot = cand_ids % 12

    f_case = ccase[f_cell]
    f_ci = ci[f_cell]
    f_cj = cj[f_cell]
    f_ck = ck[f_cell]
    tri_cls = jnp.asarray(CELL_TRI_CLASS)[f_case, f_slot]  # [max_faces, 3]
    tri_basec = jnp.asarray(CELL_TRI_BASE)[f_case, f_slot]  # [max_faces, 3]
    boff = jnp.asarray(CUBE_CORNER_OFFSETS)[tri_basec]  # [max_faces, 3, 3]
    gi = f_ci[:, None] + boff[..., 0]
    gj = f_cj[:, None] + boff[..., 1]
    gk = f_ck[:, None] + boff[..., 2]
    gedge = tri_cls * nv + (gi * R + gj) * R + gk  # [max_faces, 3]

    slots = edge_slot[gedge]  # [max_faces, 3]
    # drop faces referencing out-of-capacity vertices
    in_cap = (slots < max_verts).all(axis=-1)
    face_valid = face_valid & in_cap
    faces = jnp.where(face_valid[:, None], jnp.minimum(slots, max_verts - 1), 0).astype(jnp.int32)

    return ExtractedMesh(
        verts=vpos,
        faces=faces,
        vert_mask=vert_valid,
        face_mask=face_valid,
        n_verts=jnp.minimum(n_verts_total, max_verts),
        n_faces=jnp.minimum(n_faces_total, max_faces),
    )


def force_field_crossing(sdf: jax.Array, resolution: int) -> jax.Array:
    """Branchless empty-field fallback (InstantMesh-style center/border forcing,
    reference generative_space_mesh_rasterize_renderer.py:481-512)."""
    R = resolution
    flat = sdf.reshape(-1)
    has_crossing = jnp.any(flat > 0) & jnp.any(flat < 0)

    ijk = jnp.stack(
        jnp.meshgrid(jnp.arange(R), jnp.arange(R), jnp.arange(R), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    c = (R - 1) / 2.0
    dist2center = jnp.abs(ijk - c).max(axis=-1)
    center_mask = dist2center <= (R // 8)
    border_mask = (ijk.min(axis=-1) == 0) | (ijk.max(axis=-1) == R - 1)

    update = (
        center_mask.astype(flat.dtype) * (-1.0 - flat.max())
        + border_mask.astype(flat.dtype) * (1.0 - flat.min())
    )
    out = jnp.where(has_crossing, flat, flat + update)
    return out.reshape(sdf.shape)
