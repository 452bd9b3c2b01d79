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

# packed per-case triangle table: the k-th VALID triangle of each cube case
# (contiguous, k < CELL_TRI_COUNT[case]) with all three vertices' (edge
# class, base corner) packed into one int32 — 6 bits per vertex
# (class << 3 | corner), vertex v at bit 6v. One gather per face instead of
# three table gathers + an offset-row gather (gathers cost ~8 ns/element on
# TPU, so table-lookup count dominates the face stage).
CELL_TRI_CODE = np.zeros((256, 12), np.int32)
for cube_case in range(256):
    k = 0
    for slot in range(12):
        if not CELL_TRI_VALID[cube_case, slot]:
            continue
        code = 0
        for v in range(3):
            six = (CELL_TRI_CLASS[cube_case, slot, v] << 3) | CELL_TRI_BASE[cube_case, slot, v]
            code |= int(six) << (6 * v)
        CELL_TRI_CODE[cube_case, k] = code
        k += 1

# edge-class direction vectors bit-packed (x<<2 | y<<1 | z) at 3 bits/class,
# decoded arithmetically instead of a row gather from EDGE_CLASS_DIRS
EDGE_CLASS_DIR_BITS = 0
for _i, (_dx, _dy, _dz) in enumerate(EDGE_CLASS_DIRS):
    EDGE_CLASS_DIR_BITS |= int(_dx << 2 | _dy << 1 | _dz) << (3 * _i)


def _build_mc_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Derive MARCHING CUBES triangulations for all 256 cases from first
    principles (no copied Lorensen tables).

    Method: per cube face, marching-squares segments connect the cut edges
    bounding each maximal run of INSIDE perimeter corners (on ambiguous faces
    this is the fixed "separate the inside corners" rule — a function of the
    face's own corners only, so the two cells sharing a face derive the same
    pairing and the mesh stays watertight). Each active cube edge lies on two
    faces and receives exactly two segment endpoints; the segments therefore
    form disjoint closed cycles, which are fan-triangulated. Cycle winding is
    fixed by Newell's normal against the inside->outside direction, matching
    the marching-tets convention above.

    Returns (tri_code [256, MAX] int32 packed like CELL_TRI_CODE,
    tri_count [256]); vertices sit ONLY on the 3 axis edge classes.
    """
    axis_edges = []  # (cls, base_corner)
    for cls in range(3):
        off = EDGE_CLASS_DIRS[cls]
        for b in range(8):
            if CUBE_CORNER_OFFSETS[b][cls] == 0:
                axis_edges.append((cls, b))

    def corner_at(coords):
        return _CUBE_CORNER_IDX[tuple(int(c) for c in coords)]

    def edge_between(a, b):
        oa = CUBE_CORNER_OFFSETS[a]
        ob = CUBE_CORNER_OFFSETS[b]
        diff = [i for i in range(3) if oa[i] != ob[i]]
        assert len(diff) == 1
        cls = diff[0]
        base = a if oa[cls] == 0 else b
        return (cls, base)

    # the 6 faces as perimeter corner cycles
    faces = []
    for d in range(3):
        u, v = [a for a in range(3) if a != d]
        for s in (0, 1):
            cyc = []
            for uu, vv in ((0, 0), (1, 0), (1, 1), (0, 1)):
                c = [0, 0, 0]
                c[d], c[u], c[v] = s, uu, vv
                cyc.append(corner_at(c))
            faces.append(cyc)

    max_tris = 0
    all_tris = {}
    for case in range(256):
        occ = [(case >> i) & 1 for i in range(8)]
        # ---- marching-squares segments per face ----
        conn = {}  # edge -> list of connected edges

        def link(e1, e2):
            conn.setdefault(e1, []).append(e2)
            conn.setdefault(e2, []).append(e1)

        for cyc in faces:
            ins = [occ[c] for c in cyc]
            if all(ins) or not any(ins):
                continue
            for i in range(4):
                if ins[i] and not ins[i - 1]:
                    start = edge_between(cyc[i - 1], cyc[i])
                    j = i
                    while ins[(j + 1) % 4]:
                        j += 1
                    end = edge_between(cyc[j % 4], cyc[(j + 1) % 4])
                    link(start, end)

        # ---- walk cycles ----
        tris = []
        visited = set()
        for e0 in list(conn):
            if e0 in visited:
                continue
            cycle = [e0]
            visited.add(e0)
            prev, cur = None, e0
            while True:
                nxts = [e for e in conn[cur] if e != prev]
                nxt = nxts[0] if nxts else conn[cur][0]
                if nxt == e0:
                    break
                cycle.append(nxt)
                visited.add(nxt)
                prev, cur = cur, nxt
            # orientation: Newell normal vs inside->outside direction
            mids, want = [], np.zeros(3)
            for cls, b in cycle:
                p_in = CUBE_CORNER_OFFSETS[b].astype(np.float64)
                p_out = p_in + EDGE_CLASS_DIRS[cls]
                if not occ[b]:
                    p_in, p_out = p_out, p_in
                mids.append(0.5 * (p_in + p_out))
                want += p_out - p_in
            n = np.zeros(3)
            for i in range(len(mids)):
                n += np.cross(mids[i], mids[(i + 1) % len(mids)])
            if np.dot(n, want) < 0:
                cycle = cycle[::-1]
            for i in range(1, len(cycle) - 1):
                tris.append((cycle[0], cycle[i], cycle[i + 1]))
        all_tris[case] = tris
        max_tris = max(max_tris, len(tris))

    tri_code = np.zeros((256, max_tris), np.int32)
    tri_count = np.zeros((256,), np.int32)
    for case, tris in all_tris.items():
        tri_count[case] = len(tris)
        for k, tri in enumerate(tris):
            code = 0
            for v, (cls, b) in enumerate(tri):
                code |= int((cls << 3) | b) << (6 * v)
            tri_code[case, k] = code
    return tri_code, tri_count


MC_TRI_CODE, MC_TRI_COUNT = _build_mc_tables()
MC_MAX_TRIS = MC_TRI_CODE.shape[1]


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

    Cost model (measured on TPU): random gathers are ~8 ns/element regardless
    of source-array size, and searchsorted costs queries x log2(n) gathers —
    already at the gather bound, so no sub-structure (two-level search, small
    sorted key arrays) beats it; the only lever is fewer queries/iterations.
    """
    total = csum[-1]
    slots = jnp.arange(capacity, dtype=csum.dtype) + 1
    ids = jnp.searchsorted(csum, slots, side="left")
    valid = slots <= total
    ids = jnp.where(valid, ids, 0)
    return ids.astype(jnp.int32), valid


def _extract_isosurface(
    sdf: jax.Array,
    deformation: Optional[jax.Array],
    isovalue: float,
    max_verts: int,
    max_faces: int,
    max_cells: Optional[int],
    deform_scale: float,
    n_classes: int,
    tri_code_tbl: np.ndarray,
    tri_count_tbl: np.ndarray,
) -> ExtractedMesh:
    """Shared capacity-bounded extraction core for MT/MC (see callers)."""
    R = sdf.shape[0]
    assert sdf.shape == (R, R, R)
    if max_cells is None:
        max_cells = max(max_faces // 4, 1024)
    nv = R * R * R
    f32 = sdf.dtype
    max_k = tri_code_tbl.shape[1]

    occ = jax.lax.stop_gradient(sdf < isovalue)
    sdf_flat = sdf.reshape(-1)

    # ---- edge activity: n_classes shifted XORs, zero gathers --------------
    def shifted_neq(d):
        dx, dy, dz = (int(v) for v in d)
        a = occ[: R - dx if dx else R, : R - dy if dy else R, : R - dz if dz else R]
        b = occ[dx:, dy:, dz:]
        neq = a ^ b
        return jnp.pad(neq, ((0, dx), (0, dy), (0, dz)))

    edge_active = jnp.stack(
        [shifted_neq(d) for d in EDGE_CLASS_DIRS[:n_classes]]
    )  # [n_classes, R, R, R]
    ea_flat = edge_active.reshape(-1)

    vcsum = jnp.cumsum(ea_flat.astype(jnp.int32))  # [n_classes*nv]
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
    dbits = (EDGE_CLASS_DIR_BITS >> (3 * cls)) & 7  # arithmetic, no gather
    ei = bi + ((dbits >> 2) & 1)
    ej = bj + ((dbits >> 1) & 1)
    ek = bk + (dbits & 1)
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
    # a cell produces triangles iff its corners are not all inside/outside
    # (CELL_TRI_COUNT[c] > 0 <=> c not in {0, 255}) — arithmetic instead of a
    # 4M-element gather from the 256-entry table (a measured 30+ ms on TPU)
    case_flat = case.reshape(-1)
    cell_active = (case_flat != 0) & (case_flat != 255)

    ccsum = jnp.cumsum(cell_active.astype(jnp.int32))
    cell_ids, cell_valid = _inverse_compact(ccsum, max_cells)  # [max_cells]
    ccase = case_flat[cell_ids]  # [max_cells]

    # ---- faces -------------------------------------------------------------
    # compact at CELL granularity (searchsorted over max_cells-long cumsum,
    # several fewer binary-search passes than over the max_k-times-larger
    # candidate-slot cumsum), then index the k-th valid triangle via the
    # packed contiguous tri_code table: one int32 gather per face carries all
    # three vertices' (edge class, base corner).
    cellcnt = jnp.asarray(tri_count_tbl)[ccase] * cell_valid.astype(jnp.int32)
    ccum = jnp.cumsum(cellcnt)  # [max_cells]
    n_faces_total = ccum[-1]
    fslots = jnp.arange(max_faces, dtype=jnp.int32) + 1
    f_cell = jnp.searchsorted(ccum, fslots, side="left").astype(jnp.int32)
    face_valid = fslots <= n_faces_total
    f_cell = jnp.where(face_valid, jnp.minimum(f_cell, max_cells - 1), 0)
    prev = jnp.where(f_cell > 0, ccum[jnp.maximum(f_cell - 1, 0)], 0)
    k = jnp.clip(fslots - 1 - prev, 0, max_k - 1)  # tri index within the cell

    f_case = ccase[f_cell]
    code = jnp.asarray(tri_code_tbl)[f_case, k]  # [max_faces]
    f_cellid = cell_ids[f_cell]
    f_ci = f_cellid // (Rc * Rc)
    f_cj = (f_cellid // Rc) % Rc
    f_ck = f_cellid % Rc

    six = jnp.stack([code & 63, (code >> 6) & 63, (code >> 12) & 63], axis=-1)
    tri_cls = six >> 3  # [max_faces, 3]
    basec = six & 7
    gi = f_ci[:, None] + ((basec >> 2) & 1)
    gj = f_cj[:, None] + ((basec >> 1) & 1)
    gk = f_ck[:, None] + (basec & 1)
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


def marching_tets(
    sdf: jax.Array,
    deformation: Optional[jax.Array] = None,
    isovalue: float = 0.0,
    max_verts: int = 65536,
    max_faces: int = 131072,
    max_cells: Optional[int] = None,
    deform_scale: float = 0.5,
) -> ExtractedMesh:
    """Extract a welded triangle mesh via marching TETRAHEDRA (6-tet cells).

    Args:
      sdf: ``[R, R, R]`` level values at grid vertices (axis order x, y, z).
      deformation: optional ``[R, R, R, 3]`` raw deformation (tanh-bounded).
      max_verts / max_faces / max_cells: static capacities; overflow dropped.

    Returns vertices in normalized [0, 1] grid coordinates (rescale downstream
    like the reference helper, mesh_exporter.py:110-136).
    """
    return _extract_isosurface(
        sdf, deformation, isovalue, max_verts, max_faces, max_cells,
        deform_scale, 7, CELL_TRI_CODE, CELL_TRI_COUNT,
    )


def marching_cubes(
    sdf: jax.Array,
    deformation: Optional[jax.Array] = None,
    isovalue: float = 0.0,
    max_verts: int = 65536,
    max_faces: int = 131072,
    max_cells: Optional[int] = None,
    deform_scale: float = 0.5,
) -> ExtractedMesh:
    """Extract a welded triangle mesh via MARCHING CUBES (derived tables).

    Same contract as :func:`marching_tets` but vertices lie only on the 3
    axis edge classes, matching the reference's ``diso.DiffMC`` topology
    (threestudio/models/isosurface.py:19-65) — roughly 2x fewer vertices and
    1.7x fewer faces than the 6-tet decomposition at equal resolution, which
    proportionally shrinks every capacity-scaled cost downstream (compaction
    searches, vertex colorization, OBJ export).
    """
    if max_cells is None:
        # MC averages ~2 triangles per active cell (MT ~4), so the cell
        # capacity must be a larger fraction of the face budget
        max_cells = max(max_faces // 2, 1024)
    return _extract_isosurface(
        sdf, deformation, isovalue, max_verts, max_faces, max_cells,
        deform_scale, 3, MC_TRI_CODE, MC_TRI_COUNT,
    )


def extract_isosurface(
    sdf: jax.Array,
    deformation: Optional[jax.Array] = None,
    method: str = "mc",
    **kw,
) -> ExtractedMesh:
    """Dispatch to :func:`marching_cubes` (``"mc"``, reference-DiffMC-like,
    default) or :func:`marching_tets` (``"mt"``)."""
    if method == "mc":
        return marching_cubes(sdf, deformation, **kw)
    if method == "mt":
        import warnings

        warnings.warn(
            "isosurface method 'mt' emits ~2x more vertices/faces than 'mc'; "
            "the default capacities in the pipeline/renderer/exporter configs "
            "are sized for 'mc' — double max_verts/max_faces for 'mt' or "
            "overflow is silently mask-dropped",
            stacklevel=2,
        )
        return marching_tets(sdf, deformation, **kw)
    raise ValueError(f"Unknown isosurface method {method}")


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
