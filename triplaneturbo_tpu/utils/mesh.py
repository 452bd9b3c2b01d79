"""Mesh structure: fixed-capacity, mask-aware, differentiable attributes.

Rebuild of the reference Mesh (/root/reference/threestudio/models/mesh.py and
its inference twin triplaneturbo_executable/utils/mesh.py): vertex positions +
faces with lazily computed vertex normals (scatter-add of face normals),
normal-consistency and uniform-Laplacian regularizers. TPU-native differences:

* static capacity + validity masks instead of dynamic vertex counts (XLA needs
  static shapes);
* scatter-adds are ``jax.ops.segment_sum``-style ``.at[].add`` — the
  reference used ``index_put_(accumulate=True)`` (mesh.py:114-140);
* everything is a pytree (works under jit/vmap/grad).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Mesh:
    """Triangle mesh with optional per-vertex attributes.

    ``v_mask``/``t_mask`` mark valid entries in the fixed-capacity buffers.
    Invalid faces must reference valid vertex slots (slot 0 by convention).
    """

    v_pos: jax.Array  # [V, 3]
    t_pos_idx: jax.Array  # [F, 3] int32
    v_mask: Optional[jax.Array] = None  # [V] bool
    t_mask: Optional[jax.Array] = None  # [F] bool
    v_nrm: Optional[jax.Array] = None  # [V, 3]
    v_rgb: Optional[jax.Array] = None  # [V, 3]
    v_tex: Optional[jax.Array] = None  # [V, 2]
    extras: Optional[dict] = None

    @property
    def num_capacity_verts(self) -> int:
        return self.v_pos.shape[0]

    @property
    def num_capacity_faces(self) -> int:
        return self.t_pos_idx.shape[0]

    def valid_vert_mask(self) -> jax.Array:
        if self.v_mask is None:
            return jnp.ones(self.v_pos.shape[0], bool)
        return self.v_mask

    def valid_face_mask(self) -> jax.Array:
        if self.t_mask is None:
            return jnp.ones(self.t_pos_idx.shape[0], bool)
        return self.t_mask

    def with_(self, **kw) -> "Mesh":
        return replace(self, **kw)

    # -- derived quantities -------------------------------------------------

    def face_normals(self, normalize: bool = True, eps: float = 1e-20) -> jax.Array:
        """Per-face normals; invalid faces yield zero vectors."""
        i0, i1, i2 = self.t_pos_idx[:, 0], self.t_pos_idx[:, 1], self.t_pos_idx[:, 2]
        p0, p1, p2 = self.v_pos[i0], self.v_pos[i1], self.v_pos[i2]
        n = jnp.cross(p1 - p0, p2 - p0)
        if normalize:
            n = n / jnp.sqrt(jnp.maximum((n * n).sum(-1, keepdims=True), eps))
        return n * self.valid_face_mask()[:, None]

    def vertex_normals(self, eps: float = 1e-20) -> jax.Array:
        """Area-weighted vertex normals via scatter-add of (unnormalized) face
        normals, matching reference `_compute_vertex_normal`
        (threestudio/models/mesh.py:114-140)."""
        fn = self.face_normals(normalize=False)
        V = self.v_pos.shape[0]
        vn = jnp.zeros((V, 3), self.v_pos.dtype)
        for k in range(3):
            vn = vn.at[self.t_pos_idx[:, k]].add(fn)
        vn = vn / jnp.sqrt(jnp.maximum((vn * vn).sum(-1, keepdims=True), eps))
        return vn * self.valid_vert_mask()[:, None]

    def vertex_tangents(
        self,
        t_tex_idx: Optional[jax.Array] = None,
        eps: float = 1e-20,
    ) -> jax.Array:
        """Per-vertex tangents from UVs, for tangent-space normal mapping.

        Mirrors reference ``_compute_vertex_tangent``
        (threestudio/models/mesh.py:162-205): per-face tangent from the UV
        Jacobian, scatter-averaged onto vertices, normalized, then Gram-Schmidt
        orthogonalized against the vertex normal. Degenerate UV triangles get
        the same signed clamp of the denominator (|denom| >= 1e-6).

        Requires ``v_tex``; ``t_tex_idx`` defaults to ``t_pos_idx`` (shared
        position/UV topology, the case the reference exporter produces).
        """
        if self.v_tex is None:
            raise ValueError("vertex_tangents requires v_tex UV coordinates")
        tex_idx = self.t_pos_idx if t_tex_idx is None else t_tex_idx
        i0, i1, i2 = self.t_pos_idx[:, 0], self.t_pos_idx[:, 1], self.t_pos_idx[:, 2]
        p0, p1, p2 = self.v_pos[i0], self.v_pos[i1], self.v_pos[i2]
        t0, t1, t2 = self.v_tex[tex_idx[:, 0]], self.v_tex[tex_idx[:, 1]], self.v_tex[tex_idx[:, 2]]

        uve1 = t1 - t0
        uve2 = t2 - t0
        pe1 = p1 - p0
        pe2 = p2 - p0
        nom = pe1 * uve2[:, 1:2] - pe2 * uve1[:, 1:2]
        denom = uve1[:, 0:1] * uve2[:, 1:2] - uve1[:, 1:2] * uve2[:, 0:1]
        denom = jnp.where(
            denom > 0.0, jnp.maximum(denom, 1e-6), jnp.minimum(denom, -1e-6)
        )
        fm = self.valid_face_mask().astype(self.v_pos.dtype)[:, None]
        tang = (nom / denom) * fm

        V = self.v_pos.shape[0]
        tangents = jnp.zeros((V, 3), self.v_pos.dtype)
        tansum = jnp.zeros((V, 3), self.v_pos.dtype)
        for k in range(3):
            tangents = tangents.at[self.t_pos_idx[:, k]].add(tang)
            tansum = tansum.at[self.t_pos_idx[:, k]].add(
                jnp.broadcast_to(fm, tang.shape)
            )
        tangents = tangents / jnp.maximum(tansum, 1.0)

        def _normalize(x):
            return x / jnp.sqrt(jnp.maximum((x * x).sum(-1, keepdims=True), eps))

        vn = self.v_nrm if self.v_nrm is not None else self.vertex_normals()
        tangents = _normalize(tangents)
        tangents = _normalize(tangents - (tangents * vn).sum(-1, keepdims=True) * vn)
        return tangents * self.valid_vert_mask()[:, None]

    def normal_consistency(self) -> jax.Array:
        """Mean (1 - cos) between vertex normals across each face edge
        (reference mesh.py:248-253 uses packed edge pairs; the masked mean
        here is equivalent up to edge multiplicity)."""
        vn = self.vertex_normals()
        fm = self.valid_face_mask().astype(self.v_pos.dtype)
        total = 0.0
        for a, b in ((0, 1), (1, 2), (2, 0)):
            na = vn[self.t_pos_idx[:, a]]
            nb = vn[self.t_pos_idx[:, b]]
            cos = (na * nb).sum(-1)
            total = total + ((1.0 - cos) * fm).sum()
        denom = jnp.maximum(fm.sum() * 3.0, 1.0)
        return total / denom

    def remove_outliers(self, outlier_n_faces_threshold=0.01) -> "Mesh":
        """Drop small disconnected components (host-side; reference
        mesh.py:35-74 uses trimesh connected components — here union-find).

        threshold: int = min faces to keep a component; float = fraction of
        the largest component (reference semantics). Returns a new Mesh with
        updated masks (static shapes preserved).
        """
        import numpy as np

        faces = np.asarray(self.t_pos_idx)
        fmask = np.asarray(self.valid_face_mask())
        idx = np.nonzero(fmask)[0]
        if len(idx) == 0:
            return self
        f = faces[idx]
        nv = self.v_pos.shape[0]
        parent = np.arange(nv)

        def find(a):
            root = a
            while parent[root] != root:
                root = parent[root]
            while parent[a] != root:
                parent[a], a = root, parent[a]
            return root

        for tri in f:
            r0 = find(tri[0])
            for v in tri[1:]:
                rv = find(v)
                if rv != r0:
                    parent[rv] = r0
        comp = np.array([find(v) for v in f[:, 0]])
        labels, counts = np.unique(comp, return_counts=True)
        if isinstance(outlier_n_faces_threshold, float):
            keep_min = counts.max() * outlier_n_faces_threshold
        else:
            keep_min = outlier_n_faces_threshold
        keep_labels = set(labels[counts >= keep_min].tolist())
        keep_face = np.array([c in keep_labels for c in comp])
        new_fmask = fmask.copy()
        new_fmask[idx[~keep_face]] = False
        kept = faces[new_fmask].reshape(-1)
        new_vmask = np.zeros(nv, bool)
        new_vmask[kept] = True
        return self.with_(
            t_mask=jnp.asarray(new_fmask), v_mask=jnp.asarray(new_vmask)
        )

    def laplacian(self) -> jax.Array:
        """Uniform-Laplacian smoothness: mean |L v| over valid vertices
        (reference mesh.py:255-288 builds a sparse COO Laplacian; here the
        same quantity comes from masked scatter-adds)."""
        V = self.v_pos.shape[0]
        fm = self.valid_face_mask().astype(self.v_pos.dtype)
        nbr_sum = jnp.zeros((V, 3), self.v_pos.dtype)
        nbr_cnt = jnp.zeros((V,), self.v_pos.dtype)
        for a, b in ((0, 1), (1, 2), (2, 0)):
            ia, ib = self.t_pos_idx[:, a], self.t_pos_idx[:, b]
            w = fm
            nbr_sum = nbr_sum.at[ia].add(self.v_pos[ib] * w[:, None])
            nbr_sum = nbr_sum.at[ib].add(self.v_pos[ia] * w[:, None])
            nbr_cnt = nbr_cnt.at[ia].add(w)
            nbr_cnt = nbr_cnt.at[ib].add(w)
        valid = (nbr_cnt > 0) & self.valid_vert_mask()
        mean_nbr = nbr_sum / jnp.maximum(nbr_cnt, 1.0)[:, None]
        # eps inside the sqrt: padded slots have v_pos == mean_nbr == 0
        # exactly, and norm()'s backward is 0/0 = NaN there — a zero
        # cotangent times a NaN partial still poisons the whole gradient
        # (even at lambda_laplacian == 0, 0 * NaN = NaN)
        d2 = jnp.sum((self.v_pos - mean_nbr) ** 2, axis=-1)
        lap = jnp.sqrt(jnp.maximum(d2, 1e-20))
        return (lap * valid).sum() / jnp.maximum(valid.sum(), 1)
