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
        lap = jnp.linalg.norm(self.v_pos - mean_nbr, axis=-1)
        return (lap * valid).sum() / jnp.maximum(valid.sum(), 1)
