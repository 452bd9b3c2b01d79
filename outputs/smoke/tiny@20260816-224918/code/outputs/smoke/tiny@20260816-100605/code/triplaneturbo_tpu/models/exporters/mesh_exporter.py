"""Mesh exporter: space cache -> vertex-colored OBJ (the benchmarked path).

Rebuild of ``multiprompt-mesh-exporter``
(/root/reference/custom/triplaneturbo/models/exporters/
multiprompt_mesh_exporter.py:17-178): fmt=obj computes vertex colors from the
texture field + material activation; fmt=obj-mtl (UV-baked albedo via xatlas)
is host-side and optional — the dreamfusion-415 benchmark uses fmt=obj
(scripts/eval/dreamfusion.sh), which needs no UV atlas.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

import triplaneturbo_tpu as ttt

from ...ops.isosurface import force_field_crossing, marching_tets
from ...utils.mesh import Mesh
from ...utils.saving import save_obj


@dataclass
class MeshExporterConfig:
    fmt: str = "obj"  # "obj" (vertex colors) | "obj-mtl" (UV albedo, optional)
    save_name: str = "model"
    save_video: bool = False
    isosurface_resolution: int = 160
    max_verts: int = 262144
    max_faces: int = 524288


@ttt.register("multiprompt-mesh-exporter")
class MultipromptMeshExporter:
    def __init__(self, cfg: MeshExporterConfig = None):
        self.cfg = cfg or MeshExporterConfig()

    def extract(
        self,
        space_cache: jax.Array,  # [Bsc, 6, H, W, C]
        forward_field_grid: Callable,  # (cache [1,...], R) -> (sdf, deform)
        export_fn: Callable,  # (points [1, N, 3], cache) -> features
        material_fn: Callable,
    ) -> List[Mesh]:
        cfg = self.cfg
        R = cfg.isosurface_resolution
        meshes = []
        for i in range(space_cache.shape[0]):
            cache_i = space_cache[i : i + 1]
            sdf, deform = forward_field_grid(cache_i, R)
            sdf = force_field_crossing(sdf.reshape(-1), R)
            m = marching_tets(
                sdf.reshape(R, R, R),
                None if deform is None else deform.reshape(R, R, R, 3),
                max_verts=cfg.max_verts,
                max_faces=cfg.max_faces,
            )
            verts = m.verts * 2.0 - 1.0
            feats = export_fn(verts[None], cache_i)[0]
            meshes.append(
                Mesh(
                    v_pos=verts,
                    t_pos_idx=m.faces,
                    v_mask=m.vert_mask,
                    t_mask=m.face_mask,
                    v_rgb=material_fn(feats),
                )
            )
        return meshes

    def __call__(self, meshes: List[Mesh], save_dir: str, names: Optional[List[str]] = None) -> List[str]:
        paths = []
        for i, mesh in enumerate(meshes):
            name = names[i] if names else f"{self.cfg.save_name}_{i}"
            path = os.path.join(save_dir, name, "model.obj")
            v_nrm = mesh.vertex_normals()
            paths.append(
                save_obj(
                    path, mesh.v_pos, mesh.t_pos_idx, v_rgb=mesh.v_rgb,
                    v_mask=mesh.v_mask, t_mask=mesh.t_mask,
                )
            )
        return paths
