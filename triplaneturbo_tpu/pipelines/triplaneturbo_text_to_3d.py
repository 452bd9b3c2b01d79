"""Text -> textured 3D mesh pipeline: the ~1-second flagship path.

Rebuild of ``TriplaneTurboTextTo3DPipeline``
(/root/reference/triplaneturbo_executable/pipelines/triplaneturbo_text_to_3d.py:86-353)
as one jitted XLA program (SURVEY §3.2: "everything except OBJ serialization
is tensor ops"): CLIP text encoding -> 4-step shifted DDIM over 6 plane
latents (hexa-LoRA UNet) -> VAE decode -> channel split -> marching-tets 160³
with deformable grid -> vertex colorization. Only the final OBJ write touches
the host.

API parity: ``from_pretrained(path)``, ``pipeline(prompt=...)`` returning
``{"space_cache", "latents", "mesh"}``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

import triplaneturbo_tpu as ttt

from ..models.clip_text import CLIPTextConfig, CLIPTextEncoder
from ..models.geometry.triplane_geometry import TriplaneGeometry, TriplaneGeometryConfig
from ..models.geometry.space_generator import SpaceGeneratorConfig
from ..models.networks import MLPConfig, get_activation
from ..models.schedulers import (
    Schedule,
    SchedulerConfig,
    ddim_step,
    ddim_timesteps,
    make_schedule,
)
from ..models.tokenizer import CLIPTokenizer
from ..ops.isosurface import ExtractedMesh, extract_isosurface
from ..utils.mesh import Mesh
from ..utils.saving import save_obj


@dataclass
class TriplaneTurboPipelineConfig:
    """Mirrors TriplaneTurboTextTo3DPipelineConfig
    (triplaneturbo_text_to_3d.py:18-84)."""

    base_model_name_or_path: str = ""
    num_inference_steps: int = 4
    latent_channels: int = 4
    latent_resolution: int = 32
    n_planes: int = 6
    radius: float = 1.0
    sdf_bias: str = "sphere"
    sdf_bias_params: float = 0.5
    rotate_planes: str = "v1"
    split_channels: str = "v1"
    geo_interpolate: str = "v1"
    tex_interpolate: str = "v2"
    n_feature_dims: int = 3
    color_activation: str = "sigmoid-mipnerf"
    isosurface_resolution: int = 160
    isosurface_deformable_grid: bool = True
    # "mc" matches the reference's diso DiffMC (marching cubes,
    # triplaneturbo_text_to_3d.py:72); MC emits ~2x fewer vertices than the
    # 6-tet decomposition so the buffers (and every capacity-scaled cost)
    # shrink accordingly
    isosurface_method: str = "mc"
    # sized for MC at 160³ (~2x headroom over a typical generated object:
    # 53k verts / 105k faces measured); compaction searches, colorization and
    # export all scale with CAPACITY, not content, so oversizing is pure cost
    max_verts: int = 98304
    max_faces: int = 196608
    field_chunk: int = 256_000
    sample_scheduler: str = "ddim"
    dtype_str: str = "float32"

    @classmethod
    def from_pretrained(cls, path: Optional[str], **kw) -> "TriplaneTurboPipelineConfig":
        cfg_dict: Dict[str, Any] = {}
        if path is not None:
            cfg_path = os.path.join(path, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg_dict = json.load(f)
        cfg_dict.update(kw)
        names = {f_.name for f_ in cls.__dataclass_fields__.values()}
        return cls(**{k: v for k, v in cfg_dict.items() if k in names})


class TriplaneTurboTextTo3DPipeline:
    """Prompt in -> vertex-colored mesh out, single jitted graph."""

    def __init__(
        self,
        cfg: TriplaneTurboPipelineConfig,
        geometry: TriplaneGeometry,
        geometry_params: Any,
        text_encoder: CLIPTextEncoder,
        text_params: Any,
        tokenizer: CLIPTokenizer,
        schedule: Schedule,
    ):
        self.cfg = cfg
        self.geometry = geometry
        self.geometry_params = geometry_params
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.schedule = schedule
        self.material = get_activation(cfg.color_activation)
        # two jit units instead of one monolith: the diffusion stage and the
        # per-item extraction stage compile independently (compile times on
        # remote-compiled TPU backends scale badly with graph size)
        self._sample_jit = jax.jit(self._sample_latents)
        self._extract_jit = jax.jit(self._extract_one)
        # single-prompt fast path: one dispatch for the whole pipeline (each
        # host round trip costs ~200ms on tunneled TPU backends)
        self._generate_one_jit = jax.jit(self._generate_one)
        # same, with the init-latents randn fused into the program (saves an
        # eager dispatch + HBM round trip on the benchmarked path)
        self._generate_one_from_key_jit = jax.jit(self._generate_one_from_key)

    def _generate_one(self, geometry_params, text_params, input_ids, init_latents):
        latents, space_cache = self._sample_latents(
            geometry_params, text_params, input_ids, init_latents
        )
        mesh, color = self._extract_one(geometry_params, space_cache[0])
        return latents, space_cache, mesh, color

    def _generate_one_from_key(self, geometry_params, text_params, input_ids, key):
        cfg = self.cfg
        init_latents = jax.random.normal(
            key,
            (1, cfg.n_planes, cfg.latent_resolution, cfg.latent_resolution, cfg.latent_channels),
        )
        return self._generate_one(geometry_params, text_params, input_ids, init_latents)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: Optional[str] = None,
        seed: int = 0,
        space_generator_overrides: Optional[Dict[str, Any]] = None,
        text_config: Optional[CLIPTextConfig] = None,
        **kwargs,
    ) -> "TriplaneTurboTextTo3DPipeline":
        """Build the pipeline; load converted weights when available.

        ``path`` may contain ``config.json`` + ``params.msgpack`` (our native
        format) or a torch ``*.pth`` adapter checkpoint (converted via
        :mod:`triplaneturbo_tpu.utils.checkpoint`). Without weights the models
        are randomly initialized (shape/latency-accurate).
        """
        cfg = TriplaneTurboPipelineConfig.from_pretrained(
            pretrained_model_name_or_path
            if pretrained_model_name_or_path and os.path.isdir(pretrained_model_name_or_path)
            else None,
            **kwargs,
        )
        sg_cfg = SpaceGeneratorConfig(
            dtype_str=cfg.dtype_str, **(space_generator_overrides or {})
        )
        text_cfg = text_config or CLIPTextConfig(width=sg_cfg.cross_attention_dim)
        geometry = TriplaneGeometry(
            TriplaneGeometryConfig(
                n_feature_dims=cfg.n_feature_dims,
                sdf_bias=cfg.sdf_bias,
                sdf_bias_params=cfg.sdf_bias_params,
                rotate_planes=cfg.rotate_planes,
                split_channels=cfg.split_channels,
                geo_interpolate=cfg.geo_interpolate,
                tex_interpolate=cfg.tex_interpolate,
                isosurface_deformable_grid=cfg.isosurface_deformable_grid,
                radius=cfg.radius,
                space_generator=sg_cfg,
                mlp=MLPConfig(),
            )
        )
        text_encoder = CLIPTextEncoder(text_cfg)
        tokenizer = (
            CLIPTokenizer.from_pretrained(os.path.join(cfg.base_model_name_or_path, "tokenizer"))
            if cfg.base_model_name_or_path
            and os.path.isdir(os.path.join(cfg.base_model_name_or_path, "tokenizer"))
            else CLIPTokenizer()
        )

        key = jax.random.PRNGKey(seed)
        k_geo, k_txt = jax.random.split(key)
        # params are spatial-size independent; init on minimal spatial dims so
        # building the full SD-2.1 stack costs milliseconds, not a compile of
        # the 32x32 graph (the real graph compiles on first __call__)
        R = 8
        noisy = jnp.zeros((1, cfg.n_planes, R, R, cfg.latent_channels))
        text = jnp.zeros((1, text_cfg.max_length, text_cfg.width))
        pts = jnp.zeros((1, 8, 3))
        # jit the inits: eager flax init dispatches thousands of tiny ops,
        # which is pathological over a remote-tunneled TPU
        geometry_params = jax.jit(
            lambda k: geometry.init(k, noisy, text, jnp.zeros(()), pts, method=geometry.init_all)
        )(k_geo)
        text_params = jax.jit(
            lambda k: text_encoder.init(k, jnp.zeros((1, text_cfg.max_length), jnp.int32))
        )(k_txt)

        # optional converted weights
        if pretrained_model_name_or_path:
            from ..utils import checkpoint as ckpt_utils

            geometry_params, text_params = ckpt_utils.maybe_load_pipeline_params(
                pretrained_model_name_or_path, geometry_params, text_params
            )

        return cls(
            cfg=cfg,
            geometry=geometry,
            geometry_params=geometry_params,
            text_encoder=text_encoder,
            text_params=text_params,
            tokenizer=tokenizer,
            schedule=make_schedule(SchedulerConfig()),
        )

    # ------------------------------------------------------------------
    # jitted core
    # ------------------------------------------------------------------

    def _field_on_grid(self, params, space_cache_i: jax.Array):
        """SDF+deformation on the dense MC grid (one batch item).

        Uses the gather-free regular-grid fast path
        (TriplaneField.forward_field_grid): identical values to chunked
        forward_field over 160³ points (mesh_exporter.py:100-106) but
        MXU-bound instead of gather-bound.
        """
        cfg = self.cfg
        R = cfg.isosurface_resolution
        sdf, deform = self.geometry.apply(
            params, space_cache_i[None], R, method=self.geometry.forward_field_grid
        )
        if deform is None:
            deform = jnp.zeros((R * R * R, 3), sdf.dtype)
        return sdf.reshape(-1), deform

    def _sample_latents(
        self,
        geometry_params,
        text_params,
        input_ids: jax.Array,  # [B, 77]
        init_latents: jax.Array,  # [B, 6, 32, 32, 4]
    ):
        cfg = self.cfg
        text_embed, _ = self.text_encoder.apply(text_params, input_ids)

        ts = jnp.asarray(ddim_timesteps(self.schedule, cfg.num_inference_steps), jnp.int32)

        def ddim_body(carry, t_arr):
            latents, _ = carry
            eps = self.geometry.apply(
                geometry_params, latents, text_embed, t_arr, method=self.geometry.denoise
            )
            out = ddim_step(self.schedule, eps, t_arr, latents, cfg.num_inference_steps)
            return (out.prev_sample, out.pred_original_sample), None

        # scan: the UNet body compiles ONCE for all 4 steps
        (_, latents), _ = jax.lax.scan(ddim_body, (init_latents, init_latents), ts)

        space_cache = self.geometry.apply(
            geometry_params, latents, method=self.geometry.decode
        )
        return latents, space_cache

    def _extract_one(self, geometry_params, space_cache_i: jax.Array):
        """Mesh + vertex colors for ONE space-cache item (jitted per item so
        any batch size reuses the same compiled program)."""
        cfg = self.cfg
        R = cfg.isosurface_resolution
        sdf, deform = self._field_on_grid(geometry_params, space_cache_i)
        # empty-field fallback: sphere SDF (mesh_exporter.py:121-125)
        lin = jnp.linspace(-1.0, 1.0, R)
        grid = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
        has_crossing = jnp.any(sdf > 0) & jnp.any(sdf < 0)
        sdf = jnp.where(has_crossing, sdf, jnp.linalg.norm(grid, axis=-1) - 1.0)
        m = extract_isosurface(
            sdf.reshape(R, R, R),
            deform.reshape(R, R, R, 3) if cfg.isosurface_deformable_grid else None,
            method=cfg.isosurface_method,
            max_verts=cfg.max_verts,
            max_faces=cfg.max_faces,
        )
        # verts [0,1] -> world [-1,1] (mesh_exporter.py:128-136)
        m = m._replace(verts=m.verts * 2.0 - 1.0)
        feats = self.geometry.apply(
            geometry_params, m.verts[None], space_cache_i[None],
            method=self.geometry.export,
        )["features"][0]
        return m, self.material(feats)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def __call__(
        self,
        prompt: Union[str, List[str]],
        num_results_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        colorize: bool = True,
        return_dict: bool = True,
    ):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt = [p for p in prompt for _ in range(num_results_per_prompt)]
        B = len(prompt)
        cfg = self.cfg

        input_ids = jnp.asarray(self.tokenizer.batch_encode(prompt))
        if latents is None and key is None:
            key = jax.random.PRNGKey(42)
        if latents is None and B != 1:
            latents = jax.random.normal(
                key,
                (B, cfg.n_planes, cfg.latent_resolution, cfg.latent_resolution, cfg.latent_channels),
            )

        mesh_list = []
        if B == 1:
            if latents is None:
                # randn fused into the single program — no eager latents dispatch
                out_latents, space_cache, m, color = self._generate_one_from_key_jit(
                    self.geometry_params, self.text_params, input_ids, key
                )
            else:
                out_latents, space_cache, m, color = self._generate_one_jit(
                    self.geometry_params, self.text_params, input_ids, latents
                )
            extracted = [(m, color)]
        else:
            out_latents, space_cache = self._sample_jit(
                self.geometry_params, self.text_params, input_ids, latents
            )
            extracted = [
                self._extract_jit(self.geometry_params, space_cache[i]) for i in range(B)
            ]
        for m, color in extracted:
            mesh_list.append(
                Mesh(
                    v_pos=m.verts,
                    t_pos_idx=m.faces,
                    v_mask=m.vert_mask,
                    t_mask=m.face_mask,
                    v_rgb=color if colorize else None,
                )
            )

        if return_dict:
            return {"space_cache": space_cache, "latents": out_latents, "mesh": mesh_list}
        return mesh_list


def export_obj(mesh: Mesh, save_path: str, save_normal: bool = False) -> List[str]:
    """Vertex-colored OBJ writer (mesh_exporter.py:201-230)."""
    v_nrm = mesh.vertex_normals() if save_normal else None
    path = save_obj(
        save_path,
        mesh.v_pos,
        mesh.t_pos_idx,
        v_rgb=mesh.v_rgb,
        v_nrm=v_nrm,
        v_mask=mesh.v_mask,
        t_mask=mesh.t_mask,
    )
    return [path]
