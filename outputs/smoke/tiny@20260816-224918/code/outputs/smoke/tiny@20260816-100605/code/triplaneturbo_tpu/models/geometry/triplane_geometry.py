"""The registered triplane geometry: space generator + implicit field.

Rebuild of ``few-step-triplane-dual-stable-diffusion``
(/root/reference/custom/triplaneturbo/models/geometry/few_step_triplane_dual_stable_diffusion.py:20-447
and the inference twin sd_dual_triplanes.py): one flax module owning the
adapted SD UNet+VAE (space generator) and the SDF/deformation/feature MLPs, so
the whole student is a single parameter tree. Trainable-parameter selection
(the reference's peft_layers + MLPs) is a path predicate over this tree
(:func:`trainable_mask`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import triplaneturbo_tpu as ttt

from ..networks import MLPConfig
from .space_generator import SpaceGeneratorConfig, TriplaneSpaceGenerator
from .triplane_field import TriplaneField, TriplaneFieldConfig, decode_space_cache


@dataclass
class TriplaneGeometryConfig:
    n_feature_dims: int = 3
    sdf_bias: Any = "sphere"
    sdf_bias_params: Any = 0.5
    rotate_planes: Optional[str] = "v1"
    split_channels: Optional[str] = "v1"
    geo_interpolate: str = "v1"
    tex_interpolate: str = "v2"
    isosurface_deformable_grid: bool = True
    radius: float = 1.0
    space_generator: SpaceGeneratorConfig = field(default_factory=SpaceGeneratorConfig)
    mlp: MLPConfig = field(default_factory=MLPConfig)


@ttt.register("few-step-triplane-dual-stable-diffusion")
class TriplaneGeometry(nn.Module):
    cfg: TriplaneGeometryConfig = field(default_factory=TriplaneGeometryConfig)

    def setup(self):
        c = self.cfg
        self.space_generator = TriplaneSpaceGenerator(c.space_generator)
        per_plane_dim = c.space_generator.output_dim // (2 if c.split_channels == "v1" else 1)
        self.field = TriplaneField(
            TriplaneFieldConfig(
                n_feature_dims=c.n_feature_dims,
                sdf_bias=c.sdf_bias,
                sdf_bias_params=c.sdf_bias_params,
                rotate_planes=c.rotate_planes,
                split_channels=c.split_channels,
                geo_interpolate=c.geo_interpolate,
                tex_interpolate=c.tex_interpolate,
                isosurface_deformable_grid=c.isosurface_deformable_grid,
                radius=c.radius,
                input_dim=per_plane_dim,
                mlp=c.mlp,
            )
        )

    # -- generator side ------------------------------------------------------

    def denoise(self, noisy_input, text_embed, t, lora_scale: float = 1.0):
        return self.space_generator.denoise(noisy_input, text_embed, t, lora_scale)

    def decode(self, latents, lora_scale: float = 1.0):
        """latents [B,6,h,w,4] -> dual space cache [B,6,H,W,C/2]
        (VAE decode + split_channels v1)."""
        planes = self.space_generator.decode(latents, lora_scale)
        return decode_space_cache(planes, self.cfg.split_channels)

    # -- field side ----------------------------------------------------------

    def forward_field(self, points, space_cache):
        return self.field.forward_field(points, space_cache)

    def forward_field_grid(self, space_cache, resolution: int):
        return self.field.forward_field_grid(space_cache, resolution)

    def forward_sdf(self, points, space_cache):
        return self.field.forward_sdf(points, space_cache)

    def __call__(self, points, space_cache):
        return self.field(points, space_cache)

    def export(self, points, space_cache):
        return self.field.export(points, space_cache)

    def init_all(self, noisy, text_embed, t, points):
        eps = self.space_generator.denoise(noisy, text_embed, t)
        cache = self.decode(noisy)  # shapes only; content irrelevant at init
        out = self.field.init_all(points, cache)
        return eps, out


def trainable_mask(params: Dict) -> Dict:
    """Boolean pytree: True for trainable leaves.

    Trainables (reference parity, few_step_triplane_dual_sd_modules.py:825-846
    + the three field MLPs): adapter params (lora/locon), the VAE conv_out
    retrofit, and everything under `field` (sdf/feature/deformation MLPs).
    """

    def mark(path: Tuple, leaf) -> bool:
        joined = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "lora" in joined or "locon" in joined or "retrofit" in joined:
            return True
        if "/field/" in f"/{joined}/":
            return True
        return False

    return jax.tree_util.tree_map_with_path(mark, params)
