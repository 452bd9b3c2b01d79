"""`no-material`: color = activation(geometry features).

Rebuild of /root/reference/threestudio/models/materials/no_material.py:15-63
(config: n_output_dims 3, color_activation sigmoid-mipnerf, requires_normal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax

import triplaneturbo_tpu as ttt

from ..networks import get_activation


@dataclass
class NoMaterialConfig:
    n_output_dims: int = 3
    color_activation: str = "sigmoid-mipnerf"
    requires_normal: bool = True


@ttt.register("no-material")
class NoMaterial:
    def __init__(self, cfg: NoMaterialConfig = None):
        self.cfg = cfg or NoMaterialConfig()
        self.requires_normal = self.cfg.requires_normal
        self._act = get_activation(self.cfg.color_activation)

    def __call__(self, features: jax.Array, **kwargs) -> jax.Array:
        return self._act(features[..., : self.cfg.n_output_dims])
