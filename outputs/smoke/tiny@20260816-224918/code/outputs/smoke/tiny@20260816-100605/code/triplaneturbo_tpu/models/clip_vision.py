"""CLIP ViT image encoder (flax) — the eval-metric backbone.

From-scratch rebuild of the CLIP ViT-B/32 vision tower used by the
reference's CLIP-score evaluation (/root/reference/evaluation/clipscore/
compute.py:111-161): conv patch embed, pre-LN ViT, projection to the shared
image-text space. Weights are loadable from a converted OpenAI CLIP
checkpoint; random init keeps the harness runnable end-to-end in zero-egress
environments.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .clip_text import CLIPLayer, CLIPTextConfig


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    projection_dim: int = 512
    eps: float = 1e-5


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: [B, H, W, 3] (CLIP-normalized). Returns [B, projection_dim]."""
        c = self.cfg
        B = pixels.shape[0]
        x = nn.Conv(
            c.width, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            padding="VALID", use_bias=False, name="patch_embedding",
        )(pixels)
        x = x.reshape(B, -1, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.width)), x], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (n_pos, c.width))
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=c.eps, name="pre_layernorm")(x)

        # reuse the text tower's transformer layer (no causal mask)
        lcfg = CLIPTextConfig(
            width=c.width, layers=c.layers, heads=c.heads, intermediate=c.intermediate,
            hidden_act="quick_gelu", eps=c.eps,
        )
        full_mask = jnp.ones((1, 1, x.shape[1], x.shape[1]), bool)
        for i in range(c.layers):
            x = CLIPLayer(lcfg, name=f"layers_{i}")(x, full_mask)
        pooled = nn.LayerNorm(epsilon=c.eps, name="post_layernorm")(x[:, 0])
        return nn.Dense(c.projection_dim, use_bias=False, name="visual_projection")(pooled)


CLIP_IMAGE_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_IMAGE_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_for_clip(images: jax.Array, image_size: int = 224) -> jax.Array:
    """[B, H, W, 3] in [0,1] -> resized + CLIP-normalized."""
    B = images.shape[0]
    x = jax.image.resize(images, (B, image_size, image_size, 3), "bilinear")
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
