"""Triplane space generator: adapted SD-2.1 UNet + retrofitted VAE decoder.

Rebuild of ``OneStepTriplaneDualStableDiffusion``
(/root/reference/triplaneturbo_executable/extern/sd_dual_triplane_modules.py:710-981):
wraps the (frozen) SD backbone with hexa-LoRA attention processors, LoCon conv
adapters and the 64-channel conv_out retrofit, and exposes

* ``denoise``: UNet epsilon prediction over B x 6 plane latents with the text
  embedding repeated per plane (forward_denoise :940-971);
* ``decode``: VAE-decode latents to ``[B, 6, 256, 256, output_dim]`` feature
  planes (forward_decode :973-981 — NOTE no 1/0.18215 latent scaling, parity
  with the reference).

TPU-first: latents live as ``[B, 6, H, W, C]`` NHWC; the plane axis folds into
the batch for convs and regroups for plane-wise adapters / joint attention.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..unet import UNet2DConditionModel, UNetConfig, sd21_student_config
from ..vae import AutoencoderKL, VAEConfig, student_vae_config


@dataclass(frozen=True)
class SpaceGeneratorConfig:
    training_type: str = "self_lora_rank_16-cross_lora_rank_16-locon_rank_16"
    output_dim: int = 64
    self_lora_type: str = "hexa_v1"
    cross_lora_type: str = "vanilla"
    locon_type: str = "vanilla_v1"
    vae_attn_type: str = "basic"
    prompt_bias: bool = False
    n_planes: int = 6
    gradient_checkpoint: bool = False
    dtype_str: str = "float32"
    # architecture size knobs (defaults = SD-2.1-base; small values for tests)
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    vae_block_out_channels: tuple = (128, 256, 512, 512)
    vae_layers_per_block: int = 2

    def rank(self, which: str) -> int:
        """Parse ranks out of the reference's training_type string
        (sd_dual_triplane_modules.py:764-775)."""
        import re

        m = re.search(rf"{which}_rank_(\d+)", self.training_type)
        return int(m.group(1)) if m else 16


class TriplaneSpaceGenerator(nn.Module):
    """UNet + VAE-decoder pair behind the reference's generator API."""

    cfg: SpaceGeneratorConfig = field(default_factory=SpaceGeneratorConfig)

    def setup(self):
        c = self.cfg
        from dataclasses import replace as dc_replace

        unet_cfg = sd21_student_config(
            self_lora_type=c.self_lora_type,
            cross_lora_type=c.cross_lora_type,
            locon_type=c.locon_type,
            rank=c.rank("self_lora"),
            n_planes=c.n_planes,
            remat=c.gradient_checkpoint,
            dtype_str=c.dtype_str,
        )
        unet_cfg = dc_replace(
            unet_cfg,
            block_out_channels=tuple(c.block_out_channels),
            layers_per_block=c.layers_per_block,
            cross_attention_dim=c.cross_attention_dim,
            attention_head_dim=c.attention_head_dim,
        )
        self.unet = UNet2DConditionModel(unet_cfg)
        vae_cfg = student_vae_config(
            output_dim=c.output_dim,
            rank=c.rank("locon"),
            dtype_str=c.dtype_str,
            remat=c.gradient_checkpoint,
        )
        from dataclasses import replace as _r

        vae_cfg = _r(
            vae_cfg,
            block_out_channels=tuple(c.vae_block_out_channels),
            layers_per_block=c.vae_layers_per_block,
        )
        self.vae = AutoencoderKL(vae_cfg)
        if c.prompt_bias:
            self.prompt_bias_param = self.param(
                "lora_prompt_bias",
                nn.initializers.zeros,
                (c.n_planes, 77, c.cross_attention_dim),
            )

    def denoise(
        self,
        noisy_input: jax.Array,  # [B, P, H, W, 4]
        text_embed: jax.Array,  # [B, L, D] or [B, P, L, D]
        t: jax.Array,  # [] or [B] or [B*P]
        lora_scale: float = 1.0,
    ) -> jax.Array:
        c = self.cfg
        B, P, H, W, C = noisy_input.shape
        assert P == c.n_planes
        x = noisy_input.reshape(B * P, H, W, C)
        if text_embed.ndim == 3:
            # same text per plane: repeat_interleave over the plane axis
            ctx = jnp.repeat(text_embed, P, axis=0)
        elif text_embed.ndim == 4:
            ctx = text_embed.reshape(B * P, *text_embed.shape[-2:])
        else:
            raise ValueError("text_embed must be [B, L, D] or [B, P, L, D]")
        if c.prompt_bias:
            ctx = ctx + jnp.tile(self.prompt_bias_param, (B, 1, 1))
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (B * P,))
        elif t.shape[0] == B:
            t = jnp.repeat(t, P, axis=0)
        eps = self.unet(x, t, ctx, lora_scale=lora_scale)
        return eps.reshape(B, P, H, W, C)

    def decode(self, latents: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        """[B, P, h, w, 4] -> [B, P, 8h, 8w, output_dim] feature planes.

        With gradient_checkpoint the six planes decode sequentially
        (lax.map + remat): the decoder is plane-independent, so peak
        activation memory drops 6x for the same FLOPs — needed to fit the
        training step in one chip's HBM (the reference instead demands
        >=46 GB GPUs, README.md:197-205).
        """
        c = self.cfg
        B, P, h, w, C = latents.shape
        if c.gradient_checkpoint:
            dec = nn.remat(lambda mdl, l: mdl.vae.decode(l, lora_scale))
            outs = [dec(self, latents[:, p]) for p in range(P)]
            return jnp.stack(outs, axis=1)
        x = latents.reshape(B * P, h, w, C)
        planes = self.vae.decode(x, lora_scale)
        return planes.reshape(B, P, *planes.shape[-3:])

    def __call__(self, latents: jax.Array) -> jax.Array:
        return self.decode(latents)

    def init_all(self, noisy, text_embed, t, latents):
        eps = self.denoise(noisy, text_embed, t)
        planes = self.decode(latents)
        return eps, planes
