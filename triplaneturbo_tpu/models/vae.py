"""SD AutoencoderKL (flax/NHWC): decoder with the triplane conv_out retrofit,
encoder for the teacher image->latent paths.

Rebuild of the VAE roles in the reference:
* student decode path: VAE decoder with LoCon conv adapters, "basic" LoRA on
  the mid attention, and decoder.conv_out REPLACED by a trainable
  128 -> output_dim (64) conv (/root/reference/triplaneturbo_executable/
  extern/sd_dual_triplane_modules.py:833-846, forward_decode :973-981);
* teacher encode path: plain SD encoder (MVDream/SD guidance VAE-encode
  renders to latents; RichDreamer runs "wovae").

No latent scaling factor is applied in decode — the reference's
``forward_decode`` calls ``vae.decode`` on raw latents (SURVEY §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import AdapterSpec, Attention
from .unet_blocks import AdaptedConv, ResnetBlock2D, Upsample2D, _n_groups


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    # decoder retrofit: if set, conv_out maps 128 -> output_dim (trainable)
    output_dim: Optional[int] = None
    # adapters (student decode path): "basic" attn LoRA + vanilla_v1 LoCon
    attn_lora_type: str = "none"
    locon_type: str = "none"
    rank: int = 16
    scaling_factor: float = 0.18215
    remat: bool = False
    dtype_str: str = "float32"

    @property
    def dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype_str]


class VAEAttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (SD VAE mid attention),
    with optional vanilla/basic LoRA (vae_attn_type "basic",
    sd_dual_triplane_modules.py:793-800)."""

    channels: int
    lora_type: str = "none"
    rank: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        N, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=_n_groups(32, C), epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(N, H * W, C)
        h = Attention(
            query_dim=C,
            heads=1,
            dim_head=C,
            qkv_bias=True,  # CompVis/diffusers VAE attention q/k/v carry biases
            adapters=AdapterSpec(self_lora_type=self.lora_type, self_rank=self.rank),
            dtype=self.dtype,
            name="attention",
        )(h, lora_scale=lora_scale)
        return x + h.reshape(N, H, W, C)


class Decoder(nn.Module):
    cfg: VAEConfig = field(default_factory=VAEConfig)

    @nn.compact
    def __call__(self, z: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        cfg = self.cfg
        dtype = cfg.dtype
        res_kw = dict(
            time_emb_dim=None, groups=32, eps=1e-6, locon_type=cfg.locon_type,
            locon_rank=cfg.rank, dtype=dtype,
        )
        # remat each resnet when training memory is tight (the 256² x 6-plane
        # decode backward otherwise stores every up-block activation)
        ResBlock = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        ch_top = cfg.block_out_channels[-1]
        h = AdaptedConv(ch_top, locon_type="none", dtype=dtype, name="conv_in")(
            z.astype(dtype), lora_scale
        )
        # mid
        h = ResBlock(out_channels=ch_top, name="mid_res_0", **res_kw)(h, None, lora_scale)
        h = VAEAttnBlock(
            ch_top, lora_type=cfg.attn_lora_type, rank=cfg.rank, dtype=dtype, name="mid_attn"
        )(h, lora_scale)
        h = ResBlock(out_channels=ch_top, name="mid_res_1", **res_kw)(h, None, lora_scale)
        # up
        rev = tuple(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResBlock(out_channels=ch, name=f"up_{i}_res_{j}", **res_kw)(
                    h, None, lora_scale
                )
            if i < len(rev) - 1:
                h = Upsample2D(
                    ch, locon_type=cfg.locon_type, locon_rank=cfg.rank,
                    dtype=dtype, name=f"up_{i}_upsample",
                )(h, lora_scale)
        h = nn.GroupNorm(
            num_groups=_n_groups(32, rev[-1]), epsilon=1e-6, dtype=dtype, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        if cfg.output_dim is not None:
            # the trainable retrofit conv (name contains "retrofit" so the
            # trainable-param filter selects it; reference :833-846)
            out = nn.Conv(
                cfg.output_dim, (3, 3), padding=1, dtype=dtype, name="conv_out_retrofit"
            )(h)
        else:
            out = nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=dtype, name="conv_out")(h)
        return out.astype(jnp.float32)


class Encoder(nn.Module):
    cfg: VAEConfig = field(default_factory=VAEConfig)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """Returns moments [N, h, w, 2*latent_channels] (mean ++ logvar)."""
        cfg = self.cfg
        dtype = cfg.dtype
        res_kw = dict(time_emb_dim=None, groups=32, eps=1e-6, locon_type="none", dtype=dtype)
        h = AdaptedConv(cfg.block_out_channels[0], locon_type="none", dtype=dtype, name="conv_in")(
            x.astype(dtype)
        )
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_channels=ch, name=f"down_{i}_res_{j}", **res_kw)(h, None)
            if i < len(cfg.block_out_channels) - 1:
                # SD/LDM VAE downsample pads RIGHT/BOTTOM only ((0,1,0,1),
                # diffusers Downsample2D padding=0 + F.pad; mvdream
                # model.py:84-86) — symmetric padding would shift every conv
                # window one pixel against converted pretrained kernels
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = AdaptedConv(
                    ch, strides=(2, 2), padding=0, locon_type="none", dtype=dtype,
                    name=f"down_{i}_downsample",
                )(h)
        ch_top = cfg.block_out_channels[-1]
        h = ResnetBlock2D(out_channels=ch_top, name="mid_res_0", **res_kw)(h, None)
        h = VAEAttnBlock(ch_top, dtype=dtype, name="mid_attn")(h)
        h = ResnetBlock2D(out_channels=ch_top, name="mid_res_1", **res_kw)(h, None)
        h = nn.GroupNorm(
            num_groups=_n_groups(32, ch_top), epsilon=1e-6, dtype=dtype, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """post_quant_conv + decoder / encoder + quant_conv, SD layout."""

    cfg: VAEConfig = field(default_factory=VAEConfig)

    def setup(self):
        self.decoder = Decoder(self.cfg)
        self.encoder = Encoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), name="post_quant_conv")

    def decode(self, z: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        return self.decoder(self.post_quant_conv(z), lora_scale)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(x))

    def encode(
        self, x: jax.Array, key: Optional[jax.Array] = None, scale: bool = True
    ) -> jax.Array:
        """Encode to latents; sample when a key is given, else the mean."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        if scale:
            mean = mean * self.cfg.scaling_factor
        return mean

    def __call__(self, z, lora_scale: float = 1.0):
        return self.decode(z, lora_scale)


def student_vae_config(
    output_dim: int = 64, rank: int = 16, dtype_str: str = "float32", remat: bool = False
) -> VAEConfig:
    """The retrofitted student decoder (vae_attn_type 'basic', vanilla_v1
    LoCon, 64ch conv_out; triplaneturbo_text_to_3d.py:57-66)."""
    return VAEConfig(
        output_dim=output_dim,
        attn_lora_type="basic",
        locon_type="vanilla_v1",
        rank=rank,
        dtype_str=dtype_str,
        remat=remat,
    )
