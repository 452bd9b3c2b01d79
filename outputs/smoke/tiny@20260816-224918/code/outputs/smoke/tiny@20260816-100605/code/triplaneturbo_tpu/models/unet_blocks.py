"""UNet building blocks: adapted convs, resnets, up/down sampling, embeddings.

Flax/NHWC building blocks for the SD-2.1-family UNets (student + teachers).
LoCon conv adapters follow the reference's scheme of attaching a low-rank conv
delta to every conv in UNet/VAE
(/root/reference/triplaneturbo_executable/extern/sd_dual_triplane_modules.py:863-891).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .lora import LoConAdapter, PlaneLoConAdapter


def _n_groups(groups: int, channels: int) -> int:
    """Largest divisor of ``channels`` not exceeding ``groups`` (SD always uses
    32 | channels; this keeps tiny test configs valid)."""
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g



def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics; SD uses flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class AdaptedConv(nn.Module):
    """Conv with an optional LoCon low-rank delta.

    locon_type: "none" | "vanilla_v1" (shared) | "hexa_v1" (per-plane).
    For hexa the caller must supply n_planes so [B*P, H, W, C] can be
    regrouped.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    locon_type: str = "none"
    locon_rank: int = 16
    locon_bias: bool = False
    n_planes: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        y = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.locon_type in ("none", None):
            return y
        if self.locon_type in ("vanilla_v1", "vanilla"):
            delta = LoConAdapter(
                self.features, rank=self.locon_rank, kernel_size=self.kernel_size,
                strides=self.strides, padding=self.padding, with_bias=self.locon_bias,
                name="locon",
            )(x)
            return y + lora_scale * delta
        if self.locon_type in ("hexa_v1",):
            N, H, W, C = x.shape
            P = self.n_planes
            xp = x.reshape(N // P, P, H, W, C)
            delta = PlaneLoConAdapter(
                self.features, n_planes=P, rank=self.locon_rank,
                kernel_size=self.kernel_size, strides=self.strides,
                padding=self.padding, with_bias=self.locon_bias, name="locon",
            )(xp)
            return y + lora_scale * delta.reshape(y.shape)
        raise ValueError(f"Unknown locon type {self.locon_type}")


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv -> (+time emb) -> GN -> silu -> conv, residual."""

    out_channels: int
    time_emb_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5
    locon_type: str = "none"
    locon_rank: int = 16
    n_planes: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: Optional[jax.Array] = None, lora_scale: float = 1.0
    ) -> jax.Array:
        in_ch = x.shape[-1]
        conv_kw = dict(
            locon_type=self.locon_type, locon_rank=self.locon_rank,
            n_planes=self.n_planes, dtype=self.dtype,
        )
        h = nn.GroupNorm(num_groups=_n_groups(self.groups, in_ch), epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = AdaptedConv(self.out_channels, name="conv1", **conv_kw)(h, lora_scale)
        if temb is not None and self.time_emb_dim is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=_n_groups(self.groups, self.out_channels), epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = AdaptedConv(self.out_channels, name="conv2", **conv_kw)(h, lora_scale)
        if in_ch != self.out_channels:
            x = AdaptedConv(
                self.out_channels, kernel_size=(1, 1), padding=0,
                name="conv_shortcut", **conv_kw,
            )(x, lora_scale)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    locon_type: str = "none"
    locon_rank: int = 16
    n_planes: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        # torch Conv2d(stride=2, padding=1) on even sizes == asymmetric pad
        # ((1,1),(1,1)) keeps parity for the 32x32 latents used here
        return AdaptedConv(
            self.out_channels, strides=(2, 2), padding=1,
            locon_type=self.locon_type, locon_rank=self.locon_rank,
            n_planes=self.n_planes, dtype=self.dtype, name="conv",
        )(x, lora_scale)


class Upsample2D(nn.Module):
    out_channels: int
    locon_type: str = "none"
    locon_rank: int = 16
    n_planes: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), method="nearest")
        return AdaptedConv(
            self.out_channels, locon_type=self.locon_type,
            locon_rank=self.locon_rank, n_planes=self.n_planes,
            dtype=self.dtype, name="conv",
        )(x, lora_scale)
