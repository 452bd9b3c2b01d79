"""Conditional diffusion UNet (SD-2.1 family), flax/NHWC, TPU-first.

One configurable implementation covers all four UNets the reference uses
(SURVEY §2.1/§2.4 — four separate torch codebases there):

* the triplane **student**: SD-2.1-base UNet with hexa-LoRA self-attention,
  vanilla cross-LoRA and LoCon conv adapters, 6-plane joint self-attention
  (/root/reference/triplaneturbo_executable/extern/sd_dual_triplane_modules.py);
* the **SD-2.1 teacher**: same arch, no adapters;
* **MVDream**: + 16-dim camera embedding added to the time embedding and
  4-view joint self-attention (extern/mvdream/ldm/modules/
  diffusionmodules/openaimodel.py:811-1209, attention.py:343-355);
* **RichDreamer** (nd-mv): context_dim 768 + camera embedding
  (extern/nd_sd/ldm/modules/diffusionmodules/openaimodel_v2_1.py).

Everything is static-shaped and jit-friendly; remat is applied per block when
``remat=True`` (the reference's gradient checkpointing,
few_step_triplane_dual_sd_modules.py:863-865).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import NO_ADAPTERS, AdapterSpec, Transformer2D
from .unet_blocks import (
    _n_groups,
    AdaptedConv,
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    timestep_embedding,
)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # per-head dim; heads = channels // this
    # fixed head COUNT (RichDreamer: num_heads=8 -> dim_head = ch // 8 per
    # level, nd_sd openaimodel_v2_1.py:618); overrides attention_head_dim
    attention_num_heads: Optional[int] = None
    transformer_depth: int = 1
    camera_dim: Optional[int] = None  # MVDream/RichDreamer camera conditioning
    adapters: AdapterSpec = NO_ADAPTERS
    locon_type: str = "none"
    locon_rank: int = 16
    remat: bool = False
    dtype_str: str = "float32"

    @property
    def dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype_str]


class UNet2DConditionModel(nn.Module):
    """SD-style UNet. sample: [N, H, W, C_in], context: [N, L, D]."""

    cfg: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        camera: Optional[jax.Array] = None,
        lora_scale: float = 1.0,
    ) -> jax.Array:
        cfg = self.cfg
        dtype = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        time_dim = ch0 * 4
        n_blocks = len(cfg.block_out_channels)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # time (+camera) embedding
        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(time_dim, dtype=dtype, name="time_embedding_linear_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(time_dim, dtype=dtype, name="time_embedding_linear_2")(temb)
        if cfg.camera_dim is not None and camera is not None:
            cemb = nn.Dense(time_dim, dtype=dtype, name="camera_embedding_linear_1")(camera)
            cemb = nn.silu(cemb)
            cemb = nn.Dense(time_dim, dtype=dtype, name="camera_embedding_linear_2")(cemb)
            temb = temb + cemb

        res_kw = dict(
            time_emb_dim=time_dim, locon_type=cfg.locon_type,
            locon_rank=cfg.locon_rank, n_planes=cfg.adapters.n_planes, dtype=dtype,
        )

        ResBlock = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        AttnBlock = (
            nn.remat(Transformer2D, static_argnums=()) if cfg.remat else Transformer2D
        )

        def make_attn(ch: int, name: str) -> Transformer2D:
            if cfg.attention_num_heads is not None:
                heads, dim_head = cfg.attention_num_heads, ch // cfg.attention_num_heads
            else:
                heads, dim_head = ch // cfg.attention_head_dim, cfg.attention_head_dim
            return AttnBlock(
                heads=heads,
                dim_head=dim_head,
                depth=cfg.transformer_depth,
                cross_attention_dim=cfg.cross_attention_dim,
                adapters=cfg.adapters,
                dtype=dtype,
                name=name,
            )

        ctx = encoder_hidden_states.astype(dtype)
        # conv_in/conv_out are plain convs in the reference (diffusers only
        # attaches LoCon to LoRACompatibleConv, i.e. resnet/sampling convs)
        h = AdaptedConv(ch0, locon_type="none", dtype=dtype, name="conv_in")(
            sample.astype(dtype), lora_scale
        )

        # ---- down path -----------------------------------------------------
        residuals = [h]
        for i, ch in enumerate(cfg.block_out_channels):
            has_attn = i < n_blocks - 1  # last down block is attention-free
            for j in range(cfg.layers_per_block):
                h = ResBlock(out_channels=ch, name=f"down_{i}_res_{j}", **res_kw)(
                    h, temb, lora_scale
                )
                if has_attn:
                    h = make_attn(ch, f"down_{i}_attn_{j}")(h, ctx, lora_scale)
                residuals.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(
                    ch, locon_type=cfg.locon_type, locon_rank=cfg.locon_rank,
                    n_planes=cfg.adapters.n_planes, dtype=dtype, name=f"down_{i}_downsample",
                )(h, lora_scale)
                residuals.append(h)

        # ---- mid -----------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResBlock(out_channels=mid_ch, name="mid_res_0", **res_kw)(h, temb, lora_scale)
        h = make_attn(mid_ch, "mid_attn")(h, ctx, lora_scale)
        h = ResBlock(out_channels=mid_ch, name="mid_res_1", **res_kw)(h, temb, lora_scale)

        # ---- up path -------------------------------------------------------
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev_channels):
            has_attn = i > 0  # first up block (mirror of last down) has no attn
            for j in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResBlock(out_channels=ch, name=f"up_{i}_res_{j}", **res_kw)(
                    h, temb, lora_scale
                )
                if has_attn:
                    h = make_attn(ch, f"up_{i}_attn_{j}")(h, ctx, lora_scale)
            if i < n_blocks - 1:
                h = Upsample2D(
                    ch, locon_type=cfg.locon_type, locon_rank=cfg.locon_rank,
                    n_planes=cfg.adapters.n_planes, dtype=dtype, name=f"up_{i}_upsample",
                )(h, lora_scale)

        h = nn.GroupNorm(num_groups=_n_groups(32, ch0), epsilon=1e-5, dtype=dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = AdaptedConv(cfg.out_channels, locon_type="none", dtype=dtype, name="conv_out")(h, lora_scale)
        return h.astype(jnp.float32)


def sd21_student_config(
    self_lora_type: str = "hexa_v1",
    cross_lora_type: str = "vanilla",
    locon_type: str = "vanilla_v1",
    rank: int = 16,
    n_planes: int = 6,
    remat: bool = False,
    dtype_str: str = "float32",
) -> UNetConfig:
    """The triplane student UNet: SD-2.1-base + adapters
    (configs/TriplaneTurbo_v1.yaml:89-94)."""
    return UNetConfig(
        adapters=AdapterSpec(
            self_lora_type=self_lora_type,
            cross_lora_type=cross_lora_type,
            self_rank=rank,
            cross_rank=rank,
            n_planes=n_planes,
            joint_self_attention=True,
            joint_group=n_planes,
        ),
        locon_type=locon_type,
        locon_rank=rank,
        remat=remat,
        dtype_str=dtype_str,
    )


def sd21_teacher_config(dtype_str: str = "bfloat16", remat: bool = False) -> UNetConfig:
    return UNetConfig(dtype_str=dtype_str, remat=remat)


def mvdream_config(dtype_str: str = "bfloat16", remat: bool = False) -> UNetConfig:
    """MVDream sd-v2.1-base-4view: camera_dim 16, 4-view joint self-attention."""
    return UNetConfig(
        camera_dim=16,
        adapters=AdapterSpec(joint_self_attention=True, joint_group=4),
        dtype_str=dtype_str,
        remat=remat,
    )


def richdreamer_config(dtype_str: str = "bfloat16", remat: bool = False) -> UNetConfig:
    """RichDreamer nd-mv: SD-1.5 text space (768), camera cond, 4-view attn,
    fixed num_heads=8 (config txtcond_mvsd-4-objaverse_finetune_wovae.yaml)."""
    return UNetConfig(
        cross_attention_dim=768,
        camera_dim=16,
        attention_num_heads=8,
        adapters=AdapterSpec(joint_self_attention=True, joint_group=4),
        dtype_str=dtype_str,
        remat=remat,
    )
