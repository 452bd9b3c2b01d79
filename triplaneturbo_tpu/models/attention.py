"""Attention + transformer blocks for the diffusion UNets (flax, NHWC).

TPU-first rebuild of the diffusers attention stack the reference adapts with
custom processors (/root/reference/triplaneturbo_executable/extern/
sd_dual_triplane_modules.py:214-698). Key design moves:

* The "hexa" per-plane LoRA routing is a plane-axis einsum
  (:class:`..lora.PlaneLoRAAdapter`) instead of six strided slices — one MXU
  matmul instead of 6 small ones.
* The cross-plane/cross-view "joint token" self-attention (the reference
  reshapes ``(B·P, L, C) -> (B, P·L, C)``; sd_dual_triplane_modules.py:410-425
  for triplanes, extern/mvdream/ldm/modules/attention.py:343-355 for MVDream's
  4-view attention) is a static reshape around one fused attention call —
  flash-attention friendly (6·64·64 = 24,576 tokens max fits a single chip,
  SURVEY §5.7).
* Attention is the Pallas fused kernel (ops/attention_pallas.py) with an
  einsum fallback; jax.nn.dot_product_attention is avoided (50x slower here).

LoRA placement parity with the reference:
  hexa:    q/k/v adapters see the projection INPUT; the out adapter sees the
           base out-projection OUTPUT (sd_dual_triplane_modules.py:440-470).
  vanilla: all adapters see the projection input.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .lora import LoRAAdapter, PlaneLoRAAdapter


@dataclass(frozen=True)
class AdapterSpec:
    """Which adapters to install on an attention layer."""

    self_lora_type: str = "none"  # "none" | "vanilla" | "basic" | "hexa_v1"
    cross_lora_type: str = "none"
    self_rank: int = 16
    cross_rank: int = 16
    n_planes: int = 6
    with_bias: bool = False
    # joint self-attention across the plane/view axis (triplanes: 6; MVDream: 4)
    joint_self_attention: bool = False
    joint_group: int = 6

    def none(self) -> "AdapterSpec":
        return AdapterSpec()


NO_ADAPTERS = AdapterSpec()


class Attention(nn.Module):
    """Multi-head attention with optional plane-LoRA and joint-token mode."""

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None -> self-attention
    out_bias: bool = True
    # SD-UNet transformer q/k/v are bias-free, but the VAE mid attention
    # (CompVis q/k/v 1x1 convs, diffusers Attention in AutoencoderKL) has
    # biases — required for converted pretrained VAE weights
    qkv_bias: bool = False
    adapters: AdapterSpec = NO_ADAPTERS
    dtype: jnp.dtype = jnp.float32

    @property
    def is_cross(self) -> bool:
        return self.cross_attention_dim is not None

    def _lora_type(self) -> str:
        return self.adapters.cross_lora_type if self.is_cross else self.adapters.self_lora_type

    def _rank(self) -> int:
        return self.adapters.cross_rank if self.is_cross else self.adapters.self_rank

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # [N, L, C]
        encoder_hidden_states: Optional[jax.Array] = None,  # [N, Lc, Cc]
        lora_scale: float = 1.0,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        lora_type = self._lora_type()
        rank = self._rank()
        P = self.adapters.n_planes
        N, L, _ = hidden_states.shape

        to_q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out")

        def with_lora(name: str, base_fn, x: jax.Array, out_features: int) -> jax.Array:
            """base(x) + scale * lora(x) with the configured routing."""
            y = base_fn(x)
            if lora_type in ("none",) or lora_type is None:
                return y
            if lora_type in ("vanilla", "basic"):
                delta = LoRAAdapter(
                    out_features, rank=rank, with_bias=self.adapters.with_bias,
                    name=f"lora_{name}",
                )(x)
                return y + lora_scale * delta
            if lora_type == "hexa_v1":
                xp = x.reshape(N // P, P, x.shape[1], x.shape[2])
                delta = PlaneLoRAAdapter(
                    out_features, n_planes=P, rank=rank,
                    with_bias=self.adapters.with_bias, name=f"lora_{name}",
                )(xp).reshape(N, x.shape[1], out_features)
                return y + lora_scale * delta
            raise ValueError(f"Unknown lora type {lora_type}")

        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        q = with_lora("q", to_q, hidden_states, inner)
        k = with_lora("k", to_k, ctx, inner)
        v = with_lora("v", to_v, ctx, inner)

        # joint-token mode is orthogonal to LoRA (MVDream's 4-view attention
        # has no LoRA; the student's 6-plane attention has hexa LoRA)
        joint = not self.is_cross and self.adapters.joint_self_attention
        G = self.adapters.joint_group
        if joint:
            # (B*G, L, C) -> (B, G*L, C): planes/views attend jointly
            q = q.reshape(N // G, G * L, inner)
            k = k.reshape(N // G, G * k.shape[1], inner)
            v = v.reshape(N // G, G * v.shape[1], inner)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        # fused Pallas attention on TPU (einsum fallback elsewhere); NOTE
        # jax.nn.dot_product_attention lowers ~50x slower than either path on
        # this backend (measured 45ms vs ~1ms at 6k tokens)
        from ..ops.attention_pallas import attention as fused_attention_dispatch

        attn_out = fused_attention_dispatch(
            split_heads(q), split_heads(k), split_heads(v)
        )
        attn_out = attn_out.reshape(attn_out.shape[0], attn_out.shape[1], inner)
        if joint:
            attn_out = attn_out.reshape(N, L, inner)

        # out projection; NOTE hexa applies its adapter to the *output*
        out = to_out(attn_out)
        if lora_type in ("vanilla", "basic") and lora_type != "none":
            delta = LoRAAdapter(
                self.query_dim, rank=rank, with_bias=self.adapters.with_bias,
                name="lora_out",
            )(attn_out)
            out = out + lora_scale * delta
        elif lora_type == "hexa_v1":
            op = out.reshape(N // P, P, L, self.query_dim)
            delta = PlaneLoRAAdapter(
                self.query_dim, n_planes=P, rank=rank,
                with_bias=self.adapters.with_bias, name="lora_out",
            )(op).reshape(N, L, self.query_dim)
            out = out + lora_scale * delta
        return out


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return x


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> FF, all residual."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    adapters: AdapterSpec = NO_ADAPTERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, adapters=self.adapters,
            dtype=self.dtype, name="attn1",
        )(h, lora_scale=lora_scale)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            adapters=self.adapters, dtype=self.dtype, name="attn2",
        )(h, encoder_hidden_states=context, lora_scale=lora_scale)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> linear proj in -> blocks -> proj out + res.

    use_linear_projection=True (SD-2.1 style). Input [N, H, W, C].
    """

    heads: int
    dim_head: int
    depth: int
    cross_attention_dim: int
    adapters: AdapterSpec = NO_ADAPTERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, lora_scale: float = 1.0) -> jax.Array:
        N, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = nn.GroupNorm(num_groups=min(32, C) if C % min(32, C) == 0 else 1, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(N, H * W, C)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                adapters=self.adapters, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context, lora_scale)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(N, H, W, C) + residual
