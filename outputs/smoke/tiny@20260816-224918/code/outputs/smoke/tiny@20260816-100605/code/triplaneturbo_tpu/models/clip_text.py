"""CLIP text encoder (flax): the SD-2.1 prompt tower.

From-scratch rebuild of the role played by ``transformers.CLIPTextModel`` in
the reference (/root/reference/custom/triplaneturbo/models/prompt_processors/
stable_diffusion_multi_prompt_processor_callable.py:108-163): pre-LN causal
transformer over BPE tokens, returning per-token ("local", 77 x width) and
pooled ("global") embeddings. Default config = OpenCLIP ViT-H text tower as
used by SD-2.1-base (width 1024, 23 layers, gelu). The SD-1.5 tower used by
RichDreamer's text space is the same module with width 768 / 12 layers /
quick_gelu.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    layers: int = 23
    heads: int = 16
    intermediate: int = 4096
    max_length: int = 77
    hidden_act: str = "gelu"  # SD-1.5 tower uses "quick_gelu"
    eps: float = 1e-5
    eos_token_id: int = 49407


def sd15_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(width=768, layers=12, heads=12, intermediate=3072, hidden_act="quick_gelu")


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.width // c.heads
        q = nn.Dense(c.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.width, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], c.heads, head_dim)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (head_dim**0.5)
        scores = jnp.where(causal_mask, scores, -1e9)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(qh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        out = out.reshape(x.shape[0], x.shape[1], c.width)
        return nn.Dense(c.width, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.width, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """input_ids: [B, L] int32. Returns (last_hidden [B, L, W], pooled [B, W]).

        Pooling picks the first EOS position (HF CLIPTextModel semantics).
        """
        c = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.width, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (c.max_length, c.width)
        )
        x = tok + pos[None, :L, :]

        causal = jnp.tril(jnp.ones((L, L), bool))[None, None, :, :]
        for i in range(c.layers):
            x = CLIPLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="final_layer_norm")(x)

        is_eos = (input_ids == c.eos_token_id).astype(jnp.int32)
        # first EOS index (argmax returns first max)
        eos_pos = jnp.argmax(is_eos, axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None].repeat(x.shape[-1], -1), axis=1)[:, 0]
        return x.astype(jnp.float32), pooled.astype(jnp.float32)
