"""LoRA / LoCon adapters with per-plane ("hexa") routing, TPU-first.

Rebuild of the reference adapter machinery
(/root/reference/triplaneturbo_executable/extern/sd_dual_triplane_modules.py:16-212):

* ``LoRAAdapter``: the vanilla low-rank linear delta (down: normal(0, 1/r),
  up: zeros — so adapters start as identity);
* ``PlaneLoRAAdapter``: the "hexa_v1" variant. The reference keeps 6 separate
  nn.Modules and routes batch strides ``hidden[0::6] -> xy_geo`` etc.
  (sd_dual_triplane_modules.py:305-345). TPU-first design: ONE parameter
  tensor stacked over the plane axis ``[P, in, r] x [P, r, out]`` applied as a
  single batched einsum over ``[B, P, L, C]`` — same math, one big MXU matmul
  instead of 6 strided small ones;
* ``LoConAdapter``: low-rank conv pair (down conv kxk -> rank, up conv 1x1),
  the reference's TriplaneLoRAConv2dLayer "vanilla_v1"
  (sd_dual_triplane_modules.py:80-212); ``PlaneLoConAdapter`` is the hexa
  variant (six conv adapter sets batched over the plane axis).

Parameter naming: every adapter module name contains "lora" or "locon" so the
trainable-parameter filter (the reference's AttnProcsLayers peft_layers,
sd_dual_triplane_modules.py:840-846) is a simple path predicate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _down_init(rank: int):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / rank

    return init


class LoRAAdapter(nn.Module):
    """Vanilla LoRA delta for a linear layer: x @ down @ up (+ bias)."""

    out_features: int
    rank: int = 16
    network_alpha: Optional[float] = None
    with_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        down = self.param("down", _down_init(self.rank), (in_features, self.rank))
        up = self.param("up", nn.initializers.zeros, (self.rank, self.out_features))
        orig_dtype = x.dtype
        h = (x.astype(jnp.float32) @ down) @ up
        if self.with_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_features,))
            h = h + b
        if self.network_alpha is not None:
            h = h * (self.network_alpha / self.rank)
        return h.astype(orig_dtype)


class PlaneLoRAAdapter(nn.Module):
    """Per-plane LoRA: input [B, P, L, C] -> [B, P, L, out], one einsum.

    Equivalent to the reference's six separate LoRALinearLayerwBias modules
    with stride routing (hexa_v1); plane p uses its own (down_p, up_p).
    """

    out_features: int
    n_planes: int = 6
    rank: int = 16
    network_alpha: Optional[float] = None
    with_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 4 and x.shape[1] == self.n_planes, (
            f"expected [B, {self.n_planes}, L, C], got {x.shape}"
        )
        in_features = x.shape[-1]
        down = self.param(
            "down", _down_init(self.rank), (self.n_planes, in_features, self.rank)
        )
        up = self.param(
            "up", nn.initializers.zeros, (self.n_planes, self.rank, self.out_features)
        )
        orig_dtype = x.dtype
        h = jnp.einsum("bplc,pcr->bplr", x.astype(jnp.float32), down)
        h = jnp.einsum("bplr,pro->bplo", h, up)
        if self.with_bias:
            b = self.param("bias", nn.initializers.zeros, (self.n_planes, self.out_features))
            h = h + b[None, :, None, :]
        if self.network_alpha is not None:
            h = h * (self.network_alpha / self.rank)
        return h.astype(orig_dtype)


class LoConAdapter(nn.Module):
    """Low-rank conv delta: down kxk conv -> rank channels -> up 1x1 conv.

    Matches TriplaneLoRAConv2dLayer vanilla_v1 (kaiming-init down, zero up,
    sd_dual_triplane_modules.py:165-180). NHWC layout.
    """

    out_features: int
    rank: int = 16
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    with_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        h = nn.Conv(
            self.rank,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            kernel_init=nn.initializers.kaiming_uniform(),
            name="down",
        )(x)
        h = nn.Conv(
            self.out_features,
            (1, 1),
            use_bias=self.with_bias,
            kernel_init=nn.initializers.zeros,
            name="up",
        )(h)
        return h.astype(orig_dtype)


class PlaneLoConAdapter(nn.Module):
    """Per-plane LoCon ("hexa_v1" conv adapters): input [B, P, H, W, C].

    Implemented as grouped convs by folding the plane axis into channels is
    awkward; instead vmap the shared conv shape over a stacked parameter axis.
    """

    out_features: int
    n_planes: int = 6
    rank: int = 16
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    with_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5 and x.shape[1] == self.n_planes
        vconv = nn.vmap(
            LoConAdapter,
            in_axes=1,
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(
            out_features=self.out_features,
            rank=self.rank,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            with_bias=self.with_bias,
            name="planes",
        )
        return vconv(x)


def is_adapter_path(path: Tuple[str, ...]) -> bool:
    """Trainable-parameter predicate: adapter / retrofit params only."""
    joined = "/".join(str(p) for p in path).lower()
    return "lora" in joined or "locon" in joined or "retrofit" in joined
