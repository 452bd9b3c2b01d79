"""Hypernet environment-map background + the LinearHyperNetwork.

Rebuild of ``multi-prompt-neural-hashgrid-environment-map-background``
(/root/reference/custom/triplaneturbo/models/background/
multi_prompt_neural_environment_hashgrid_map_background.py:18-124) and
``LinearHyperNetwork`` (custom/triplaneturbo/models/geometry/
hypernetwork.py:18-111): the prompt's pooled text embedding generates
per-prompt 2-layer MLP weights [enc_out -> 64 -> 3]; view directions are
hash-encoded and pushed through those generated weights (bias-free bmm),
ending in the MipNeRF-clamped sigmoid. Eval returns a fixed color (white).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import triplaneturbo_tpu as ttt

from ...ops.hashgrid import HashGridConfig, HashGridEncoding
from ..networks import get_activation


@dataclass(frozen=True)
class HyperNetConfig:
    c_dim: int = 1024
    out_dims: Tuple[Tuple[str, Tuple[int, ...]], ...] = (("bg_weights", (64, 3)),)
    n_neurons: int = 64
    n_hidden_layers: int = 1
    output_activation: Optional[str] = None


class LinearHyperNetwork(nn.Module):
    """text embedding [B, c_dim] -> dict of per-prompt weight matrix lists."""

    n_input_dims: int
    cfg: HyperNetConfig = HyperNetConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, List[jax.Array]]:
        c = self.cfg
        # resolve generated-MLP shapes: [n_input_dims] + dims
        chains = {name: (self.n_input_dims,) + tuple(dims) for name, dims in c.out_dims}
        n_out = sum(
            i * o for dims in chains.values() for i, o in zip(dims[:-1], dims[1:])
        )

        h = x.astype(jnp.float32)
        h = nn.Dense(c.n_neurons, use_bias=False, kernel_init=nn.initializers.xavier_normal(), name="fc_in")(h)
        h = nn.LayerNorm(name="ln_in")(h)
        h = nn.silu(h)
        for i in range(c.n_hidden_layers - 1):
            h = nn.Dense(c.n_neurons, kernel_init=nn.initializers.xavier_normal(), name=f"fc_{i}")(h)
            h = nn.LayerNorm(name=f"ln_{i}")(h)
            h = nn.silu(h)
        h = nn.Dense(n_out, kernel_init=nn.initializers.xavier_normal(), name="fc_out")(h)
        if c.output_activation:
            h = get_activation(c.output_activation)(h)

        out: Dict[str, List[jax.Array]] = {}
        start = 0
        for name, dims in chains.items():
            mats = []
            for i, o in zip(dims[:-1], dims[1:]):
                mats.append(h[:, start : start + i * o].reshape(-1, i, o))
                start += i * o
            out[name] = mats
        return out


@dataclass
class HashgridBackgroundConfig:
    n_output_dims: int = 3
    color_activation: str = "sigmoid-mipnerf"
    encoding: HashGridConfig = field(default_factory=HashGridConfig)
    hypernet: HyperNetConfig = field(default_factory=HyperNetConfig)
    random_aug: bool = False
    random_aug_prob: float = 0.5
    eval_color: Optional[Tuple[float, float, float]] = (1.0, 1.0, 1.0)


@ttt.register("multi-prompt-neural-hashgrid-environment-map-background")
class HashgridEnvironmentMapBackground(nn.Module):
    cfg: HashgridBackgroundConfig = field(default_factory=HashgridBackgroundConfig)

    def setup(self):
        self.encoding = HashGridEncoding(self.cfg.encoding)
        self.hypernet = LinearHyperNetwork(
            self.cfg.encoding.n_output_dims, self.cfg.hypernet
        )

    def __call__(
        self,
        dirs: jax.Array,  # [B, H, W, 3] normalized view dirs
        text_embed: Optional[jax.Array] = None,  # [Bp, c_dim] pooled
        train: bool = True,
        aug_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.cfg
        B, H, W, _ = dirs.shape
        if not train and c.eval_color is not None:
            return jnp.broadcast_to(jnp.asarray(c.eval_color), (B, H, W, c.n_output_dims))

        weights = self.hypernet(text_embed)["bg_weights"]  # list of [Bp, i, o]
        enc = self.encoding(((dirs + 1.0) / 2.0).reshape(-1, 3))
        enc = enc.reshape(B, H * W, -1)

        h = enc
        for idx, wmat in enumerate(weights):
            nv = B // wmat.shape[0]
            wmat = jnp.repeat(wmat, nv, axis=0)
            h = jnp.einsum("bnc,bco->bno", h, wmat)
            if idx < len(weights) - 1:
                h = jax.nn.relu(h)
        color = get_activation(c.color_activation)(h).reshape(B, H, W, c.n_output_dims)

        if train and c.random_aug and aug_key is not None:
            k1, k2 = jax.random.split(aug_key)
            use_aug = jax.random.uniform(k1) < c.random_aug_prob
            rand_color = jax.random.uniform(k2, (B, 1, 1, c.n_output_dims))
            color = jnp.where(use_aug, jnp.broadcast_to(rand_color, color.shape), color)
        return color


@ttt.register("solid-color-background")
class SolidColorBackground(nn.Module):
    """Fixed/learned solid color (threestudio solid-color-background analog)."""

    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, dirs: jax.Array, text_embed=None, train: bool = True, aug_key=None):
        B, H, W, _ = dirs.shape
        return jnp.broadcast_to(jnp.asarray(self.color), (B, H, W, 3))
