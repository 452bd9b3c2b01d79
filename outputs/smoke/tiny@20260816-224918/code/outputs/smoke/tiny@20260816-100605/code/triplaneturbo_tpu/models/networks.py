"""Small network library: activations + the bias-free VanillaMLP.

Rebuilds the surface of the reference MLP stack
(/root/reference/triplaneturbo_executable/models/networks.py:8-83,
threestudio/models/networks.py:67-126). The reference force-disables autocast
for these MLPs; here the equivalent policy is explicit: params and compute are
float32 unless the caller casts (TPU MXU is fed by the surrounding matmuls).

The reference's tcnn HashGrid encoding equivalent lives in
:mod:`triplaneturbo_tpu.ops.hashgrid`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_activation(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Activation registry incl. the MipNeRF-clamped sigmoid used for colors
    (reference: models/networks.py:13-16, threestudio/utils/ops.py:89-125)."""
    if name is None:
        return lambda x: x
    key = name.lower()
    if key == "none":
        return lambda x: x
    if key == "sigmoid-mipnerf":
        return lambda x: jax.nn.sigmoid(x) * (1 + 2 * 0.001) - 0.001
    if key == "exp":
        return jnp.exp
    if key == "shifted_exp":
        return lambda x: jnp.exp(x - 1.0)
    if key == "trunc_exp":
        # exp with clipped gradient for stability
        return _trunc_exp
    if key == "shifted_trunc_exp":
        return lambda x: _trunc_exp(x - 1.0)
    if key == "sigmoid":
        return jax.nn.sigmoid
    if key == "tanh":
        return jnp.tanh
    if key == "relu":
        return jax.nn.relu
    if key == "softplus":
        return jax.nn.softplus
    if key == "scale_-11_01":
        return lambda x: x * 0.5 + 0.5
    if hasattr(jax.nn, key):
        return getattr(jax.nn, key)
    raise ValueError(f"Unknown activation function: {name}")


@jax.custom_vjp
def _trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15, 15)),)


_trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@dataclass
class MLPConfig:
    otype: str = "VanillaMLP"
    activation: str = "ReLU"
    output_activation: str = "none"
    n_neurons: int = 64
    n_hidden_layers: int = 2


class VanillaMLP(nn.Module):
    """Bias-free ReLU MLP: dim_in -> n_neurons x n_hidden_layers -> dim_out.

    Matches the reference VanillaMLP (bias-free Linear stack, ReLU, optional
    output activation; models/networks.py:23-62). Kept float32 regardless of
    surrounding mixed precision, like the reference's autocast-disable.
    """

    dim_out: int
    config: MLPConfig = field(default_factory=MLPConfig)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        act = get_activation(cfg.activation)
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        for _ in range(cfg.n_hidden_layers):
            x = nn.Dense(cfg.n_neurons, use_bias=False, dtype=jnp.float32)(x)
            x = act(x)
        x = nn.Dense(self.dim_out, use_bias=False, dtype=jnp.float32)(x)
        x = get_activation(cfg.output_activation)(x)
        return x.astype(orig_dtype)


def get_mlp(output_dim: int, config: Union[Dict[str, Any], MLPConfig]) -> VanillaMLP:
    """Factory mirroring the reference get_mlp (models/networks.py:74-83)."""
    if isinstance(config, dict):
        config = MLPConfig(**{k: v for k, v in config.items() if k in MLPConfig.__dataclass_fields__})
    if config.otype != "VanillaMLP":
        raise ValueError(f"Unknown MLP type: {config.otype}")
    return VanillaMLP(dim_out=output_dim, config=config)
