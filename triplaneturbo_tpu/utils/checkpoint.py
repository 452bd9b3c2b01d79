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


def save_train_state(path: str, params: Any, opt_state: Any, global_step: int) -> str:
    """Full training checkpoint (params + optimizer state + step) via orbax
    (SURVEY §5.4: reference = PL ModelCheckpoint every 5000 steps)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state, "step": global_step}, force=True)
    return path


def load_train_state(path: str, params_template: Any, opt_state_template: Any):
    """Restore (params, opt_state, step) from an orbax checkpoint."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        item={"params": params_template, "opt_state": opt_state_template, "step": 0},
    )
    return restored["params"], restored["opt_state"], int(restored["step"])


def load_torch_adapter(path: str, geometry_params, strict: bool = False) -> Any:
    """Convert the released torch adapter checkpoint onto our param tree.

    Delegates the key mapping to :func:`~.convert_torch.convert_adapters`
    (hexa-LoRA stacking, vanilla LoRA, LoCon convs, conv_out retrofit, field
    MLPs — the full ``triplane_turbo_sd_v1.pth`` surface, reference loader
    triplaneturbo_text_to_3d.py:166-177). With ``strict`` every converted
    tensor must land on the tree; otherwise mismatches are reported.
    """
    import torch

    from .convert_torch import apply_flat_to_tree, convert_adapters

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    state = {
        k.replace("geometry.", "", 1): np.asarray(v.detach().cpu().float().numpy())
        if hasattr(v, "detach")
        else np.asarray(v)
        for k, v in state.items()
    }

    converted = convert_adapters(state)
    new_params, loaded, mismatched = apply_flat_to_tree(converted, geometry_params)
    ttt.info(
        f"torch adapter conversion: {len(loaded)} tensors loaded, "
        f"{len(mismatched)} unmatched"
    )
    if mismatched:
        for m in mismatched[:20]:
            ttt.warn(f"  adapter mismatch: {m}")
        if strict:
            raise ValueError(
                f"strict adapter load failed: {len(mismatched)} mismatches"
            )
    return new_params


def _torch_state_numpy(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {
        k: np.asarray(v.detach().cpu().float().numpy()) if hasattr(v, "detach") else np.asarray(v)
        for k, v in state.items()
    }


def load_teacher_params(
    path: str,
    unet_params: Any,
    vae_params: Optional[Any] = None,
    n_blocks: int = 4,
    layers_per_block: int = 2,
    strict: bool = False,
) -> Tuple[Any, Optional[Any]]:
    """Load teacher weights from any of the reference's checkpoint layouts.

    * ``*.msgpack``: our native serialized ``{"unet": ..., "vae": ...}`` pair
      (output of tools/convert_checkpoints.py);
    * ``*.pt`` / ``*.ckpt`` with ``model.diffusion_model.*`` keys: LDM layout
      (MVDream ``sd-v2.1-base-4view.pt``, RichDreamer ``nd_mv_ema.ckpt``
      incl. EMA shadows — extern/{mvdream,nd_sd}/model_zoo.py);
    * a diffusers directory (``unet/diffusion_pytorch_model.bin`` +
      ``vae/diffusion_pytorch_model.bin``): the SD-2.1 teacher.
    """
    from flax import serialization

    from .convert_torch import (
        apply_flat_to_tree,
        convert_ldm_teacher,
        convert_unet,
        convert_vae,
    )

    def apply(flat, params, what):
        if not flat or params is None:
            return params
        new, loaded, mismatched = apply_flat_to_tree(flat, params)
        ttt.info(f"teacher {what}: {len(loaded)} tensors loaded, {len(mismatched)} unmatched")
        if mismatched and strict:
            raise ValueError(f"strict teacher load failed ({what}): {mismatched[:10]}")
        return new

    if path.endswith(".msgpack"):
        template = {"unet": unet_params, "vae": vae_params if vae_params is not None else {}}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        return restored["unet"], (restored["vae"] if vae_params is not None else None)

    if os.path.isdir(path):  # diffusers layout (SD-2.1 teacher)
        unet_bin = os.path.join(path, "unet", "diffusion_pytorch_model.bin")
        vae_bin = os.path.join(path, "vae", "diffusion_pytorch_model.bin")
        if os.path.exists(unet_bin):
            flat = convert_unet(_torch_state_numpy(unet_bin), n_blocks, layers_per_block)
            unet_params = apply(flat, unet_params, "unet")
        if vae_params is not None and os.path.exists(vae_bin):
            flat = convert_vae(_torch_state_numpy(vae_bin), n_blocks, layers_per_block)
            vae_params = apply(flat, vae_params, "vae")
        return unet_params, vae_params

    state = _torch_state_numpy(path)
    if any(k.startswith("model.diffusion_model.") for k in state):
        out = convert_ldm_teacher(state, n_blocks, layers_per_block)
        unet_params = apply(out["unet"], unet_params, "unet")
        vae_params = apply(out["vae"], vae_params, "vae")
        return unet_params, vae_params

    # bare diffusers UNet state dict
    flat = convert_unet(state, n_blocks, layers_per_block)
    return apply(flat, unet_params, "unet"), vae_params
