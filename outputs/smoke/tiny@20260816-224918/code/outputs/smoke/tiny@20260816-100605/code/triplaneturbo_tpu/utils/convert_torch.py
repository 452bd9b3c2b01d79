"""torch/diffusers checkpoint -> flax parameter-tree converters.

Maps the pretrained weights the reference consumes onto this framework's
param trees (SURVEY §5.4: a torch->JAX converter for the released
``triplane_turbo_sd_v1.pth`` and the SD/MVDream/RichDreamer backbones is
required for bit-parity eval):

* :func:`convert_unet`: diffusers ``UNet2DConditionModel`` state dict ->
  :class:`~triplaneturbo_tpu.models.unet.UNet2DConditionModel` params;
* :func:`convert_vae`: diffusers ``AutoencoderKL`` -> our VAE;
* :func:`convert_clip_text`: HF ``CLIPTextModel`` -> our text encoder;
* :func:`convert_adapters`: the TriplaneTurbo adapter checkpoint (hexa-LoRA /
  LoCon / conv_out retrofit / field MLPs) — six separate torch LoRA modules
  stack onto our plane axis in the routing order [xy_geo, xz_geo, yz_geo,
  xy_tex, xz_tex, yz_tex] (sd_dual_triplane_modules.py:305-345).

Tensor layout rules: torch Linear [out,in] -> flax kernel [in,out]; torch
Conv [out,in,kh,kw] -> flax [kh,kw,in,out]; norms map scale/bias directly.

All converters work on plain dicts of numpy arrays (no torch import needed if
the caller already extracted numpy), return (flat_params, unmatched_keys).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

PLANE_ORDER = ["xy_lora_geo", "xz_lora_geo", "yz_lora_geo", "xy_lora_tex", "xz_lora_tex", "yz_lora_tex"]


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _norm_pair(src: Dict, prefix: str, dst: Dict, out_prefix: str) -> None:
    if f"{prefix}.weight" in src:
        dst[f"{out_prefix}/scale"] = np.asarray(src[f"{prefix}.weight"])
        dst[f"{out_prefix}/bias"] = np.asarray(src[f"{prefix}.bias"])


def _linear_pair(src: Dict, prefix: str, dst: Dict, out_prefix: str) -> None:
    if f"{prefix}.weight" in src:
        dst[f"{out_prefix}/kernel"] = _linear(np.asarray(src[f"{prefix}.weight"]))
        if f"{prefix}.bias" in src:
            dst[f"{out_prefix}/bias"] = np.asarray(src[f"{prefix}.bias"])


def _conv_pair(src: Dict, prefix: str, dst: Dict, out_prefix: str) -> None:
    if f"{prefix}.weight" in src:
        dst[f"{out_prefix}/kernel"] = _conv(np.asarray(src[f"{prefix}.weight"]))
        if f"{prefix}.bias" in src:
            dst[f"{out_prefix}/bias"] = np.asarray(src[f"{prefix}.bias"])


def _resnet(src: Dict, p: str, dst: Dict, o: str) -> None:
    _norm_pair(src, f"{p}.norm1", dst, f"{o}/norm1")
    _conv_pair(src, f"{p}.conv1", dst, f"{o}/conv1/conv")
    _linear_pair(src, f"{p}.time_emb_proj", dst, f"{o}/time_emb_proj")
    _norm_pair(src, f"{p}.norm2", dst, f"{o}/norm2")
    _conv_pair(src, f"{p}.conv2", dst, f"{o}/conv2/conv")
    _conv_pair(src, f"{p}.conv_shortcut", dst, f"{o}/conv_shortcut/conv")


def _attn_block(src: Dict, p: str, dst: Dict, o: str) -> None:
    """diffusers Transformer2DModel -> our Transformer2D."""
    _norm_pair(src, f"{p}.norm", dst, f"{o}/norm")
    _linear_pair(src, f"{p}.proj_in", dst, f"{o}/proj_in")
    _linear_pair(src, f"{p}.proj_out", dst, f"{o}/proj_out")
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in src:
        b = f"{p}.transformer_blocks.{i}"
        ob = f"{o}/transformer_blocks_{i}"
        for n in ("norm1", "norm2", "norm3"):
            _norm_pair(src, f"{b}.{n}", dst, f"{ob}/{n}")
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _linear_pair(src, f"{b}.{attn}.{proj}", dst, f"{ob}/{attn}/{proj}")
            _linear_pair(src, f"{b}.{attn}.to_out.0", dst, f"{ob}/{attn}/to_out")
        _linear_pair(src, f"{b}.ff.net.0.proj", dst, f"{ob}/ff/net_0/proj")
        _linear_pair(src, f"{b}.ff.net.2", dst, f"{ob}/ff/net_2")
        i += 1


def convert_unet(src: Dict[str, Any], n_blocks: int = 4, layers_per_block: int = 2) -> Dict[str, np.ndarray]:
    """diffusers UNet2DConditionModel -> flat {path: array} for our UNet."""
    dst: Dict[str, np.ndarray] = {}
    _conv_pair(src, "conv_in", dst, "conv_in/conv")
    _linear_pair(src, "time_embedding.linear_1", dst, "time_embedding_linear_1")
    _linear_pair(src, "time_embedding.linear_2", dst, "time_embedding_linear_2")
    # MVDream/RichDreamer camera embedding MLP (openaimodel.py:937-940)
    _linear_pair(src, "camera_embed.0", dst, "camera_embedding_linear_1")
    _linear_pair(src, "camera_embed.2", dst, "camera_embedding_linear_2")

    for i in range(n_blocks):
        for j in range(layers_per_block):
            _resnet(src, f"down_blocks.{i}.resnets.{j}", dst, f"down_{i}_res_{j}")
            _attn_block(src, f"down_blocks.{i}.attentions.{j}", dst, f"down_{i}_attn_{j}")
        _conv_pair(src, f"down_blocks.{i}.downsamplers.0.conv", dst, f"down_{i}_downsample/conv/conv")
    _resnet(src, "mid_block.resnets.0", dst, "mid_res_0")
    _attn_block(src, "mid_block.attentions.0", dst, "mid_attn")
    _resnet(src, "mid_block.resnets.1", dst, "mid_res_1")
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            _resnet(src, f"up_blocks.{i}.resnets.{j}", dst, f"up_{i}_res_{j}")
            _attn_block(src, f"up_blocks.{i}.attentions.{j}", dst, f"up_{i}_attn_{j}")
        _conv_pair(src, f"up_blocks.{i}.upsamplers.0.conv", dst, f"up_{i}_upsample/conv/conv")
    _norm_pair(src, "conv_norm_out", dst, "conv_norm_out")
    _conv_pair(src, "conv_out", dst, "conv_out/conv")
    return dst


def _vae_attn(src: Dict, p: str, dst: Dict, o: str) -> None:
    _norm_pair(src, f"{p}.group_norm", dst, f"{o}/group_norm")
    names = (
        [("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"), ("to_out.0", "to_out")]
        if f"{p}.to_q.weight" in src
        else [("query", "to_q"), ("key", "to_k"), ("value", "to_v"), ("proj_attn", "to_out")]
    )
    for s_name, o_name in names:
        _linear_pair(src, f"{p}.{s_name}", dst, f"{o}/attention/{o_name}")


def convert_vae(src: Dict[str, Any], n_blocks: int = 4, layers_per_block: int = 2) -> Dict[str, np.ndarray]:
    """diffusers AutoencoderKL -> flat params for our AutoencoderKL
    (decoder + encoder + quant convs; decoder.conv_out only maps when shapes
    agree — the student replaces it with the retrofit conv)."""
    dst: Dict[str, np.ndarray] = {}
    _conv_pair(src, "quant_conv", dst, "quant_conv")
    _conv_pair(src, "post_quant_conv", dst, "post_quant_conv")

    # decoder
    _conv_pair(src, "decoder.conv_in", dst, "decoder/conv_in/conv")
    _resnet(src, "decoder.mid_block.resnets.0", dst, "decoder/mid_res_0")
    _vae_attn(src, "decoder.mid_block.attentions.0", dst, "decoder/mid_attn")
    _resnet(src, "decoder.mid_block.resnets.1", dst, "decoder/mid_res_1")
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            _resnet(src, f"decoder.up_blocks.{i}.resnets.{j}", dst, f"decoder/up_{i}_res_{j}")
        _conv_pair(src, f"decoder.up_blocks.{i}.upsamplers.0.conv", dst, f"decoder/up_{i}_upsample/conv/conv")
    _norm_pair(src, "decoder.conv_norm_out", dst, "decoder/conv_norm_out")
    _conv_pair(src, "decoder.conv_out", dst, "decoder/conv_out")

    # encoder
    _conv_pair(src, "encoder.conv_in", dst, "encoder/conv_in/conv")
    for i in range(n_blocks):
        for j in range(layers_per_block):
            _resnet(src, f"encoder.down_blocks.{i}.resnets.{j}", dst, f"encoder/down_{i}_res_{j}")
        _conv_pair(src, f"encoder.down_blocks.{i}.downsamplers.0.conv", dst, f"encoder/down_{i}_downsample/conv")
    _resnet(src, "encoder.mid_block.resnets.0", dst, "encoder/mid_res_0")
    _vae_attn(src, "encoder.mid_block.attentions.0", dst, "encoder/mid_attn")
    _resnet(src, "encoder.mid_block.resnets.1", dst, "encoder/mid_res_1")
    _norm_pair(src, "encoder.conv_norm_out", dst, "encoder/conv_norm_out")
    _conv_pair(src, "encoder.conv_out", dst, "encoder/conv_out")
    return dst


def convert_clip_text(src: Dict[str, Any], n_layers: int = 23) -> Dict[str, np.ndarray]:
    """HF CLIPTextModel -> flat params for CLIPTextEncoder."""
    dst: Dict[str, np.ndarray] = {}
    p = "text_model." if any(k.startswith("text_model.") for k in src) else ""
    dst["token_embedding/embedding"] = np.asarray(src[f"{p}embeddings.token_embedding.weight"])
    dst["position_embedding"] = np.asarray(src[f"{p}embeddings.position_embedding.weight"])
    for i in range(n_layers):
        b = f"{p}encoder.layers.{i}"
        o = f"layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear_pair(src, f"{b}.self_attn.{proj}", dst, f"{o}/self_attn/{proj}")
        _norm_pair(src, f"{b}.layer_norm1", dst, f"{o}/layer_norm1")
        _norm_pair(src, f"{b}.layer_norm2", dst, f"{o}/layer_norm2")
        _linear_pair(src, f"{b}.mlp.fc1", dst, f"{o}/mlp_fc1")
        _linear_pair(src, f"{b}.mlp.fc2", dst, f"{o}/mlp_fc2")
    _norm_pair(src, f"{p}final_layer_norm", dst, "final_layer_norm")
    return dst


def convert_adapters(src: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """TriplaneTurbo adapter checkpoint -> flat params.

    Handles (keys relative to the geometry module, ``geometry.`` stripped):
    * hexa self-attn LoRA: six modules ``to_{q,k,v,out}_<plane>_lora_<kind>``
      stacked -> ``lora_{q,k,v,out}/{down,up}`` with a leading plane axis;
    * vanilla cross-attn LoRA: ``to_q_lora.down.weight`` etc.;
    * LoCon conv adapters: ``<conv>.lora_layer.{down,up}.weight``;
    * VAE conv_out retrofit; field MLPs (sdf/feature/deformation networks).
    """
    dst: Dict[str, np.ndarray] = {}

    # field MLPs: Sequential Linear at even indices
    for tname, fname in (
        ("sdf_network", "field/sdf_network"),
        ("feature_network", "field/feature_network"),
        ("deformation_network", "field/deformation_network"),
    ):
        for i in range(8):
            k = f"{tname}.layers.{2*i}.weight"
            if k in src:
                dst[f"{fname}/Dense_{i}/kernel"] = _linear(np.asarray(src[k]))

    # collect hexa groups: strip the per-plane tag, stack over PLANE_ORDER
    hexa: Dict[str, Dict[str, List[Optional[np.ndarray]]]] = {}
    for k, v in src.items():
        m = re.match(r"(.*)\.to_(q|k|v|out)_(xy|xz|yz)_lora_(geo|tex)\.(down|up|bias)\.?(weight)?$", k)
        if not m:
            continue
        base, proj, plane, kind, which = m.group(1), m.group(2), m.group(3), m.group(4), m.group(5)
        tag = f"{plane}_lora_{kind}"
        slot = PLANE_ORDER.index(tag)
        key = f"{base}|{proj}|{which}"
        hexa.setdefault(key, {"vals": [None] * 6})["vals"][slot] = np.asarray(v)
    for key, group in hexa.items():
        base, proj, which = key.split("|")
        vals = group["vals"]
        if any(x is None for x in vals):
            continue
        out_base = _map_attn_path(base) + f"/lora_{proj}"
        if which in ("down", "up"):
            dst[f"{out_base}/{which}"] = np.stack([_linear(x) for x in vals])
        else:
            dst[f"{out_base}/bias"] = np.stack(vals)

    # vanilla LoRA (cross attention / vae 'basic')
    for k, v in src.items():
        m = re.match(r"(.*)\.to_(q|k|v|out)_lora\.(down|up)\.weight$", k)
        if m:
            out_base = _map_attn_path(m.group(1))
            dst[f"{out_base}/lora_{m.group(2)}/{m.group(3)}"] = _linear(np.asarray(v))

    # LoCon conv adapters
    for k, v in src.items():
        m = re.match(r"(.*)\.lora_layer\.(down|up)\.weight$", k)
        if m:
            out_base = _map_conv_path(m.group(1))
            dst[f"{out_base}/locon/{m.group(2)}/kernel"] = _conv(np.asarray(v))

    # conv_out retrofit
    for k, v in src.items():
        if re.search(r"vae\.decoder\.conv_out\.(weight|bias)$", k):
            which = "kernel" if k.endswith("weight") else "bias"
            arr = np.asarray(v)
            dst[f"space_generator/vae/decoder/conv_out_retrofit/{which}"] = (
                _conv(arr) if which == "kernel" else arr
            )
    return dst


def _map_attn_path(torch_path: str) -> str:
    """down_blocks.0.attentions.1.transformer_blocks.0.attn1[.processor] ->
    space_generator/unet/down_0_attn_1/transformer_blocks_0/attn1."""
    p = torch_path
    p = re.sub(r"\.processor$", "", p)
    p = re.sub(r"^(space_generator\.)?(unet|vae)\.", r"", p)
    root = "space_generator/unet" if "decoder" not in torch_path and "mid_block.attentions" not in torch_path or "down_blocks" in torch_path or "up_blocks" in torch_path else "space_generator/vae"
    p = re.sub(r"down_blocks\.(\d+)\.attentions\.(\d+)", r"down_\1_attn_\2", p)
    p = re.sub(r"up_blocks\.(\d+)\.attentions\.(\d+)", r"up_\1_attn_\2", p)
    p = re.sub(r"mid_block\.attentions\.0", "mid_attn", p)
    p = re.sub(r"decoder\.mid_attn", "decoder/mid_attn/attention", p)
    p = re.sub(r"transformer_blocks\.(\d+)", r"transformer_blocks_\1", p)
    p = p.replace(".", "/")
    return f"{root}/{p}"


def _map_conv_path(torch_path: str) -> str:
    """Resnet/sampler conv paths -> AdaptedConv module paths."""
    p = re.sub(r"^(space_generator\.)?", "", torch_path)
    root = "space_generator/vae" if p.startswith("vae.") else "space_generator/unet"
    p = re.sub(r"^(unet|vae)\.", "", p)
    p = re.sub(r"^decoder\.", "decoder.", p)
    p = re.sub(r"down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_res_\2.", p)
    p = re.sub(r"up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_res_\2.", p)
    p = re.sub(r"mid_block\.resnets\.(\d+)\.", r"mid_res_\1.", p)
    p = re.sub(r"down_blocks\.(\d+)\.downsamplers\.0\.conv", r"down_\1_downsample/conv", p)
    p = re.sub(r"up_blocks\.(\d+)\.upsamplers\.0\.conv", r"up_\1_upsample/conv", p)
    if root.endswith("vae"):
        p = re.sub(r"^decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv", r"decoder.up_\1_upsample/conv", p)
    p = p.replace(".", "/")
    return f"{root}/{p}"


def apply_flat_to_tree(flat_src: Dict[str, np.ndarray], params: Any, prefix: str = "") -> Tuple[Any, List[str], List[str]]:
    """Write flat {path: array} entries into a flax param tree.

    Returns (new_params, loaded_paths, mismatched_paths)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    tree = params["params"] if "params" in params else params
    flat = flatten_dict(tree, sep="/")
    loaded, mismatched = [], []
    for k, v in flat_src.items():
        kk = prefix + k
        if kk in flat:
            if tuple(flat[kk].shape) == tuple(v.shape):
                flat[kk] = jnp.asarray(v, flat[kk].dtype)
                loaded.append(kk)
            else:
                mismatched.append(f"{kk}: ckpt{v.shape} != tree{tuple(flat[kk].shape)}")
        else:
            mismatched.append(f"{kk}: not in tree")
    new_tree = unflatten_dict(flat, sep="/")
    out = dict(params)
    if "params" in params:
        out["params"] = new_tree
        return out, loaded, mismatched
    return new_tree, loaded, mismatched
