"""Checkpoint converter: every leaf of our flax trees must be reachable from
diffusers/HF-style torch state dicts (synthetic, shape-exact)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict

from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from triplaneturbo_tpu.models.unet import UNet2DConditionModel, UNetConfig
from triplaneturbo_tpu.models.vae import AutoencoderKL, VAEConfig
from triplaneturbo_tpu.utils.convert_torch import (
    apply_flat_to_tree,
    convert_clip_text,
    convert_unet,
    convert_vae,
)

TINY = dict(block_out_channels=(32, 64), layers_per_block=1, cross_attention_dim=16, attention_head_dim=8)


def _inverse_unet_name(path: str) -> str:
    """flax path -> diffusers key (test-local inverse of the converter)."""
    p = path
    p = re.sub(r"^down_(\d+)_res_(\d+)/", r"down_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^down_(\d+)_attn_(\d+)/", r"down_blocks.\1.attentions.\2.", p)
    p = re.sub(r"^down_(\d+)_downsample/conv/conv/", r"down_blocks.\1.downsamplers.0.conv.", p)
    p = re.sub(r"^up_(\d+)_res_(\d+)/", r"up_blocks.\1.resnets.\2.", p)
    p = re.sub(r"^up_(\d+)_attn_(\d+)/", r"up_blocks.\1.attentions.\2.", p)
    p = re.sub(r"^up_(\d+)_upsample/conv/conv/", r"up_blocks.\1.upsamplers.0.conv.", p)
    p = re.sub(r"^mid_res_(\d+)/", r"mid_block.resnets.\1.", p)
    p = re.sub(r"^mid_attn/", "mid_block.attentions.0.", p)
    p = re.sub(r"transformer_blocks_(\d+)/", r"transformer_blocks.\1.", p)
    p = re.sub(r"(attn\d)/to_out/", r"\1.to_out.0.", p)
    p = p.replace("ff/net_0/proj/", "ff.net.0.proj.")
    p = p.replace("ff/net_2/", "ff.net.2.")
    p = p.replace("time_embedding_linear_1/", "time_embedding.linear_1.")
    p = p.replace("time_embedding_linear_2/", "time_embedding.linear_2.")
    p = p.replace("camera_embedding_linear_1/", "camera_embed.0.")
    p = p.replace("camera_embedding_linear_2/", "camera_embed.2.")
    p = p.replace("conv_in/conv/", "conv_in.")
    p = p.replace("conv_out/conv/", "conv_out.")
    p = p.replace("conv1/conv/", "conv1.")
    p = p.replace("conv2/conv/", "conv2.")
    p = p.replace("conv_shortcut/conv/", "conv_shortcut.")
    p = p.replace("/", ".")
    p = p.replace(".scale", ".weight")
    p = p.replace(".kernel", ".weight")
    return p


def _torch_layout(path: str, arr: np.ndarray) -> np.ndarray:
    if path.endswith("kernel") and arr.ndim == 2:
        return arr.T
    if path.endswith("kernel") and arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)
    return arr


def test_unet_converter_full_coverage():
    cfg = UNetConfig(camera_dim=16, **TINY)
    unet = UNet2DConditionModel(cfg)
    x = jnp.zeros((4, 8, 8, 4))
    params = unet.init(
        jax.random.PRNGKey(0), x, jnp.zeros((4,)), jnp.zeros((4, 7, 16)), jnp.zeros((4, 16))
    )
    flat = flatten_dict(params["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        tname = _inverse_unet_name(path)
        src[tname] = _torch_layout(path, np.asarray(leaf))
    converted = convert_unet(src, n_blocks=2, layers_per_block=1)
    new, loaded, mismatched = apply_flat_to_tree(converted, params)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), (
        f"loaded {len(loaded)}/{len(flat)}; missing "
        f"{sorted(set(flat) - set(loaded))[:10]}"
    )
    # values round-trip exactly
    new_flat = flatten_dict(new["params"], sep="/")
    for k in flat:
        np.testing.assert_allclose(np.asarray(new_flat[k]), np.asarray(flat[k]))


def _inverse_vae_name(path: str) -> str:
    p = path
    p = re.sub(r"^(decoder|encoder)/up_(\d+)_res_(\d+)/", r"\1.up_blocks.\2.resnets.\3.", p)
    p = re.sub(r"^(decoder|encoder)/down_(\d+)_res_(\d+)/", r"\1.down_blocks.\2.resnets.\3.", p)
    p = re.sub(r"^decoder/up_(\d+)_upsample/conv/conv/", r"decoder.up_blocks.\1.upsamplers.0.conv.", p)
    p = re.sub(r"^encoder/down_(\d+)_downsample/conv/", r"encoder.down_blocks.\1.downsamplers.0.conv.", p)
    p = re.sub(r"^(decoder|encoder)/mid_res_(\d+)/", r"\1.mid_block.resnets.\2.", p)
    p = re.sub(r"^(decoder|encoder)/mid_attn/attention/to_out/", r"\1.mid_block.attentions.0.to_out.0.", p)
    p = re.sub(r"^(decoder|encoder)/mid_attn/attention/", r"\1.mid_block.attentions.0.", p)
    p = re.sub(r"^(decoder|encoder)/mid_attn/group_norm/", r"\1.mid_block.attentions.0.group_norm.", p)
    p = p.replace("conv_in/conv/", "conv_in.")
    p = p.replace("conv1/conv/", "conv1.")
    p = p.replace("conv2/conv/", "conv2.")
    p = p.replace("conv_shortcut/conv/", "conv_shortcut.")
    p = p.replace("/", ".")
    p = p.replace(".scale", ".weight")
    p = p.replace(".kernel", ".weight")
    return p


def test_vae_converter_coverage():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    vae = AutoencoderKL(cfg)
    z = jnp.zeros((1, 4, 4, 4))
    img = jnp.zeros((1, 8, 8, 3))
    params = vae.init(jax.random.PRNGKey(0), z, method=vae.decode)
    enc_params = vae.init(jax.random.PRNGKey(0), img, method=vae.encode)
    # merge decoder+encoder trees
    merged = {"params": {**enc_params["params"], **params["params"]}}
    flat = flatten_dict(merged["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        src[_inverse_vae_name(path)] = _torch_layout(path, np.asarray(leaf))
    converted = convert_vae(src, n_blocks=2, layers_per_block=1)
    _, loaded, mismatched = apply_flat_to_tree(converted, merged)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), sorted(set(flat) - set(loaded))[:10]


def test_clip_text_converter_coverage():
    cfg = CLIPTextConfig(vocab_size=64, width=32, layers=2, heads=4, intermediate=64)
    enc = CLIPTextEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    flat = flatten_dict(params["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        p = path
        p = p.replace("token_embedding/embedding", "embeddings.token_embedding.weight")
        if p == "position_embedding":
            p = "embeddings.position_embedding.weight"
        p = re.sub(r"^layers_(\d+)/", r"encoder.layers.\1.", p)
        p = p.replace("mlp_fc1/", "mlp.fc1.").replace("mlp_fc2/", "mlp.fc2.")
        p = p.replace("/", ".").replace(".scale", ".weight").replace(".kernel", ".weight")
        arr = np.asarray(leaf)
        if path.endswith("kernel"):
            arr = arr.T
        src["text_model." + p if not p.startswith("final") else "text_model." + p] = arr
    converted = convert_clip_text(src, n_layers=2)
    _, loaded, mismatched = apply_flat_to_tree(converted, params)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), sorted(set(flat) - set(loaded))[:10]
