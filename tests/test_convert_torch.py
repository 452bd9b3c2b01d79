"""Checkpoint converter: every leaf of our flax trees must be reachable from
diffusers/HF-style torch state dicts (synthetic, shape-exact)."""

import re

import pytest

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


# ---------------------------------------------------------------------------
# Adapter checkpoint (triplane_turbo_sd_v1.pth layout) round trip
# ---------------------------------------------------------------------------

from triplaneturbo_tpu.models.geometry.triplane_geometry import (
    TriplaneGeometry,
    TriplaneGeometryConfig,
)
from triplaneturbo_tpu.models.geometry.space_generator import SpaceGeneratorConfig
from triplaneturbo_tpu.utils.convert_torch import PLANE_ORDER, convert_adapters

TINY_SG = dict(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=8,
    vae_block_out_channels=(16, 32),
    vae_layers_per_block=1,
    output_dim=8,
    training_type="self_lora_rank_4-cross_lora_rank_4-locon_rank_4",
)


def _inverse_adapter_module(path: str) -> str:
    """flax adapter module path -> the reference torch module path
    (inverse of convert_torch._map_attn_path/_map_conv_path)."""
    p = path
    p = re.sub(r"^space_generator/(unet|vae)/", r"space_generator.\1.", p)
    p = re.sub(r"down_(\d+)_attn_(\d+)/", r"down_blocks.\1.attentions.\2.", p)
    p = re.sub(r"up_(\d+)_attn_(\d+)/", r"up_blocks.\1.attentions.\2.", p)
    p = re.sub(r"down_(\d+)_res_(\d+)/", r"down_blocks.\1.resnets.\2.", p)
    p = re.sub(r"up_(\d+)_res_(\d+)/", r"up_blocks.\1.resnets.\2.", p)
    p = re.sub(r"mid_res_(\d+)/", r"mid_block.resnets.\1.", p)
    p = re.sub(r"mid_attn/attention/", "mid_block.attentions.0.", p)
    p = re.sub(r"mid_attn/", "mid_block.attentions.0.", p)
    p = re.sub(r"down_(\d+)_downsample/conv/", r"down_blocks.\1.downsamplers.0.conv.", p)
    p = re.sub(r"up_(\d+)_upsample/conv/", r"up_blocks.\1.upsamplers.0.conv.", p)
    p = re.sub(r"transformer_blocks_(\d+)/", r"transformer_blocks.\1.", p)
    return p.replace("/", ".")


def _synthesize_torch_adapter_state(flat):
    """Build a reference-naming state dict covering every adapter/field leaf."""
    rng = np.random.RandomState(0)
    src = {}
    for path, leaf in flat.items():
        arr = rng.randn(*leaf.shape).astype(np.float32)
        m = re.match(r"(.*)/lora_(q|k|v|out)/(down|up|bias)$", path)
        if m:
            base = _inverse_adapter_module(m.group(1) + "/")[:-1]
            proj, which = m.group(2), m.group(3)
            if arr.ndim == 3:  # hexa stacked [P, in, r]
                for slot, tag in enumerate(PLANE_ORDER):
                    plane, kind = tag.split("_lora_")
                    src[f"{base}.processor.to_{proj}_{plane}_lora_{kind}.{which}.weight"] = arr[slot].T
            elif arr.ndim == 2 and which != "bias":  # vanilla [in, r]
                src[f"{base}.processor.to_{proj}_lora.{which}.weight"] = arr.T
            elif which == "bias":
                if arr.ndim == 2:  # hexa bias [P, out] -> six [1,1,out]
                    for slot, tag in enumerate(PLANE_ORDER):
                        plane, kind = tag.split("_lora_")
                        src[f"{base}.processor.to_{proj}_{plane}_lora_{kind}.bias"] = arr[slot][None, None]
                else:
                    src[f"{base}.processor.to_{proj}_lora.bias"] = arr[None, None]
            continue
        m = re.match(r"(.*)/locon/(down|up)/(kernel|bias)$", path)
        if m:
            base = _inverse_adapter_module(m.group(1) + "/")[:-1]
            if m.group(3) == "kernel":
                src[f"{base}.lora_layer.{m.group(2)}.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                src[f"{base}.lora_layer.{m.group(2)}.bias"] = arr
            continue
        m = re.match(r"space_generator/vae/decoder/conv_out_retrofit/(kernel|bias)$", path)
        if m:
            which = "weight" if m.group(1) == "kernel" else "bias"
            src[f"space_generator.vae.decoder.conv_out.{which}"] = (
                arr.transpose(3, 2, 0, 1) if which == "weight" else arr
            )
            continue
        m = re.match(r"field/(sdf|feature|deformation)_network/Dense_(\d+)/kernel$", path)
        if m:
            src[f"{m.group(1)}_network.layers.{2 * int(m.group(2))}.weight"] = arr.T
            continue
        raise AssertionError(f"unhandled adapter path: {path}")
    return src


def test_adapter_converter_round_trip():
    """Every trainable leaf (LoRA/LoCon/retrofit/field MLP) is reachable from
    the reference checkpoint layout, values exact (reference loader:
    triplaneturbo_text_to_3d.py:166-177; module layout
    sd_dual_triplane_modules.py:236-345, 869-888)."""
    geometry = TriplaneGeometry(
        TriplaneGeometryConfig(space_generator=SpaceGeneratorConfig(**TINY_SG))
    )
    noisy = jnp.zeros((1, 6, 8, 8, 4))
    text = jnp.zeros((1, 7, 16))
    pts = jnp.zeros((1, 8, 3))
    params = geometry.init(
        jax.random.PRNGKey(0), noisy, text, jnp.zeros(()), pts, method=geometry.init_all
    )
    flat = flatten_dict(params["params"], sep="/")
    adapter_paths = {
        k: v
        for k, v in flat.items()
        if re.search("lora|locon|retrofit", k) or k.startswith("field/")
    }
    assert len(adapter_paths) > 50, "expected a real adapter population"

    src = _synthesize_torch_adapter_state(adapter_paths)
    converted = convert_adapters(src)
    from triplaneturbo_tpu.utils.convert_torch import apply_flat_to_tree

    new, loaded, mismatched = apply_flat_to_tree(converted, params)
    assert not mismatched, mismatched[:10]
    missing = sorted(set(adapter_paths) - set(loaded))
    assert not missing, missing[:10]

    # exact value round trip
    new_flat = flatten_dict(new["params"], sep="/")
    rng = np.random.RandomState(0)
    for path, leaf in adapter_paths.items():
        expect = rng.randn(*leaf.shape).astype(np.float32)
        np.testing.assert_allclose(np.asarray(new_flat[path]), expect, rtol=0, atol=0)


def test_load_torch_adapter_end_to_end(tmp_path):
    """load_torch_adapter consumes a .pth with the released layout
    ({state_dict: {geometry.*}}) and loads every trainable leaf."""
    torch = pytest.importorskip("torch")

    geometry = TriplaneGeometry(
        TriplaneGeometryConfig(space_generator=SpaceGeneratorConfig(**TINY_SG))
    )
    params = geometry.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 6, 8, 8, 4)),
        jnp.zeros((1, 7, 16)),
        jnp.zeros(()),
        jnp.zeros((1, 8, 3)),
        method=geometry.init_all,
    )
    flat = flatten_dict(params["params"], sep="/")
    adapter_paths = {
        k: v
        for k, v in flat.items()
        if re.search("lora|locon|retrofit", k) or k.startswith("field/")
    }
    src = _synthesize_torch_adapter_state(adapter_paths)
    state = {f"geometry.{k}": torch.from_numpy(np.ascontiguousarray(v)) for k, v in src.items()}
    path = str(tmp_path / "adapter.pth")
    torch.save({"state_dict": state, "epoch": 0, "global_step": 0}, path)

    from triplaneturbo_tpu.utils.checkpoint import load_torch_adapter

    new = load_torch_adapter(path, params, strict=True)
    new_flat = flatten_dict(new["params"], sep="/")
    rng = np.random.RandomState(0)
    for p, leaf in adapter_paths.items():
        expect = rng.randn(*leaf.shape).astype(np.float32)
        np.testing.assert_allclose(np.asarray(new_flat[p]), expect, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# LDM-format teacher checkpoints (MVDream / RichDreamer)
# ---------------------------------------------------------------------------

from triplaneturbo_tpu.utils.convert_torch import (
    convert_ldm_teacher,
    extract_ema,
    ldm_unet_to_diffusers,
)


def _diffusers_to_ldm_unet_key(key: str, n_blocks: int, L: int, attn_down, attn_up) -> str:
    """Test-local inverse of ldm_unet_to_diffusers (index arithmetic of
    openaimodel.py: input_blocks / middle_block / output_blocks)."""
    direct = {
        "time_embedding.linear_1": "time_embed.0",
        "time_embedding.linear_2": "time_embed.2",
        "camera_embed.0": "camera_embed.0",
        "camera_embed.2": "camera_embed.2",
        "conv_in": "input_blocks.0.0",
        "conv_norm_out": "out.0",
        "conv_out": "out.2",
    }
    inv_res = {
        "norm1": "in_layers.0",
        "conv1": "in_layers.2",
        "time_emb_proj": "emb_layers.1",
        "norm2": "out_layers.0",
        "conv2": "out_layers.3",
        "conv_shortcut": "skip_connection",
    }

    def res_sub(sub):
        head = sub.split(".", 1)[0]
        return inv_res[head] + sub[len(head):]

    for dname, lname in direct.items():
        if key.startswith(dname + "."):
            return lname + key[len(dname):]
    m = re.match(r"mid_block\.resnets\.(\d)\.(.*)$", key)
    if m:
        return f"middle_block.{int(m.group(1)) * 2}.{res_sub(m.group(2))}"
    m = re.match(r"mid_block\.attentions\.0\.(.*)$", key)
    if m:
        return f"middle_block.1.{m.group(1)}"
    m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", key)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"input_blocks.{1 + i * (L + 1) + j}.0.{res_sub(m.group(3))}"
    m = re.match(r"down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", key)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"input_blocks.{1 + i * (L + 1) + j}.1.{m.group(3)}"
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$", key)
    if m:
        i = int(m.group(1))
        return f"input_blocks.{1 + i * (L + 1) + L}.0.op.{m.group(2)}"
    m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", key)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"output_blocks.{i * (L + 1) + j}.0.{res_sub(m.group(3))}"
    m = re.match(r"up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$", key)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"output_blocks.{i * (L + 1) + j}.1.{m.group(3)}"
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", key)
    if m:
        i = int(m.group(1))
        mod = 2 if attn_up(i) else 1
        return f"output_blocks.{i * (L + 1) + L}.{mod}.conv.{m.group(2)}"
    raise AssertionError(f"no LDM inverse for {key}")


def test_ldm_unet_converter_full_coverage():
    """MVDream-layout checkpoint (model.diffusion_model.* LDM naming,
    extern/mvdream/ldm/modules/diffusionmodules/openaimodel.py:811-1209)
    reaches every leaf of our camera-conditioned UNet."""
    n_blocks, L = 2, 1
    cfg = UNetConfig(camera_dim=16, **TINY)
    unet = UNet2DConditionModel(cfg)
    x = jnp.zeros((4, 8, 8, 4))
    params = unet.init(
        jax.random.PRNGKey(0), x, jnp.zeros((4,)), jnp.zeros((4, 7, 16)), jnp.zeros((4, 16))
    )
    flat = flatten_dict(params["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        dkey = _inverse_unet_name(path)
        lkey = _diffusers_to_ldm_unet_key(
            dkey, n_blocks, L, attn_down=lambda i: i < n_blocks - 1, attn_up=lambda i: i > 0
        )
        src["model.diffusion_model." + lkey] = _torch_layout(path, np.asarray(leaf))
    out = convert_ldm_teacher(src, n_blocks=n_blocks, layers_per_block=L)
    new, loaded, mismatched = apply_flat_to_tree(out["unet"], params)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), sorted(set(flat) - set(loaded))[:10]
    new_flat = flatten_dict(new["params"], sep="/")
    for k in flat:
        np.testing.assert_allclose(np.asarray(new_flat[k]), np.asarray(flat[k]))


def test_ldm_unet_conv_projections_squeeze():
    """RichDreamer's transformer proj_in/proj_out are 1x1 convs
    (use_linear_in_transformer unset, openaimodel_v2_1.py) — the converter
    squeezes them to our linear layout."""
    w = np.arange(12, dtype=np.float32).reshape(4, 3, 1, 1)
    src = {"model.diffusion_model.input_blocks.1.1.proj_in.weight": w}
    out = ldm_unet_to_diffusers(src)
    np.testing.assert_allclose(out["down_blocks.0.attentions.0.proj_in.weight"], w[:, :, 0, 0])


def _inverse_vae_ldm_name(dkey: str, n_blocks: int) -> str:
    """diffusers VAE key -> CompVis LDM key (inverse of ldm_vae_to_diffusers)."""
    inv_res = {
        "norm1": "norm1",
        "conv1": "conv1",
        "time_emb_proj": "temb_proj",
        "norm2": "norm2",
        "conv2": "conv2",
        "conv_shortcut": "nin_shortcut",
    }
    inv_attn = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out": "proj_out", "group_norm": "norm"}

    def res_sub(sub):
        head = sub.split(".", 1)[0]
        return inv_res[head] + sub[len(head):]

    if dkey.startswith(("quant_conv.", "post_quant_conv.")):
        return dkey
    m = re.match(r"(encoder|decoder)\.(.*)$", dkey)
    tower, rest = m.group(1), m.group(2)
    if rest.startswith(("conv_in.", "conv_out.")):
        return dkey
    if rest.startswith("conv_norm_out."):
        return f"{tower}.norm_out.{rest[len('conv_norm_out.'):]}"
    m = re.match(r"mid_block\.resnets\.(\d)\.(.*)$", rest)
    if m:
        return f"{tower}.mid.block_{int(m.group(1)) + 1}.{res_sub(m.group(2))}"
    m = re.match(r"mid_block\.attentions\.0\.to_out\.0\.(.*)$", rest)
    if m:  # diffusers ModuleList wrapper -> LDM proj_out
        return f"{tower}.mid.attn_1.proj_out.{m.group(1)}"
    m = re.match(r"mid_block\.attentions\.0\.(\w+)\.(.*)$", rest)
    if m:
        return f"{tower}.mid.attn_1.{inv_attn[m.group(1)]}.{m.group(2)}"
    m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", rest)
    if m:
        return f"encoder.down.{m.group(1)}.block.{m.group(2)}.{res_sub(m.group(3))}"
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)$", rest)
    if m:
        return f"encoder.down.{m.group(1)}.downsample.conv.{m.group(2)}"
    m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)$", rest)
    if m:
        return f"decoder.up.{n_blocks - 1 - int(m.group(1))}.block.{m.group(2)}.{res_sub(m.group(3))}"
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)$", rest)
    if m:
        return f"decoder.up.{n_blocks - 1 - int(m.group(1))}.upsample.conv.{m.group(2)}"
    raise AssertionError(f"no LDM VAE inverse for {dkey}")


def test_ldm_vae_converter_full_coverage():
    """CompVis first_stage_model naming (MVDream's encode path for renders)
    reaches every leaf, incl. the attention q/k/v 1x1 convs + biases."""
    n_blocks = 2
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    vae = AutoencoderKL(cfg)
    dec = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)), method=vae.decode)
    enc = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), method=vae.encode)
    merged = {"params": {**enc["params"], **dec["params"]}}
    flat = flatten_dict(merged["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        dkey = _inverse_vae_name(path)
        arr = _torch_layout(path, np.asarray(leaf))
        # LDM attention q/k/v/proj_out are 1x1 convs
        if re.search(r"attentions\.0\.to_(q|k|v)\.weight$|attentions\.0\.to_out\.0\.weight$", dkey):
            arr = arr[:, :, None, None]
        src["first_stage_model." + _inverse_vae_ldm_name(dkey, n_blocks)] = arr
    out = convert_ldm_teacher(src, n_blocks=n_blocks, layers_per_block=1)
    new, loaded, mismatched = apply_flat_to_tree(out["vae"], merged)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), sorted(set(flat) - set(loaded))[:10]
    new_flat = flatten_dict(new["params"], sep="/")
    for k in flat:
        np.testing.assert_allclose(np.asarray(new_flat[k]), np.asarray(flat[k]))


def test_extract_ema_overrides_model_weights():
    """nd_mv_ema.ckpt semantics: model_ema.<name-with-dots-stripped> shadows
    replace model.<name> (extern/nd_sd/model_zoo.py:21-61)."""
    raw = np.ones((3, 3), np.float32)
    shadow = 2 * np.ones((3, 3), np.float32)
    ckpt = {
        "model.diffusion_model.out.2.weight": raw,
        "model_ema.diffusion_modelout2weight": shadow,
        "model_ema.decay": np.asarray(0.9995),
        "model.diffusion_model.out.2.bias": np.zeros(3, np.float32),  # no shadow
        "first_stage_model.decoder.conv_in.weight": raw,
    }
    out = extract_ema(ckpt)
    np.testing.assert_allclose(out["model.diffusion_model.out.2.weight"], shadow)
    np.testing.assert_allclose(out["model.diffusion_model.out.2.bias"], 0.0)
    assert "model_ema.decay" not in out
    assert "first_stage_model.decoder.conv_in.weight" in out


# ---------------------------------------------------------------------------
# CLIP vision tower (the eval scorer backbone)
# ---------------------------------------------------------------------------

from triplaneturbo_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
from triplaneturbo_tpu.utils.convert_torch import convert_clip_vision


def test_clip_vision_converter_full_coverage():
    """HF CLIPModel naming (vision_model.* + visual_projection +
    text_projection) reaches every leaf of our ViT tower
    (evaluation/clipscore/compute.py:111-161 consumes these weights)."""
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, width=32, layers=2, heads=4,
        intermediate=64, projection_dim=16,
    )
    enc = CLIPVisionEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = flatten_dict(params["params"], sep="/")
    src = {}
    for path, leaf in flat.items():
        arr = _torch_layout(path, np.asarray(leaf))
        p = path
        if p == "patch_embedding/kernel":
            src["vision_model.embeddings.patch_embedding.weight"] = arr
            continue
        if p == "class_embedding":
            src["vision_model.embeddings.class_embedding"] = arr
            continue
        if p == "position_embedding":
            src["vision_model.embeddings.position_embedding.weight"] = arr
            continue
        if p.startswith("pre_layernorm/"):
            src[p.replace("pre_layernorm/", "vision_model.pre_layrnorm.").replace("scale", "weight")] = arr
            continue
        if p.startswith("post_layernorm/"):
            src[p.replace("post_layernorm/", "vision_model.post_layernorm.").replace("scale", "weight")] = arr
            continue
        if p == "visual_projection/kernel":
            src["visual_projection.weight"] = arr
            continue
        p = re.sub(r"^layers_(\d+)/", r"vision_model.encoder.layers.\1.", p)
        p = p.replace("mlp_fc1/", "mlp.fc1.").replace("mlp_fc2/", "mlp.fc2.")
        p = p.replace("/", ".").replace(".scale", ".weight").replace(".kernel", ".weight")
        src[p] = arr
    src["text_projection.weight"] = np.eye(16, 32, dtype=np.float32)

    converted = convert_clip_vision(src, n_layers=2)
    tp = converted.pop("__text_projection__")
    assert tp.shape == (32, 16)
    new, loaded, mismatched = apply_flat_to_tree(converted, params)
    assert not mismatched, mismatched[:10]
    assert len(loaded) == len(flat), sorted(set(flat) - set(loaded))[:10]
    new_flat = flatten_dict(new["params"], sep="/")
    for k in flat:
        np.testing.assert_allclose(np.asarray(new_flat[k]), np.asarray(flat[k]))


def test_build_teacher_loads_ldm_checkpoint(tmp_path):
    """builder.build_teacher(ckpt_path=...) consumes a tiny LDM-layout .pt:
    every UNet leaf is overwritten by the checkpoint values."""
    torch = pytest.importorskip("torch")
    from triplaneturbo_tpu.systems.builder import build_teacher

    n_blocks, L = 2, 1
    sizes = dict(
        block_out_channels=(32, 64), layers_per_block=L, cross_attention_dim=32,
        attention_head_dim=8, vae_block_out_channels=(8, 16), vae_layers_per_block=1,
    )
    bundle = build_teacher("mv", jax.random.PRNGKey(0), dict(sizes), dtype_str="float32")
    flat = flatten_dict(bundle.unet_params["params"], sep="/")
    src = {}
    rng = np.random.RandomState(7)
    for path, leaf in flat.items():
        dkey = _inverse_unet_name(path)
        lkey = _diffusers_to_ldm_unet_key(
            dkey, n_blocks, L, attn_down=lambda i: i < n_blocks - 1, attn_up=lambda i: i > 0
        )
        src["model.diffusion_model." + lkey] = torch.from_numpy(
            _torch_layout(path, rng.randn(*leaf.shape).astype(np.float32))
        )
    path = str(tmp_path / "teacher.pt")
    torch.save(src, path)

    loaded = build_teacher("mv", jax.random.PRNGKey(0), dict(sizes), "float32", ckpt_path=path)
    new_flat = flatten_dict(loaded.unet_params["params"], sep="/")
    rng = np.random.RandomState(7)
    for p, leaf in flat.items():
        expect = rng.randn(*leaf.shape).astype(np.float32)
        np.testing.assert_allclose(np.asarray(new_flat[p]), expect, rtol=1e-6, atol=1e-6)
