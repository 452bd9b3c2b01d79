"""System builder: config dict -> assembled, initialized component stack.

Plays the role of the reference's BaseLift3DSystem.configure + launch wiring
(/root/reference/threestudio/systems/base.py:249-303, launch.py:161-246):
geometry -> material -> background -> renderers -> guidance -> trainer, all
resolved by registered names from the config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import triplaneturbo_tpu as ttt

from ..models.attention import AdapterSpec
from ..models.background.hashgrid_env_map import (
    HashgridBackgroundConfig,
    HashgridEnvironmentMapBackground,
    HyperNetConfig,
)
from ..models.clip_text import CLIPTextConfig, CLIPTextEncoder, sd15_text_config
from ..models.geometry.space_generator import SpaceGeneratorConfig
from ..models.geometry.triplane_geometry import TriplaneGeometry, TriplaneGeometryConfig
from ..models.guidance.asd_guidance import ASDConfig, ASDGuidance, TeacherBundle
from ..models.networks import get_activation
from ..models.renderers.patch_renderer import PatchRendererConfig
from ..models.renderers.rasterize_renderer import (
    GenerativeSpaceMeshRasterizeRenderer,
    RasterizeRendererConfig,
)
from ..models.renderers.volume_renderer import (
    GenerativeSpaceSDFVolumeRenderer,
    VolumeRendererConfig,
)
from ..models.schedulers import SchedulerConfig, make_schedule
from ..models.unet import (
    UNet2DConditionModel,
    mvdream_config,
    richdreamer_config,
    sd21_teacher_config,
)
from ..models.vae import AutoencoderKL, VAEConfig
from ..ops.hashgrid import HashGridConfig
from ..utils.config import DotDict, parse_structured
from .trainer import LossConfig, TrainerConfig, TriplaneTurboTrainer


def _sub(cfg: Dict, key: str) -> Dict:
    v = cfg.get(key, {}) or {}
    return dict(v)


def build_teacher(
    kind: str,
    key: jax.Array,
    sizes: Optional[Dict] = None,
    dtype_str: str = "bfloat16",
    ckpt_path: Optional[str] = None,
) -> TeacherBundle:
    """Build one frozen teacher; load converted weights when ``ckpt_path`` is
    given (LDM .pt/.ckpt, diffusers dir, or converted .msgpack — the
    reference's {mv,rd,sd}_ckpt_path config keys,
    configs/TriplaneTurbo_v1.yaml:159,168,178)."""
    from dataclasses import replace as dc_replace

    sizes = {
        k: tuple(v) if isinstance(v, list) else v for k, v in dict(sizes or {}).items()
    }  # YAML sequences -> the tuple-annotated dataclass fields
    vae_sizes = {k[4:]: sizes.pop(k) for k in list(sizes) if k.startswith("vae_")}
    if kind == "mv":
        ucfg = mvdream_config(dtype_str)
    elif kind == "rd":
        ucfg = richdreamer_config(dtype_str)
    elif kind == "sd":
        ucfg = sd21_teacher_config(dtype_str)
    else:
        raise ValueError(kind)
    if sizes:
        ucfg = dc_replace(ucfg, **sizes)
    unet = UNet2DConditionModel(ucfg)
    lat_hw = 8
    n = ucfg.adapters.joint_group if ucfg.adapters.joint_self_attention else 1
    x = jnp.zeros((n, lat_hw, lat_hw, 4))
    ctx = jnp.zeros((n, 77, ucfg.cross_attention_dim))
    cam = jnp.zeros((n, ucfg.camera_dim)) if ucfg.camera_dim else None
    uparams = jax.jit(lambda k: unet.init(k, x, jnp.zeros((n,)), ctx, cam))(key)

    def to_model_dtype(tree):
        # flax `dtype` is compute-only; params init as f32. Frozen teachers
        # can live in bf16 outright (halves ~11 GB of teacher weights).
        if dtype_str != "bfloat16":
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
        )

    uparams = to_model_dtype(uparams)
    vae = vparams = None
    if kind in ("mv", "sd"):
        vae = AutoencoderKL(VAEConfig(dtype_str=dtype_str, **vae_sizes))
        img = jnp.zeros((1, 32, 32, 3))
        vparams = to_model_dtype(
            jax.jit(lambda k: vae.init(k, img, method=vae.encode))(
                jax.random.fold_in(key, 7)
            )
        )
    if ckpt_path:
        from ..utils.checkpoint import load_teacher_params

        uparams, vparams = load_teacher_params(
            ckpt_path,
            uparams,
            vparams,
            n_blocks=len(ucfg.block_out_channels),
            layers_per_block=ucfg.layers_per_block,
        )
    return TeacherBundle(unet, uparams, vae, vparams)


def build_system(cfg: Dict[str, Any], seed: int = 0) -> TriplaneTurboTrainer:
    """Assemble the full training system from a config dict (see
    configs/triplaneturbo_v1.yaml)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    sys_cfg = _sub(cfg, "system")

    # -- geometry (student) ---------------------------------------------------
    geo_cfg_d = _sub(sys_cfg, "geometry")
    sg = parse_structured(SpaceGeneratorConfig, _sub(geo_cfg_d, "space_generator_config"))
    geo_cfg = TriplaneGeometryConfig(space_generator=sg)
    for k in ("n_feature_dims", "sdf_bias", "sdf_bias_params", "rotate_planes",
              "split_channels", "geo_interpolate", "tex_interpolate", "radius"):
        if k in geo_cfg_d:
            setattr(geo_cfg, k, geo_cfg_d[k])
    geometry = TriplaneGeometry(geo_cfg)
    R0 = 8
    noisy = jnp.zeros((1, sg.n_planes, R0, R0, 4))
    text = jnp.zeros((1, 77, sg.cross_attention_dim))
    pts = jnp.zeros((1, 8, 3))
    geo_params = jax.jit(
        lambda k: geometry.init(k, noisy, text, jnp.zeros(()), pts, method=geometry.init_all)
    )(ks[0])
    # reference `system.weights=<path>` (threestudio/systems/base.py:52-62):
    # module weights without optimizer state — adapter .pth or native msgpack
    weights = sys_cfg.get("weights")
    if weights:
        from ..utils.checkpoint import load_params, load_torch_adapter

        if str(weights).endswith(".pth"):
            geo_params = load_torch_adapter(str(weights), geo_params)
        else:
            geo_params = load_params(str(weights), geo_params)

    # -- background -----------------------------------------------------------
    bg_d = _sub(sys_cfg, "background")
    bg_cfg = HashgridBackgroundConfig(
        hypernet=HyperNetConfig(c_dim=bg_d.get("c_dim", sg.cross_attention_dim)),
        encoding=parse_structured(HashGridConfig, _sub(bg_d, "encoding")),
    )
    background = HashgridEnvironmentMapBackground(bg_cfg)
    bg_params = jax.jit(
        lambda k: background.init(k, jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, bg_cfg.hypernet.c_dim)))
    )(ks[1])

    # -- renderers ------------------------------------------------------------
    vol = GenerativeSpaceSDFVolumeRenderer(
        parse_structured(VolumeRendererConfig, _sub(sys_cfg, "renderer_2nd"))
    )

    def dummy_field(points, with_normal):
        out = {"sdf": jnp.zeros(points.shape[:-1] + (1,)), "features": jnp.zeros_like(points)}
        out["normal"] = jnp.zeros_like(points)
        return out

    ro = jnp.zeros((1, 4, 4, 3))
    vol_params = vol.init(ks[2], ro, ro, dummy_field, lambda d, t: jnp.ones_like(d), train=False)

    rast = GenerativeSpaceMeshRasterizeRenderer(
        parse_structured(RasterizeRendererConfig, _sub(sys_cfg, "renderer"))
    )
    patch_cfg = parse_structured(PatchRendererConfig, _sub(sys_cfg, "patch"))

    # -- teachers + guidance ----------------------------------------------------
    teacher_sizes = _sub(sys_cfg, "teacher_sizes")  # tests shrink these
    dtype_str = sys_cfg.get("teacher_dtype", "bfloat16")
    guidance_d = _sub(sys_cfg, "guidance")
    # reference config keys {mv,rd,sd}_ckpt_path (TriplaneTurbo_v1.yaml:159,168,178)
    ckpt_paths = {k: guidance_d.pop(f"{k}_ckpt_path", None) for k in ("mv", "rd", "sd")}
    for k in ("mv", "rd", "sd"):
        guidance_d.pop(f"{k}_model_name_or_path", None)
    guidance = ASDGuidance(
        parse_structured(ASDConfig, guidance_d),
        mv=build_teacher("mv", ks[3], teacher_sizes.get("mv"), dtype_str, ckpt_paths["mv"]),
        rd=build_teacher("rd", ks[4], teacher_sizes.get("rd"), dtype_str, ckpt_paths["rd"]),
        sd=build_teacher("sd", ks[5], teacher_sizes.get("sd"), dtype_str, ckpt_paths["sd"]),
    )

    trainer_cfg = parse_structured(TrainerConfig, sys_cfg)
    trainer_cfg.loss = parse_structured(LossConfig, _sub(sys_cfg, "loss"))

    return TriplaneTurboTrainer(
        trainer_cfg,
        geometry, geo_params,
        background, bg_params,
        vol, vol_params,
        rast, patch_cfg,
        guidance, make_schedule(SchedulerConfig()),
        get_activation(sys_cfg.get("color_activation", "sigmoid-mipnerf")),
    )
