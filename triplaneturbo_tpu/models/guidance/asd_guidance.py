"""Asynchronous Score Distillation (ASD) guidance with three frozen teachers.

Rebuild of ``richdreamer-mvdream-stablediffusion-asynchronous-score-distillation-guidance``
(/root/reference/custom/triplaneturbo/models/guidance/
richdreamer_mvdream_stablediffusion_asd_guidance.py, 1796 LoC):

* three teachers — MVDream (4-view SD-2.1, camera-conditioned), RichDreamer
  (4-view normal-depth diffusion, 768-d text space, no VAE "wovae"), and
  SD-2.1 — one configurable UNet implementation covers all
  (:mod:`..unet`);
* per teacher: encode the rendered views to that teacher's latent space
  (MV: VAE-encode 256²→32²; RD: average-pool cat(normal, disparity) to 32²
  4-channel directly :780-797; SD: VAE-encode one random view at 512²→64²);
* ASD: sample t ∈ [min, max] per prompt; second timestep t⁺ = t +
  clamp(ratio·(t−t_min)·U) (get_t_plus :213-290); ONE batched UNet pass over
  [cond@t, uncond@t, cond@t⁺] (:364-464); grad = CFG(first) − second with
  the "dmd" weighting (x̂₀(second)−x̂₀(first))/(mean|x−x̂₀(first)|+ε)
  (:621-654); loss via the MSE-to-detached-target reparameterization
  (:666-687);
* dual-render mode stacks both renderers' images through one teacher pass
  and returns per-renderer losses (is_dual, :1576-1592).

All teacher math is stop-gradiented except the final reparameterized loss, so
gradients flow only through the rendered images — same as the reference's
torch.no_grad structure (SURVEY §3.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import triplaneturbo_tpu as ttt

from ..schedulers import Schedule, SchedulerConfig, make_schedule
from ..unet import UNet2DConditionModel
from ..vae import AutoencoderKL


def _avg_pool_to(x: jax.Array, size: int) -> jax.Array:
    """Exact box-average downsample to (size, size) — the TPU equivalent of
    torch adaptive_avg_pool2d for the divisible resolutions this system uses
    (512/128 -> 32; asserts divisibility instead of emulating the general
    fractional-window case)."""
    B, H, W, C = x.shape
    assert H % size == 0 and W % size == 0, (H, W, size)
    fh, fw = H // size, W // size
    return x.reshape(B, size, fh, size, fw, C).mean(axis=(2, 4))


class TeacherBundle(NamedTuple):
    """A frozen teacher: UNet (+optional VAE encoder) and params."""

    unet: UNet2DConditionModel
    unet_params: Any
    vae: Optional[AutoencoderKL] = None
    vae_params: Any = None


@dataclass
class ASDConfig:
    n_view: int = 4
    # timestep ranges as percents (scheduled via C() on the host)
    # guidance scales etc. are passed per-call so they can follow schedules
    mv_weighting_strategy: str = "dmd"
    rd_weighting_strategy: str = "dmd"
    sd_weighting_strategy: str = "dmd"
    mv_plus_ratio: float = 0.1
    rd_plus_ratio: float = 0.1
    sd_plus_ratio: float = 0.1
    mv_plus_random: bool = True
    rd_plus_random: bool = True
    sd_plus_random: bool = True
    plus_schedule: str = "linear"
    t_plus_type: str = "v1"
    eps: float = 0.01
    grad_clip_val: Optional[float] = None
    mv_image_size: int = 256
    rd_image_size: int = 32
    sd_image_size: int = 512
    sd_oppo_side: bool = True
    num_train_timesteps: int = 1000


@ttt.register("richdreamer-mvdream-stablediffusion-asynchronous-score-distillation-guidance")
class ASDGuidance:
    """Functional guidance: teachers are frozen param bundles."""

    def __init__(
        self,
        cfg: ASDConfig = None,
        mv: Optional[TeacherBundle] = None,
        rd: Optional[TeacherBundle] = None,
        sd: Optional[TeacherBundle] = None,
        schedule: Optional[Schedule] = None,
    ):
        self.cfg = cfg or ASDConfig()
        self.mv = mv
        self.rd = rd
        self.sd = sd
        self.schedule = schedule or make_schedule(SchedulerConfig())
        self.alphas = self.schedule.alphas_cumprod

    def teacher_params(self) -> Dict[str, Any]:
        """Teacher param pytree — pass this INTO jitted train steps so the
        ~10 GB of frozen weights become jit arguments, not baked-in constants."""
        out = {}
        for name, b in (("mv", self.mv), ("rd", self.rd), ("sd", self.sd)):
            if b is None:
                continue
            out[f"{name}_unet"] = b.unet_params
            if b.vae_params is not None:
                out[f"{name}_vae"] = b.vae_params
        return out

    def bind(self, params: Dict[str, Any]) -> "ASDGuidance":
        """Return a copy whose bundles carry the given (possibly traced)
        params; pairs with :meth:`teacher_params`."""
        def rebind(name, b):
            if b is None:
                return None
            return b._replace(
                unet_params=params[f"{name}_unet"],
                vae_params=params.get(f"{name}_vae", b.vae_params),
            )

        return ASDGuidance(
            self.cfg,
            mv=rebind("mv", self.mv),
            rd=rebind("rd", self.rd),
            sd=rebind("sd", self.sd),
            schedule=self.schedule,
        )

    # ------------------------------------------------------------------
    # ASD core
    # ------------------------------------------------------------------

    def get_t_plus(
        self, key: jax.Array, t: jax.Array, plus_ratio: float, plus_random: bool,
        min_step: jax.Array,
    ) -> jax.Array:
        """Second (bigger) timestep (reference get_t_plus :213-290, linear
        schedule, t_plus_type v1)."""
        T = self.cfg.num_train_timesteps
        t_plus = plus_ratio * (t.astype(jnp.float32) - min_step)
        t_plus = jnp.clip(t_plus, 0.0, (T - 1) - t.astype(jnp.float32))
        if plus_random:
            t_plus = t_plus * jax.random.uniform(key, t.shape)
        t_plus = t + t_plus.astype(jnp.int32)
        return jnp.clip(t_plus, 1, T - 1)

    def _q_sample(self, latents, noise, t):
        a = self.alphas[t].reshape(-1, 1, 1, 1)
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

    def _asd_loss(
        self,
        latents: jax.Array,  # [B, h, w, 4] (differentiable wrt renders)
        noise_pred_text: jax.Array,
        noise_pred_uncond: jax.Array,
        noise_pred_text_second: jax.Array,
        t: jax.Array,
        guidance_scale: jax.Array,
        weighting: str,
        is_dual: bool,
    ) -> Tuple[jax.Array, jax.Array]:
        """grad -> reparameterized MSE loss (reference :604-687)."""
        cfg = self.cfg
        first = noise_pred_uncond + guidance_scale * (noise_pred_text - noise_pred_uncond)
        second = noise_pred_text_second
        lat_sg = jax.lax.stop_gradient(latents)

        a = self.alphas[t].reshape(-1, 1, 1, 1)
        alpha, sigma = jnp.sqrt(a), jnp.sqrt(1.0 - a)
        if weighting in ("sds", "uniform", "fantasia3d", "sds_sqrt"):
            if weighting == "sds":
                w = (1 - a)
            elif weighting == "uniform":
                w = 1.0
            elif weighting == "fantasia3d":
                w = jnp.sqrt(a) * (1 - a)
            else:
                w = jnp.sqrt(1 - a)
            grad = (first - second) * w
        elif weighting == "dmd":
            latent_first = (lat_sg - sigma * first) / alpha
            latent_second = (lat_sg - sigma * second) / alpha
            w = jnp.abs(lat_sg - latent_first).mean(axis=(1, 2, 3), keepdims=True)
            grad = (latent_second - latent_first) / (w + cfg.eps)
        else:
            raise ValueError(f"Unknown weighting {weighting}")

        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip_val is not None:
            grad = jnp.clip(grad, -cfg.grad_clip_val, cfg.grad_clip_val)
        target = jax.lax.stop_gradient(lat_sg - grad)

        if not is_dual:
            loss = 0.5 * ((latents - target) ** 2).sum() / cfg.n_view
            return loss, jnp.linalg.norm(grad)
        vb = latents.shape[0] // 2
        loss = jnp.stack(
            [
                0.5 * ((latents[:vb] - target[:vb]) ** 2).sum() / cfg.n_view,
                0.5 * ((latents[vb:] - target[vb:]) ** 2).sum() / cfg.n_view,
            ]
        )
        gn = jnp.stack([jnp.linalg.norm(grad[:vb]), jnp.linalg.norm(grad[vb:])])
        return loss, gn

    def _three_way_pred(
        self,
        bundle: TeacherBundle,
        noisy: jax.Array,  # [B, h, w, 4]
        noisy_second: jax.Array,
        t: jax.Array,
        t_plus: jax.Array,
        ctx_cond: jax.Array,
        ctx_uncond: jax.Array,
        camera: Optional[jax.Array],
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One batched UNet pass over [cond@t, uncond@t, cond@t⁺]
        (reference _mv_noise_pred :364-464)."""
        x = jnp.concatenate([noisy, noisy, noisy_second], axis=0)
        ts = jnp.concatenate([t, t, t_plus], axis=0)
        ctx = jnp.concatenate([ctx_cond, ctx_uncond, ctx_cond], axis=0)
        cam = None if camera is None else jnp.concatenate([camera] * 3, axis=0)
        pred = bundle.unet.apply(bundle.unet_params, x, ts, ctx, cam)
        return jnp.split(pred, 3, axis=0)

    # ------------------------------------------------------------------
    # per-teacher branches
    # ------------------------------------------------------------------

    def mv_branch(
        self,
        key: jax.Array,
        rgb: jax.Array,  # [B, H, W, 3] in [0,1]
        text_cond: jax.Array,  # [Bp, 77, 1024]
        text_uncond: jax.Array,
        c2w: jax.Array,  # [B, 4, 4]
        min_step: jax.Array,
        max_step: jax.Array,
        guidance_scale: jax.Array,
        rgb_2nd: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """MVDream branch: VAE-encode 256² renders, 4-view joint UNet."""
        cfg = self.cfg
        is_dual = rgb_2nd is not None
        size = cfg.mv_image_size
        # resize each renderer's output to the teacher size BEFORE stacking —
        # the two renderers run at different resolutions (512² rasterize,
        # 128² volume; reference encodes each set separately, :466-530).
        # antialias=False matches torch F.interpolate bilinear (no AA).
        rgb = jax.image.resize(rgb, (rgb.shape[0], size, size, 3), "bilinear", antialias=False)
        if is_dual:
            rgb_2nd = jax.image.resize(
                rgb_2nd, (rgb_2nd.shape[0], size, size, 3), "bilinear", antialias=False
            )
            rgb = jnp.concatenate([rgb, rgb_2nd], axis=0)
            c2w = jnp.concatenate([c2w, c2w], axis=0)
        B = rgb.shape[0]
        Bp = B // cfg.n_view
        imgs = rgb * 2.0 - 1.0
        k_t, k_p, k_n, k_e = jax.random.split(key, 4)
        # sample the VAE posterior like the reference's
        # get_first_stage_encoding(encode_first_stage(...)) (interface.py)
        latents = self.mv.vae.apply(
            self.mv.vae_params, imgs, k_e, method=self.mv.vae.encode
        )
        _t = jax.random.randint(k_t, (Bp,), min_step, max_step)
        _tp = self.get_t_plus(k_p, _t, cfg.mv_plus_ratio, cfg.mv_plus_random, min_step)
        t = jnp.repeat(_t, cfg.n_view)
        t_plus = jnp.repeat(_tp, cfg.n_view)

        noise = jax.random.normal(k_n, latents.shape)
        lat_sg = jax.lax.stop_gradient(latents)
        noisy = self._q_sample(lat_sg, noise, t)
        noisy_second = self._q_sample(lat_sg, noise, t_plus)

        camera = self._mv_camera(c2w)
        ctx_c = self._dual_ctx(text_cond, B, is_dual)
        ctx_u = self._dual_ctx(text_uncond, B, is_dual)

        p_text, p_uncond, p_second = jax.lax.stop_gradient(
            self._three_way_pred(self.mv, noisy, noisy_second, t, t_plus, ctx_c, ctx_u, camera)
        )
        loss, gn = self._asd_loss(
            latents, p_text, p_uncond, p_second, t, guidance_scale,
            cfg.mv_weighting_strategy, is_dual,
        )
        return {"loss_asd": loss, "grad_norm": gn, "t": t}

    def _dual_ctx(self, text: jax.Array, batch: jax.Array, is_dual: bool) -> jax.Array:
        """Per-view text context with correct dual ordering.

        Images in dual mode are ordered [renderer1 views | renderer2 views]
        with prompts interleaved WITHIN each half, so the text must be
        repeat_interleave(n_view) per prompt and then TILED across the two
        halves (reference: repeat_interleave then .repeat(2,1,1),
        guidance :951-958 + :821-827). A flat jnp.repeat over the doubled
        batch would misalign prompts for multi-prompt batches.
        """
        half = batch // 2 if is_dual else batch
        per_view = jnp.repeat(text, half // text.shape[0], axis=0)
        if is_dual:
            per_view = jnp.concatenate([per_view, per_view], axis=0)
        return per_view

    def rd_branch(
        self,
        key: jax.Array,
        normal: jax.Array,  # [B, H, W, 3] in [0,1] (camera-space vis)
        disparity: jax.Array,  # [B, H, W, 1] in [0,1]
        text_cond: jax.Array,  # [Bp, 77, 768]
        text_uncond: jax.Array,
        c2w: jax.Array,
        camera_distances_relative: jax.Array,  # [B]
        min_step: jax.Array,
        max_step: jax.Array,
        guidance_scale: jax.Array,
        normal_2nd: Optional[jax.Array] = None,
        disparity_2nd: Optional[jax.Array] = None,
        cam_method: str = "rel_x2",
    ) -> Dict[str, jax.Array]:
        """RichDreamer branch: pooled normal+depth as 4ch latents ("wovae",
        reference :780-797, 905-1105)."""
        cfg = self.cfg
        is_dual = normal_2nd is not None
        size = cfg.rd_image_size
        # normals stay in [0,1] (comp_normal_cam_vis) — the reference feeds
        # them to the RD teacher unscaled (cat([normal, depth]), :933);
        # downsampling is adaptive_avg_pool2d = exact box mean (:787-790)
        geo = jnp.concatenate([normal, disparity], axis=-1)  # [B,H,W,4]
        geo = _avg_pool_to(geo, size)
        if is_dual:
            geo2 = jnp.concatenate([normal_2nd, disparity_2nd], axis=-1)
            geo2 = _avg_pool_to(geo2, size)
            geo = jnp.concatenate([geo, geo2], axis=0)
            c2w = jnp.concatenate([c2w, c2w], axis=0)
            camera_distances_relative = jnp.concatenate([camera_distances_relative] * 2)
        B = geo.shape[0]
        Bp = B // cfg.n_view
        latents = geo

        k_t, k_p, k_n = jax.random.split(key, 3)
        _t = jax.random.randint(k_t, (Bp,), min_step, max_step)
        _tp = self.get_t_plus(k_p, _t, cfg.rd_plus_ratio, cfg.rd_plus_random, min_step)
        t = jnp.repeat(_t, cfg.n_view)
        t_plus = jnp.repeat(_tp, cfg.n_view)

        noise = jax.random.normal(k_n, latents.shape)
        lat_sg = jax.lax.stop_gradient(latents)
        noisy = self._q_sample(lat_sg, noise, t)
        noisy_second = self._q_sample(lat_sg, noise, t_plus)

        if cam_method == "rel_x2":
            dist = camera_distances_relative * 2.0
        else:
            dist = camera_distances_relative
        camera = self._rd_camera(c2w, dist)
        ctx_c = self._dual_ctx(text_cond, B, is_dual)
        ctx_u = self._dual_ctx(text_uncond, B, is_dual)

        p_text, p_uncond, p_second = jax.lax.stop_gradient(
            self._three_way_pred(self.rd, noisy, noisy_second, t, t_plus, ctx_c, ctx_u, camera)
        )
        loss, gn = self._asd_loss(
            latents, p_text, p_uncond, p_second, t, guidance_scale,
            cfg.rd_weighting_strategy, is_dual,
        )
        return {"loss_asd": loss, "grad_norm": gn, "t": t}

    def sd_branch(
        self,
        key: jax.Array,
        rgb: jax.Array,  # [B, H, W, 3]: all views; one random view is used
        text_cond: jax.Array,  # [Bp, 77, 1024]
        text_uncond: jax.Array,
        min_step: jax.Array,
        max_step: jax.Array,
        guidance_scale: jax.Array,
        rgb_2nd: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """SD-2.1 branch: ONE random view per prompt (+opposite view for the
        second renderer when sd_oppo_side, reference :1664-1696)."""
        cfg = self.cfg
        is_dual = rgb_2nd is not None
        B = rgb.shape[0]
        Bp = B // cfg.n_view
        k_v, k_t, k_p, k_n, k_e = jax.random.split(key, 5)

        size = cfg.sd_image_size
        view_idx = jax.random.randint(k_v, (Bp,), 0, cfg.n_view)
        flat_idx = jnp.arange(Bp) * cfg.n_view + view_idx
        sel = rgb[flat_idx]  # [Bp, H, W, 3]
        # antialias=False matches torch F.interpolate bilinear (:1241-1248)
        sel = jax.image.resize(sel, (Bp, size, size, 3), "bilinear", antialias=False)
        if is_dual:
            oppo = (view_idx + cfg.n_view // 2) % cfg.n_view if cfg.sd_oppo_side else view_idx
            flat2 = jnp.arange(Bp) * cfg.n_view + oppo
            sel2 = jax.image.resize(
                rgb_2nd[flat2], (Bp, size, size, 3), "bilinear", antialias=False
            )
            sel = jnp.concatenate([sel, sel2], axis=0)
        n = sel.shape[0]
        # posterior SAMPLE like the reference's latent_dist.sample()
        latents = jax.checkpoint(
            lambda p_, im, k_: self.sd.vae.apply(p_, im, k_, method=self.sd.vae.encode)
        )(self.sd.vae_params, sel * 2.0 - 1.0, k_e)

        # per-IMAGE timesteps — the reference draws t of shape
        # [img_batch_size] (= n, both halves independent; :1391-1397)
        t = jax.random.randint(k_t, (n,), min_step, max_step)
        t_plus = self.get_t_plus(k_p, t, cfg.sd_plus_ratio, cfg.sd_plus_random, min_step)

        noise = jax.random.normal(k_n, latents.shape)
        lat_sg = jax.lax.stop_gradient(latents)
        noisy = self._q_sample(lat_sg, noise, t)
        noisy_second = self._q_sample(lat_sg, noise, t_plus)

        ctx_c = self._dual_ctx(text_cond, n, is_dual)
        ctx_u = self._dual_ctx(text_uncond, n, is_dual)

        p_text, p_uncond, p_second = jax.lax.stop_gradient(
            self._three_way_pred(self.sd, noisy, noisy_second, t, t_plus, ctx_c, ctx_u, None)
        )
        loss, gn = self._asd_loss(
            latents, p_text, p_uncond, p_second, t, guidance_scale,
            cfg.sd_weighting_strategy, is_dual,
        )
        # per-sample normalization: only 1 view per prompt is scored, so undo
        # the /n_view inside _asd_loss (same in single and dual mode)
        loss = loss * cfg.n_view
        return {"loss_asd": loss, "grad_norm": gn, "t": t}

    # ------------------------------------------------------------------
    # camera conditioning
    # ------------------------------------------------------------------

    @staticmethod
    def _mv_camera(c2w: jax.Array) -> jax.Array:
        """MVDream: unit-sphere-normalized c2w flattened to 16
        (extern/mvdream/camera_utils.py:5-27)."""
        pos = c2w[:, :3, 3]
        pos = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-8)
        out = c2w.at[:, :3, 3].set(pos)
        return out.reshape(out.shape[0], 16)

    @staticmethod
    def _rd_camera(c2w: jax.Array, distances: jax.Array) -> jax.Array:
        """RichDreamer: normalized camera, z-rotated -90°, translation scaled
        by distance (reference :757-777)."""
        pos = c2w[:, :3, 3]
        pos = pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-8)
        cam = c2w.at[:, :3, 3].set(pos)
        ang = -np.pi / 2
        rot = jnp.asarray(
            [
                [np.cos(ang), -np.sin(ang), 0, 0],
                [np.sin(ang), np.cos(ang), 0, 0],
                [0, 0, 1, 0],
                [0, 0, 0, 1],
            ],
            cam.dtype,
        )
        cam = jnp.einsum("ij,bjk->bik", rot, cam)
        cam = cam.at[:, :3, 3].set(cam[:, :3, 3] * distances[:, None])
        return cam.reshape(cam.shape[0], 16)
