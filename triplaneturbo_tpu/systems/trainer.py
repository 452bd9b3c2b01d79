"""Training system: multi-step progressive rendering distillation.

Rebuild of ``multiprompt-dual-renderer-multistep-generator-system``
(/root/reference/custom/triplaneturbo/systems/
multiprompt_dual_renderer_multistep_generator.py): per optimization step,
partition the 4 shifted training timesteps into strata (sample_timesteps
:28-45), then for each denoise step i: add fresh gaussian noise at t_i,
student UNet denoise -> pred_original, VAE-decode to a space cache, render
with BOTH renderers (mesh rasterize + patch/volume), score with the ASD
teacher ensemble plus regularizers, and accumulate grads (loss/num_parts,
:528-536); the next latent is the detached denoised latent (:539). Optimizer
is Adan on the adapter/MLP/background/variance parameters only.

TPU-native: the whole 4-step loop is ONE jitted+grad-ed function; gradient
accumulation uses optax.MultiSteps; data parallelism shards the view batch
over a Mesh axis with replicated params (SURVEY §2.7).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import triplaneturbo_tpu as ttt

from ..models.geometry.triplane_geometry import TriplaneGeometry, trainable_mask
from ..models.guidance.asd_guidance import ASDGuidance
from ..models.renderers.patch_renderer import PatchRenderer, PatchRendererConfig
from ..models.renderers.rasterize_renderer import GenerativeSpaceMeshRasterizeRenderer
from ..models.renderers.volume_renderer import GenerativeSpaceSDFVolumeRenderer
from ..utils.ops import safe_normalize
from ..models.schedulers import Schedule, add_noise, ddim_timesteps, pred_original
from ..utils.schedule import C, schedule_is_zero
from .optimizers import guarded_adan


def split_params(params, mask):
    """Partition a param tree into (train, frozen) by a boolean mask tree
    (equinox-style partition): gradients are computed ONLY for the train
    part, so the frozen SD backbone never materializes ~3.5 GB of f32 grad
    buffers the optimizer would zero anyway."""
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine_params(train, frozen):
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a,
        train,
        frozen,
        is_leaf=lambda x: x is None,
    )


def sample_timesteps(
    all_timesteps: np.ndarray, num_parts: int, rng: np.random.RandomState
) -> np.ndarray:
    """Stratified timestep sampling (reference sample_timesteps :28-45):
    partition the training timesteps into num_parts strata, draw one from
    each (descending)."""
    n = len(all_timesteps)
    per = n // num_parts
    out = []
    for p in range(num_parts):
        lo = p * per
        hi = n if p == num_parts - 1 else (p + 1) * per
        out.append(all_timesteps[rng.randint(lo, hi)])
    return np.asarray(out)


@dataclass
class LossConfig:
    lambda_asd: Any = 1.0
    lambda_asd_2nd: Any = 1.0
    lambda_sparsity: Any = 0.0
    lambda_sparsity_2nd: Any = 0.0
    lambda_opaque: Any = 0.0
    lambda_opaque_2nd: Any = 0.0
    lambda_z_variance_2nd: Any = 0.0
    lambda_eikonal_2nd: Any = 0.0
    lambda_orient_2nd: Any = 0.0
    lambda_sdf_abs: Any = 0.0
    lambda_normal_consistency: Any = 0.0
    lambda_laplacian_smoothness: Any = 0.0


@dataclass
class TrainerConfig:
    num_parts_training: int = 4
    num_steps_training: int = 4
    gradient_accumulation_steps: int = 1
    prediction_type: str = "epsilon"
    parallel_guidance: bool = False
    # staged path only: force one tiny host read after EVERY staged program
    # dispatch. PJRT allocates every enqueued program's OUTPUT buffers at
    # dispatch time, so letting the host race ahead stacks the queued
    # programs' outputs (three ~0.7 GB grad trees per part) on top of the
    # running program's temps — measured OOM on the 16 GB v5e at the
    # full-size 1-chip config even with one sync per PART
    # (probe_train_stages runs the same programs one-at-a-time and fits).
    # Each read costs ~28 ms through the tunnel; ~6 programs x 4 parts
    # ≈ 0.7 s/step, the price of serial-stream peak-memory = one program.
    sync_per_part: bool = True
    # the reference v1 recipe's auto_grad (configs/TriplaneTurbo_v1.yaml:198;
    # guidance :702-755): precompute image-space guidance gradients with the
    # teachers, re-inject via the SpecifyGradient trick. Here it additionally
    # splits the step into three jit programs (student render / teacher
    # ensemble / student backward) so no single compile unit holds all four
    # diffusion models — the only form the tunneled dev TPU's memory-capped
    # remote compiler accepts at full model size. Costs one extra student
    # forward per denoise part; gradients are mathematically identical
    # (chain rule), tested in tests/test_trainer_staged.py.
    auto_grad: bool = False
    n_view: int = 4
    rasterize_hw: int = 512
    learning_rate: float = 2e-4
    adan_betas: Tuple[float, float, float] = (0.98, 0.92, 0.99)
    adan_eps: float = 1e-15
    # numerical armor at the optimizer boundary (reference parity: the
    # guidance nan_to_num's its image grads, guidance:661,1079,1455, and
    # clips them via the update_step grad-clip hook, guidance:1765-1770;
    # torch's scaler additionally skips non-finite optimizer steps). Here:
    # optional global-norm clip on the param grads, and a finiteness gate
    # (optax.apply_if_finite) that SKIPS a poisoned batch — one non-finite
    # grad batch logs skipped_nonfinite and keeps training instead of
    # permanently bricking params (measured failure mode, r4: NaN grads x
    # MultiSteps' mid-cycle acc*0 update = NaN params forever).
    grad_clip_norm: Optional[float] = None
    skip_nonfinite_grads: bool = True
    loss: LossConfig = field(default_factory=LossConfig)
    # guidance schedules (C()-able)
    mv_guidance_scale: Any = 10.0
    rd_guidance_scale: Any = 5.0
    sd_guidance_scale: Any = 7.5
    mv_min_step_percent: Any = 0.02
    mv_max_step_percent: Any = 0.98
    rd_min_step_percent: Any = 0.02
    rd_max_step_percent: Any = 0.98
    sd_min_step_percent: Any = 0.02
    sd_max_step_percent: Any = 0.98
    rgb_grad_shrink: Any = 1.0
    sdf_grad_shrink: Any = 0.001
    def_grad_shrink: Any = 0.001


@ttt.register("multiprompt-dual-renderer-multistep-generator-system")
class TriplaneTurboTrainer:
    """Owns params, optimizer state and the jitted multi-step train step."""

    def __init__(
        self,
        cfg: TrainerConfig,
        geometry: TriplaneGeometry,
        geometry_params: Any,
        background,  # flax module
        background_params: Any,
        volume_renderer: GenerativeSpaceSDFVolumeRenderer,
        volume_params: Any,
        rasterize_renderer: GenerativeSpaceMeshRasterizeRenderer,
        patch_cfg: PatchRendererConfig,
        guidance: ASDGuidance,
        schedule: Schedule,
        material_fn: Callable,
    ):
        self.cfg = cfg
        self.geometry = geometry
        self.background = background
        self.volume_renderer = volume_renderer
        self.rasterize_renderer = rasterize_renderer
        self.patch_cfg = patch_cfg
        self.guidance = guidance
        self.schedule = schedule
        self.material_fn = material_fn
        self.global_step = 0
        self.rng = np.random.RandomState(0)

        self.params = {
            "geometry": geometry_params,
            "background": background_params,
            "renderer": volume_params,
        }
        # trainable partition: geometry adapters/MLPs; background: all;
        # renderer: the learned variance (reference peft_layers + bg + var)
        self.train_mask = {
            "geometry": trainable_mask(geometry_params),
            "background": jax.tree_util.tree_map(lambda _: True, background_params),
            "renderer": jax.tree_util.tree_map(lambda _: True, volume_params),
        }
        # frozen leaves of the student (the SD backbone) can live in the
        # compute dtype: bf16 storage halves ~3.6 GB of frozen weights while
        # trainable adapters/MLPs stay f32
        if geometry.cfg.space_generator.dtype_str == "bfloat16":
            self.params["geometry"] = jax.tree_util.tree_map(
                lambda p, m: p if m or p.dtype != jnp.float32 else p.astype(jnp.bfloat16),
                self.params["geometry"], self.train_mask["geometry"],
            )
        # the optimizer sees ONLY the trainable partition (reference: Adan on
        # peft_layers + field MLPs + background + variance); frozen leaves
        # are never differentiated (split_params) — saves the full-size
        # backbone's gradient buffers in HBM
        self.tx = tx = guarded_adan(
            cfg.learning_rate, cfg.adan_betas, cfg.adan_eps,
            grad_clip_norm=cfg.grad_clip_norm,
            accumulation_steps=cfg.gradient_accumulation_steps,
            skip_nonfinite=cfg.skip_nonfinite_grads,
        )
        train0, _ = split_params(self.params, self.train_mask)
        self.opt_state = tx.init(train0)
        # donate trainable params + optimizer state: both are immediately
        # replaced on the host, and without donation XLA keeps a second full
        # copy of the trainables + all Adan moments live across the step.
        # The frozen partition (arg 1) is reused every step — never donated.
        self._train_step_jit = jax.jit(self._train_step, donate_argnums=(0, 2))
        # staged (auto_grad) programs — lazily compiled, free to define
        self._stage_render_jit = jax.jit(self._stage_render)
        self._stage_teacher_jit = jax.jit(self._stage_teacher)
        import functools as _ft

        # render/space split (the default staged decomposition): per-branch
        # render-only backwards + ONE shared UNet+VAE backward per part.
        # space_cache (3) and grad_images (6) die with the 2nd-branch call;
        # the space program consumes (donates) both branch cotangents (5, 6).
        self._stage_student_render_jit = {
            "1st": jax.jit(_ft.partial(self._stage_student_render, branch="1st")),
            "2nd": jax.jit(
                _ft.partial(self._stage_student_render, branch="2nd"),
                donate_argnums=(3, 6),
            ),
        }
        self._stage_student_space_jit = jax.jit(
            self._stage_student_space, donate_argnums=(5, 6)
        )
        self._stage_update_jit = jax.jit(self._stage_update, donate_argnums=(0, 1))
        self._acc_jit = jax.jit(
            lambda a, b: jax.tree_util.tree_map(jnp.add, a, b), donate_argnums=(0,)
        )

        # fixed training timesteps: shifted 4-step schedule (:393-402)
        self.all_timesteps = ddim_timesteps(schedule, cfg.num_steps_training)
        # optional per-dispatch hook used by step_cost_flops (MFU accounting)
        self._cost_hook: Optional[Callable] = None

    def _dispatch(self, fn, *args):
        """Run a jitted step program, notifying the cost hook if installed."""
        if self._cost_hook is not None:
            self._cost_hook(fn, args)
        return fn(*args)

    def _hard_sync(self, out) -> None:
        """Retire every program enqueued so far (staged path, sync_per_part).

        Reads ONE element of one output leaf to the host: serial-stream
        execution order guarantees everything dispatched earlier has finished
        when the read returns, so the finished program's temps and any
        donated inputs are free before the next program is enqueued.
        jax.block_until_ready is NOT a reliable barrier through the tunnel
        (CLAUDE.md) — only a host read is."""
        if not self.cfg.sync_per_part:
            return
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.ravel(leaf)[0])

    def step_cost_flops(self, batch_list, text_embeds, key) -> float:
        """Total XLA-analyzed FLOPs of ONE optimization step.

        Sums ``cost_analysis()['flops']`` over every jit program the step
        dispatches, weighted by dispatch count (the staged path runs the
        render/teacher/backward programs once per denoise part). Runs one
        real step to observe the dispatch sequence; each distinct program is
        lowered once. Basis for the MFU numbers reported by
        tools/bench_train.py (VERDICT r2 missing #3/#4)."""
        costs: Dict[int, float] = {}
        counts: Dict[int, int] = {}

        def hook(fn, args):
            fid = id(fn)
            counts[fid] = counts.get(fid, 0) + 1
            if fid not in costs:
                try:
                    analysis = fn.lower(*args).compile().cost_analysis()
                except Exception:
                    analysis = None
                if isinstance(analysis, (list, tuple)):
                    analysis = analysis[0] if analysis else None
                costs[fid] = float((analysis or {}).get("flops", 0.0))

        self._cost_hook = hook
        try:
            self.train_step(batch_list, text_embeds, key)
        finally:
            self._cost_hook = None
        return sum(costs[k] * counts[k] for k in costs)

    # ------------------------------------------------------------------

    def host_scalars(self) -> Dict[str, jnp.ndarray]:
        """Evaluate every C() schedule at the current step (host side)."""
        s = self.global_step
        cfg = self.cfg
        T = self.schedule.config.num_train_timesteps

        def c(v):
            return jnp.asarray(C(v, 0, s), jnp.float32)

        out = {
            "mv_guidance_scale": c(cfg.mv_guidance_scale),
            "rd_guidance_scale": c(cfg.rd_guidance_scale),
            "sd_guidance_scale": c(cfg.sd_guidance_scale),
            "rgb_grad_shrink": c(cfg.rgb_grad_shrink),
            "sdf_grad_shrink": c(cfg.sdf_grad_shrink),
            "def_grad_shrink": c(cfg.def_grad_shrink),
        }
        for mod in ("mv", "rd", "sd"):
            out[f"{mod}_min_step"] = jnp.asarray(
                int(C(getattr(cfg, f"{mod}_min_step_percent"), 0, s) * T), jnp.int32
            )
            out[f"{mod}_max_step"] = jnp.asarray(
                int(C(getattr(cfg, f"{mod}_max_step_percent"), 0, s) * T), jnp.int32
            )
        for f_ in LossConfig.__dataclass_fields__:
            out[f_] = c(getattr(cfg.loss, f_))
        return out

    # ------------------------------------------------------------------

    def _render_both(self, params, batch, space_cache, scalars, key, text_global):
        """Dual-renderer forward (reference forward_rendering :195-227)."""
        return self._render_branch(
            params, batch, space_cache, scalars, key, text_global, "both"
        )

    def _render_branch(self, params, batch, space_cache, scalars, key, text_global, branch):
        """Render "1st" (mesh rasterize), "2nd" (patch volume) or "both".

        The branch split exists for the staged (auto_grad) step: running one
        renderer per backward program halves the peak activation memory (the
        isosurface/field-grid backward lives only in the 1st branch, the
        ray-sample MLP temps only in the 2nd). Key derivation is shared so
        1st/2nd render identically to "both" (gradient-equality tested)."""
        cfg = self.cfg
        Bsc = space_cache.shape[0]

        def forward_field(p, sc):
            return self.geometry.apply(params["geometry"], p, sc, method=self.geometry.forward_field)

        def forward_field_grid(sc, R):
            return self.geometry.apply(
                params["geometry"], sc, R, method=self.geometry.forward_field_grid
            )

        def export_fn(p, sc):
            return self.geometry.apply(
                params["geometry"], p, sc, method=self.geometry.export
            )["features"]

        def background_fn(dirs, te):
            return self.background.apply(
                params["background"], dirs, te, train=True
            )

        k1, k2 = jax.random.split(key)
        out_1st = None
        if branch in ("1st", "both"):
            H = batch["rays_d_rasterize"].shape[1]
            out_1st = self.rasterize_renderer(
                batch["mvp_mtx"], batch["camera_positions"], space_cache,
                forward_field, export_fn, self.material_fn, background_fn,
                H, H,
                text_embed=text_global,
                rays_d_rasterize=batch["rays_d_rasterize"],
                camera_distances=batch["camera_distances"],
                c2w=batch["c2w"],
                sdf_grad_shrink=scalars["sdf_grad_shrink"],
                def_grad_shrink=scalars["def_grad_shrink"],
                forward_field_grid=forward_field_grid,
            )
        if branch == "1st":
            return out_1st, None

        # 2nd renderer: patch-wrapped NeuS volume renderer. Points arrive
        # grouped per VIEW ([B, M, 3]); regroup per SPACE-CACHE item instead
        # of repeating the cache per view — repeating makes XLA materialize
        # nv x [6,256,256,C] gather-gradient temps (HBM blowup on backward)
        nv = batch["rays_o"].shape[0] // Bsc

        def field_fn(points, with_normal):
            B, M, _ = points.shape
            pts = points.reshape(Bsc, nv * M, 3)

            def ungroup(x):
                return x.reshape(B, M, *x.shape[2:])

            if with_normal == "sdf":
                # proposal pass: the renderer stop-gradients the density and
                # consumes ONLY the sdf — forward_sdf skips the texture taps
                # and the feature MLP (value-identical where consumed)
                sdf = self.geometry.apply(
                    params["geometry"], pts, space_cache,
                    method=self.geometry.forward_sdf,
                )
                return {"sdf": ungroup(sdf)}
            if with_normal:
                # one primal + one VJP: the sdf input-gradient (analytic
                # normal) reuses the primal's plane taps as residuals, where a
                # separate forward_sdf apply would re-gather all geo taps
                # (~12 row-gathers/pt, the dominant field cost on v5e)
                def f(p):
                    o = self.geometry.apply(params["geometry"], p, space_cache)
                    return o["sdf"].sum(), o

                (_, out), grad = jax.value_and_grad(f, has_aux=True)(pts)
                out = {k: ungroup(v) for k, v in out.items()}
                grad = ungroup(grad)
                out["sdf_grad"] = grad
                # safe_normalize: sdf_grad vanishes identically outside the
                # contracted box; max(norm, eps) NaNs those points' backward
                out["normal"] = safe_normalize(grad)
            else:
                out = self.geometry.apply(params["geometry"], pts, space_cache)
                out = {k: ungroup(v) for k, v in out.items()}
            out["features"] = self.material_fn(out["features"])
            return out

        field_fn = jax.checkpoint(field_fn, static_argnums=(1,))

        def base_renderer(ro, rd, key=None, train=True, **kw):
            return self.volume_renderer.apply(
                params["renderer"], ro, rd, field_fn, background_fn,
                camera_distances=batch["camera_distances"], c2w=batch["c2w"],
                text_embed=text_global, key=key, train=train,
                rgb_grad_shrink=scalars["rgb_grad_shrink"],
            )

        patch = PatchRenderer(self.patch_cfg, base_renderer)
        out_2nd = patch(batch["rays_o"], batch["rays_d"], key=k2, train=True)
        return out_1st, out_2nd

    def _regularizers(self, out_1st, out_2nd, scalars) -> jax.Array:
        """Active regularizer set (reference _compute_loss :594-788)."""
        return self._regularizers_1st(out_1st, scalars) + self._regularizers_2nd(
            out_2nd, scalars
        )

    def _term_on(self, name: str) -> bool:
        """STATIC gate: drop a loss term whose lambda schedule is identically
        zero, mirroring the reference's ``if self.C(...) > 0`` skipping
        (systems/multiprompt...py:594-788). Under jit a 0-lambda term still
        builds its backward graph, and a 0 cotangent times a NaN/inf partial
        would poison every upstream gradient; it also wastes forward FLOPs."""
        return not schedule_is_zero(getattr(self.cfg.loss, name))

    def _regularizers_1st(self, out_1st, scalars) -> jax.Array:
        loss = jnp.zeros((), jnp.float32)
        op1 = out_1st["opacity"]
        if self._term_on("lambda_sparsity"):
            loss += scalars["lambda_sparsity"] * jnp.sqrt(op1**2 + 0.01).mean()
        if self._term_on("lambda_opaque"):
            opc = jnp.clip(op1, 1e-3, 1 - 1e-3)
            loss += scalars["lambda_opaque"] * (
                -(opc * jnp.log(opc) + (1 - opc) * jnp.log(1 - opc))
            ).mean()
        if "mesh" in out_1st:
            if self._term_on("lambda_normal_consistency"):
                nc = jnp.stack([m.normal_consistency() for m in out_1st["mesh"]]).mean()
                loss += scalars["lambda_normal_consistency"] * nc
            if self._term_on("lambda_laplacian_smoothness"):
                lap = jnp.stack([m.laplacian() for m in out_1st["mesh"]]).mean()
                loss += scalars["lambda_laplacian_smoothness"] * lap
        return loss

    def _regularizers_2nd(self, out_2nd, scalars) -> jax.Array:
        loss = jnp.zeros((), jnp.float32)
        op2 = out_2nd["opacity"]
        if self._term_on("lambda_sparsity_2nd"):
            loss += scalars["lambda_sparsity_2nd"] * jnp.sqrt(op2**2 + 0.01).mean()
        if self._term_on("lambda_opaque_2nd"):
            opc2 = jnp.clip(op2, 1e-3, 1 - 1e-3)
            loss += scalars["lambda_opaque_2nd"] * (
                -(opc2 * jnp.log(opc2) + (1 - opc2) * jnp.log(1 - opc2))
            ).mean()
        if self._term_on("lambda_z_variance_2nd"):
            zv = out_2nd["z_variance"]
            sel = (op2 > 0.5).astype(zv.dtype)
            loss += scalars["lambda_z_variance_2nd"] * (zv * sel).sum() / jnp.maximum(sel.sum(), 1)
        if "eikonal" in out_2nd and self._term_on("lambda_eikonal_2nd"):
            loss += scalars["lambda_eikonal_2nd"] * out_2nd["eikonal"]
        # volume renderer exposes the orientation penalty (weights ·
        # clamp(n·d)², reference :618-633) and mean |sdf| (:689-705)
        if "orient" in out_2nd and self._term_on("lambda_orient_2nd"):
            loss += scalars["lambda_orient_2nd"] * out_2nd["orient"]
        if "sdf_abs" in out_2nd and self._term_on("lambda_sdf_abs"):
            loss += scalars["lambda_sdf_abs"] * out_2nd["sdf_abs"]
        return loss

    def _guidance_losses(self, key, out_1st, out_2nd, batch, text_embeds, scalars, teacher_params):
        """Teacher ensemble (reference compute_guidance_n_loss :229-300).

        parallel_guidance=True stacks both renderers through one teacher pass
        (the reference's >=98GB mode); False runs the two renderers through
        the teachers sequentially — same math, half the peak activations
        (v1 default, configs/TriplaneTurbo_v1.yaml:58)."""
        g = self.guidance.bind(teacher_params)
        k_mv, k_rd, k_sd = jax.random.split(key, 3)

        def mv(k, rgb, rgb_2nd):
            return g.mv_branch(
                k, rgb, text_embeds["cond_21"], text_embeds["uncond_21"],
                batch["c2w"], scalars["mv_min_step"], scalars["mv_max_step"],
                scalars["mv_guidance_scale"], rgb_2nd=rgb_2nd,
            )

        def rd(k, n, d, n2, d2):
            return g.rd_branch(
                k, n, d, text_embeds["cond_15"], text_embeds["uncond_15"],
                batch["c2w"], batch["camera_distances_relative"],
                scalars["rd_min_step"], scalars["rd_max_step"],
                scalars["rd_guidance_scale"], normal_2nd=n2, disparity_2nd=d2,
            )

        def sd(k, rgb, rgb_2nd):
            return g.sd_branch(
                k, rgb, text_embeds["cond_21"], text_embeds["uncond_21"],
                scalars["sd_min_step"], scalars["sd_max_step"],
                scalars["sd_guidance_scale"], rgb_2nd=rgb_2nd,
            )

        fid = 0.0
        if self.cfg.parallel_guidance:
            mv_o = mv(k_mv, out_1st["comp_rgb"], out_2nd["comp_rgb"])
            rd_o = rd(
                k_rd, out_1st["comp_normal_cam_vis"], out_1st["disparity"],
                out_2nd["comp_normal_cam_vis"], out_2nd["disparity"],
            )
            sd_o = sd(k_sd, out_1st["comp_rgb"], out_2nd["comp_rgb"])
            for branch in (mv_o, rd_o, sd_o):
                fid = fid + scalars["lambda_asd"] * branch["loss_asd"][0]
                fid = fid + scalars["lambda_asd_2nd"] * branch["loss_asd"][1]
            gn = mv_o["grad_norm"]
        else:
            k1 = jax.random.split(k_mv, 2)
            k2 = jax.random.split(k_rd, 2)
            k3 = jax.random.split(k_sd, 2)
            first = 0.0
            second = 0.0
            gn = None
            for k_, out_, lam in ((0, out_1st, "lambda_asd"), (1, out_2nd, "lambda_asd_2nd")):
                mv_o = mv(k1[k_], out_["comp_rgb"], None)
                rd_o = rd(
                    k2[k_], out_["comp_normal_cam_vis"],
                    out_["disparity"], None, None,
                )
                sd_o = sd(k3[k_], out_["comp_rgb"], None)
                term = mv_o["loss_asd"] + rd_o["loss_asd"] + sd_o["loss_asd"]
                fid = fid + scalars[lam] * term
                if gn is None:
                    gn = mv_o["grad_norm"]
        return fid, {"grad_norm_mv": gn}

    # ------------------------------------------------------------------

    def _loss_fn(self, params_train, params_frozen, batch_list, timesteps, text_embeds, scalars, key, teacher_params):
        """The 4-iteration denoise loop as ONE lax.scan: the (large) loop body
        compiles once instead of num_parts times (reference unrolls in Python,
        systems/...py:409-539). Differentiated w.r.t. params_train only."""
        params = combine_params(params_train, params_frozen)
        cfg = self.cfg
        latent0 = batch_list[0]["noise"]
        # stack the per-step camera batches into scan inputs
        common = [
            {k: v for k, v in b.items() if k != "noise"} for b in batch_list
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *common)
        keys = jax.random.split(key, cfg.num_parts_training)

        def body(latent, inp):
            batch, t, k = inp
            k_noise, k_render, k_guid = jax.random.split(k, 3)
            noise = jax.random.normal(k_noise, latent.shape)
            noisy = add_noise(self.schedule, latent, noise, t)
            eps = self.geometry.apply(
                params["geometry"], noisy, text_embeds["cond_local"], t,
                method=self.geometry.denoise,
            )
            denoised = pred_original(self.schedule, eps, t, noisy)
            space_cache = self.geometry.apply(
                params["geometry"], denoised, method=self.geometry.decode
            )
            out_1st, out_2nd = self._render_both(
                params, batch, space_cache, scalars, k_render,
                text_embeds["global_21"],
            )
            fid, gaux = self._guidance_losses(
                k_guid, out_1st, out_2nd, batch, text_embeds, scalars, teacher_params
            )
            regu = self._regularizers(out_1st, out_2nd, scalars)
            return jax.lax.stop_gradient(denoised), (fid, regu, gaux["grad_norm_mv"])

        # remat each denoise step: without it the scan stores every step's
        # residuals simultaneously (num_parts x the renderer/teacher
        # activations — OOM at real sizes); the reference checkpoints the
        # heavy submodules for the same reason (SURVEY §2.7)
        _, (fids, regus, gns) = jax.lax.scan(
            jax.checkpoint(body), latent0, (stacked, timesteps, keys)
        )
        total = (fids.sum() + regus.sum()) / cfg.num_parts_training
        metrics = self._step_metrics(fids, regus, gns)
        return total, metrics

    def _step_metrics(self, fids, regus, gns) -> Dict[str, jax.Array]:
        """Per-step metric dict, identical keys for the monolithic and staged
        paths (reference logs every loss term per denoise-step index,
        systems/multiprompt...py:610-616): aggregate loss/fidelity/
        regularization/grad_norm plus the per-part series."""
        cfg = self.cfg
        metrics = {
            "loss": (fids.sum() + regus.sum()) / cfg.num_parts_training,
            "fidelity": fids.mean(),
            "regularization": regus.mean(),
            "grad_norm": gns.mean(),
        }
        for i in range(cfg.num_parts_training):
            metrics[f"fidelity_{i}"] = fids[i]
            metrics[f"regularization_{i}"] = regus[i]
            metrics[f"grad_norm_{i}"] = gns[i]
        return metrics

    def _train_step(self, params_train, params_frozen, opt_state, batch_list, timesteps, text_embeds, scalars, key, teacher_params):
        (loss, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            params_train, params_frozen, batch_list, timesteps, text_embeds, scalars, key, teacher_params
        )
        updates, opt_state = self.tx.update(grads, opt_state, params_train)
        params_train = optax.apply_updates(params_train, updates)
        return params_train, opt_state, metrics

    # ------------------------------------------------------------------
    # staged (auto_grad) step: three jit programs per denoise part
    # (reference guidance :702-755 SpecifyGradient path; see TrainerConfig)
    # ------------------------------------------------------------------

    _GUIDANCE_IMAGE_KEYS = ("comp_rgb", "comp_normal_cam_vis", "disparity")

    def _student_forward(self, params, batch, latent, t, text_embeds, scalars, k, branch="both"):
        """Shared fwd of the render stage: noise -> denoise -> decode ->
        render. Deterministic given k (k_noise/k_render re-derived), and the
        per-renderer keys are derived identically for every ``branch`` value
        so single-branch renders match the dual render exactly."""
        k_noise, k_render, _ = jax.random.split(k, 3)
        denoised, space_cache = self._denoise_decode(
            params, latent, t, text_embeds, k_noise
        )
        out_1st, out_2nd = self._render_branch(
            params, batch, space_cache, scalars, k_render, text_embeds["global_21"], branch
        )
        return denoised, space_cache, out_1st, out_2nd

    def _denoise_decode(self, params, latent, t, text_embeds, k_noise):
        """Generator half of the student forward: noise -> UNet eps ->
        pred_original -> VAE decode to the space cache (reference
        forward_rendering upstream, :504-527)."""
        noise = jax.random.normal(k_noise, latent.shape)
        noisy = add_noise(self.schedule, latent, noise, t)
        eps = self.geometry.apply(
            params["geometry"], noisy, text_embeds["cond_local"], t,
            method=self.geometry.denoise,
        )
        denoised = pred_original(self.schedule, eps, t, noisy)
        space_cache = self.geometry.apply(
            params["geometry"], denoised, method=self.geometry.decode
        )
        return denoised, space_cache

    def _stage_render(self, params, batch, latent, t, text_embeds, scalars, k):
        """Program R: student fwd only; emits the guidance input images and
        the detached space cache the render-backward programs reuse."""
        denoised, space_cache, out_1st, out_2nd = self._student_forward(
            params, batch, latent, t, text_embeds, scalars, k
        )
        images = {
            f"{name}_{side}": out[name]
            for side, out in (("1st", out_1st), ("2nd", out_2nd))
            for name in self._GUIDANCE_IMAGE_KEYS
        }
        return (
            jax.lax.stop_gradient(denoised),
            jax.lax.stop_gradient(space_cache),
            jax.lax.stop_gradient(images),
        )

    def _stage_teacher(self, teacher_params, images, batch, text_embeds, scalars, k):
        """Program G: teacher ensemble -> ((fid value, grad_norm),
        d(fid)/d(images)).

        Contains the 3 teacher UNets (+ VAE encoders) and differentiates only
        w.r.t. the input images — the auto_grad precompute. grad_norm (the MV
        teacher's ASD-gradient norm, what the reference logs per part) rides
        along as aux so staged metrics match the monolithic path."""
        _, _, k_guid = jax.random.split(k, 3)

        def fid_fn(imgs):
            o1 = {name: imgs[f"{name}_1st"] for name in self._GUIDANCE_IMAGE_KEYS}
            o2 = {name: imgs[f"{name}_2nd"] for name in self._GUIDANCE_IMAGE_KEYS}
            fid, gaux = self._guidance_losses(
                k_guid, o1, o2, batch, text_embeds, scalars, teacher_params
            )
            return fid, gaux["grad_norm_mv"]

        return jax.value_and_grad(fid_fn, has_aux=True)(images)

    def _stage_student_render(self, params_train, params_frozen, batch, space_cache, text_embeds, scalars, grad_images, k, branch):
        """Program B-R: ONE renderer's fwd+bwd from the detached space cache.

        Differentiates w.r.t. (trainable partition, space cache): the
        renderer-side trainables (geometry field MLPs, background hypernet,
        NeuS variance) get their grads directly; everything upstream of the
        space cache (UNet + VAE adapters) is deferred to program B-G via the
        returned d(loss)/d(space_cache) cotangent. Unlike a combined
        per-branch backward (student fwd+bwd through the UNet+VAE per branch,
        the decomposition this one replaced — see tools/probe_student_mem.py)
        this program contains NO UNet/VAE compute at all, so its peak HBM is
        just the renderer residuals — the decisive split for a 16 GB v5e
        (the combined per-branch backward lands ~23 MB over HBM at full size).
        """
        _, k_render, _ = jax.random.split(k, 3)

        def loss_fn(pt, sc):
            p = combine_params(pt, params_frozen)
            out_1st, out_2nd = self._render_branch(
                p, batch, sc, scalars, k_render, text_embeds["global_21"], branch
            )
            out = out_1st if branch == "1st" else out_2nd
            fid_proxy = 0.0
            for name in self._GUIDANCE_IMAGE_KEYS:
                g = jax.lax.stop_gradient(grad_images[f"{name}_{branch}"])
                fid_proxy = fid_proxy + (g * out[name]).sum()
            regu = (
                self._regularizers_1st(out_1st, scalars)
                if branch == "1st"
                else self._regularizers_2nd(out_2nd, scalars)
            )
            return fid_proxy + regu, regu

        (_, regu), (grads, g_space) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params_train, space_cache)
        return grads, g_space, regu

    def _stage_student_space(self, params_train, params_frozen, latent, t, text_embeds, g_space_1st, g_space_2nd, k):
        """Program B-G: UNet denoise + VAE decode fwd+bwd with the injected
        space-cache cotangent (SpecifyGradient at the space-cache boundary:
        loss = sum(sg(g) * space_cache) has d/d(space_cache) = g).

        Runs ONCE per denoise part with the two render branches' cotangents
        summed — vs the replaced combined decomposition which re-ran the
        UNet+VAE fwd AND bwd inside each branch program (2x the generator
        work per part; see tools/probe_student_mem.py).
        By loss additivity + the chain rule the parameter grads are identical
        (locked by tests/test_trainer_staged.py through train_step)."""
        k_noise, _, _ = jax.random.split(k, 3)
        g_space = jax.lax.stop_gradient(g_space_1st + g_space_2nd)

        def loss_fn(pt):
            p = combine_params(pt, params_frozen)
            _, space_cache = self._denoise_decode(p, latent, t, text_embeds, k_noise)
            return (g_space * space_cache).sum()

        return jax.grad(loss_fn)(params_train)

    def _stage_update(self, params_train, opt_state, grads):
        grads = jax.tree_util.tree_map(
            lambda g: g / self.cfg.num_parts_training, grads
        )
        updates, opt_state = self.tx.update(grads, opt_state, params_train)
        params_train = optax.apply_updates(params_train, updates)
        return params_train, opt_state

    def _train_step_staged(self, batch_list, timesteps, text_embeds, scalars, key):
        """Host loop over denoise parts, 4 jit dispatches per part + 1 update
        (render R, teacher G, per-branch backwards B1 + B2).

        vs the monolithic scan: extra student forwards per part (R, B1, B2
        each run the fwd; XLA residual sharing cannot cross jit boundaries),
        in exchange for per-program compile and activation memory a fraction
        of the fused step's — the full-size (SD-2.1 + 3 teachers) step only
        compiles AND fits 16 GB HBM this way. Gradients are identical by the
        chain rule / loss additivity."""
        cfg = self.cfg
        keys = jax.random.split(key, cfg.num_parts_training)
        latent = batch_list[0]["noise"]
        teacher_params = self.guidance.teacher_params()
        params_train, params_frozen = split_params(self.params, self.train_mask)

        grads_acc = None
        fids, regus, gns = [], [], []
        for i in range(cfg.num_parts_training):
            batch = {k_: v for k_, v in batch_list[i].items() if k_ != "noise"}
            t = timesteps[i]
            latent_in = latent
            latent, space_cache, images = self._dispatch(
                self._stage_render_jit,
                self.params, batch, latent_in, t, text_embeds, scalars, keys[i],
            )
            self._hard_sync(latent)
            (fid, gn), grad_images = self._dispatch(
                self._stage_teacher_jit,
                teacher_params, images, batch, text_embeds, scalars, keys[i],
            )
            self._hard_sync(fid)
            grads, g_space1, regu = self._dispatch(
                self._stage_student_render_jit["1st"],
                params_train, params_frozen, batch, space_cache,
                text_embeds, scalars, grad_images, keys[i],
            )
            self._hard_sync(regu)
            grads2, g_space2, regu2 = self._dispatch(
                self._stage_student_render_jit["2nd"],
                params_train, params_frozen, batch, space_cache,
                text_embeds, scalars, grad_images, keys[i],
            )
            self._hard_sync(regu2)
            grads_g = self._dispatch(
                self._stage_student_space_jit,
                params_train, params_frozen, latent_in, t,
                text_embeds, g_space1, g_space2, keys[i],
            )
            self._hard_sync(grads_g)
            grads = self._acc_jit(self._acc_jit(grads, grads2), grads_g)
            regu = regu + regu2
            grads_acc = grads if grads_acc is None else self._acc_jit(grads_acc, grads)
            # the b-side accumulation args are NOT donated (only arg 0 is) —
            # drop the Python refs now or three ~0.7 GB grad trees stay live
            # into the next part's render program (measured OOM, r4)
            del grads, grads2, grads_g
            fids.append(fid)
            regus.append(regu)
            gns.append(gn)
            self._hard_sync(grads_acc)
        # drop the last part's buffers the loop locals still pin (the space
        # cache / image grads / branch cotangents) before the update
        del space_cache, grad_images, g_space1, g_space2
        params_train, self.opt_state = self._dispatch(
            self._stage_update_jit, params_train, self.opt_state, grads_acc
        )
        self.params = combine_params(params_train, params_frozen)
        return self._step_metrics(jnp.stack(fids), jnp.stack(regus), jnp.stack(gns))

    # ------------------------------------------------------------------
    # validation / test (turntable rendering, reference :546-933)
    # ------------------------------------------------------------------

    def diffusion_reverse(self, noise: jax.Array, text_local: jax.Array, key=None) -> jax.Array:
        """4-step shifted DDIM sampling to a space cache latent (reference
        diffusion_reverse :317-379)."""
        from ..models.schedulers import ddim_step

        ts = jnp.asarray(self.all_timesteps, jnp.int32)
        latents = noise
        denoised = latents
        for t in np.asarray(ts):
            t_arr = jnp.asarray(t, jnp.int32)
            eps = self.geometry.apply(
                self.params["geometry"], latents, text_local, t_arr,
                method=self.geometry.denoise,
            )
            out = ddim_step(self.schedule, eps, t_arr, latents, len(self.all_timesteps))
            latents, denoised = out.prev_sample, out.pred_original_sample
        return denoised

    def render_eval_views(
        self,
        batch: Dict[str, Any],
        text_embeds: Dict[str, Any],
        chunk_views: int = 4,
    ) -> Dict[str, np.ndarray]:
        """Render a turntable batch with the mesh rasterize renderer
        (eval renders per 4-view chunk like the reference :155-165)."""
        latents = self.diffusion_reverse(
            jnp.asarray(batch["noise"]), text_embeds["cond_local"]
        )
        space_cache = self.geometry.apply(
            self.params["geometry"], latents, method=self.geometry.decode
        )

        def forward_field(p, sc):
            return self.geometry.apply(self.params["geometry"], p, sc, method=self.geometry.forward_field)

        def forward_field_grid(sc, R):
            return self.geometry.apply(
                self.params["geometry"], sc, R, method=self.geometry.forward_field_grid
            )

        def export_fn(p, sc):
            return self.geometry.apply(
                self.params["geometry"], p, sc, method=self.geometry.export
            )["features"]

        def background_fn(dirs, te):
            return self.background.apply(self.params["background"], dirs, te, train=False)

        n = batch["mvp_mtx"].shape[0]
        frames = []
        scalars = self.host_scalars()
        for i in range(0, n, chunk_views):
            sl = slice(i, min(i + chunk_views, n))
            out = self.rasterize_renderer(
                jnp.asarray(batch["mvp_mtx"][sl]),
                jnp.asarray(batch["camera_positions"][sl]),
                space_cache,
                forward_field, export_fn, self.material_fn, background_fn,
                batch["rays_d_rasterize"].shape[1], batch["rays_d_rasterize"].shape[2],
                text_embed=text_embeds["global_21"],
                rays_d_rasterize=jnp.asarray(batch["rays_d_rasterize"][sl]),
                camera_distances=jnp.asarray(batch["camera_distances"][sl]),
                c2w=jnp.asarray(batch["c2w"][sl]),
                forward_field_grid=forward_field_grid,
            )
            frames.append(
                {
                    "rgb": np.asarray(out["comp_rgb"]),
                    "normal": np.asarray(out["comp_normal"]),
                    "opacity": np.asarray(out["opacity"]),
                    "depth": np.asarray(out["depth"]),
                }
            )
        return {k: np.concatenate([f[k] for f in frames]) for k in frames[0]}

    def save_eval_artifacts(self, views: Dict[str, np.ndarray], save_dir: str, tag: str) -> List[str]:
        """Image grid (rgb|normal|opacity|depth) per view + turntable video
        (reference SaverMixin usage :791-933)."""
        from ..utils.saving import save_image_grid, save_video

        paths = []
        n = views["rgb"].shape[0]
        mid = n // 2
        d = views["depth"][mid, ..., 0]
        d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
        paths.append(
            save_image_grid(
                os.path.join(save_dir, f"{tag}-grid.png"),
                [views["rgb"][mid], views["normal"][mid], views["opacity"][mid].repeat(3, -1), np.stack([d] * 3, -1)],
            )
        )
        paths.append(save_video(os.path.join(save_dir, f"{tag}-rgb.mp4"), list(views["rgb"])))
        return paths

    def train_step(self, batch_list: List[Dict[str, Any]], text_embeds: Dict[str, Any], key) -> Dict:
        """One optimization step (host entry): evaluates schedules, samples
        stratified timesteps, runs the jitted step."""
        ts = sample_timesteps(self.all_timesteps, self.cfg.num_parts_training, self.rng)
        scalars = self.host_scalars()
        batch_list = [
            {k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, (list, str))}
            for b in batch_list
        ]
        if self.cfg.auto_grad:
            metrics = self._train_step_staged(
                batch_list, jnp.asarray(ts, jnp.int32), text_embeds, scalars, key
            )
        else:
            params_train, params_frozen = split_params(self.params, self.train_mask)
            params_train, self.opt_state, metrics = self._dispatch(
                self._train_step_jit,
                params_train, params_frozen, self.opt_state, batch_list,
                jnp.asarray(ts, jnp.int32), text_embeds, scalars, key,
                self.guidance.teacher_params(),
            )
            self.params = combine_params(params_train, params_frozen)
        if self.cfg.skip_nonfinite_grads:
            # cumulative count of batches whose param grads were non-finite
            # and were therefore skipped by the apply_if_finite gate
            metrics = dict(metrics)
            metrics["skipped_nonfinite"] = self.opt_state.total_notfinite
        self.global_step += 1
        return metrics
