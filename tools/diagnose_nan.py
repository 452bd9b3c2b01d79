#!/usr/bin/env python
"""Bisect the full-size step-1 NaN on the real chip.

The 30-step on-chip run of configs/triplaneturbo_v1_1chip.yaml produced a
finite step 0 (loss 31531, grad_norm 147) and NaN from step 1 on, with
teacher-side grad_norm 0.0 — i.e. the RENDER stage's guidance images went
NaN (the ASD nan_to_num guard then zeroes the image gradient, reference
parity: threestudio guidance does the same). gradient_accumulation_steps=2
means optax.MultiSteps had NOT yet touched the params at step 1: the forward
NaNs for some (batch, noise, key) at INIT. This tool replays the exact
launch.py input sequence (same seed/fold_in/sample order) and runs ONLY the
forward render stage per step/part, reporting which output goes non-finite
first (denoised latent / space cache / which guidance image, which branch).

Usage: python tools/diagnose_nan.py [--config ...] [--steps 3] [dotlist...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def finite_report(name, x):
    x = np.asarray(jax.device_get(x)).astype(np.float32)
    n_bad = int(np.size(x) - np.isfinite(x).sum())
    mx = float(np.nanmax(np.abs(x))) if np.isfinite(x).any() else float("nan")
    flag = "" if n_bad == 0 else f"  <-- {n_bad}/{x.size} NON-FINITE"
    print(f"    {name:28s} max|x|={mx:12.4e}{flag}")
    sys.stdout.flush()
    return n_bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--stage", default="render",
        choices=["render", "teacher", "full", "grads"],
        help="render: per-part forward finiteness; teacher: drill the three "
        "guidance branches separately on the render stage's images; full: "
        "run the REAL staged train_step with a checking dispatch that "
        "verifies every program's outputs AND the param tree after each "
        "program (catches buffer corruption by the backward programs that "
        "forward-only replay cannot reproduce)",
    )
    ap.add_argument("extras", nargs="*")
    args = ap.parse_args()

    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.systems.trainer import sample_timesteps
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup
    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.utils import load_config, parse_structured

    cfg = load_config(args.config, cli_args=args.extras, n_devices=jax.device_count())
    dm = MultiviewMultipromptDataModule(
        parse_structured(DataModuleConfig, cfg.get("data", {})), seed=args.seed
    )
    trainer = build_system(cfg, seed=args.seed)
    processor, embeds_for = build_prompt_setup(
        trainer.geometry.cfg.space_generator.cross_attention_dim,
        seed=args.seed,
        negative_prompt=cfg.get("data", {}).get("negative_prompt", ""),
    )
    key = jax.random.PRNGKey(args.seed)

    teacher_params = trainer.guidance.teacher_params()

    def teacher_branches(tp, images, batch, text_embeds, scalars, k):
        """Per-teacher, per-renderer fid values (mirrors _guidance_losses
        with parallel_guidance=False) so the NaN teacher is identified."""
        _, _, k_guid = jax.random.split(k, 3)
        g = trainer.guidance.bind(tp)
        k_mv, k_rd, k_sd = jax.random.split(k_guid, 3)
        k1 = jax.random.split(k_mv, 2)
        k2 = jax.random.split(k_rd, 2)
        k3 = jax.random.split(k_sd, 2)
        out = {}
        for side_i, side in enumerate(("1st", "2nd")):
            o = {name: images[f"{name}_{side}"] for name in trainer._GUIDANCE_IMAGE_KEYS}
            mv_o = g.mv_branch(
                k1[side_i], o["comp_rgb"], text_embeds["cond_21"],
                text_embeds["uncond_21"], batch["c2w"],
                scalars["mv_min_step"], scalars["mv_max_step"],
                scalars["mv_guidance_scale"],
            )
            rd_o = g.rd_branch(
                k2[side_i], o["comp_normal_cam_vis"], o["disparity"],
                text_embeds["cond_15"], text_embeds["uncond_15"],
                batch["c2w"], batch["camera_distances_relative"],
                scalars["rd_min_step"], scalars["rd_max_step"],
                scalars["rd_guidance_scale"],
            )
            sd_o = g.sd_branch(
                k3[side_i], o["comp_rgb"], text_embeds["cond_21"],
                text_embeds["uncond_21"], scalars["sd_min_step"],
                scalars["sd_max_step"], scalars["sd_guidance_scale"],
            )
            out[f"mv_{side}"] = mv_o["loss_asd"]
            out[f"mv_gn_{side}"] = mv_o["grad_norm"]
            out[f"rd_{side}"] = rd_o["loss_asd"]
            out[f"sd_{side}"] = sd_o["loss_asd"]
        return out

    teacher_branches_jit = jax.jit(teacher_branches)

    if args.stage == "grads":
        # leaf-level non-finite census of part-0's two branch backwards
        from triplaneturbo_tpu.systems.trainer import split_params

        batch_list = dm.sample_train_batch()
        prompts = batch_list[0]["prompt"]
        text_embeds = embeds_for(prompts)
        kstep = jax.random.fold_in(key, 0)
        trainer.global_step = 0
        ts = sample_timesteps(
            trainer.all_timesteps, trainer.cfg.num_parts_training, trainer.rng
        )
        scalars = trainer.host_scalars()
        batch_list = [
            {k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, (list, str))}
            for b in batch_list
        ]
        keys = jax.random.split(kstep, trainer.cfg.num_parts_training)
        batch = {k: v for k, v in batch_list[0].items() if k != "noise"}
        t0 = jnp.asarray(ts, jnp.int32)[0]
        latent, space_cache, images = trainer._stage_render_jit(
            trainer.params, batch, batch_list[0]["noise"], t0,
            text_embeds, scalars, keys[0],
        )
        (fid, gn), grad_images = trainer._stage_teacher_jit(
            trainer.guidance.teacher_params(), images, batch, text_embeds,
            scalars, keys[0],
        )
        params_train, params_frozen = split_params(trainer.params, trainer.train_mask)

        census = jax.jit(
            lambda tree: jax.tree_util.tree_map(
                lambda l: (jnp.sum(jnp.isnan(l)), jnp.sum(jnp.isinf(l)),
                           jnp.nanmax(jnp.abs(l)))
                if jnp.issubdtype(l.dtype, jnp.floating)
                else (jnp.zeros((), jnp.int32),) * 2 + (jnp.zeros(()),),
                tree,
            )
        )

        for branch in ("1st", "2nd"):
            grads, g_space, regu = trainer._stage_student_render_jit[branch](
                params_train, params_frozen, batch, space_cache,
                text_embeds, scalars, grad_images, keys[0],
            )
            print(f"== branch {branch}: regu={float(regu):.6f}")
            rep = jax.device_get(census({"grads": grads, "g_space": g_space}))

            def walk(prefix, node):
                if isinstance(node, dict):
                    for k2, v2 in node.items():
                        walk(f"{prefix}/{k2}", v2)
                elif isinstance(node, tuple) and len(node) == 3:
                    n_nan, n_inf, mx = (int(node[0]), int(node[1]), float(node[2]))
                    if n_nan or n_inf or mx > 1e15:
                        print(f"    {prefix:70s} nan={n_nan:9d} inf={n_inf:9d} max={mx:10.3e}")
                else:
                    for i2, v2 in enumerate(node):
                        walk(f"{prefix}[{i2}]", v2)
            walk("", rep)
            per_plane = jax.jit(
                lambda g: (jnp.sum(~jnp.isfinite(g), axis=(0, 2, 3, 4)),
                           jnp.max(jnp.abs(jnp.nan_to_num(g)), axis=(0, 2, 3, 4)))
            )(g_space)
            bad_p, max_p = jax.device_get(per_plane)
            print(f"    g_space per-plane nonfinite: {list(map(int, bad_p))}")
            print(f"    g_space per-plane max|.|   : "
                  f"{['%.2e' % float(v) for v in max_p]}")
            sys.stdout.flush()
        print("DONE")
        return

    if args.stage == "full":
        # one jitted non-finite counter per tree structure (a fresh jit per
        # structure would recompile; cache on the treedef + leaf shapes)
        counters = {}

        def count_bad(tree):
            leaves = [
                l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            sig = tuple((l.shape, str(l.dtype)) for l in leaves)
            if sig not in counters:
                counters[sig] = jax.jit(
                    lambda ls: sum(jnp.sum(~jnp.isfinite(l)) for l in ls)
                )
            return int(counters[sig](leaves))

        orig_dispatch = trainer._dispatch
        state = {"i": 0}

        def checking_dispatch(fn, *fargs):
            out = orig_dispatch(fn, *fargs)
            label = getattr(fn, "__wrapped__", fn)
            name = getattr(label, "__name__", str(fn))[:40]
            bad_out = count_bad(out)
            if fn is trainer._stage_update_jit:
                # the update donated the params buffers; check its output
                # (the new params_train) instead of the stale trainer.params
                bad_par = count_bad(out[0])
            else:
                bad_par = count_bad(trainer.params)
            flag = "" if bad_out == 0 and bad_par == 0 else "  <-- NON-FINITE"
            print(f"    [{state['i']:02d}] {name:34s} out_bad={bad_out:8d} "
                  f"params_bad={bad_par:6d}{flag}")
            sys.stdout.flush()
            state["i"] += 1
            return out

        trainer._dispatch = checking_dispatch
        key = jax.random.PRNGKey(args.seed)
        for step in range(args.steps):
            batch_list = dm.sample_train_batch()
            prompts = batch_list[0]["prompt"]
            print(f"== step {step} (prompt: {prompts[0][:50]!r})")
            state["i"] = 0
            metrics = trainer.train_step(
                batch_list, embeds_for(prompts), jax.random.fold_in(key, step)
            )
            print(f"  step {step}: loss={float(metrics['loss']):.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.4f}")
            sys.stdout.flush()
        print("DONE")
        return

    for step in range(args.steps):
        batch_list = dm.sample_train_batch()
        prompts = batch_list[0]["prompt"]
        text_embeds = embeds_for(prompts)
        kstep = jax.random.fold_in(key, step)
        trainer.global_step = step
        ts = sample_timesteps(
            trainer.all_timesteps, trainer.cfg.num_parts_training, trainer.rng
        )
        scalars = trainer.host_scalars()
        batch_list = [
            {k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, (list, str))}
            for b in batch_list
        ]
        keys = jax.random.split(kstep, trainer.cfg.num_parts_training)
        latent = batch_list[0]["noise"]
        print(f"== step {step} (prompt: {prompts[0][:50]!r}, t={list(ts)})")
        for part in range(trainer.cfg.num_parts_training):
            batch = {k: v for k, v in batch_list[part].items() if k != "noise"}
            latent, space_cache, images = trainer._stage_render_jit(
                trainer.params, batch, latent,
                jnp.asarray(ts, jnp.int32)[part], text_embeds, scalars, keys[part],
            )
            print(f"  part {part}:")
            if args.stage == "teacher":
                outs = teacher_branches_jit(
                    teacher_params, images, batch, text_embeds, scalars,
                    keys[part],
                )
                bad = 0
                for k_, v in sorted(outs.items()):
                    bad += finite_report(k_, v)
            else:
                bad = finite_report("denoised latent", latent)
                bad += finite_report("space_cache", space_cache)
                for k_, v in images.items():
                    bad += finite_report(f"images[{k_}]", v)
            if bad:
                print("  FIRST NON-FINITE at this part; stopping this step")
                break
    print("DONE")


if __name__ == "__main__":
    main()
