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
        choices=["render", "teacher", "full", "grads", "drill1", "drill2", "probe1n"],
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

    if args.stage == "probe1n":
        # zero-injection probe INSIDE the comp_normal_cam_vis path (the term
        # the drill flagged): replicate the 1st renderer's normal pipeline
        # with additive zero injections at every intermediate, take grads
        # w.r.t. all injections in ONE program, and report which cotangents
        # are non-finite. Walking from the loss upstream, the first injection
        # whose cotangent goes NaN brackets the backward segment that
        # CREATES the NaN.
        import jax.numpy as jnp2
        from triplaneturbo_tpu.ops.isosurface import (
            extract_isosurface, force_field_crossing,
        )
        from triplaneturbo_tpu.ops.rasterize import interpolate, rasterize
        from triplaneturbo_tpu.utils.mesh import Mesh
        from triplaneturbo_tpu.utils.ops import safe_normalize

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
        g_img = jax.lax.stop_gradient(grad_images["comp_normal_cam_vis_1st"])

        rr = trainer.rasterize_renderer
        cfg_r = rr.cfg
        R = cfg_r.isosurface_resolution
        H = batch["rays_d_rasterize"].shape[1]
        geom = trainer.geometry
        gparams = trainer.params["geometry"]
        sgs = scalars["sdf_grad_shrink"]
        dgs = scalars["def_grad_shrink"]
        assert space_cache.shape[0] == 1, "probe assumes Bsc=1"
        V = cfg_r.max_verts
        F = cfg_r.max_faces
        nv = batch["mvp_mtx"].shape[0]

        inj0 = {
            "sdf": jnp2.zeros((R * R * R,)),
            "deform": jnp2.zeros((R * R * R, 3)),
            "vpos": jnp2.zeros((V, 3)),
            "fn": jnp2.zeros((F, 3)),
            "vn_raw": jnp2.zeros((V, 3)),
            "vn": jnp2.zeros((V, 3)),
            "gbn_raw": jnp2.zeros((nv, H, H, 3)),
            "gbn": jnp2.zeros((nv, H, H, 3)),
            "n_cam_in": jnp2.zeros((nv, H, H, 3)),
            "img": jnp2.zeros((nv, H, H, 3)),
        }

        def loss_fn(inj, sc_cache):
            sdf, deform = geom.apply(
                gparams, sc_cache, R, method=geom.forward_field_grid
            )
            sdf = sdf.reshape(-1) + inj["sdf"]
            deform = deform.reshape(-1, 3) + inj["deform"]
            sdf = sgs * sdf + (1.0 - sgs) * jax.lax.stop_gradient(sdf)
            deform = dgs * deform + (1.0 - dgs) * jax.lax.stop_gradient(deform)
            sdf = force_field_crossing(sdf, R)
            m = extract_isosurface(
                sdf.reshape(R, R, R), deform.reshape(R, R, R, 3),
                method=cfg_r.isosurface_method,
                max_verts=V, max_faces=F,
            )
            mesh = Mesh(
                v_pos=m.verts * 2.0 - 1.0 + inj["vpos"],
                t_pos_idx=m.faces, v_mask=m.vert_mask, t_mask=m.face_mask,
            )
            # vertex_normals, unrolled for injection (utils/mesh.py:65-84)
            i0, i1, i2 = mesh.t_pos_idx[:, 0], mesh.t_pos_idx[:, 1], mesh.t_pos_idx[:, 2]
            p0, p1, p2 = mesh.v_pos[i0], mesh.v_pos[i1], mesh.v_pos[i2]
            fn = jnp2.cross(p1 - p0, p2 - p0)
            fn = fn * mesh.valid_face_mask()[:, None] + inj["fn"]
            vn_raw = jnp2.zeros((V, 3))
            for kk in range(3):
                vn_raw = vn_raw.at[mesh.t_pos_idx[:, kk]].add(fn)
            vn_raw = vn_raw + inj["vn_raw"]
            vn = vn_raw / jnp2.sqrt(
                jnp2.maximum((vn_raw * vn_raw).sum(-1, keepdims=True), 1e-20)
            )
            vn = vn * mesh.valid_vert_mask()[:, None] + inj["vn"]

            gbn_list, mask_list = [], []
            for v in range(nv):
                vh = jnp2.concatenate(
                    [mesh.v_pos, jnp2.ones_like(mesh.v_pos[:, :1])], axis=-1
                )
                v_clip = vh @ batch["mvp_mtx"][v].T
                rast = rasterize(
                    v_clip, mesh.t_pos_idx, mesh.t_mask, H, H,
                    tile=cfg_r.tile, faces_per_tile=cfg_r.faces_per_tile,
                    max_span=cfg_r.max_span,
                )
                gbn_list.append(interpolate(vn, rast, mesh.t_pos_idx))
                mask_list.append(rast.mask)
            gbn_raw = jnp2.stack(gbn_list) + inj["gbn_raw"]
            mask = jnp2.stack(mask_list).astype(jnp2.float32)[..., None]
            gbn = safe_normalize(gbn_raw) + inj["gbn"]
            w2c_rot = jnp2.swapaxes(batch["c2w"][:, :3, :3], -1, -2)
            n_cam = jnp2.einsum("vhwc,vkc->vhwk", gbn, w2c_rot)
            n_cam = n_cam * jnp2.asarray([-1.0, 1.0, 1.0]) + inj["n_cam_in"]
            n_cam = safe_normalize(n_cam)
            n_cam01 = (n_cam + 1.0) / 2.0
            bg_n = jnp2.ones_like(n_cam01) * jnp2.asarray([0.5, 0.5, 1.0])
            img = n_cam01 * mask + bg_n * (1 - mask) + inj["img"]
            return (g_img * img).sum()

        grads = jax.jit(jax.grad(loss_fn))(inj0, space_cache)
        for name in ("img", "n_cam_in", "gbn", "gbn_raw", "vn", "vn_raw",
                     "fn", "vpos", "deform", "sdf"):
            g = grads[name]
            n_bad = int(jnp.sum(~jnp.isfinite(g)))
            mx = float(jnp.max(jnp.abs(jnp.nan_to_num(g))))
            flag = "" if n_bad == 0 else "  <-- NON-FINITE"
            print(f"  cotangent@{name:10s} bad={n_bad:9d} max|.|={mx:12.4e}{flag}")
            sys.stdout.flush()
        print("DONE")
        return

    if args.stage in ("drill1", "drill2"):
        # per-loss-term bisect of ONE branch's backward: each term of the
        # _stage_student_render loss is differentiated alone, so the term
        # whose backward emits the NaN (a 0-cotangent x NaN-partial leak
        # survives even when the term's lambda is 0) is named exactly.
        import jax.numpy as jnp2
        from triplaneturbo_tpu.systems.trainer import combine_params, split_params

        branch = "1st" if args.stage == "drill1" else "2nd"
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
        k0 = keys[0]

        def term_loss(out_1st, out_2nd, sc, which):
            out = out_1st if branch == "1st" else out_2nd
            if which.startswith("fid_"):
                name = {"fid_rgb": "comp_rgb",
                        "fid_normal": "comp_normal_cam_vis",
                        "fid_disp": "disparity"}[which]
                g = jax.lax.stop_gradient(grad_images[f"{name}_{branch}"])
                return (g * out[name]).sum()
            op = out["opacity"]
            if which == "sparsity":
                return sc["lambda_sparsity" + ("" if branch == "1st" else "_2nd")] * jnp2.sqrt(op**2 + 0.01).mean()
            if which == "opaque":
                opc = jnp2.clip(op, 1e-3, 1 - 1e-3)
                return sc["lambda_opaque" + ("" if branch == "1st" else "_2nd")] * (
                    -(opc * jnp2.log(opc) + (1 - opc) * jnp2.log(1 - opc))
                ).mean()
            if which == "nc":
                return sc["lambda_normal_consistency"] * jnp2.stack(
                    [m.normal_consistency() for m in out_1st["mesh"]]
                ).mean()
            if which == "lap":
                return sc["lambda_laplacian_smoothness"] * jnp2.stack(
                    [m.laplacian() for m in out_1st["mesh"]]
                ).mean()
            if which == "zvar":
                zv = out["z_variance"]
                sel = (op > 0.5).astype(zv.dtype)
                return sc["lambda_z_variance_2nd"] * (zv * sel).sum() / jnp2.maximum(sel.sum(), 1)
            if which == "eikonal":
                return sc["lambda_eikonal_2nd"] * out["eikonal"]
            if which == "orient":
                return sc["lambda_orient_2nd"] * out.get("orient", jnp2.zeros(()))
            if which == "sdf_abs":
                return sc["lambda_sdf_abs"] * out.get("sdf_abs", jnp2.zeros(()))
            raise ValueError(which)

        def make_grads_fn(which):
            def loss_fn(pt, sc_cache):
                p = combine_params(pt, params_frozen)
                _, k_render, _ = jax.random.split(k0, 3)
                out_1st, out_2nd = trainer._render_branch(
                    p, batch, sc_cache, scalars, k_render,
                    text_embeds["global_21"], branch,
                )
                return term_loss(out_1st, out_2nd, scalars, which)
            return jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

        terms_1st = ["fid_rgb", "fid_normal", "fid_disp", "sparsity", "opaque", "nc", "lap"]
        terms_2nd = ["fid_rgb", "fid_normal", "fid_disp", "sparsity", "opaque", "zvar", "eikonal", "orient", "sdf_abs"]
        terms = terms_1st if branch == "1st" else terms_2nd

        count_bad = jax.jit(
            lambda ls: sum(
                jnp2.sum(~jnp2.isfinite(l))
                for l in ls
                if jnp2.issubdtype(l.dtype, jnp2.floating)
            )
        )
        for which in terms:
            import time as _time

            t_start = _time.time()
            grads, g_space = make_grads_fn(which)(params_train, space_cache)
            bad_g = int(count_bad(
                [l for l in jax.tree_util.tree_leaves(grads) if hasattr(l, "dtype")]
            ))
            bad_s = int(count_bad([g_space]))
            flag = "" if bad_g == 0 and bad_s == 0 else "  <-- NON-FINITE"
            print(f"  term {which:12s} grads_bad={bad_g:9d} g_space_bad={bad_s:9d} "
                  f"({_time.time()-t_start:.0f}s){flag}")
            sys.stdout.flush()
            del grads, g_space
        print("DONE")
        return

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
                if node is None:
                    return
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
