#!/usr/bin/env python
"""Runtime bisect of the staged step's render programs on the real chip.

profile_train_dispatch.py showed the three RENDER programs own ~57 s of the
62 s full-size step (teacher ensemble: 0.6 s). This tool times forward and
backward of successive sub-pipelines of both render branches — fused
field-grid eval, marching cubes, mask-only rasterize, full rasterize,
pointwise field eval at volume-sample counts, full volume branch — to find
which op owns the time. Mirrors tools/probe_render_mem.py (the AOT memory
bisect) but RUNS each program (min of 3, forced scalar host read).

Usage: python tools/profile_render_bisect.py [--config ...] [--stages ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, n=3):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts) * 1e3:8.1f} ms   (compile+first {compile_s:.1f}s)")
    sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument(
        "--stages",
        default="iso,mc,mask,full1,pts,ptsn,vol",
        help="subset of iso,mc,mask,full1,pts,ptsn,vol",
    )
    ap.add_argument("extras", nargs="*")
    args = ap.parse_args()
    stages = args.stages.split(",")

    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup
    from triplaneturbo_tpu.systems.trainer import combine_params, split_params
    from triplaneturbo_tpu.utils import load_config, parse_structured

    cfg = load_config(args.config, cli_args=args.extras, n_devices=jax.device_count())
    dm = MultiviewMultipromptDataModule(
        parse_structured(DataModuleConfig, cfg.get("data", {})), seed=0
    )
    t0 = time.time()
    trainer = build_system(cfg, seed=0)
    print(f"# build {time.time() - t0:.1f}s", file=sys.stderr)

    _, embeds_for = build_prompt_setup(
        trainer.geometry.cfg.space_generator.cross_attention_dim,
        seed=0,
        negative_prompt=cfg.get("data", {}).get("negative_prompt", ""),
    )
    batch_list = dm.sample_train_batch()
    embeds = embeds_for(batch_list[0]["prompt"])
    key = jax.random.PRNGKey(0)
    scalars = trainer.host_scalars()
    bl = [
        {k: jnp.asarray(v) for k, v in b.items() if not isinstance(v, (list, str))}
        for b in batch_list
    ]
    latent = bl[0]["noise"]
    batch = {k_: v for k_, v in bl[0].items() if k_ != "noise"}
    t = jnp.asarray(trainer.all_timesteps[0], jnp.int32)
    params_train, params_frozen = split_params(trainer.params, trainer.train_mask)

    # real space cache from one on-chip render; random image-grad cotangents
    _, space_cache, img = trainer._stage_render_jit(
        trainer.params, batch, latent, t, embeds, scalars, key
    )
    gimg_s = jax.eval_shape(
        trainer._stage_teacher,
        trainer.guidance.teacher_params(), img, batch, embeds, scalars, key,
    )[1]
    gimg = {
        k: 1e-3 * jax.random.normal(jax.random.fold_in(key, i), v.shape, v.dtype)
        for i, (k, v) in enumerate(sorted(gimg_s.items()))
    }
    del img

    geometry, renderer = trainer.geometry, trainer.rasterize_renderer

    def grid_sdf_loss(pt, pf, sc):
        p = combine_params(pt, pf)
        sdf, deform = geometry.apply(
            p["geometry"], sc[0:1], renderer.cfg.isosurface_resolution,
            method=geometry.forward_field_grid,
        )
        return sdf.sum() + deform.sum()

    def mesh_loss(pt, pf, sc, scalars_):
        p = combine_params(pt, pf)

        def forward_field(pts, sc_):
            return geometry.apply(p["geometry"], pts, sc_, method=geometry.forward_field)

        def forward_field_grid(sc_, R):
            return geometry.apply(p["geometry"], sc_, R, method=geometry.forward_field_grid)

        meshes = renderer.isosurface(
            sc, forward_field,
            scalars_["sdf_grad_shrink"], scalars_["def_grad_shrink"],
            forward_field_grid=forward_field_grid,
        )
        return sum((m.v_pos * m.v_mask[:, None]).sum() for m in meshes)

    def branch1_loss(pt, pf, batch_, sc, embeds_, scalars_, gimg_, k, render_rgb):
        p = combine_params(pt, pf)

        def forward_field(pts, sc_):
            return geometry.apply(p["geometry"], pts, sc_, method=geometry.forward_field)

        def forward_field_grid(sc_, R):
            return geometry.apply(p["geometry"], sc_, R, method=geometry.forward_field_grid)

        def export_fn(pts, sc_):
            return geometry.apply(p["geometry"], pts, sc_, method=geometry.export)["features"]

        def background_fn(dirs, te):
            return trainer.background.apply(p["background"], dirs, te, train=True)

        H = batch_["rays_d_rasterize"].shape[1]
        out = renderer(
            batch_["mvp_mtx"], batch_["camera_positions"], sc,
            forward_field, export_fn, trainer.material_fn, background_fn,
            H, H,
            text_embed=embeds_["global_21"],
            rays_d_rasterize=batch_["rays_d_rasterize"],
            camera_distances=batch_["camera_distances"],
            c2w=batch_["c2w"],
            render_rgb=render_rgb,
            sdf_grad_shrink=scalars_["sdf_grad_shrink"],
            def_grad_shrink=scalars_["def_grad_shrink"],
            forward_field_grid=forward_field_grid,
        )
        loss = 0.0
        for name in trainer._GUIDANCE_IMAGE_KEYS:
            if name in out:
                g = jax.lax.stop_gradient(gimg_[f"{name}_1st"])
                loss = loss + (g * out[name]).sum()
        if render_rgb:
            loss = loss + trainer._regularizers_1st(out, scalars_)
        return loss

    if "iso" in stages:
        timeit("iso-grid fwd", grid_sdf_loss, params_train, params_frozen, space_cache)
        timeit("iso-grid fwd+bwd", jax.grad(grid_sdf_loss, argnums=(0, 2)),
               params_train, params_frozen, space_cache)
    if "mc" in stages:
        timeit("+marching-cubes fwd", mesh_loss,
               params_train, params_frozen, space_cache, scalars)
        timeit("+marching-cubes fwd+bwd", jax.grad(mesh_loss, argnums=(0, 2)),
               params_train, params_frozen, space_cache, scalars)
    if "mask" in stages:
        timeit("mask-only raster fwd+bwd",
               jax.grad(lambda *a: branch1_loss(*a, render_rgb=False), argnums=(0, 3)),
               params_train, params_frozen, batch, space_cache, embeds, scalars, gimg, key)
    if "full1" in stages:
        timeit("full 1st branch fwd",
               lambda *a: branch1_loss(*a, render_rgb=True),
               params_train, params_frozen, batch, space_cache, embeds, scalars, gimg, key)
        timeit("full 1st branch fwd+bwd",
               jax.grad(lambda *a: branch1_loss(*a, render_rgb=True), argnums=(0, 3)),
               params_train, params_frozen, batch, space_cache, embeds, scalars, gimg, key)

    # ---- 2nd (volume) branch ----
    # global 32^2 + patch 40^2 per view, 128 proposal + 64 final samples/ray
    nv = batch["rays_o"].shape[0] // space_cache.shape[0]
    n_prop = batch["rays_o"].shape[0] * 32 * 32 * 128

    def pts_eval(pt, pf, sc, pts):
        p = combine_params(pt, pf)
        return geometry.apply(p["geometry"], pts, sc)["sdf"].sum()

    def pts_eval_normal(pt, pf, sc, pts):
        p = combine_params(pt, pf)

        def sdf_fn(q):
            return geometry.apply(p["geometry"], q, sc, method=geometry.forward_sdf).sum()

        return jax.grad(sdf_fn)(pts).sum()

    pts_prop = jax.random.uniform(
        key, (space_cache.shape[0], n_prop // space_cache.shape[0], 3),
        minval=-0.8, maxval=0.8,
    )
    if "pts" in stages:
        timeit(f"pointwise field eval fwd ({n_prop / 1e6:.2f}M pts)",
               pts_eval, params_train, params_frozen, space_cache, pts_prop)
    if "ptsb" in stages:
        # backward w.r.t. trainables + space cache: the grid_sample VJP is a
        # scatter-add into the planes — the suspected volume-branch bwd cost
        timeit(f"pointwise field eval fwd+bwd ({n_prop / 1e6:.2f}M pts)",
               jax.grad(pts_eval, argnums=(0, 2)),
               params_train, params_frozen, space_cache, pts_prop)
    if "ptsn" in stages:
        pts_fin = pts_prop[:, : n_prop // 2 // space_cache.shape[0]]
        timeit(f"pointwise SDF-normal grad ({pts_fin.shape[1] / 1e6:.2f}M pts)",
               pts_eval_normal, params_train, params_frozen, space_cache, pts_fin)
    if "ptsnb" in stages:
        pts_fin = pts_prop[:, : n_prop // 2 // space_cache.shape[0]]
        timeit(f"pointwise SDF-normal grad fwd+bwd ({pts_fin.shape[1] / 1e6:.2f}M pts)",
               jax.grad(
                   lambda *a: pts_eval_normal(*a), argnums=(0, 2)
               ),
               params_train, params_frozen, space_cache, pts_fin)
    if "bg" in stages:
        # hashgrid background at mesh-branch pixel count (4 views x 256²):
        # 8 levels x 8 trilinear corners = 64 row-gathers/dir fwd, scatter-adds
        # into the 2^19 table bwd
        nv_ = batch["rays_d_rasterize"].shape[0]
        Hh = batch["rays_d_rasterize"].shape[1]
        dirs = jax.random.normal(key, (nv_, 256, 256, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def bg_loss(pt, pf, dirs_):
            p = combine_params(pt, pf)
            rgb = trainer.background.apply(
                p["background"], dirs_, embeds["global_21"], train=True
            )
            return rgb.sum()

        timeit(f"background hashgrid fwd ({nv_}x256²)",
               bg_loss, params_train, params_frozen, dirs)
        timeit(f"background hashgrid fwd+bwd ({nv_}x256²)",
               jax.grad(bg_loss, argnums=(0,)), params_train, params_frozen, dirs)
    if "exp" in stages:
        # texture export at mesh-branch pixel count
        n_exp = batch["rays_d_rasterize"].shape[0] * 256 * 256
        pts_exp = jax.random.uniform(
            key, (space_cache.shape[0], n_exp // space_cache.shape[0], 3),
            minval=-0.8, maxval=0.8,
        )

        def exp_loss(pt, pf, sc, pts):
            p = combine_params(pt, pf)
            return geometry.apply(
                p["geometry"], pts, sc, method=geometry.export
            )["features"].sum()

        timeit(f"export field fwd ({n_exp / 1e6:.2f}M pts)",
               exp_loss, params_train, params_frozen, space_cache, pts_exp)
        timeit(f"export field fwd+bwd ({n_exp / 1e6:.2f}M pts)",
               jax.grad(exp_loss, argnums=(0, 2)),
               params_train, params_frozen, space_cache, pts_exp)
    if "sampling" in stages:
        # importance-sampling machinery alone (searchsorted + per-ray sort)
        # with a trivial analytic density — no field eval
        from triplaneturbo_tpu.ops.ray import importance_sampling as _imps

        n_rays = batch["rays_o"].shape[0] * 32 * 32

        def sampling_only(k):
            def sigma_fn(ts, te):
                return jnp.exp(-((ts + te) * 0.5 - 2.0) ** 2)

            ts_, te_ = _imps(sigma_fn, n_rays, 128, 64, 0.1, 4.0, key=k)
            return ts_.sum() + te_.sum()

        timeit(f"importance-sampling machinery ({n_rays} rays)", sampling_only, key)

    def branch2_loss(pt, pf, batch_, sc, embeds_, scalars_, gimg_, k):
        p = combine_params(pt, pf)
        _, out2 = trainer._render_branch(
            p, batch_, sc, scalars_, k, embeds_["global_21"], "2nd"
        )
        loss = 0.0
        for name in trainer._GUIDANCE_IMAGE_KEYS:
            if name in out2:
                g = jax.lax.stop_gradient(gimg_[f"{name}_2nd"])
                loss = loss + (g * out2[name]).sum()
        return loss + trainer._regularizers_2nd(out2, scalars_)

    if "vol" in stages:
        timeit("full 2nd branch fwd",
               branch2_loss,
               params_train, params_frozen, batch, space_cache, embeds, scalars, gimg, key)
        timeit("full 2nd branch fwd+bwd",
               jax.grad(branch2_loss, argnums=(0, 3)),
               params_train, params_frozen, batch, space_cache, embeds, scalars, gimg, key)
    print("DONE")


if __name__ == "__main__":
    main()
