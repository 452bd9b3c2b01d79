#!/usr/bin/env python
"""AOT bisect of the rasterize-branch backward's HBM temp footprint.

The render/space-split student backward (trainer._stage_student_render,
branch "1st") reported ~26 GB of XLA temps at the 1-chip full config —
far beyond a 16 GB v5e. This tool compiles (never runs) gradients of
successive sub-pipelines of that program w.r.t. (trainables, space_cache)
and prints each one's memory_analysis, isolating which stage owns the
temps (fused field-grid backward slabs, marching cubes, rasterize +
interpolate, chunked export, antialias).

Usage: python tools/probe_render_mem.py [--config ...] [--stages iso,mc,mask,rgb,full]
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


def report(name, fn, *args) -> None:
    t0 = time.time()
    try:
        mem = jax.jit(fn).lower(*args).compile().memory_analysis()
        print(
            f"{name}: args {mem.argument_size_in_bytes / 1e9:.2f}GB "
            f"out {mem.output_size_in_bytes / 1e9:.2f}GB "
            f"temp {mem.temp_size_in_bytes / 1e9:.2f}GB "
            f"(compile {time.time() - t0:.1f}s)"
        )
    except Exception as e:
        print(f"{name}: FAILED after {time.time() - t0:.1f}s: {type(e).__name__} {str(e)[:200]}")
    sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument("--stages", default="iso,mc,mask,rgb,full,full_noslab")
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
    print(f"build {time.time() - t0:.1f}s")
    sys.stdout.flush()

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

    sds = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )
    _, sc_s, img_s = jax.eval_shape(
        trainer._stage_render, trainer.params, batch, latent, t, embeds, scalars, key
    )
    _, gimg_s = jax.eval_shape(
        trainer._stage_teacher,
        trainer.guidance.teacher_params(), img_s, batch, embeds, scalars, key,
    )
    pt_s, pf_s = sds(params_train), sds(params_frozen)
    batch_s, embeds_s, scalars_s = sds(batch), sds(embeds), sds(scalars)
    key_s = jax.ShapeDtypeStruct(key.shape, key.dtype)

    geometry, renderer = trainer.geometry, trainer.rasterize_renderer

    def grid_sdf_loss(pt, pf, sc):
        """Isosurface grid eval only (fused field-grid kernel fwd+bwd)."""
        p = combine_params(pt, pf)
        sdf, deform = geometry.apply(
            p["geometry"], sc[0:1], renderer.cfg.isosurface_resolution,
            method=geometry.forward_field_grid,
        )
        return (sdf.sum() + deform.sum())

    def mesh_loss(pt, pf, sc, scalars_):
        """+ marching cubes (mesh vertex positions)."""
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

    def branch_loss(pt, pf, batch_, sc, embeds_, scalars_, gimg, k, render_rgb):
        """Full 1st-branch loss (= _stage_student_render) or mask-only."""
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
                g = jax.lax.stop_gradient(gimg[f"{name}_1st"])
                loss = loss + (g * out[name]).sum()
        loss = loss + trainer._regularizers_1st(out, scalars_) if render_rgb else loss
        return loss

    if "iso" in stages:
        report("grad iso-grid", jax.grad(grid_sdf_loss, argnums=(0, 2)), pt_s, pf_s, sc_s)
    if "mc" in stages:
        report(
            "grad +marching-cubes",
            jax.grad(mesh_loss, argnums=(0, 2)), pt_s, pf_s, sc_s, scalars_s,
        )
    if "mask" in stages:
        report(
            "grad mask-only raster (no rgb)",
            jax.grad(lambda *a: branch_loss(*a, render_rgb=False), argnums=(0, 3)),
            pt_s, pf_s, batch_s, sc_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    if "rgb" in stages or "full" in stages:
        report(
            "grad full 1st branch",
            jax.grad(lambda *a: branch_loss(*a, render_rgb=True), argnums=(0, 3)),
            pt_s, pf_s, batch_s, sc_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    if "full_noslab" in stages:
        from triplaneturbo_tpu.ops import field_grid_pallas

        field_grid_pallas.BWD_SLABS = 1
        report(
            "grad full 1st branch (1 slab)",
            jax.grad(lambda *a: branch_loss(*a, render_rgb=True), argnums=(0, 3)),
            pt_s, pf_s, batch_s, sc_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    print("DONE")


if __name__ == "__main__":
    main()
