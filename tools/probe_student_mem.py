#!/usr/bin/env python
"""AOT memory-analysis probe for the staged student-backward variants.

Compiles (never runs) the candidate student-backward decompositions at the
full 1-chip config and prints each program's temp/arg/output HBM sizes —
the tool used to pick the decomposition that fits a 16 GB v5e (see
configs/triplaneturbo_v1_1chip.yaml NOTE and trainer._stage_student_render).

Usage: python tools/probe_student_mem.py [--config configs/triplaneturbo_v1_1chip.yaml]
        [--variants new_off,old,space,new_on]
"""

import argparse
import functools as ft
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

SCHED_OFF = {"xla_tpu_enable_latency_hiding_scheduler": "false"}


def report(name, jitfn, *args) -> None:
    t0 = time.time()
    try:
        mem = jitfn.lower(*args).compile().memory_analysis()
        print(
            f"{name}: args {mem.argument_size_in_bytes / 1e9:.2f}GB "
            f"out {mem.output_size_in_bytes / 1e9:.2f}GB "
            f"temp {mem.temp_size_in_bytes / 1e9:.2f}GB "
            f"(compile {time.time() - t0:.1f}s)"
        )
    except Exception as e:
        print(f"{name}: FAILED after {time.time() - t0:.1f}s: {type(e).__name__} {str(e)[:300]}")
    sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument("--variants", default="new_off,space,old")
    ap.add_argument("extras", nargs="*")
    args = ap.parse_args()
    variants = args.variants.split(",")

    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup
    from triplaneturbo_tpu.systems.trainer import split_params
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

    # shapes of the render stage outputs without running it
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
    print(f"space_cache {sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(sc_s)) / 1e6:.1f}MB")
    sys.stdout.flush()
    pt_s, pf_s = sds(params_train), sds(params_frozen)
    batch_s, embeds_s, scalars_s = sds(batch), sds(embeds), sds(scalars)
    key_s = jax.ShapeDtypeStruct(key.shape, key.dtype)
    lat_s, t_s = sds(latent), jax.ShapeDtypeStruct(t.shape, t.dtype)

    if "new_on" in variants:
        report(
            "render_1st sched ON",
            jax.jit(ft.partial(trainer._stage_student_render, branch="1st")),
            pt_s, pf_s, batch_s, sc_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    if "new_off" in variants:
        report(
            "render_1st sched OFF",
            jax.jit(
                ft.partial(trainer._stage_student_render, branch="1st"),
                compiler_options=SCHED_OFF,
            ),
            pt_s, pf_s, batch_s, sc_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    if "space" in variants:
        report(
            "space (unet+vae bwd)",
            trainer._stage_student_space_jit,
            pt_s, pf_s, lat_s, t_s, embeds_s, sds(sc_s), sds(sc_s), key_s,
        )
    if "old" in variants:
        # the replaced combined decomposition (student fwd+bwd through the
        # UNet+VAE inside each branch program) — kept here, not in the
        # trainer, as the historical comparison point. The latency-hiding
        # scheduler is disabled exactly as it was when this variant was
        # measured ~23 MB over a 16 GB v5e at full size.
        from triplaneturbo_tpu.systems.trainer import combine_params

        def old_combined_1st(params_train, params_frozen, batch, latent, t,
                             text_embeds, scalars, grad_images, k):
            def loss_fn(pt):
                p = combine_params(pt, params_frozen)
                _, _, out_1st, _ = trainer._student_forward(
                    p, batch, latent, t, text_embeds, scalars, k, "1st"
                )
                fid_proxy = 0.0
                for name in trainer._GUIDANCE_IMAGE_KEYS:
                    g = jax.lax.stop_gradient(grad_images[f"{name}_1st"])
                    fid_proxy = fid_proxy + (g * out_1st[name]).sum()
                regu = trainer._regularizers_1st(out_1st, scalars)
                return fid_proxy + regu, regu

            (_, regu), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_train)
            return grads, regu

        report(
            "old combined 1st (sched OFF)",
            jax.jit(old_combined_1st, compiler_options=SCHED_OFF),
            pt_s, pf_s, batch_s, lat_s, t_s, embeds_s, scalars_s, gimg_s, key_s,
        )
    print("DONE")


if __name__ == "__main__":
    main()
