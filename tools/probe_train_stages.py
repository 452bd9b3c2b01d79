#!/usr/bin/env python
"""Stage-by-stage probe of the staged (auto_grad) training step.

Runs each jit program of the staged step (render R, teacher G, per-branch
student backwards B1/B2, optimizer update) one at a time on the current
backend, timing compile+run and reporting param-tree sizes — the tool used
to fit the full-size v1 step into a 16 GB v5e chip (see
configs/triplaneturbo_v1_1chip.yaml and PARITY.md "Full-size single-chip
training"). On an OOM the XLA error names the largest HBM allocations;
attack those (field_chunk, branch split, bf16 storage) and re-run.

Usage: python tools/probe_train_stages.py [--config configs/triplaneturbo_v1_1chip.yaml]
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


def nbytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "nbytes"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument("extras", nargs="*")
    args = ap.parse_args()

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
    geo = nbytes(trainer.params["geometry"])
    print(f"params: geometry {geo / 1e9:.2f}GB, other {(nbytes(trainer.params) - geo) / 1e9:.3f}GB")
    tp = trainer.guidance.teacher_params()
    for k in tp:
        print(f"  teacher {k}: {nbytes(tp[k]) / 1e9:.2f}GB")
    print(f"  opt_state {nbytes(trainer.opt_state) / 1e9:.3f}GB")

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
    keys = jax.random.split(key, trainer.cfg.num_parts_training)
    latent = bl[0]["noise"]
    batch = {k_: v for k_, v in bl[0].items() if k_ != "noise"}
    t = jnp.asarray(trainer.all_timesteps[0], jnp.int32)
    params_train, params_frozen = split_params(trainer.params, trainer.train_mask)

    def stage(name, fn, lowered=None):
        t0 = time.time()
        if lowered is not None:
            # compile first (cached) and report the program's HBM picture
            # before attempting to run it — on OOM this is the diagnosis.
            try:
                mem = lowered().compile().memory_analysis()
                print(
                    f"{name}: args {mem.argument_size_in_bytes / 1e9:.2f}GB "
                    f"out {mem.output_size_in_bytes / 1e9:.2f}GB "
                    f"temp {mem.temp_size_in_bytes / 1e9:.2f}GB "
                    f"(compile {time.time() - t0:.1f}s)"
                )
            except Exception as e:  # memory_analysis availability varies
                print(f"{name}: memory_analysis unavailable ({e})")
            sys.stdout.flush()
            t0 = time.time()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        print(f"{name}: compile+run {time.time() - t0:.1f}s")
        sys.stdout.flush()
        return out

    def stage_jit(name, jitfn, *sargs):
        return stage(name, lambda: jitfn(*sargs), lowered=lambda: jitfn.lower(*sargs))

    latent1, space_cache, images = stage_jit(
        "stage_render",
        trainer._stage_render_jit, trainer.params, batch, latent, t, embeds, scalars, keys[0],
    )
    (fid, gn), grad_images = stage_jit(
        "stage_teacher",
        trainer._stage_teacher_jit, tp, images, batch, embeds, scalars, keys[0],
    )
    print(f"  fid {float(fid):.3f} grad_norm {float(gn):.4f}")
    g1, gs1, regu1 = stage_jit(
        "stage_student_render_1st",
        trainer._stage_student_render_jit["1st"],
        params_train, params_frozen, batch, space_cache, embeds, scalars, grad_images, keys[0],
    )
    g2, gs2, regu2 = stage_jit(
        "stage_student_render_2nd",
        trainer._stage_student_render_jit["2nd"],
        params_train, params_frozen, batch, space_cache, embeds, scalars, grad_images, keys[0],
    )
    gg = stage_jit(
        "stage_student_space",
        trainer._stage_student_space_jit,
        params_train, params_frozen, latent, t, embeds, gs1, gs2, keys[0],
    )
    print(f"  regu {float(regu1) + float(regu2):.3f}")
    gsum = trainer._acc_jit(trainer._acc_jit(g1, g2), gg)
    stage_jit(
        "stage_update",
        trainer._stage_update_jit, params_train, trainer.opt_state, gsum,
    )
    print("ALL STAGES OK")


if __name__ == "__main__":
    main()
