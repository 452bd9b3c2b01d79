#!/usr/bin/env python
"""Training / evaluation / export CLI.

Rebuild of the reference launcher (/root/reference/launch.py:109-296):
``python launch.py --config configs/foo.yaml --train [key.path=value ...]``
with --validate / --test / --export modes. TPU-native: no DDP forking — data
parallelism is a jax.sharding Mesh inside the jitted train step; multi-host
runs call jax.distributed.initialize per process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--export", action="store_true")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--resume", default=None, help="train-state checkpoint dir")
    parser.add_argument(
        "--typecheck",
        action="store_true",
        help="install the jaxtyping/typeguard import hook over the package "
        "(reference launch.py:132-135)",
    )
    parser.add_argument("extras", nargs="*", help="dotlist config overrides")
    args = parser.parse_args()

    if args.typecheck:
        # must run before the first `import triplaneturbo_tpu`; the checker
        # lives in typecheck_hook.py (typeguard 2.x + py3.12 workaround)
        from jaxtyping import install_import_hook

        install_import_hook("triplaneturbo_tpu", "typecheck_hook.typechecked")

    import jax

    # multi-host: one jax process per host (reference: DDP over ranks,
    # launch.py:111-123 / SURVEY §5.8). Env-triggered so single-host runs are
    # untouched; jax auto-detects SLURM/OpenMPI/Cloud-TPU topologies.
    if (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
        or int(os.environ.get("SLURM_NTASKS", "1")) > 1
    ):
        jax.distributed.initialize()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import triplaneturbo_tpu as ttt
    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.utils import load_config, parse_structured
    from triplaneturbo_tpu.utils.checkpoint import save_params

    cfg = load_config(args.config, cli_args=args.extras, n_devices=jax.device_count())
    # per-process seed offset (reference seed_everything(seed + rank),
    # launch.py:168)
    seed = args.seed if args.seed is not None else cfg.get("seed", 0)
    seed = seed + jax.process_index()

    dm = MultiviewMultipromptDataModule(
        parse_structured(DataModuleConfig, cfg.get("data", {})), seed=seed
    )
    trainer = build_system(cfg, seed=seed)
    os.makedirs(cfg.trial_dir, exist_ok=True)

    def rank() -> int:
        return jax.process_index()

    def world() -> int:
        return jax.process_count()

    from triplaneturbo_tpu.utils.callbacks import MetricsLogger, snapshot_code, snapshot_config

    snapshot_config(cfg.trial_dir, dict(cfg), raw_path=args.config)
    snapshot_code(cfg.trial_dir)
    mlog = MetricsLogger(cfg.trial_dir)

    # text embeddings: encode the prompt library once with the (random-init or
    # converted) text towers — reference shards this across ranks and caches
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup

    processor, embeds_for = build_prompt_setup(
        trainer.geometry.cfg.space_generator.cross_attention_dim,
        seed=seed,
        negative_prompt=cfg.get("data", {}).get("negative_prompt", ""),
    )

    if args.train:
        from triplaneturbo_tpu.utils.checkpoint import load_train_state, save_train_state
        from triplaneturbo_tpu.utils.misc import find_last_path
        from triplaneturbo_tpu.utils.profiling import maybe_trace

        max_steps = args.max_steps or cfg.get("trainer", {}).get("max_steps", 15000)
        if args.resume:
            resume = find_last_path(args.resume)
            trainer.params, trainer.opt_state, trainer.global_step = load_train_state(
                resume, trainer.params, trainer.opt_state
            )
            ttt.info(f"resumed from {resume} at step {trainer.global_step}")
        key = jax.random.PRNGKey(seed)
        t0 = time.time()
        for step in range(trainer.global_step, max_steps):
            batch_list = dm.sample_train_batch()
            prompts = batch_list[0]["prompt"]
            metrics = trainer.train_step(batch_list, embeds_for(prompts), jax.random.fold_in(key, step))
            if step % cfg.get("trainer", {}).get("log_every_n_steps", 10) == 0:
                loss = float(metrics["loss"])
                ttt.info(f"step {step}: loss {loss:.4f} ({time.time()-t0:.1f}s)")
                mlog.log(step, metrics)
                mlog.progress(step, max_steps)
            ckpt_every = cfg.get("trainer", {}).get("checkpoint_every", 5000)
            if (step + 1) % ckpt_every == 0:
                save_params(
                    os.path.join(cfg.trial_dir, f"ckpt_{step+1:06d}", "geometry.msgpack"),
                    trainer.params["geometry"],
                )
                save_train_state(
                    os.path.join(cfg.trial_dir, f"ckpt_{step+1:06d}", "train_state"),
                    trainer.params, trainer.opt_state, step + 1,
                )
            # validation pass (reference val_check_interval: 5000,
            # configs/TriplaneTurbo_v1.yaml:251 — turntable renders per val prompt)
            val_every = cfg.get("trainer", {}).get("val_check_interval", ckpt_every)
            if val_every and (step + 1) % val_every == 0:
                val_prompts = dm.library["val"][rank() :: world()]
                save_dir = os.path.join(cfg.trial_dir, "save")
                for vi, vprompt in enumerate(val_prompts):
                    vbatch = dm.eval_views(vprompt, split="val")
                    views = trainer.render_eval_views(vbatch, embeds_for([vprompt]))
                    trainer.save_eval_artifacts(
                        views, save_dir, f"it{step+1}-val-{vi}"
                    )
                ttt.info(f"step {step+1}: validated {len(val_prompts)} prompts")
        save_params(os.path.join(cfg.trial_dir, "last", "geometry.msgpack"), trainer.params["geometry"])
    elif args.validate or args.test:
        # turntable renders per prompt (reference --validate/--test,
        # 40/120 views, grids + mp4)
        split = "val" if args.validate else "test"
        prompts = dm.library[split]
        weights = cfg.get("system", {}).get("weights")
        if weights:
            from triplaneturbo_tpu.utils.checkpoint import load_params

            trainer.params["geometry"] = load_params(weights, trainer.params["geometry"])
        save_dir = os.path.join(cfg.trial_dir, "save")
        for i, prompt in enumerate(prompts):
            batch = dm.eval_views(prompt, split=split)
            views = trainer.render_eval_views(batch, embeds_for([prompt]))
            trainer.save_eval_artifacts(views, save_dir, f"it{trainer.global_step}-{split}-{i}")
            ttt.info(f"[{i+1}/{len(prompts)}] rendered {prompt}")
    elif args.export:
        # dreamfusion-415-style OBJ export, prompts sharded over hosts
        from triplaneturbo_tpu.models.exporters.mesh_exporter import (
            MeshExporterConfig,
            MultipromptMeshExporter,
        )

        prompts = dm.library["test"]
        rank, world = jax.process_index(), jax.process_count()
        my_prompts = prompts[rank::world]
        exporter = MultipromptMeshExporter(
            parse_structured(MeshExporterConfig, cfg.get("system", {}).get("exporter", {}))
        )
        save_dir = os.path.join(cfg.trial_dir, f"it{trainer.global_step}-export")

        def forward_field_grid(sc, R):
            return trainer.geometry.apply(
                trainer.params["geometry"], sc, R, method=trainer.geometry.forward_field_grid
            )

        def export_fn(p, sc):
            return trainer.geometry.apply(
                trainer.params["geometry"], p, sc, method=trainer.geometry.export
            )["features"]

        for i, prompt in enumerate(my_prompts):
            emb = embeds_for([prompt])
            noise = jnp.asarray(dm.eval_views(prompt)["noise"])
            latents = trainer.diffusion_reverse(noise, emb["cond_local"])
            space_cache = trainer.geometry.apply(
                trainer.params["geometry"], latents, method=trainer.geometry.decode
            )
            meshes = exporter.extract(space_cache, forward_field_grid, export_fn, trainer.material_fn)
            name = "".join(c if c.isalnum() else "_" for c in prompt)[:80]
            exporter(meshes, save_dir, [name])
            ttt.info(f"[{i+1}/{len(my_prompts)}] exported {prompt}")


if __name__ == "__main__":
    main()
