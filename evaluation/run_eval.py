#!/usr/bin/env python
"""End-to-end benchmark loop: prompts -> meshes -> 4-view renders -> CLIP score.

Rebuild of the reference eval pipeline (SURVEY §3.3): ``--export`` mesh
generation (scripts/eval/dreamfusion.sh), kire 4-view rendering
(evaluation/mesh_visualize.py) and CLIP similarity / Recall@1
(evaluation/clipscore/compute.py) — all in-process on TPU, no GPU subprocess
pools.

Usage:
  python evaluation/run_eval.py --prompts datasets/my_prompts.json \
      --out outputs/eval --limit 16 [--weights path]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prompt_slug(i: int, prompt: str) -> str:
    """Filesystem-safe unique name for a prompt's artifacts: index prefix
    guarantees uniqueness (prompts sharing a 60-char prefix would otherwise
    overwrite each other), and the sanitizer keeps '/' etc. out of the path
    (ADVICE r4)."""
    return f"{i:03d}_" + re.sub(r"[^A-Za-z0-9_-]+", "_", prompt)[:60]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", default=None, help="json prompt library (test split)")
    ap.add_argument("--out", default="outputs/eval")
    ap.add_argument("--limit", type=int, default=8)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--render-size", type=int, default=512)
    ap.add_argument("--save-obj", action="store_true")
    ap.add_argument(
        "--save-grid",
        action="store_true",
        help="write a per-prompt PNG grid of the rendered eval views "
        "(the reference saves kire render grids next to its score json)",
    )
    ap.add_argument(
        "--clip-ckpt",
        default=None,
        help="HF clip-vit-base-patch32 torch state dict (or converted "
        "msgpack from tools/convert_checkpoints.py); random towers when "
        "absent — scores are then only self-consistent, not comparable",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import triplaneturbo_tpu as ttt
    from triplaneturbo_tpu.evaluation import CLIPScorer, render_mesh_views
    from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
        TriplaneTurboTextTo3DPipeline,
        export_obj,
    )

    if args.prompts and os.path.exists(args.prompts):
        with open(args.prompts) as f:
            lib = json.load(f)
        prompts = lib["test"] if isinstance(lib, dict) else lib
    else:
        from triplaneturbo_tpu.data import DataModuleConfig, load_prompt_library

        prompts = load_prompt_library(DataModuleConfig())["test"]
    prompts = prompts[: args.limit]

    # shard prompts across hosts (reference: DDP-sharded export)
    rank, world = jax.process_index(), jax.process_count()
    my_prompts = prompts[rank::world]

    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(args.weights, dtype_str="bfloat16")
    if args.clip_ckpt:
        scorer = CLIPScorer.from_checkpoint(args.clip_ckpt)
    else:
        scorer = CLIPScorer()
    os.makedirs(args.out, exist_ok=True)

    images = {}
    t_total = 0.0
    for i, prompt in enumerate(my_prompts):
        t0 = time.time()
        out = pipe(prompt, key=jax.random.fold_in(jax.random.PRNGKey(42), i))
        mesh = out["mesh"][0]
        views = render_mesh_views(mesh, n_views=args.views, height=args.render_size, width=args.render_size)
        # forced scalar host read: block_until_ready is often a no-op on the
        # tunneled axon backend (CLAUDE.md) — this is the honest sync
        float(views.sum())
        dt = time.time() - t0
        t_total += dt
        images[prompt] = views
        if args.save_obj:
            export_obj(mesh, os.path.join(args.out, prompt_slug(i, prompt), "model.obj"))
        if args.save_grid:
            from triplaneturbo_tpu.utils.saving import save_image_grid

            save_image_grid(
                os.path.join(args.out, f"{prompt_slug(i, prompt)}.png"),
                [np.asarray(v) for v in views],
            )
        ttt.info(f"[{i+1}/{len(my_prompts)}] {dt:.2f}s  {prompt}")

    metrics = scorer.score(images)
    metrics["prompts"] = len(my_prompts)
    metrics["mean_latency_s"] = t_total / max(len(my_prompts), 1)
    with open(os.path.join(args.out, f"metrics_rank{rank}.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
