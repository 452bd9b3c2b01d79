#!/usr/bin/env python
"""Steady-state per-program latency of the staged train step on the chip.

Wraps trainer._dispatch with a forced scalar host read per program and
times the SECOND step (the first warms compiles + autotuning), attributing
wall time to each staged program. This is the breakdown behind the s/step
number in benchmarks/bench_r4_train.json; use it to decide which program to
attack (reference budget: 15k steps x batch 8 on 8 x >=48 GB GPUs,
/root/reference/configs/TriplaneTurbo_v1.yaml:8,62,248).

Usage: python tools/profile_train_dispatch.py [--config configs/triplaneturbo_v1_1chip.yaml]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/triplaneturbo_v1_1chip.yaml")
    ap.add_argument("extras", nargs="*")
    args = ap.parse_args()

    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.systems.builder import build_system
    from triplaneturbo_tpu.systems.prompt_setup import build_prompt_setup
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
        negative_prompt=cfg.get("data", {}).get("negative_prompt", ""),
    )

    names = {
        id(trainer._stage_render_jit): "render",
        id(trainer._stage_teacher_jit): "teacher",
        id(trainer._stage_student_render_jit["1st"]): "student_render_1st",
        id(trainer._stage_student_render_jit["2nd"]): "student_render_2nd",
        id(trainer._stage_student_space_jit): "student_space",
        id(trainer._stage_update_jit): "update",
        id(trainer._acc_jit): "acc",
    }

    records = []
    recording = [False]
    orig_dispatch = trainer._dispatch
    orig_acc = trainer._acc_jit

    def read_one(out) -> None:
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.ravel(leaf)[0])

    def timed_dispatch(fn, *a):
        t0 = time.time()
        out = orig_dispatch(fn, *a)
        read_one(out)
        if recording[0]:
            records.append((names.get(id(fn), "?"), time.time() - t0))
        return out

    def timed_acc(a, b):
        t0 = time.time()
        out = orig_acc(a, b)
        read_one(out)
        if recording[0]:
            records.append(("acc", time.time() - t0))
        return out

    trainer._dispatch = timed_dispatch
    trainer._acc_jit = timed_acc
    # the per-dispatch reads above already serialize the stream; skip the
    # trainer's own syncs so they are not double-counted
    trainer.cfg.sync_per_part = False

    key = jax.random.PRNGKey(0)
    batch_list = dm.sample_train_batch()
    embeds = embeds_for(batch_list[0]["prompt"])
    t0 = time.time()
    m = trainer.train_step(batch_list, embeds, key)
    float(m["loss"])
    print(f"# warmup step {time.time() - t0:.1f}s", file=sys.stderr)

    recording[0] = True
    batch_list = dm.sample_train_batch()
    embeds = embeds_for(batch_list[0]["prompt"])
    t0 = time.time()
    m = trainer.train_step(batch_list, embeds, jax.random.fold_in(key, 1))
    float(m["loss"])
    total = time.time() - t0

    agg = {}
    for name, dt in records:
        c, s = agg.get(name, (0, 0.0))
        agg[name] = (c + 1, s + dt)
    print(f"step total {total:.2f}s, dispatched+synced {sum(s for _, s in agg.values()):.2f}s")
    for name, (c, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {name:20s} x{c}  {s:7.2f}s  ({s / c:6.3f}s each)")
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "benchmarks", "profile_train_dispatch_r4.json")
    if os.environ.get("TTT_WRITE_ARTIFACT", "0") == "1":
        with open(out_path, "w") as f:
            json.dump({"config": args.config, "step_total_s": round(total, 3),
                       "programs": {k: {"count": c, "total_s": round(s, 3)}
                                    for k, (c, s) in agg.items()}}, f, indent=1)
        print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
