#!/usr/bin/env python
"""Batched-inference throughput: meshes/s at B in {1, 4, 8} on one chip.

The reference pipeline exposes num_results_per_prompt
(/root/reference/triplaneturbo_executable/pipelines/triplaneturbo_text_to_3d.py:264-269)
but publishes only the B=1 "around 1 second" claim. Batching amortizes the
fixed per-dispatch sync (~28 ms host read on the tunneled backend) and fills
the MXU with bigger matmuls; this prints one JSON line per batch size with
latency and meshes/s.

Usage: python tools/bench_infer_batch.py [--batches 1,4,8] [--runs 4]
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
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
        TriplaneTurboTextTo3DPipeline,
    )

    t0 = time.time()
    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(None, dtype_str="bfloat16")
    print(f"# build {time.time() - t0:.1f}s", file=sys.stderr)

    prompt = "a DSLR photo of a hamburger"
    key = jax.random.PRNGKey(42)
    results = []
    for B in batches:
        # compile + warmup
        t0 = time.time()
        out = pipe(prompt, num_results_per_prompt=B, key=key)
        # forced host read of EVERY mesh: the B>1 path is one sample program
        # + B extract programs, so sync each (block_until_ready is unreliable
        # on the tunneled axon backend, CLAUDE.md)
        for m in out["mesh"]:
            float(jnp.sum(m.v_pos))
        compile_s = time.time() - t0

        ts = []
        for i in range(args.runs):
            k = jax.random.fold_in(key, i + 1)
            t0 = time.time()
            out = pipe(prompt, num_results_per_prompt=B, key=k)
            for m in out["mesh"]:
                float(jnp.sum(m.v_pos))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        rec = {
            "metric": "batched_inference",
            "batch": B,
            "latency_s": round(med, 4),
            "meshes_per_s": round(B / med, 3),
            "compile_first_s": round(compile_s, 1),
            "runs": [round(t, 4) for t in ts],
        }
        results.append(rec)
        print(json.dumps(rec))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "bench_r4_infer_batch.json",
    )
    if os.environ.get("TTT_WRITE_ARTIFACT", "1") == "1":
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=1)
        print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
