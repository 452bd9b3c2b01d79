#!/usr/bin/env python
"""Batched-inference throughput (meshes/s) at B = 1 / 4 / 8 on the real chip.

The reference pipeline exposes num_results_per_prompt
(/root/reference/triplaneturbo_executable/pipelines/triplaneturbo_text_to_3d.py:264-269);
batching amortizes the fixed host-sync/dispatch cost of the B=1 path and
feeds the MXU bigger matmuls in the denoise/decode program. Writes
benchmarks/bench_r5_batched_inference.json.

Usage: python tools/bench_batched_inference.py
"""

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
    from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
        TriplaneTurboTextTo3DPipeline,
    )

    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(
        None, dtype_str="bfloat16", isosurface_resolution=160
    )
    prompt = "a DSLR photo of a hamburger"
    key = jax.random.PRNGKey(42)

    def sync(out) -> float:
        # forced scalar host read (block_until_ready is a no-op on axon)
        return float(jnp.sum(out["mesh"][-1].v_pos))

    results = {}
    for B in (1, 4, 8):
        t0 = time.time()
        try:
            out = pipe(prompt, num_results_per_prompt=B, key=key)
            sync(out)
        except Exception as e:  # e.g. HBM OOM at the largest batch
            results[f"B{B}"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"# B={B}: FAILED {type(e).__name__}", file=sys.stderr)
            continue
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            k = jax.random.fold_in(key, i)
            t0 = time.time()
            out = pipe(prompt, num_results_per_prompt=B, key=k)
            sync(out)
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        results[f"B{B}"] = {
            "latency_s": round(med, 4),
            "meshes_per_s": round(B / med, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "runs": [round(t, 4) for t in times],
        }
        print(f"# B={B}: {med:.3f}s  {B/med:.3f} meshes/s "
              f"(compile+first {compile_s:.1f}s)", file=sys.stderr)
        sys.stderr.flush()

    artifact = {
        "metric": "batched_inference_throughput",
        "unit": "meshes/s",
        "isosurface_resolution": 160,
        "dtype": "bfloat16",
        **results,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/bench_r5_batched_inference.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
