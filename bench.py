#!/usr/bin/env python
"""Headline benchmark: prompt -> textured mesh latency on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims "around 1 second" prompt->mesh on an
unspecified single GPU (BASELINE.md). vs_baseline = baseline_s / ours_s
(>1 means faster than the reference's claim).

Runs the full-size flagship model (SD-2.1-base UNet + retrofitted VAE +
CLIP-H text encoder, MC 160³) with randomly initialized weights — identical
compute graph to the trained model, so latency is representative.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_S = 1.0


def main() -> None:
    import numpy as np

    from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
        TriplaneTurboTextTo3DPipeline,
    )

    dtype_str = os.environ.get("TTT_BENCH_DTYPE", "bfloat16")
    iso_res = int(os.environ.get("TTT_BENCH_ISO_RES", "160"))

    t0 = time.time()
    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(
        None, dtype_str=dtype_str, isosurface_resolution=iso_res
    )
    build_s = time.time() - t0

    prompt = "a DSLR photo of a hamburger"
    key = jax.random.PRNGKey(42)

    import jax.numpy as jnp

    def sync(out) -> float:
        # CLAUDE.md / measured gotcha: jax.block_until_ready is often a no-op
        # on the tunneled axon backend — end every timed region with a forced
        # scalar host transfer, which cannot return before the XLA program
        # producing the buffer completes. Costs ~28 ms (included in the
        # reported number, i.e. the honest end-to-end latency).
        return float(jnp.sum(out["mesh"][0].v_pos)) + float(
            jnp.sum(out["latents"][0, 0, 0, :2])
        )

    # compile + warmup
    t0 = time.time()
    out = pipe(prompt, key=key)
    sync(out)
    compile_s = time.time() - t0

    # timed runs
    times = []
    for i in range(5):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        out = pipe(prompt, key=k)
        sync(out)
        times.append(time.time() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]

    n_faces = int(np.asarray(out["mesh"][0].t_mask).sum())
    print(
        f"# build {build_s:.1f}s, compile+first {compile_s:.1f}s, "
        f"runs {['%.3f' % t for t in times]}, faces {n_faces}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "prompt_to_textured_mesh_latency",
                "value": round(med, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / med, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
