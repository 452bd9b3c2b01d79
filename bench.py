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


def probe_backend(max_wait_s: float = 480.0) -> None:
    """Wait (bounded) for the tunneled TPU backend to become initializable.

    The axon tunnel can wedge after a TPU process is killed mid-compile
    (CLAUDE.md gotcha): backend init then hangs or raises UNAVAILABLE for an
    extended period before recovering on its own. Round 2's perf record was
    lost to exactly this — one unguarded init attempt at driver time
    (BENCH_r02.json rc=1). Probe in a subprocess with SIGKILL (plain SIGTERM
    is ignored during init) and retry with backoff; only commit THIS process
    to backend init once a probe succeeds. Fails with a distinct message so
    a wedged tunnel is distinguishable from a code regression.
    """
    import subprocess

    deadline = time.time() + max_wait_s
    delay, attempt = 15.0, 0
    while True:
        attempt += 1
        t0 = time.time()
        r = subprocess.run(
            ["timeout", "-s", "KILL", "60", sys.executable, "-c",
             "import jax; jax.devices()"],
            capture_output=True, text=True,
        )
        if r.returncode == 0:
            print(f"# backend probe ok (attempt {attempt}, {time.time()-t0:.0f}s)",
                  file=sys.stderr)
            return
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["(killed)"]
        print(f"# backend probe attempt {attempt} failed rc={r.returncode}: {tail[0]}",
              file=sys.stderr)
        if time.time() + delay > deadline:
            print(
                "TPU_BACKEND_UNAVAILABLE: axon tunnel did not recover within "
                f"{max_wait_s:.0f}s of probing ({attempt} attempts). This is the "
                "documented transient tunnel wedge (CLAUDE.md), not a code "
                "regression — rerun bench.py once the tunnel recovers.",
                file=sys.stderr,
            )
            sys.exit(3)
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


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
        # reported number, i.e. the honest end-to-end latency). ONE read
        # suffices: the whole pipeline is a single XLA program, and PJRT
        # makes every output ready when the program finishes — reading a
        # second output would just pay the ~28 ms round trip twice.
        return float(jnp.sum(out["mesh"][0].v_pos))

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

    # FLOPs of the single-program pipeline from XLA's compiled cost analysis
    # -> achieved TFLOP/s and MFU vs the v5e bf16 peak (~197 TFLOP/s). The
    # lower().compile() hits the persistent compilation cache (seconds).
    flops = tflops_s = mfu = None
    try:
        input_ids = jnp.asarray(pipe.tokenizer.batch_encode([prompt]))
        analysis = pipe._generate_one_from_key_jit.lower(
            pipe.geometry_params, pipe.text_params, input_ids, key
        ).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0] if analysis else {}
        flops = float((analysis or {}).get("flops", 0.0)) or None
        if flops and jax.devices()[0].platform == "tpu":
            tflops_s = round(flops / med / 1e12, 2)
            mfu = round(flops / med / 197e12, 4)
    except Exception as e:
        print(f"# cost_analysis failed: {e}", file=sys.stderr)

    print(
        f"# build {build_s:.1f}s, compile+first {compile_s:.1f}s, "
        f"runs {['%.3f' % t for t in times]}, faces {n_faces}, "
        f"flops {flops}, tflops/s {tflops_s}, mfu {mfu}",
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
    probe_backend()
    main()
