"""Stage-level latency breakdown of the flagship pipeline on the real chip.

Times the two jit units separately (diffusion sample vs mesh extract) plus
sub-stages, to find where the time goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import TriplaneTurboTextTo3DPipeline


def _sync(out) -> float:
    """Forced scalar host read: block_until_ready is often a no-op on the
    tunneled axon backend (CLAUDE.md) — a float() of one output leaf cannot
    return before the producing program finishes. Costs ~28 ms, which is a
    constant additive term in every stage time below (see the printed
    baseline)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *a, n=5, warmup=1):
    for _ in range(warmup):
        _sync(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*a)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    pipe = TriplaneTurboTextTo3DPipeline.from_pretrained(None, dtype_str="bfloat16")
    prompt = "a DSLR photo of a hamburger"
    key = jax.random.PRNGKey(0)
    cfg = pipe.cfg
    input_ids = jnp.asarray(pipe.tokenizer.batch_encode([prompt]))
    latents = jax.random.normal(key, (1, cfg.n_planes, cfg.latent_resolution, cfg.latent_resolution, cfg.latent_channels))

    # baseline: dispatch + forced host read of a trivial program — this
    # constant is included in every stage time below
    null = jax.jit(lambda x: x + 1.0)
    t_null, _ = timeit(lambda: null(jnp.zeros(())))
    print(f"dispatch+read baseline: {t_null*1e3:.1f} ms (additive in all stages)")

    t_one, _ = timeit(
        lambda: pipe._generate_one_jit(pipe.geometry_params, pipe.text_params, input_ids, latents)
    )
    print(f"single-dispatch full pipeline: {t_one*1e3:.1f} ms")

    t_sample, (out_latents, space_cache) = timeit(
        lambda: pipe._sample_jit(pipe.geometry_params, pipe.text_params, input_ids, latents)
    )
    print(f"sample (text enc + 4-step UNet + VAE decode): {t_sample*1e3:.1f} ms")

    t_extract, _ = timeit(
        lambda: pipe._extract_jit(pipe.geometry_params, space_cache[0])
    )
    print(f"extract (field grid + MC + colorize):         {t_extract*1e3:.1f} ms")

    # finer: text encoder alone
    te = jax.jit(lambda p, i: pipe.text_encoder.apply(p, i))
    t_text, _ = timeit(lambda: te(pipe.text_params, input_ids))
    print(f"  text encoder: {t_text*1e3:.1f} ms")

    # decode alone
    dec = jax.jit(lambda p, l: pipe.geometry.apply(p, l, method=pipe.geometry.decode))
    t_dec, sc = timeit(lambda: dec(pipe.geometry_params, out_latents))
    print(f"  VAE decode:   {t_dec*1e3:.1f} ms")

    # field-on-grid alone
    fog = jax.jit(lambda p, s: pipe._field_on_grid(p, s))
    t_fog, (sdf, deform) = timeit(lambda: fog(pipe.geometry_params, space_cache[0]))
    print(f"  field on 160^3 grid: {t_fog*1e3:.1f} ms")

    # marching tets alone
    from triplaneturbo_tpu.ops.isosurface import marching_tets
    R = cfg.isosurface_resolution
    mt = jax.jit(lambda s, d: marching_tets(s.reshape(R, R, R), d.reshape(R, R, R, 3), max_verts=cfg.max_verts, max_faces=cfg.max_faces))
    t_mt, m = timeit(lambda: mt(sdf, deform))
    print(f"  marching tets 160^3: {t_mt*1e3:.1f} ms")

    # export colorize alone
    exp = jax.jit(lambda p, v, s: pipe.geometry.apply(p, v[None], s[None], method=pipe.geometry.export))
    verts = m.verts * 2.0 - 1.0
    t_exp, _ = timeit(lambda: exp(pipe.geometry_params, verts, space_cache[0]))
    print(f"  export colorize ({verts.shape[0]} vert slots): {t_exp*1e3:.1f} ms")

    # per-UNet-step estimate
    t_unet = t_sample - t_text - t_dec
    print(f"  => 4-step UNet ~ {t_unet*1e3:.1f} ms ({t_unet/4*1e3:.1f} ms/step)")

    import json

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "profile_pipeline_r5.json",
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "inference_stage_profile",
                "device": "1x TPU v5e (tunneled)",
                "dispatch_read_baseline_ms": round(t_null * 1e3, 1),
                "single_dispatch_full_ms": round(t_one * 1e3, 1),
                "sample_ms": round(t_sample * 1e3, 1),
                "extract_ms": round(t_extract * 1e3, 1),
                "text_encoder_ms": round(t_text * 1e3, 1),
                "vae_decode_ms": round(t_dec * 1e3, 1),
                "unet_4step_ms": round(t_unet * 1e3, 1),
                "field_on_grid_ms": round(t_fog * 1e3, 1),
                "marching_tets_ms": round(t_mt * 1e3, 1),
                "export_colorize_ms": round(t_exp * 1e3, 1),
                "note": "stage times each include the dispatch+read baseline "
                "(~28 ms host transfer); sub-stages are timed as separate jit "
                "programs so they do not sum exactly to the fused single-"
                "dispatch pipeline, which XLA fuses and overlaps.",
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
