#!/usr/bin/env python
"""Time the hashgrid encode fwd/bwd and its raw primitives on the real chip.

The background hashgrid backward was suspected to dominate the mesh-branch
student backward (benchmarks/render_bisect_r4_bgexp.txt) — 16.8M
trilinear-corner scatter-adds into the 8 x 2^19 x 2 table. This times the
encode end-to-end at that exact scale (N = 4 x 256^2 dirs), plus the raw
primitives (sort, cumsum, colliding vs unique scatter). The r5 run settled
the grad-strategy question (plain scatter won; losers deleted) and showed
the encode is only ~280 ms of the 1018 ms background fwd+bwd — the rest is
the hypernet MLP (benchmarks/microbench_hashgrid_r5.txt).

Usage: python tools/microbench_hashgrid.py
"""

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

from triplaneturbo_tpu.ops.hashgrid import (
    HashGridConfig,
    _dense_level_encode,
    _hashed_indices_weights,
    hashgrid_encode,
)


def timeit(name, fn, *args, n=5):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    compile_s = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts) * 1e3:8.1f} ms   (compile+first {compile_s:.1f}s)")
    sys.stdout.flush()


def main() -> None:
    N = 4 * 256 * 256
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 3))
    base = HashGridConfig()
    T = 1 << base.log2_hashmap_size
    L, F = base.n_levels, base.n_features_per_level
    table = jax.random.normal(jax.random.PRNGKey(1), (L, T, F)) * 1e-2
    cot = jax.random.normal(jax.random.PRNGKey(2), (N, base.n_output_dims))

    print(f"# N={N}, L={L}, T=2^{base.log2_hashmap_size}, F={F}, "
          f"updates={N * L * 8 / 1e6:.1f}M")

    # end-to-end encode fwd / fwd+bwd (r5 measured: plain scatter 232 ms beat
    # sorted_scatter 239 ms and scatter-free sort 405 ms at this scale, so the
    # loser strategies were deleted — benchmarks/microbench_hashgrid_r5.txt)
    timeit("encode fwd", lambda t: hashgrid_encode(t, x, base).sum(), table)
    timeit(
        "encode fwd+bwd [scatter]",
        jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x, base) * cot)),
        table,
    )

    # dense packed level alone (fwd and fwd+bwd) at the finest dense res
    res5 = base.resolutions[5]
    timeit(f"dense packed level res={res5} fwd",
           lambda t: _dense_level_encode(t[5], x, res5).sum(), table)
    timeit(f"dense packed level res={res5} fwd+bwd",
           jax.grad(lambda t: jnp.sum(
               _dense_level_encode(t[5], x, res5)
               * cot[:, 5 * F : 6 * F])), table)

    # hashed-level colliding scatter baseline (per level)
    idx, w = jax.jit(lambda xx: _hashed_indices_weights(xx, base))(x)
    for li in range(idx.shape[1]):
        def lvl_scatter(gc, lv=li):
            upd = (w[:, lv, :, None] * gc[:, lv, None, :]).reshape(-1, F)
            return jnp.zeros((T, F)).at[(idx[:, lv] % T).reshape(-1)].add(upd)
        timeit(f"scatter hashed level {li} (2.1M upd)", lvl_scatter,
               cot.reshape(N, L, F)[:, -idx.shape[1]:])

    # raw primitives at the full 16.8M scale
    M = N * L * 8
    keys = jax.random.randint(jax.random.PRNGKey(3), (M,), 0, L * T)
    vals = jax.random.normal(jax.random.PRNGKey(4), (M, F))
    timeit("raw sort 16.8M (key+2 vals)",
           lambda k, v: jax.lax.sort((k, v[:, 0], v[:, 1]), num_keys=1)[1].sum(),
           keys, vals)
    timeit("raw cumsum 16.8M x2",
           lambda v: jnp.cumsum(v, axis=0).sum(), vals)
    skeys = jnp.sort(keys)
    timeit("raw scatter-add 16.8M colliding",
           lambda k, v: jnp.zeros((L * T, F)).at[k].add(v).sum(), keys, vals)
    timeit("raw scatter-add 16.8M sorted hint",
           lambda k, v: jnp.zeros((L * T, F)).at[k].add(
               v, indices_are_sorted=True).sum(), skeys, vals)
    uniq = jnp.arange(M, dtype=jnp.int32) % (L * T)
    timeit("raw scatter-add 16.8M unique-flag",
           lambda k, v: jnp.zeros((L * T, F)).at[k].add(
               v, mode="drop", unique_indices=True, indices_are_sorted=True
           ).sum(), jnp.sort(uniq), vals)
    print("DONE")


if __name__ == "__main__":
    main()
