#!/usr/bin/env python
"""Micro-bench of bilinear-tap gather strategies on the real chip.

The volume branch evaluates ~2M field points/part; each costs 12 row-gathers
(3 planes x 4 bilinear taps) through grid_sample_2d. Random gathers are
~8 ns/element-row on this v5e regardless of source size (CLAUDE.md), so the
lever is gather COUNT. Candidates:

  a) take_along_axis x4 (current grid_sample_2d inner loop)
  b) lax.gather with slice_sizes (1,1,2,C): x-adjacent taps paired -> 2 ops
  c) lax.gather with slice_sizes (1,2,2,C): full 2x2 footprint -> 1 op
  d) flat-index take_along_axis on a pre-padded plane (control for layout)

All on zero-padded planes (padding makes every 2x2 slice in-bounds, matching
zeros-padding semantics). Prints min-of-3 ms for each at training-scale sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, HW, C = 3, 130, 32  # padded 128+2
M = 2_000_000


def timeit(name, fn, *args, n=3):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    float(jnp.ravel(out)[0])
    c = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.ravel(out)[0])
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts) * 1e3:8.1f} ms  (compile+first {c:.1f}s)")
    sys.stdout.flush()


def main():
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (N, HW, HW, C), jnp.float32)
    iy = jax.random.randint(jax.random.fold_in(key, 1), (N, M), 0, HW - 2)
    ix = jax.random.randint(jax.random.fold_in(key, 2), (N, M), 0, HW - 2)
    w = jax.random.uniform(jax.random.fold_in(key, 3), (N, M, 4))

    def taa4(feats, iy, ix, w):
        flat = feats.reshape(N, HW * HW, C)
        out = 0.0
        k = 0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = (iy + dy) * HW + (ix + dx)
                out = out + jnp.take_along_axis(flat, idx[..., None], axis=1) * w[..., k : k + 1]
                k += 1
        return out.sum()

    def gather_dims(feats, starts, slice_hw):
        # feats [N,H,W,C], starts [N,M,2] -> [N,M,sh,sw,C]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
            operand_batching_dims=(),
            start_indices_batching_dims=(),
        )
        # add leading N index to starts
        nidx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None, None], (N, M, 1))
        si = jnp.concatenate([nidx, starts], axis=-1)  # [N, M, 3]
        return jax.lax.gather(
            feats, si, dn, slice_sizes=(1,) + slice_hw + (C,), mode=jax.lax.GatherScatterMode.CLIP
        )

    def pair2(feats, iy, ix, w):
        out = 0.0
        for k, dy in enumerate((0, 1)):
            st = jnp.stack([iy + dy, ix], axis=-1)
            blk = gather_dims(feats, st, (1, 2))  # [N,M,1,2,C]
            out = out + blk[:, :, 0, 0] * w[..., 2 * k : 2 * k + 1] + blk[:, :, 0, 1] * w[..., 2 * k + 1 : 2 * k + 2]
        return out.sum()

    def block1(feats, iy, ix, w):
        st = jnp.stack([iy, ix], axis=-1)
        blk = gather_dims(feats, st, (2, 2))  # [N,M,2,2,C]
        wb = w.reshape(N, M, 2, 2, 1)
        return (blk * wb).sum()

    timeit("a) take_along_axis x4 taps", taa4, feats, iy, ix, w)
    timeit("b) lax.gather (1,2,C) x2 taps", pair2, feats, iy, ix, w)
    timeit("c) lax.gather (2,2,C) x1 tap", block1, feats, iy, ix, w)
    # d) single-tap baseline to estimate per-gather cost
    def taa1(feats, iy, ix, w):
        flat = feats.reshape(N, HW * HW, C)
        idx = iy * HW + ix
        return (jnp.take_along_axis(flat, idx[..., None], axis=1) * w[..., :1]).sum()

    timeit("d) take_along_axis x1 tap", taa1, feats, iy, ix, w)
    print("DONE")


if __name__ == "__main__":
    main()
