"""Fused attention kernel vs einsum reference (CPU: interpreter fallback
exercises the dispatch + vjp paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.ops.attention_pallas import attention, fused_attention


def _ref(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d**0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_dispatch_matches_reference_einsum_path():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 40, 4, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 40, 4, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 40, 4, 64))
    out = attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)), atol=1e-5)


def test_fused_kernel_interpret_matches():
    # run the pallas kernel in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu
    import triplaneturbo_tpu.ops.attention_pallas as ap

    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (3, 256, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 256, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (3, 256, 64))
    with pltpu.force_tpu_interpret_mode():
        out = ap.fused_attention(q, k, v)
    d = 64
    s = jnp.einsum("bld,bkd->blk", q, k) / (d**0.5)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("blk,bkd->bld", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_vjp_matches_einsum_grads():
    from jax.experimental.pallas import tpu as pltpu
    import triplaneturbo_tpu.ops.attention_pallas as ap

    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (1, 128, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 128, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 128, 64))

    def loss_fused(q_, k_, v_):
        return (ap.fused_attention(q_, k_, v_) ** 2).sum()

    def loss_ref(q_, k_, v_):
        s = jnp.einsum("bld,bkd->blk", q_, k_) / 8.0
        p = jax.nn.softmax(s, axis=-1)
        return (jnp.einsum("blk,bkd->bld", p, v_) ** 2).sum()

    # the context must cover the backward too: it is a Pallas program as well
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_flash_backward_long_ragged_kv():
    """Streaming flash backward parity at L > tiles and ragged lengths
    (padded-key masking in the recomputed probability tiles; dk/dv of padded
    keys must be zero; Lk != Lq exercises the cross-attention shape)."""
    from jax.experimental.pallas import tpu as pltpu
    import triplaneturbo_tpu.ops.attention_pallas as ap

    key = jax.random.PRNGKey(7)
    for Lq, Lk in [(700, 700), (300, 1200)]:
        q = jax.random.normal(key, (2, Lq, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, Lk, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, Lk, 64))

        def loss_fused(q_, k_, v_):
            return (jnp.sin(ap.fused_attention(q_, k_, v_)) ** 2).sum()

        def loss_ref(q_, k_, v_):
            s = jnp.einsum("bld,bkd->blk", q_, k_) / 8.0
            p = jax.nn.softmax(s, axis=-1)
            return (jnp.sin(jnp.einsum("blk,bkd->bld", p, v_)) ** 2).sum()

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
            )


def test_flash_streaming_matches_einsum_long_and_ragged():
    """Online-softmax streaming over KV tiles: parity at L > _KV_TILE and at
    lengths that don't divide the tiles (padded-key masking)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from triplaneturbo_tpu.ops import attention_pallas as ap

    key = jax.random.PRNGKey(3)
    for L in [1536, 700]:  # > _KV_TILE, and non-divisible by both tiles
        q = jax.random.normal(key, (2, L, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, L, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, L, 64))
        # interpreter-mode pallas path
        import unittest.mock as mock
        with mock.patch.object(ap.pl, "pallas_call", functools_partial_interpret(ap.pl.pallas_call)):
            out = ap._fused_attention_fwd_impl(q, k, v)
        scale = 1.0 / 8.0
        s = jnp.einsum("bld,bkd->blk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("blk,bkd->bld", p, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def functools_partial_interpret(pallas_call):
    import functools

    def wrapper(*a, **kw):
        kw.setdefault("interpret", True)
        return pallas_call(*a, **kw)

    return wrapper
