"""Triplane field: shapes, sphere bias, channel split, analytic normals
(incl. grad-of-grad through the full field, the reference's CUDA-ext path)."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.models.geometry.triplane_field import (
    TriplaneField,
    TriplaneFieldConfig,
    analytic_normal,
    decode_space_cache,
)


def make_field(rng=0):
    cfg = TriplaneFieldConfig(input_dim=8)
    field = TriplaneField(cfg)
    cache = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16, 16, 8)) * 0.1
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 3), minval=-0.9, maxval=0.9)
    params = field.init(jax.random.PRNGKey(rng), pts, cache, method=field.init_all)
    return field, params, cache, pts


def test_forward_shapes():
    field, params, cache, pts = make_field()
    out = field.apply(params, pts, cache)
    assert out["sdf"].shape == (2, 64, 1)
    assert out["features"].shape == (2, 64, 3)
    sdf, deform = field.apply(params, pts, cache, method=field.forward_field)
    assert sdf.shape == (2, 64, 1) and deform.shape == (2, 64, 3)
    exp = field.apply(params, pts, cache, method=field.export)
    assert exp["features"].shape == (2, 64, 3)


def test_sphere_bias_dominates_at_init():
    """Bias-free MLPs output ~small values at init; the sphere bias (r=0.5,
    pipeline config triplaneturbo_text_to_3d.py:41) should drive the sign."""
    field, params, cache, _ = make_field()
    inside = jnp.zeros((1, 1, 3))
    outside = jnp.ones((1, 1, 3)) * 0.9
    cache1 = cache[:1] * 0  # zero cache -> pure bias
    s_in = field.apply(params, inside, cache1, method=field.forward_sdf)
    s_out = field.apply(params, outside, cache1, method=field.forward_sdf)
    assert float(s_in[0, 0, 0]) < 0 < float(s_out[0, 0, 0])


def test_decode_space_cache_split_v1():
    tri = jnp.arange(2 * 6 * 4 * 4 * 8, dtype=jnp.float32).reshape(2, 6, 4, 4, 8)
    out = decode_space_cache(tri, "v1")
    assert out.shape == (2, 6, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out[:, 0:3]), np.asarray(tri[:, 0:3, ..., :4]))
    np.testing.assert_allclose(np.asarray(out[:, 3:6]), np.asarray(tri[:, 3:6, ..., 4:]))


def test_analytic_normal_matches_fd_and_is_twice_differentiable():
    field, params, cache, _ = make_field()
    pts = jnp.asarray([[[0.3, -0.2, 0.4], [0.0, 0.5, -0.1]]])
    cache1 = cache[:1]

    def sdf_fn(p, sc):
        return field.apply(params, p, sc, method=field.forward_sdf)

    n = analytic_normal(sdf_fn, pts, cache1, normalize=False)
    # finite differences
    eps = 1e-3
    fd = np.zeros((1, 2, 3))
    for i in range(2):
        for j in range(3):
            pp = pts.at[0, i, j].add(eps)
            pm = pts.at[0, i, j].add(-eps)
            fd[0, i, j] = float(
                (sdf_fn(pp, cache1)[0, i, 0] - sdf_fn(pm, cache1)[0, i, 0]) / (2 * eps)
            )
    # bilinear interpolation has kinks at cell boundaries; central differences
    # straddling a kink are biased, so the tolerance is loose
    np.testing.assert_allclose(np.asarray(n), fd, atol=3e-2, rtol=2e-2)

    # backprop THROUGH the normals into the cache (the reference's grad² case)
    def loss(sc):
        nn_ = analytic_normal(sdf_fn, pts, sc)
        return (nn_**2).sum()

    g = jax.grad(loss)(cache1)
    assert np.isfinite(np.asarray(g)).all()


def test_rotated_sampling_consistency():
    """A feature painted on the geo xy-plane should vary along x/y but be
    constant along z after rotation+projection."""
    field, params, cache, _ = make_field()
    cache = cache.at[:].set(0.0)
    # gradient along the H axis of plane 0
    ramp = jnp.linspace(-1, 1, 16)[None, :, None, None] * jnp.ones((1, 16, 16, 1))
    cache = cache.at[:, 0, :, :, :].set(ramp)
    ptsA = jnp.asarray([[[0.2, 0.3, -0.5]]])
    ptsB = jnp.asarray([[[0.2, 0.3, 0.7]]])  # same x, y
    gA = field.apply(params, ptsA, cache[:1], method=field.forward_sdf)
    gB = field.apply(params, ptsB, cache[:1], method=field.forward_sdf)
    # sdf bias differs (radius), so compare the MLP input via interpolate
    fa = field.apply(params, ptsA, cache[:1], True, method=field.interpolate)
    fb = field.apply(params, ptsB, cache[:1], True, method=field.interpolate)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)
    assert gA.shape == gB.shape
