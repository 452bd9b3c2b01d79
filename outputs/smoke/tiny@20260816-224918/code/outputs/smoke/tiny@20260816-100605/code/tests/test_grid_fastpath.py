"""The gather-free regular-grid triplane sampler must match per-point
sampling exactly (it replaces 50M random taps on the MC grid)."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.models.geometry.triplane_field import (
    TriplaneField,
    TriplaneFieldConfig,
)
from triplaneturbo_tpu.ops.triplane import (
    bilinear_interp_matrix,
    rotate_planes,
    sample_from_planes,
    sample_triplane_on_grid,
)


def test_interp_matrix_matches_grid_sample_1d():
    from triplaneturbo_tpu.ops.grid_sample import grid_sample_2d

    W = 16
    coords = jnp.linspace(-1, 1, 9)
    A = bilinear_interp_matrix(coords, W)
    sig = jax.random.normal(jax.random.PRNGKey(0), (W,))
    out = A @ sig
    # reference via grid_sample on a 1-row image
    feats = sig.reshape(1, 1, W, 1)
    grid = jnp.stack([coords, jnp.zeros_like(coords)], -1)[None]
    ref = grid_sample_2d(feats, grid)[0, :, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grid_fastpath_matches_pointwise_v1_v2():
    key = jax.random.PRNGKey(1)
    planes = jax.random.normal(key, (1, 3, 12, 12, 5))
    R = 7
    lin = jnp.linspace(-1, 1, R)
    grid_pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(1, -1, 3)
    for mode in ["v1", "v2"]:
        ref = sample_from_planes(planes, grid_pts, interpolate_feat=mode)[0]
        fast = sample_triplane_on_grid(planes[0], lin, mode).reshape(R**3, -1)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4, err_msg=mode)


def test_forward_field_grid_matches_forward_field():
    cfg = TriplaneFieldConfig(input_dim=8)
    field = TriplaneField(cfg)
    cache = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16, 16, 8)) * 0.3
    pts = jnp.zeros((1, 8, 3))
    params = field.init(jax.random.PRNGKey(3), pts, cache, method=field.init_all)

    R = 9
    lin = jnp.linspace(-1.0, 1.0, R)
    grid_pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(1, -1, 3)
    sdf_ref, def_ref = field.apply(params, grid_pts, cache, method=field.forward_field)
    sdf_fast, def_fast = field.apply(params, cache, R, method=field.forward_field_grid)
    np.testing.assert_allclose(np.asarray(sdf_fast), np.asarray(sdf_ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(def_fast), np.asarray(def_ref[0]), atol=2e-4)
