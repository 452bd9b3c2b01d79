"""Fused field-grid Pallas kernel: parity against the unfused XLA path
(interpreter mode on CPU) + gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triplaneturbo_tpu.ops.field_grid_pallas import (
    _reference_field_grid,
    fused_field_grid,
)


def _make_inputs(key, R=16, C=32, concat=False):
    ks = jax.random.split(key, 10)
    cin = 3 * C if concat else C
    m = [jax.random.normal(ks[i], (R, R, C)) * 0.3 for i in range(3)]
    w1s = jax.random.normal(ks[3], (cin, 64)) * 0.1
    w2s = jax.random.normal(ks[4], (64, 64)) * 0.1
    w3s = jax.random.normal(ks[5], (64, 1)) * 0.1
    w1d = jax.random.normal(ks[6], (cin, 64)) * 0.1
    w2d = jax.random.normal(ks[7], (64, 64)) * 0.1
    w3d = jax.random.normal(ks[8], (64, 3)) * 0.1
    return (*m, w1s, w2s, w3s, w1d, w2d, w3d)


@pytest.mark.parametrize("concat", [False, True])
def test_fused_matches_reference(concat):
    args = _make_inputs(jax.random.PRNGKey(0), concat=concat)
    sdf_p, def_p = fused_field_grid(*args, 1.0, 0.5, concat, True)
    sdf_r, def_r = _reference_field_grid(*args, 1.0, 0.5, concat)
    np.testing.assert_allclose(np.asarray(sdf_p), np.asarray(sdf_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(def_p), np.asarray(def_r), atol=2e-5)


def test_fused_matches_module_path():
    """The flax module's XLA fallback equals the kernel (same field)."""
    from triplaneturbo_tpu.models.geometry.triplane_field import (
        TriplaneField,
        TriplaneFieldConfig,
    )

    R, C = 16, 32
    key = jax.random.PRNGKey(1)
    field = TriplaneField(TriplaneFieldConfig())
    cache = jax.random.normal(key, (1, 6, 24, 24, C)) * 0.3
    params = field.init(key, jnp.zeros((1, 4, 3)), cache, method=field.init_all)
    # CPU backend -> module takes the unfused path
    sdf_x, def_x = field.apply(params, cache, R, method=field.forward_field_grid)

    # drive the kernel (interpret) with the module's own weights
    from triplaneturbo_tpu.ops.triplane import resample_triplane_axes, rotate_planes

    rotated = rotate_planes(cache, "v1")[0]
    coords = jnp.linspace(-1.0, 1.0, R)
    m_xy, m_xz, m_zy = resample_triplane_axes(rotated[0:3], coords)
    ps = params["params"]["sdf_network"]
    pd = params["params"]["deformation_network"]
    sdf_k, def_k = fused_field_grid(
        m_xy, m_xz, m_zy,
        ps["Dense_0"]["kernel"], ps["Dense_1"]["kernel"], ps["Dense_2"]["kernel"],
        pd["Dense_0"]["kernel"], pd["Dense_1"]["kernel"], pd["Dense_2"]["kernel"],
        1.0, 0.5, False, True,
    )
    np.testing.assert_allclose(
        np.asarray(sdf_k.reshape(-1, 1)), np.asarray(sdf_x), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(def_k, 0, -1).reshape(-1, 3)), np.asarray(def_x), atol=2e-5
    )


@pytest.mark.parametrize("slabs", [1, 2, 4])
def test_bwd_slab_count_invariant(monkeypatch, slabs):
    """BWD_SLABS only changes the backward's recompute decomposition, never
    the gradients: any slab count matches the unfused reference."""
    from triplaneturbo_tpu.ops import field_grid_pallas

    args = _make_inputs(jax.random.PRNGKey(3))

    def loss_fused(*a):
        s, d = fused_field_grid(*a, 1.0, 0.5, False, True)
        return jnp.sum(s * s) + jnp.sum(jnp.tanh(d))

    def loss_ref(*a):
        s, d = _reference_field_grid(*a, 1.0, 0.5, False)
        return jnp.sum(s * s) + jnp.sum(jnp.tanh(d))

    monkeypatch.setattr(field_grid_pallas, "BWD_SLABS", slabs)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 8))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 8))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fused_gradients_match_reference():
    args = _make_inputs(jax.random.PRNGKey(2))

    def loss_fused(*a):
        s, d = fused_field_grid(*a, 1.0, 0.5, False, True)
        return jnp.sum(s * s) + jnp.sum(jnp.tanh(d))

    def loss_ref(*a):
        s, d = _reference_field_grid(*a, 1.0, 0.5, False)
        return jnp.sum(s * s) + jnp.sum(jnp.tanh(d))

    gf = jax.grad(loss_fused, argnums=(0, 3, 4, 5, 8))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 3, 4, 5, 8))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
