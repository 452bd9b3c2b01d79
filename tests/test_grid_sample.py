"""Parity of the gather+lerp grid sampler vs torch.nn.functional.grid_sample,
plus arbitrary-order differentiability (the reason the reference shipped a
CUDA grad² extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from triplaneturbo_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 5, 7, 4)])
def test_grid_sample_2d_matches_torch(shape):
    rng = np.random.RandomState(0)
    N, H, W, C = shape
    M = 33
    feats = rng.randn(N, H, W, C).astype(np.float32)
    # include out-of-bounds points to exercise zeros padding
    grid = rng.uniform(-1.3, 1.3, size=(N, M, 2)).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(feats), jnp.asarray(grid))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid).unsqueeze(1)  # [N, 1, M, 2]
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()  # [N, M, C]

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.RandomState(1)
    N, D, H, W, C = 2, 4, 5, 6, 3
    M = 17
    feats = rng.randn(N, D, H, W, C).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(N, M, 3)).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(feats), jnp.asarray(grid))

    t_feats = torch.from_numpy(feats).permute(0, 4, 1, 2, 3)  # NCDHW
    t_grid = torch.from_numpy(grid).view(N, 1, 1, M, 3)
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    ref = ref.view(N, C, M).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grid_sample_grad_matches_torch():
    rng = np.random.RandomState(2)
    N, H, W, C, M = 1, 6, 6, 2, 9
    feats = rng.randn(N, H, W, C).astype(np.float32)
    grid = rng.uniform(-0.9, 0.9, size=(N, M, 2)).astype(np.float32)
    cot = rng.randn(N, M, C).astype(np.float32)

    def f(feats_, grid_):
        return (grid_sample_2d(feats_, grid_) * jnp.asarray(cot)).sum()

    gf, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(grid))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2).requires_grad_(True)
    t_grid = torch.from_numpy(grid).unsqueeze(1).requires_grad_(True)
    out = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    loss = (out.squeeze(2).permute(0, 2, 1) * torch.from_numpy(cot)).sum()
    loss.backward()

    np.testing.assert_allclose(np.asarray(gf), t_feats.grad.permute(0, 2, 3, 1).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), t_grid.grad.squeeze(1).numpy(), atol=1e-4)


def test_grid_sample_grad2_finite_difference():
    """Second derivative w.r.t. grid exists and matches finite differences of
    the first derivative (replaces the CUDA gridsample-grad² ext, SURVEY §2.6#1)."""
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    grid0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 4, 2)).astype(np.float32))

    def first_grad(g):
        # d(sum of samples)/dgrid — this is what analytic SDF normals are
        return jax.grad(lambda gg: grid_sample_2d(feats, gg).sum())(g)

    def loss(g):
        return (first_grad(g) ** 2).sum()

    g2 = jax.grad(loss)(grid0)  # grad of grad — needs grad² of grid_sample
    assert np.all(np.isfinite(np.asarray(g2)))

    eps = 1e-3
    fd = np.zeros_like(np.asarray(grid0))
    l0 = float(loss(grid0))
    for i in range(grid0.shape[1]):
        for j in range(2):
            gp = grid0.at[0, i, j].add(eps)
            gm = grid0.at[0, i, j].add(-eps)
            fd[0, i, j] = (float(loss(gp)) - float(loss(gm))) / (2 * eps)
    # bilinear interp is piecewise-linear in grid; within a cell the second
    # derivative of the sample is 0 along each axis but cross terms survive.
    np.testing.assert_allclose(np.asarray(g2), fd, atol=1e-2, rtol=1e-2)
    assert np.isfinite(l0)


def test_grid_sample_2d_packed_matches_unpacked():
    """The pack-2x2 one-gather path must reproduce grid_sample_2d exactly,
    including zero padding at every out-of-bounds corner combination, and its
    gradients (features and grid) must match."""
    from triplaneturbo_tpu.ops.grid_sample import grid_sample_2d_packed, pack_2x2

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, 7, 5, 6))
    # in-bounds, straddling every border, and fully outside
    grid = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 2), minval=-1, maxval=1),
            jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 2), minval=-1.4, maxval=1.4),
            jnp.asarray([[[-3.0, 0.2], [3.0, 0.2], [0.2, -3.0], [0.2, 3.0]]] * 2),
        ],
        axis=1,
    )
    ref = grid_sample_2d(feats, grid)
    out = grid_sample_2d_packed(pack_2x2(feats), grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    cot = jax.random.normal(jax.random.PRNGKey(3), ref.shape)
    gf_ref, gg_ref = jax.grad(
        lambda f, g: jnp.sum(grid_sample_2d(f, g) * cot), argnums=(0, 1)
    )(feats, grid)
    gf, gg = jax.grad(
        lambda f, g: jnp.sum(grid_sample_2d_packed(pack_2x2(f), g) * cot),
        argnums=(0, 1),
    )(feats, grid)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref), rtol=1e-5, atol=1e-5)
