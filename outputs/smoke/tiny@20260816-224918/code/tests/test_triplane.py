"""Triplane rotation/projection/sampling parity against a torch
re-implementation of the reference semantics
(/root/reference/triplaneturbo_executable/utils/general_utils.py:62-110,
models/geometry/sd_dual_triplanes.py:213-250)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from triplaneturbo_tpu.ops.triplane import (
    contract_to_unisphere,
    project_onto_planes,
    rotate_planes,
    sample_from_planes,
)

# torch reference pieces (reimplemented from the reference's documented
# behavior for the purpose of this parity test)
_PLANES = torch.tensor(
    [
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[0, 0, 1], [0, 1, 0], [1, 0, 0]],
    ],
    dtype=torch.float32,
)


def _torch_project(coords):
    N, M, _ = coords.shape
    n_planes = 3
    c = coords.unsqueeze(1).expand(-1, n_planes, -1, -1).reshape(N * n_planes, M, 3)
    inv = torch.linalg.inv(_PLANES).unsqueeze(0).expand(N, -1, -1, -1).reshape(N * n_planes, 3, 3)
    return torch.bmm(c, inv)[..., :2]


def _torch_sample_from_planes(plane_feats_nchw, coords, interpolate_feat, box_warp=2.0):
    N, n_planes, C, H, W = plane_feats_nchw.shape
    _, M, _ = coords.shape
    pf = plane_feats_nchw.reshape(N * n_planes, C, H, W)
    coords = (2.0 / box_warp) * coords
    proj = _torch_project(coords).unsqueeze(1)
    out = F.grid_sample(pf, proj.float(), mode="bilinear", padding_mode="zeros", align_corners=False)
    out = out.permute(0, 3, 2, 1).reshape(N, n_planes, M, C)
    if interpolate_feat in (None, "v1"):
        return out.sum(dim=1)
    return out.permute(0, 2, 1, 3).reshape(N, M, n_planes * C)


def test_projection_matches_inverse_plane_bmm():
    rng = np.random.RandomState(0)
    coords = rng.randn(2, 11, 3).astype(np.float32)
    ours = project_onto_planes(jnp.asarray(coords))  # [N, M, 3, 2]
    ref = _torch_project(torch.from_numpy(coords)).reshape(2, 3, 11, 2).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def _np_rot_v1(sc_nchw):
    """Reference rotate_planes v1 on [B, 6, C, H, W] torch tensors."""
    out = torch.zeros_like(sc_nchw)
    out[:, 0::3] = torch.transpose(sc_nchw[:, 0::3], 3, 4)
    out[:, 1::3] = torch.rot90(sc_nchw[:, 1::3], k=2, dims=(3, 4))
    out[:, 2::3] = torch.rot90(sc_nchw[:, 2::3], k=-1, dims=(3, 4))
    return out


def _np_rot_v2(sc_nchw):
    out = torch.zeros_like(sc_nchw)
    out[:, 0::3] = torch.flip(sc_nchw[:, 0::3], dims=(4,))
    out[:, 1::3] = torch.rot90(sc_nchw[:, 1::3], k=2, dims=(3, 4))
    out[:, 2::3] = torch.rot90(sc_nchw[:, 2::3], k=-1, dims=(3, 4))
    return out


def test_rotate_planes_v1_v2_match_reference():
    rng = np.random.RandomState(1)
    sc = rng.randn(2, 6, 4, 5, 5).astype(np.float32)  # B, P, C, H, W (torch layout)
    t = torch.from_numpy(sc)
    ours_in = jnp.asarray(np.moveaxis(sc, 2, -1))  # -> B, P, H, W, C
    for mode, ref_fn in [("v1", _np_rot_v1), ("v2", _np_rot_v2)]:
        ours = rotate_planes(ours_in, mode)
        ref = ref_fn(t).numpy()
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(ref, 2, -1), atol=1e-6, err_msg=mode
        )


def test_sample_from_planes_v1_v2():
    rng = np.random.RandomState(2)
    N, C, H, W, M = 2, 8, 16, 16, 50
    pf = rng.randn(N, 3, C, H, W).astype(np.float32)
    coords = rng.uniform(-1, 1, size=(N, M, 3)).astype(np.float32)

    pf_jax = jnp.asarray(np.moveaxis(pf, 2, -1))
    for mode in ["v1", "v2"]:
        ours = sample_from_planes(pf_jax, jnp.asarray(coords), interpolate_feat=mode)
        ref = _torch_sample_from_planes(torch.from_numpy(pf), torch.from_numpy(coords), mode)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, err_msg=mode)


def test_contract_to_unisphere_bounded():
    bbox = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, 0.5]])
    out = contract_to_unisphere(pts, bbox)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)
    # non-unit bbox rescales
    bbox2 = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    out2 = contract_to_unisphere(pts, bbox2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(pts) / 2, atol=1e-6)


def test_quaplane_and_hplane_variants():
    import jax
    from triplaneturbo_tpu.ops.triplane import sample_from_hplanes, sample_from_quaplanes

    key = jax.random.PRNGKey(5)
    qp = jax.random.normal(key, (2, 4, 8, 8, 3))
    hp = jax.random.normal(key, (2, 3, 8, 8, 3))
    pts = jax.random.uniform(jax.random.fold_in(key, 1), (2, 17, 3), minval=-0.9, maxval=0.9)
    out_q = sample_from_quaplanes(qp, pts, "v1")
    assert out_q.shape == (2, 17, 9)
    out_qn = sample_from_quaplanes(qp, pts, None)
    assert out_qn.shape == (2, 17, 9)
    # hard-select and alpha agree at |x| -> 1
    pts_front = pts.at[..., 0].set(0.999)
    np.testing.assert_allclose(
        np.asarray(sample_from_quaplanes(qp, pts_front, None)),
        np.asarray(sample_from_quaplanes(qp, pts_front, "v1")),
        atol=1e-2,
    )
    for mode, ch in [(None, 6), ("v1", 6), ("v2", 9), ("v3", 9), ("v4", 3), ("v5", 3), ("v6", 2), ("v7", 2)]:
        out_h = sample_from_hplanes(hp, pts, mode)
        assert out_h.shape == (2, 17, ch), mode


def _torch_sample_from_hplanes(pf_nchw, coords, mode, box_warp=2.0):
    """Torch mirror of the reference Hplane sampler semantics
    (geometry/utils.py:213-362): projections (x,z), (z,y), (z,y)."""
    N, n_planes, C, H, W = pf_nchw.shape
    _, M, _ = coords.shape
    pf = pf_nchw.reshape(N * n_planes, C, H, W)
    c = (2.0 / box_warp) * coords
    x = c[..., 0:1]
    projs = torch.stack(
        [
            torch.cat([c[..., 0:1], c[..., 2:3]], -1),
            torch.cat([c[..., 2:3], c[..., 1:2]], -1),
            torch.cat([c[..., 2:3], c[..., 1:2]], -1),
        ],
        dim=1,
    ).reshape(N * n_planes, 1, M, 2)
    out = F.grid_sample(pf, projs, mode="bilinear", padding_mode="zeros", align_corners=False)
    out = out.permute(0, 3, 2, 1).reshape(N, n_planes, M, C)
    side, front, back = out[:, 0], out[:, 1], out[:, 2]

    def trapezoid(thres):
        a_hi = 1 - (x - thres) / (1 - thres)
        a_lo = (x + 1) / (thres + 1)
        return torch.where(x > thres, a_hi, a_lo)

    if mode == "v4":
        return side + front * trapezoid(0.5) + back * trapezoid(-0.5)
    if mode == "v5":
        return side + front * (0.5 + 0.5 * x) + back * (0.5 - 0.5 * x)
    if mode == "v6":
        alpha = torch.sigmoid(out[..., -1:])
        return (out[..., :-1] * alpha).sum(dim=1)
    if mode == "v7":
        bias = torch.cat([torch.zeros_like(x), 0.5 + 0.5 * x, 0.5 - 0.5 * x], -1)
        alpha = torch.sigmoid(out[..., -1:]) + bias.permute(0, 2, 1).unsqueeze(-1)
        return (out[..., :-1] * alpha).sum(dim=1)
    raise ValueError(mode)


def test_hplane_v4_to_v7_torch_parity():
    from triplaneturbo_tpu.ops.triplane import sample_from_hplanes

    rng = np.random.RandomState(7)
    N, C, H, W, M = 2, 5, 12, 12, 33
    pf = rng.randn(N, 3, C, H, W).astype(np.float32)
    coords = rng.uniform(-0.95, 0.95, size=(N, M, 3)).astype(np.float32)
    pf_jax = jnp.asarray(np.moveaxis(pf, 2, -1))
    for mode in ["v4", "v5", "v6", "v7"]:
        ours = sample_from_hplanes(pf_jax, jnp.asarray(coords), mode)
        ref = _torch_sample_from_hplanes(torch.from_numpy(pf), torch.from_numpy(coords), mode)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, err_msg=mode)


def test_chunk_batch_and_ops():
    import jax
    from triplaneturbo_tpu.utils.ops import binary_cross_entropy, chunk_batch, perpendicular_component, specify_gradient

    x = jnp.arange(10.0).reshape(10, 1)
    out = chunk_batch(lambda a: a * 2, 3, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x * 2))
    # bce of p against itself = entropy
    p = jnp.asarray([0.3, 0.7])
    assert float(binary_cross_entropy(p, p)) > 0
    a = jnp.asarray([[1.0, 1.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0, 0.0]])
    perp = perpendicular_component(a, b)
    np.testing.assert_allclose(np.asarray(perp), [[0.0, 1.0, 0.0]], atol=1e-6)
    # specify_gradient injects the given grad
    g = jax.grad(lambda z: specify_gradient(z, jnp.full_like(z, 2.0)))(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), [2.0, 2.0, 2.0])
