"""Differentiable marching-tetrahedra extraction: geometry, topology,
orientation and gradient checks (replaces diso DiffMC, SURVEY §2.6 #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.ops.isosurface import (
    ExtractedMesh,
    force_field_crossing,
    marching_tets,
)

R = 24
CAP_V, CAP_F = 8192, 16384


def sphere_sdf(r=0.3, center=0.5):
    g = np.stack(np.meshgrid(*[np.arange(R)] * 3, indexing="ij"), axis=-1) / (R - 1)
    return (np.linalg.norm(g - center, axis=-1) - r).astype(np.float32)


def _np_mesh(m: ExtractedMesh):
    v = np.asarray(m.verts)
    f = np.asarray(m.faces)[np.asarray(m.face_mask)]
    vm = np.asarray(m.vert_mask)
    return v, f, vm


def test_sphere_surface_accuracy():
    sdf = sphere_sdf()
    m = marching_tets(jnp.asarray(sdf), max_verts=CAP_V, max_faces=CAP_F)
    v, f, vm = _np_mesh(m)
    assert int(m.n_verts) > 100 and int(m.n_faces) > 100
    used = v[vm]
    r = np.linalg.norm(used - 0.5, axis=-1)
    # vertices lie on the isosurface up to linear-interp error ~ (1/R)^2
    assert np.abs(r - 0.3).max() < 2.0 / R**2 + 5e-3


def test_sphere_topology_closed():
    sdf = sphere_sdf()
    m = marching_tets(jnp.asarray(sdf), max_verts=CAP_V, max_faces=CAP_F)
    _, f, vm = _np_mesh(m)
    # all face vertex refs must be valid vertices
    assert vm[f.reshape(-1)].all()
    # Euler characteristic of a sphere: V - E + F = 2
    V = int(np.asarray(m.n_verts))
    # count used verts only (all referenced)
    used_ids = np.unique(f.reshape(-1))
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    edges = np.sort(edges, axis=1)
    E = len(np.unique(edges, axis=0))
    F = len(f)
    assert len(used_ids) == V
    assert len(used_ids) - E + F == 2
    # closed manifold: every edge shared by exactly 2 faces
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_sphere_winding_outward():
    sdf = sphere_sdf()
    m = marching_tets(jnp.asarray(sdf), max_verts=CAP_V, max_faces=CAP_F)
    v, f, _ = _np_mesh(m)
    p0, p1, p2 = v[f[:, 0]] - 0.5, v[f[:, 1]] - 0.5, v[f[:, 2]] - 0.5
    # signed volume: positive iff normals point outward
    vol = np.sum(np.einsum("ij,ij->i", np.cross(p0, p1), p2)) / 6.0
    expected = 4.0 / 3.0 * np.pi * 0.3**3
    assert vol > 0
    np.testing.assert_allclose(vol, expected, rtol=0.05)


def test_gradient_flows_to_sdf_and_deformation():
    sdf = jnp.asarray(sphere_sdf())

    def mean_radius(s):
        m = marching_tets(s, max_verts=CAP_V, max_faces=CAP_F)
        r = jnp.linalg.norm(m.verts - 0.5, axis=-1)
        return (r * m.vert_mask).sum() / m.vert_mask.sum()

    g = jax.grad(mean_radius)(sdf)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

    # growing the SDF (more negative inside) should grow the radius:
    # d(mean_radius)/d(uniform sdf shift) < 0
    shift_grad = float(jnp.sum(g))
    assert shift_grad < 0

    def mean_radius_deformed(d):
        m = marching_tets(sdf, deformation=d, max_verts=CAP_V, max_faces=CAP_F)
        r = jnp.linalg.norm(m.verts - 0.5, axis=-1)
        return (r * m.vert_mask).sum() / m.vert_mask.sum()

    gd = jax.grad(mean_radius_deformed)(jnp.zeros((R, R, R, 3)))
    assert np.isfinite(np.asarray(gd)).all()
    assert np.abs(np.asarray(gd)).sum() > 0


def test_capacity_overflow_is_safe():
    sdf = sphere_sdf()
    m = marching_tets(jnp.asarray(sdf), max_verts=64, max_faces=64)
    v, f, vm = _np_mesh(m)
    assert int(m.n_verts) == 64 and int(m.n_faces) == 64
    assert np.isfinite(v).all()
    assert (f >= 0).all() and (f < 64).all()


def test_jit_and_vmap():
    sdf = jnp.asarray(sphere_sdf())
    fn = jax.jit(lambda s: marching_tets(s, max_verts=CAP_V, max_faces=CAP_F))
    m = fn(sdf)
    assert int(m.n_verts) > 0
    batched = jax.vmap(lambda s: marching_tets(s, max_verts=CAP_V, max_faces=CAP_F))(
        jnp.stack([sdf, sdf + 0.05])
    )
    assert batched.verts.shape[0] == 2


def test_force_field_crossing():
    # all-positive field gets a center blob; field with crossing is untouched
    allpos = jnp.ones((R, R, R)) * 0.7
    fixed = force_field_crossing(allpos, R)
    assert float(fixed.min()) < 0 and float(fixed.max()) > 0
    sdf = jnp.asarray(sphere_sdf())
    np.testing.assert_allclose(np.asarray(force_field_crossing(sdf, R)), np.asarray(sdf))
    m = marching_tets(fixed, max_verts=CAP_V, max_faces=CAP_F)
    assert int(m.n_faces) > 0


def test_mc_sphere_accuracy_topology_winding():
    """marching_cubes: same sphere checks as MT (accuracy, closed, outward)."""
    from triplaneturbo_tpu.ops.isosurface import marching_cubes

    sdf = sphere_sdf()
    m = marching_cubes(jnp.asarray(sdf), max_verts=CAP_V, max_faces=CAP_F)
    v, f, vm = _np_mesh(m)
    assert int(m.n_verts) > 100 and int(m.n_faces) > 100
    r = np.linalg.norm(v[vm] - 0.5, axis=-1)
    assert np.abs(r - 0.3).max() < 2.0 / R**2 + 5e-3
    # closed manifold + sphere Euler characteristic
    used_ids = np.unique(f.reshape(-1))
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    assert len(used_ids) - len(uniq) + len(f) == 2
    # outward winding, volume ~ 4/3 pi r^3
    p0, p1, p2 = v[f[:, 0]] - 0.5, v[f[:, 1]] - 0.5, v[f[:, 2]] - 0.5
    vol = np.sum(np.einsum("ij,ij->i", np.cross(p0, p1), p2)) / 6.0
    assert vol > 0
    np.testing.assert_allclose(vol, 4.0 / 3.0 * np.pi * 0.3**3, rtol=0.05)
    # MC produces fewer verts than MT at equal resolution
    mt = marching_tets(jnp.asarray(sdf), max_verts=CAP_V, max_faces=CAP_F)
    assert int(m.n_verts) < int(mt.n_verts)


def test_mc_random_field_watertight():
    """Random smooth field: every edge shared by exactly 2 faces — catches any
    inconsistent ambiguous-face pairing between neighboring cells."""
    from triplaneturbo_tpu.ops.isosurface import marching_cubes

    rng = np.random.RandomState(11)
    # smooth random field, positive at the border so surfaces are closed
    field = rng.randn(6, 6, 6)
    sdf = np.kron(field, np.ones((4, 4, 4)))[: R, : R, : R]
    # cheap smoothing: average neighbors a few times
    for _ in range(2):
        sdf = (
            sdf
            + np.roll(sdf, 1, 0) + np.roll(sdf, -1, 0)
            + np.roll(sdf, 1, 1) + np.roll(sdf, -1, 1)
            + np.roll(sdf, 1, 2) + np.roll(sdf, -1, 2)
        ) / 7.0
    sdf[0, :, :] = sdf[-1, :, :] = 1.0
    sdf[:, 0, :] = sdf[:, -1, :] = 1.0
    sdf[:, :, 0] = sdf[:, :, -1] = 1.0
    # generous capacities: a truncated mesh is legal but not watertight
    m = marching_cubes(jnp.asarray(sdf.astype(np.float32)), max_verts=4 * CAP_V, max_faces=4 * CAP_F)
    v, f, vm = _np_mesh(m)
    assert len(f) > 50
    assert vm[f.reshape(-1)].all()
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_mc_gradients():
    from triplaneturbo_tpu.ops.isosurface import marching_cubes

    sdf = jnp.asarray(sphere_sdf())

    def mean_radius(s):
        m = marching_cubes(s, max_verts=CAP_V, max_faces=CAP_F)
        r = jnp.linalg.norm(m.verts - 0.5, axis=-1)
        return (r * m.vert_mask).sum() / m.vert_mask.sum()

    g = jax.grad(mean_radius)(sdf)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.sum(g)) < 0

    def mean_radius_deformed(d):
        m = marching_cubes(sdf, deformation=d, max_verts=CAP_V, max_faces=CAP_F)
        r = jnp.linalg.norm(m.verts - 0.5, axis=-1)
        return (r * m.vert_mask).sum() / m.vert_mask.sum()

    gd = jax.grad(mean_radius_deformed)(jnp.zeros((R, R, R, 3)))
    assert np.isfinite(np.asarray(gd)).all() and np.abs(np.asarray(gd)).sum() > 0
