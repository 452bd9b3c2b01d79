"""Mesh rasterize renderer end-to-end on a tiny triplane field."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.models.geometry.triplane_field import (
    TriplaneField,
    TriplaneFieldConfig,
)
from triplaneturbo_tpu.models.renderers.rasterize_renderer import (
    GenerativeSpaceMeshRasterizeRenderer,
    RasterizeRendererConfig,
)
from triplaneturbo_tpu.models.networks import get_activation
from triplaneturbo_tpu.utils.camera import (
    camera_to_world,
    get_mvp_matrix,
    get_projection_matrix,
    get_ray_directions,
    get_rays,
)


def test_rasterize_renderer_forward_and_grad():
    cfg = TriplaneFieldConfig(input_dim=8)
    field = TriplaneField(cfg)
    cache = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16, 16, 8)) * 0.05
    pts = jnp.zeros((1, 8, 3))
    params = field.init(jax.random.PRNGKey(0), pts, cache, method=field.init_all)

    B = 2  # two views of one space cache
    elev = jnp.asarray([0.3, 0.0])
    azim = jnp.asarray([0.0, jnp.pi / 2])
    dist = jnp.asarray([2.5, 2.5])
    c2w = camera_to_world(elev, azim, dist)
    fovy = jnp.full((B,), jnp.deg2rad(40.0))
    proj = get_projection_matrix(fovy, 1.0, 0.1, 100.0)
    mvp = get_mvp_matrix(c2w, proj)
    cam_pos = c2w[:, :3, 3]
    dirs = get_ray_directions(32, 32, fovy)
    _, rays_d = get_rays(dirs, c2w)

    renderer = GenerativeSpaceMeshRasterizeRenderer(
        RasterizeRendererConfig(
            isosurface_resolution=24, max_verts=8192, max_faces=16384,
            field_chunk=4096, tile=16, faces_per_tile=256,
        )
    )
    act = get_activation("sigmoid-mipnerf")

    def run(cache_in):
        def forward_field(p, sc):
            return field.apply(params, p, sc, method=field.forward_field)

        def export_fn(p, sc):
            return field.apply(params, p, sc, method=field.export)["features"]

        out = renderer(
            mvp, cam_pos, cache_in, forward_field, export_fn,
            material_fn=act,
            background_fn=lambda d, te: jnp.ones(d.shape[:-1] + (3,)),
            height=32, width=32,
            rays_d_rasterize=rays_d,
            camera_distances=dist, c2w=c2w,
        )
        return out

    out = run(cache)
    assert out["comp_rgb"].shape == (2, 32, 32, 3)
    assert out["opacity"].shape == (2, 32, 32, 1)
    op = np.asarray(out["opacity"])
    # sphere-bias field at tiny init -> a blob covering the image center
    assert op[0, 16, 16, 0] > 0.5
    assert op[0, 0, 0, 0] < 0.5
    assert 0.0 <= float(out["disparity"].min()) and float(out["disparity"].max()) <= 1.0
    n = np.asarray(out["comp_normal_cam_vis"])
    assert n.shape == (2, 32, 32, 3) and np.isfinite(n).all()

    # gradient flows back to the space cache through rgb (texture path)
    def loss(c_):
        return (run(c_)["comp_rgb"] ** 2).sum()

    g = jax.grad(loss)(cache)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_rasterize_renderer_field_chunk_equivalence():
    """Chunked per-pixel feature eval (field_chunk) is a pure memory knob:
    outputs and space-cache gradients match the fused evaluation."""
    cfg = TriplaneFieldConfig(input_dim=8)
    field = TriplaneField(cfg)
    cache = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16, 16, 8)) * 0.05
    pts = jnp.zeros((1, 8, 3))
    params = field.init(jax.random.PRNGKey(0), pts, cache, method=field.init_all)

    B = 2
    elev = jnp.asarray([0.3, 0.0])
    azim = jnp.asarray([0.0, jnp.pi / 2])
    dist = jnp.asarray([2.5, 2.5])
    c2w = camera_to_world(elev, azim, dist)
    fovy = jnp.full((B,), jnp.deg2rad(40.0))
    mvp = get_mvp_matrix(c2w, get_projection_matrix(fovy, 1.0, 0.1, 100.0))
    cam_pos = c2w[:, :3, 3]
    dirs = get_ray_directions(32, 32, fovy)
    _, rays_d = get_rays(dirs, c2w)

    def run(chunk, cache_in):
        renderer = GenerativeSpaceMeshRasterizeRenderer(
            RasterizeRendererConfig(
                isosurface_resolution=24, max_verts=8192, max_faces=16384,
                field_chunk=chunk, tile=16, faces_per_tile=256,
            )
        )

        def forward_field(p, sc):
            return field.apply(params, p, sc, method=field.forward_field)

        def export_fn(p, sc):
            return field.apply(params, p, sc, method=field.export)["features"]

        return renderer(
            mvp, cam_pos, cache_in, forward_field, export_fn,
            material_fn=get_activation("sigmoid-mipnerf"),
            background_fn=lambda d, te: jnp.ones(d.shape[:-1] + (3,)),
            height=32, width=32, rays_d_rasterize=rays_d,
            camera_distances=dist, c2w=c2w,
        )

    # 2 views x 32x32 = 2048 pts; chunk 300 exercises pad + 7 chunks
    out_full = run(4096, cache)
    out_chunk = run(300, cache)
    for k in ("comp_rgb", "opacity", "comp_normal"):
        np.testing.assert_allclose(
            np.asarray(out_full[k]), np.asarray(out_chunk[k]), atol=1e-5, err_msg=k
        )

    g_full = jax.grad(lambda c_: (run(4096, c_)["comp_rgb"] ** 2).sum())(cache)
    g_chunk = jax.grad(lambda c_: (run(300, c_)["comp_rgb"] ** 2).sum())(cache)
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(g_chunk), rtol=1e-4, atol=1e-6
    )
