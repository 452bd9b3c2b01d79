"""Rendering stack: ray ops vs analytic references, volume renderer on an
analytic sphere SDF, patch renderer composition, hashgrid encoding."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.ops.hashgrid import HashGridConfig, HashGridEncoding
from triplaneturbo_tpu.ops.ray import (
    accumulate_along_rays,
    importance_sampling,
    neus_alpha,
    render_transmittance_from_density,
    render_weight_from_alpha,
    sample_pdf,
)
from triplaneturbo_tpu.models.renderers.patch_renderer import (
    PatchRenderer,
    PatchRendererConfig,
)
from triplaneturbo_tpu.models.renderers.volume_renderer import (
    GenerativeSpaceSDFVolumeRenderer,
    VolumeRendererConfig,
)
from triplaneturbo_tpu.utils.camera import camera_to_world, get_ray_directions, get_rays


def test_weights_sum_to_opacity_and_bounded():
    alpha = jnp.asarray([[0.5, 0.5, 0.5, 0.0], [1.0, 0.3, 0.0, 0.0]])
    w = render_weight_from_alpha(alpha)
    np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.25, 0.125, 0.0], atol=1e-6)
    # opaque first sample takes all weight
    np.testing.assert_allclose(np.asarray(w[1, 0]), 1.0, atol=1e-6)
    assert float(w.sum(-1).max()) <= 1.0 + 1e-5


def test_transmittance_matches_closed_form():
    t0 = jnp.asarray([[0.0, 1.0, 2.0]])
    t1 = jnp.asarray([[1.0, 2.0, 3.0]])
    sigma = jnp.asarray([[0.5, 0.5, 0.5]])
    T = render_transmittance_from_density(t0, t1, sigma)
    np.testing.assert_allclose(np.asarray(T[0]), [1.0, np.exp(-0.5), np.exp(-1.0)], atol=1e-6)


def test_sample_pdf_concentrates_on_high_density():
    # CDF with all mass in [0.5, 0.6]
    bins = jnp.asarray([[0.0, 0.5, 0.6, 1.0]])
    cdfs = jnp.asarray([[0.0, 0.05, 0.95, 1.0]])
    s = sample_pdf(bins, cdfs, 64)
    frac_inside = float(((s >= 0.5) & (s <= 0.6)).mean())
    assert frac_inside > 0.8


def test_importance_sampling_shapes_and_monotonicity():
    def prop_fn(t0, t1):
        mid = (t0 + t1) / 2
        return jnp.exp(-((mid - 2.0) ** 2) * 10.0) * 5.0  # density bump at t=2

    t0, t1 = importance_sampling(prop_fn, 7, 16, 32, 0.1, 4.0, key=jax.random.PRNGKey(0))
    assert t0.shape == (7, 16 + 32 + 1)
    assert np.all(np.asarray(t1 - t0) >= -1e-6)
    # samples concentrate near the bump
    mid = np.asarray((t0 + t1) / 2)
    assert (np.abs(mid - 2.0) < 0.5).mean() > 0.35


def _sphere_field(radius=0.5):
    def field_fn(points, with_normal):
        # points [B, M, 3]
        norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
        sdf = norm - radius
        out = {"sdf": sdf, "features": jnp.broadcast_to(
            jnp.asarray([1.0, 0.2, 0.2]), points.shape
        )}
        out["normal"] = points / jnp.maximum(norm, 1e-8)
        return out

    return field_fn


def _white_bg(dirs, text_embed=None):
    return jnp.ones_like(dirs)


def make_rays(B=1, H=24, W=24, dist=2.5):
    fovy = jnp.full((B,), jnp.deg2rad(40.0))
    dirs = get_ray_directions(H, W, fovy)
    c2w = camera_to_world(
        jnp.zeros((B,)), jnp.zeros((B,)), jnp.full((B,), dist)
    )
    return get_rays(dirs, c2w), c2w, jnp.full((B,), dist)


def test_volume_renderer_sphere():
    cfg = VolumeRendererConfig(num_samples_per_ray=48, num_samples_per_ray_importance=24)
    renderer = GenerativeSpaceSDFVolumeRenderer(cfg)
    (ro, rd), c2w, dists = make_rays()
    params = renderer.init(
        jax.random.PRNGKey(0), ro, rd, _sphere_field(), _white_bg,
        camera_distances=dists, c2w=c2w, train=False,
    )
    out = renderer.apply(
        params, ro, rd, _sphere_field(), _white_bg,
        camera_distances=dists, c2w=c2w, train=False,
    )
    H = ro.shape[1]
    op = np.asarray(out["opacity"])[0, :, :, 0]
    # center pixel hits the sphere (opaque), corner misses (transparent)
    assert op[H // 2, H // 2] > 0.95
    assert op[0, 0] < 0.05
    # depth at center ~ dist - radius
    d = np.asarray(out["depth"])[0, H // 2, H // 2, 0]
    assert abs(d - 2.0) < 0.1
    # center rgb ~ foreground color, corner ~ white bg
    rgb = np.asarray(out["comp_rgb"])[0]
    np.testing.assert_allclose(rgb[0, 0], [1, 1, 1], atol=0.05)
    np.testing.assert_allclose(rgb[H // 2, H // 2], [1.0, 0.2, 0.2], atol=0.1)
    # normals at center point toward camera (+x world for azimuth 0)
    n = np.asarray(out["comp_normal"])[0, H // 2, H // 2]
    assert n[0] > 0.9
    # disparity in [0, 1]
    assert 0.0 <= float(out["disparity"].min()) and float(out["disparity"].max()) <= 1.0


def test_patch_renderer_composes():
    cfg = VolumeRendererConfig(num_samples_per_ray=24, num_samples_per_ray_importance=12)
    base = GenerativeSpaceSDFVolumeRenderer(cfg)
    (ro, rd), c2w, dists = make_rays(H=36, W=36)
    params = base.init(
        jax.random.PRNGKey(0), ro, rd, _sphere_field(), _white_bg,
        camera_distances=dists, c2w=c2w, train=False,
    )

    def base_fn(ro_, rd_, key=None, train=True, **kw):
        return base.apply(
            params, ro_, rd_, _sphere_field(), _white_bg,
            camera_distances=dists, c2w=c2w, train=train, key=key,
        )

    pr = PatchRenderer(PatchRendererConfig(patch_size=12, global_downsample=3), base_fn)
    out = pr(ro, rd, key=jax.random.PRNGKey(1), train=True)
    assert out["comp_rgb"].shape == (1, 36, 36, 3)
    out_eval = pr(ro, rd, train=False)
    assert out_eval["comp_rgb"].shape == (1, 36, 36, 3)


def test_hashgrid_encoding():
    enc = HashGridEncoding(HashGridConfig(n_levels=4, log2_hashmap_size=10))
    x = jax.random.uniform(jax.random.PRNGKey(0), (128, 3))
    params = enc.init(jax.random.PRNGKey(1), x)
    out = enc.apply(params, x)
    assert out.shape == (128, 8)
    # deterministic + differentiable
    out2 = enc.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    g = jax.grad(lambda p: enc.apply(p, x).sum())(params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
    assert total > 0
    # continuity: nearby points give nearby encodings
    d = enc.apply(params, x + 1e-5) - out
    assert float(jnp.abs(d).max()) < 1e-3


def test_hashgrid_grad_modes_match_autodiff():
    """The custom VJP must equal plain autodiff through the gather+lerp
    forward (same forward, no custom_vjp). Mix of dense-indexed (coarse) and
    hashed (fine) levels, with heavy index collisions (N >> coarse table
    sizes)."""
    from triplaneturbo_tpu.ops.hashgrid import _encode_fwd_core, hashgrid_encode

    base = HashGridConfig(n_levels=5, log2_hashmap_size=10, base_resolution=2,
                          per_level_scale=2.0)
    T = 1 << base.log2_hashmap_size
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (4096, 3))
    table = jax.random.normal(jax.random.PRNGKey(4),
                              (base.n_levels, T, base.n_features_per_level))
    cot = jax.random.normal(jax.random.PRNGKey(5),
                            (4096, base.n_output_dims))

    def ref_loss(t, xx):
        return jnp.sum(_encode_fwd_core(t.reshape(-1, t.shape[-1]), xx, base) * cot)

    g_ref_t, g_ref_x = jax.grad(ref_loss, argnums=(0, 1))(table, x)

    out = hashgrid_encode(table, x, base)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_encode_fwd_core(
            table.reshape(-1, table.shape[-1]), x, base)), rtol=1e-6)
    g_t, g_x = jax.grad(
        lambda t, xx: jnp.sum(hashgrid_encode(t, xx, base) * cot),
        argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_ref_t),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref_x),
                               rtol=2e-4, atol=2e-4)


def test_hashgrid_dense_levels_are_collision_free():
    """Levels whose (res+1)^3 fits the table must use dense indexing (tcnn
    grid_index parity): two distinct coarse cells never share a row."""
    from triplaneturbo_tpu.ops.hashgrid import _level_indices_weights

    res, T = 4, 1 << 19
    grid = jnp.stack(jnp.meshgrid(*[jnp.linspace(0.05, 0.95, res)] * 3,
                                  indexing="ij"), -1).reshape(-1, 3)
    idx, _ = _level_indices_weights(grid, res, T, dense=True)
    # all 8 corners of all cells, deduped, must count (res+1)^3 distinct rows
    assert len(np.unique(np.asarray(idx))) == (res + 1) ** 3


def test_volume_renderer_field_chunk_equivalence():
    """field_chunk (lax.map + per-chunk remat over ray samples) must be a pure
    memory knob: outputs and gradients identical to the fused evaluation."""
    (ro, rd), c2w, dists = make_rays()
    cfg0 = VolumeRendererConfig(
        num_samples_per_ray=16, num_samples_per_ray_importance=8, randomized=False
    )
    cfg1 = VolumeRendererConfig(
        num_samples_per_ray=16, num_samples_per_ray_importance=8, randomized=False,
        field_chunk=100,  # H*W*S = 1024 samples/view -> 11 chunks incl. pad
    )
    r0 = GenerativeSpaceSDFVolumeRenderer(cfg0)
    r1 = GenerativeSpaceSDFVolumeRenderer(cfg1)
    params = r0.init(
        jax.random.PRNGKey(0), ro, rd, _sphere_field(), _white_bg,
        camera_distances=dists, c2w=c2w, train=False,
    )

    def render(r, shift):
        def field(pts, with_normal=True):
            out = _sphere_field()(pts + shift, with_normal)
            return out
        return r.apply(
            params, ro, rd, field, _white_bg,
            camera_distances=dists, c2w=c2w, train=True, key=jax.random.PRNGKey(1),
        )

    out0 = render(r0, jnp.zeros(3))
    out1 = render(r1, jnp.zeros(3))
    for k in ("comp_rgb", "opacity", "depth", "comp_normal"):
        np.testing.assert_allclose(
            np.asarray(out0[k]), np.asarray(out1[k]), atol=1e-5, err_msg=k
        )

    # gradient equivalence through the chunked remat
    def loss(shift, r):
        return render(r, shift)["comp_rgb"].sum()

    g0 = jax.grad(loss)(jnp.zeros(3), r0)
    g1 = jax.grad(loss)(jnp.zeros(3), r1)
    # atol scaled to the gradient magnitude (~2e2): the y/z components are a
    # symmetric zero realized as accumulation-order noise
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=5e-4)


def test_volume_renderer_backward_finite_with_degenerate_geometry():
    """The two r5 NaN traps of the volume branch (diagnose_nan --stage grads
    on chip): (a) eikonal's norm backward at EXACTLY-zero sdf gradients (the
    analytic gradient vanishes identically outside the contracted box), and
    (b) comp_normal's 0/0 normalize backward on empty rays (all-zero
    accumulated weights at random init). Both must yield finite grads."""
    cfg = VolumeRendererConfig(num_samples_per_ray=16, num_samples_per_ray_importance=8)
    renderer = GenerativeSpaceSDFVolumeRenderer(cfg)
    (ro, rd), c2w, dists = make_rays(H=8, W=8, dist=4.0)

    def make_field(shift):
        def field_fn(points, with_normal):
            # sdf > 0 everywhere (rays hit nothing -> empty rays), and the
            # sdf gradient is EXACTLY zero outside a small box
            inside = (jnp.abs(points) < 0.3).all(-1, keepdims=True)
            sdf = jnp.where(inside, 0.5 + shift * points[..., :1], 0.8 + 0 * points[..., :1])
            out = {
                "sdf": sdf,
                "features": jnp.broadcast_to(jnp.asarray([1.0, 0.2, 0.2]), points.shape) * (1 + shift),
                "normal": jnp.zeros_like(points),
                "sdf_grad": jnp.where(inside, shift * jnp.ones_like(points), jnp.zeros_like(points)),
            }
            return out

        return field_fn

    params = renderer.init(
        jax.random.PRNGKey(0), ro, rd, make_field(jnp.zeros(())), _white_bg,
        camera_distances=dists, c2w=c2w, train=False,
    )

    def loss(shift):
        out = renderer.apply(
            params, ro, rd, make_field(shift), _white_bg,
            camera_distances=dists, c2w=c2w, train=False,
        )
        return (
            out["eikonal"]
            + out["comp_normal"].sum()
            + out["comp_normal_cam_vis"].sum()
            + out["comp_rgb"].sum()
        )

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(float(g)), f"gradient is {g}"
