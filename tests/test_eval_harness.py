"""Eval harness: mesh turntable renders + CLIP scoring pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.evaluation import CLIPScorer, render_mesh_views
from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from triplaneturbo_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
from triplaneturbo_tpu.ops.isosurface import marching_tets
from triplaneturbo_tpu.utils.mesh import Mesh


def sphere_mesh(R=20):
    g = np.stack(np.meshgrid(*[np.linspace(0, 1, R)] * 3, indexing="ij"), -1)
    sdf = jnp.asarray((np.linalg.norm(g - 0.5, axis=-1) - 0.3).astype(np.float32))
    m = marching_tets(sdf, max_verts=4096, max_faces=8192)
    return Mesh(
        v_pos=m.verts * 2 - 1, t_pos_idx=m.faces, v_mask=m.vert_mask, t_mask=m.face_mask,
        v_rgb=jnp.ones((4096, 3)) * jnp.asarray([0.9, 0.2, 0.2]),
    )


def test_render_mesh_views():
    mesh = sphere_mesh()
    views = render_mesh_views(mesh, n_views=4, height=64, width=64)
    assert views.shape == (4, 64, 64, 3)
    v = np.asarray(views)
    # center shows the red sphere, corner shows white bg
    assert v[0, 32, 32, 0] > 0.3 and v[0, 32, 32, 0] > v[0, 32, 32, 1]
    np.testing.assert_allclose(v[0, 2, 2], [1, 1, 1], atol=0.02)


def test_clip_scorer_pipeline():
    scorer = CLIPScorer(
        vision=CLIPVisionEncoder(CLIPVisionConfig(image_size=64, patch_size=16, width=64, layers=2, heads=4, intermediate=128, projection_dim=32)),
        text=CLIPTextEncoder(CLIPTextConfig(width=32, layers=2, heads=4, intermediate=64)),
    )
    key = jax.random.PRNGKey(0)
    imgs = {
        "a red sphere": jax.random.uniform(key, (2, 64, 64, 3)),
        "a blue cube": jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 64, 3)),
    }
    out = scorer.score(imgs)
    assert set(out) == {"clip_score", "recall_at_1"}
    assert 0.0 <= out["clip_score"] <= 2.5
    assert out["recall_at_1"] in (0.0, 0.5, 1.0)


def test_obj_mtl_export(tmp_path):
    import numpy as np
    from triplaneturbo_tpu.models.exporters.mesh_exporter import (
        MeshExporterConfig,
        MultipromptMeshExporter,
    )

    mesh = sphere_mesh()
    exporter = MultipromptMeshExporter(MeshExporterConfig(fmt="obj-mtl"))

    def color_fn(pos):
        return np.stack([np.clip(pos[:, 0] + 0.5, 0, 1), np.full(len(pos), 0.3), np.full(len(pos), 0.3)], -1)

    paths = exporter([mesh], str(tmp_path), ["sphere"], color_fns=[color_fn])
    import os
    assert os.path.exists(paths[0])
    d = os.path.dirname(paths[0])
    assert os.path.exists(os.path.join(d, "model.mtl"))
    assert os.path.exists(os.path.join(d, "texture_kd.png"))
    txt = open(paths[0]).read()
    assert "vt " in txt and "mtllib" in txt
    # faces reference uv indices
    assert "/" in txt.split("\nf ")[1]


def test_kire_rig_silhouette_bbox():
    """Lock the eval camera rig: rasterized silhouette bbox of a known cube
    must match the analytically projected corners (kire parameters: radius 3,
    fovy 50deg, elevation -15deg, front +y, load-normalize bound 0.9 —
    reference mesh_visualize.py:38-41 + kiuikit render.py defaults)."""
    from triplaneturbo_tpu.evaluation.mesh_render import (
        kire_camera_rig,
        kire_normalize_mesh,
    )

    # cube with arbitrary size/offset: normalization must cancel both
    corners = np.array(
        [[x, y, z] for x in (0, 4.0) for y in (1.0, 5.0) for z in (-2.0, 2.0)],
        np.float32,
    )
    tris = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y faces
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z faces
        ],
        np.int32,
    )
    v = kire_normalize_mesh(jnp.asarray(corners))
    np.testing.assert_allclose(np.abs(np.asarray(v)).max(), 0.9, atol=1e-6)

    mesh = Mesh(v_pos=v, t_pos_idx=jnp.asarray(tris))
    H = W = 256
    views = render_mesh_views(mesh, n_views=4, height=H, width=W)
    mvp = np.asarray(kire_camera_rig(4))

    for view in range(4):
        # analytic: project the 8 corners, take the NDC bbox (the MVP's y row
        # is pre-negated, threestudio/utils/ops.py:346-365 convention — NDC y
        # maps directly to image rows, see ops/rasterize.py docstring)
        vh = np.concatenate([np.asarray(v), np.ones((8, 1), np.float32)], axis=1)
        clip = vh @ mvp[view].T
        ndc = clip[:, :2] / clip[:, 3:4]
        px = (ndc[:, 0] * 0.5 + 0.5) * W
        py = (ndc[:, 1] * 0.5 + 0.5) * H
        expect = np.array(
            [
                np.clip(px.min(), 0, W), np.clip(px.max(), 0, W),
                np.clip(py.min(), 0, H), np.clip(py.max(), 0, H),
            ]
        )

        sil = np.asarray(views[view]).sum(-1) < 2.999  # non-white pixels
        assert sil.any(), f"view {view}: empty silhouette"
        ys, xs = np.nonzero(sil)
        got = np.array([xs.min(), xs.max() + 1, ys.min(), ys.max() + 1])
        np.testing.assert_allclose(got, expect, atol=2.5, err_msg=f"view {view}")

    # framing regression: kire frames tightly — a bound-0.9 cube at radius 3,
    # fovy 50 deg nearly fills the frame (~0.80 measured; its corners reach
    # past the frustum). Locks radius/fovy/bound against accidental change.
    occupancy = np.asarray(views).sum(-1) < 2.999
    frac = occupancy.mean()
    assert 0.70 < frac < 0.90, f"unexpected framing, occupancy {frac:.3f}"


def test_clip_scorer_msgpack_roundtrip(tmp_path):
    """from_msgpack restores exactly the towers convert_checkpoints.py saves
    (clip_scorer.msgpack layout: vision/text/text_projection)."""
    from flax import serialization

    from triplaneturbo_tpu.evaluation.clipscore import CLIPScorer

    src = CLIPScorer(seed=7)
    path = tmp_path / "clip_scorer.msgpack"
    with open(path, "wb") as f:
        f.write(
            serialization.to_bytes(
                {
                    "vision": src.vision_params,
                    "text": src.text_params,
                    "text_projection": jnp.asarray(src.text_projection),
                }
            )
        )
    dst = CLIPScorer.from_checkpoint(str(path), seed=0)  # different seed
    img = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(src.image_features(img)),
        np.asarray(dst.image_features(img)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(src.text_features(["a cat"])),
        np.asarray(dst.text_features(["a cat"])),
        atol=1e-6,
    )
