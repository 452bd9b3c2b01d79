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
