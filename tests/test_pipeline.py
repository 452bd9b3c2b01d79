"""End-to-end pipeline smoke test on a tiny model (CPU-sized): prompt ->
latents -> planes -> mesh -> OBJ, one jitted graph."""

import os

import jax
import numpy as np

import pytest

from triplaneturbo_tpu.pipelines.triplaneturbo_text_to_3d import (
    TriplaneTurboTextTo3DPipeline,
    export_obj,
)

pytestmark = pytest.mark.slow  # full-stack XLA compiles, minutes on 1-core CPU

TINY_SG = dict(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=32,
    attention_head_dim=8,
    vae_block_out_channels=(16, 32),
    vae_layers_per_block=1,
    output_dim=8,
    training_type="self_lora_rank_4-cross_lora_rank_4-locon_rank_4",
)


def tiny_pipeline():
    from triplaneturbo_tpu.models.clip_text import CLIPTextConfig

    return TriplaneTurboTextTo3DPipeline.from_pretrained(
        None,
        space_generator_overrides=TINY_SG,
        text_config=CLIPTextConfig(
            vocab_size=49408, width=32, layers=2, heads=4, intermediate=64, max_length=77
        ),
        latent_resolution=8,
        isosurface_resolution=24,
        max_verts=8192,
        max_faces=16384,
        field_chunk=4096,
    )


def test_pipeline_end_to_end(tmp_path):
    pipe = tiny_pipeline()
    out = pipe("a photo of a hamburger", key=jax.random.PRNGKey(0))
    assert set(out.keys()) == {"space_cache", "latents", "mesh"}
    # latents [B, 6, 8, 8, 4]; space cache [B, 6, 2*8, 2*8, output_dim/2]
    assert out["latents"].shape == (1, 6, 8, 8, 4)
    assert out["space_cache"].shape[0:2] == (1, 6)
    assert out["space_cache"].shape[-1] == 4  # output_dim 8 split in half
    mesh = out["mesh"][0]
    n_faces = int(np.asarray(mesh.t_mask).sum())
    assert n_faces > 0, "sphere-bias SDF must produce a mesh at random init"
    # vertices in world coords [-1, 1]
    v = np.asarray(mesh.v_pos)[np.asarray(mesh.v_mask)]
    assert v.min() >= -1.0001 and v.max() <= 1.0001
    assert mesh.v_rgb is not None
    rgb = np.asarray(mesh.v_rgb)
    assert rgb.shape[-1] == 3

    # OBJ export
    path = export_obj(mesh, str(tmp_path / "model.obj"))[0]
    assert os.path.exists(path)
    txt = open(path).read()
    assert txt.startswith("v ")
    assert " f " in txt or "\nf " in txt
    # vertex colors written (6 floats per v line)
    first_v = txt.splitlines()[0].split()
    assert len(first_v) == 7


def test_pipeline_batch_and_determinism():
    pipe = tiny_pipeline()
    o1 = pipe(["a cat", "a dog"], key=jax.random.PRNGKey(1))
    assert o1["latents"].shape[0] == 2
    assert len(o1["mesh"]) == 2
    o2 = pipe(["a cat", "a dog"], key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(o1["latents"]), np.asarray(o2["latents"]), atol=1e-6
    )
