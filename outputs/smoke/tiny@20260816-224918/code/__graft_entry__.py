"""Driver entry points: single-chip compile check + multi-chip dry run.

``entry()`` returns a jittable forward step on the flagship model (the
student's denoise UNet pass — the hot op of the 4-step sampler).
``dryrun_multichip(n)`` jits a full data-parallel training step over an
n-device ``jax.sharding.Mesh`` on tiny shapes and runs one step.
"""

import os
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


_TINY_SG = dict(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=32,
    attention_head_dim=8,
    vae_block_out_channels=(16, 32),
    vae_layers_per_block=1,
    output_dim=8,
    training_type="self_lora_rank_4-cross_lora_rank_4-locon_rank_4",
)


def entry() -> Tuple:
    """Jittable forward step (student UNet denoise) + example args."""
    from triplaneturbo_tpu.models.geometry.space_generator import (
        SpaceGeneratorConfig,
        TriplaneSpaceGenerator,
    )

    gen = TriplaneSpaceGenerator(SpaceGeneratorConfig(**_TINY_SG))
    key = jax.random.PRNGKey(0)
    noisy = jax.random.normal(key, (1, 6, 32, 32, 4))
    text = jax.random.normal(jax.random.fold_in(key, 1), (1, 77, 32))
    t = jnp.asarray(999, jnp.int32)
    latents = noisy
    params = gen.init(jax.random.fold_in(key, 2), noisy, text, t, latents, method=gen.init_all)

    def fn(params, noisy, text, t):
        return gen.apply(params, noisy, text, t, method=gen.denoise)

    return fn, (params, noisy, text, t)


def dryrun_multichip(n_devices: int) -> None:
    """FULL data-parallel training step over an n-device mesh, one real step.

    Runs the complete multi-step distillation step (student UNet+VAE, dual
    renderers, 3-teacher ASD, Adan update) on tiny shapes with the view batch
    sharded over the "data" axis and params/optimizer state replicated —
    gradient reduction is the XLA psum jit inserts (SURVEY §2.7).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
    from triplaneturbo_tpu.parallel import make_data_mesh, replicate, shard_batch
    from triplaneturbo_tpu.systems.builder import build_system

    mesh = make_data_mesh(n_devices)
    tiny_teacher = dict(
        block_out_channels=(16, 32), layers_per_block=1,
        attention_head_dim=8,
    )
    cfg = {
        "system": {
            "rasterize_hw": 8,
            "n_view": 4,
            "geometry": {"space_generator_config": _TINY_SG},
            "background": {"c_dim": 32, "encoding": {"n_levels": 2, "log2_hashmap_size": 8}},
            "renderer": {
                "isosurface_resolution": 10, "max_verts": 1024, "max_faces": 2048,
                "field_chunk": 1024, "tile": 8, "faces_per_tile": 64,
            },
            "renderer_2nd": {"num_samples_per_ray": 8, "num_samples_per_ray_importance": 4},
            "patch": {"patch_size": 4, "global_downsample": 2},
            "guidance": {"mv_image_size": 16, "rd_image_size": 8, "sd_image_size": 16},
            "num_parts_training": 2,
            "num_steps_training": 2,
            "teacher_sizes": {
                "mv": {**tiny_teacher, "cross_attention_dim": 32,
                       "vae_block_out_channels": (8, 16), "vae_layers_per_block": 1},
                "rd": {**tiny_teacher, "cross_attention_dim": 32},
                "sd": {**tiny_teacher, "cross_attention_dim": 32,
                       "vae_block_out_channels": (8, 16), "vae_layers_per_block": 1},
            },
            "teacher_dtype": "float32",
            "loss": {"lambda_sparsity_2nd": 0.1, "lambda_eikonal_2nd": 0.1},
        }
    }
    trainer = build_system(cfg, seed=0)

    # view batch = n_devices (each device gets >=1 view); prompts = batch/4
    Bp = max(1, n_devices // 4)
    dm = MultiviewMultipromptDataModule(
        DataModuleConfig(
            batch_size=4 * Bp, n_view=4, height=8, width=8,
            ray_height=8, ray_width=8, dim_gaussian=(6, 4, 8, 8),
        )
    )
    batch_list = dm.sample_train_batch()
    key = jax.random.PRNGKey(0)
    text_embeds = {
        "cond_local": jax.random.normal(key, (Bp, 7, 32)),
        "cond_21": jax.random.normal(jax.random.fold_in(key, 1), (Bp, 7, 32)),
        "uncond_21": jnp.zeros((Bp, 7, 32)),
        "cond_15": jax.random.normal(jax.random.fold_in(key, 2), (Bp, 7, 32)),
        "uncond_15": jnp.zeros((Bp, 7, 32)),
        "global_21": jax.random.normal(jax.random.fold_in(key, 3), (Bp, 32)),
    }

    batch_list = [
        {k: v for k, v in b.items() if not isinstance(v, (list, str, int))}
        for b in batch_list
    ]
    with mesh:
        trainer.params = replicate(mesh, trainer.params)
        trainer.opt_state = replicate(mesh, trainer.opt_state)
        batch_list = [shard_batch(mesh, b) for b in batch_list]
        text_embeds = shard_batch(mesh, text_embeds)
        metrics = trainer.train_step(batch_list, text_embeds, key)
        loss = metrics["loss"]
        jax.block_until_ready(loss)
    assert jnp.isfinite(loss), f"non-finite loss {loss}"


if __name__ == "__main__":
    fn, args = entry()
    out = jax.jit(fn)(*args)
    print("entry ok", out.shape)
    dryrun_multichip(jax.device_count())
    print("dryrun ok")
