"""Prompt processors: disk cache round trip, output API, dual variant."""

import jax
import jax.numpy as jnp
import numpy as np

from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from triplaneturbo_tpu.models.prompt_processors.callable_processor import (
    DualStableDiffusionPromptProcessor,
    PromptProcessorConfig,
    StableDiffusionMultipromptPromptProcessor,
)
from triplaneturbo_tpu.models.tokenizer import CLIPTokenizer


def make_enc(width=32):
    cfg = CLIPTextConfig(width=width, layers=2, heads=4, intermediate=64)
    enc = CLIPTextEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    return enc, params


def test_processor_cache_and_output(tmp_path):
    enc, params = make_enc()
    cfg = PromptProcessorConfig(
        model_tag="test", negative_prompt="ugly", cache_dir=str(tmp_path)
    )
    proc = StableDiffusionMultipromptPromptProcessor(cfg, enc, params, CLIPTokenizer())
    prompts = ["a cat", "a dog"]
    proc.prepare_text_embeddings(prompts)
    # cache files exist
    import os

    assert len(os.listdir(tmp_path)) >= 3  # 2 prompts + negative + ""
    out = proc(prompts)
    local = out.get_global_text_embeddings()
    assert local.shape == (2, 77, 32)
    pooled = out.get_global_text_embeddings(use_local_text_embeddings=False)
    assert pooled.shape == (2, 32)
    unc = out.get_uncond_text_embeddings()
    assert unc.shape == (2, 77, 32)
    both = out.get_text_embeddings()
    assert both.shape == (4, 77, 32)
    # cache is stable: second call returns identical values
    out2 = proc(prompts)
    np.testing.assert_allclose(
        np.asarray(out.local_text_embeddings), np.asarray(out2.local_text_embeddings)
    )


def test_dual_processor(tmp_path):
    enc15, p15 = make_enc(24)
    enc21, p21 = make_enc(32)
    dual = DualStableDiffusionPromptProcessor(
        PromptProcessorConfig(model_tag="m15", cache_dir=str(tmp_path / "a")),
        enc15, p15,
        PromptProcessorConfig(model_tag="m21", cache_dir=str(tmp_path / "b")),
        enc21, p21,
    )
    dual.prepare_text_embeddings(["x"])
    out = dual(["x"])
    assert out["first"].local_text_embeddings.shape == (1, 77, 24)
    assert out["second"].local_text_embeddings.shape == (1, 77, 32)


def test_cache_keys_distinguish_encoder_width(tmp_path):
    """A tiny-config cache entry must not be served to a full-size run
    (regression: smoke runs poisoned the cache for v1-scale training)."""
    import jax
    import jax.numpy as jnp

    from triplaneturbo_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    from triplaneturbo_tpu.models.prompt_processors.callable_processor import (
        PromptProcessorConfig,
        StableDiffusionMultipromptPromptProcessor,
    )

    def make(width):
        enc = CLIPTextEncoder(CLIPTextConfig(width=width, layers=1, heads=1))
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
        cfg = PromptProcessorConfig(model_tag="sd21", cache_dir=str(tmp_path))
        return StableDiffusionMultipromptPromptProcessor(cfg, enc, params)

    small = make(16)
    out_small = small(["a hamburger"])
    assert out_small.local_text_embeddings.shape[-1] == 16

    big = make(32)
    out_big = big(["a hamburger"])  # same prompt, same tag, bigger tower
    assert out_big.local_text_embeddings.shape[-1] == 32
