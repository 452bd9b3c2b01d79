"""Shared dual prompt-processor wiring for entry points.

launch.py's --train loop and tools/bench_train.py both need the dual
SD1.5+SD2.1 text towers and the exact text-embedding dict the trainer's
``train_step`` consumes (reference: the condition/guidance prompt processors
of configs/TriplaneTurbo_v1.yaml:103-128). Kept in one place so the key
layout cannot drift between the real loop and the benchmark.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.clip_text import CLIPTextConfig, CLIPTextEncoder, sd15_text_config
from ..models.prompt_processors.callable_processor import (
    DualStableDiffusionPromptProcessor,
    PromptProcessorConfig,
)


def build_prompt_setup(
    cross_attention_dim: int,
    seed: int = 0,
    negative_prompt: str = "",
) -> Tuple[DualStableDiffusionPromptProcessor, Callable[[Any], Dict[str, jax.Array]]]:
    """Returns (processor, embeds_for) as used by the training loop.

    ``embeds_for(prompts)`` produces the dict ``TriplaneTurboTrainer.train_step``
    expects: SD2.1-width cond/uncond for the student + MVDream teacher,
    SD1.5-width cond/uncond for the RichDreamer/SD teachers, and the global
    (pooled) SD2.1 embedding for the hypernet background.
    """
    c_dim = cross_attention_dim
    enc21 = CLIPTextEncoder(CLIPTextConfig(width=c_dim))
    p21 = jax.jit(lambda k: enc21.init(k, jnp.zeros((1, 77), jnp.int32)))(
        jax.random.PRNGKey(seed + 1)
    )
    enc15 = CLIPTextEncoder(
        sd15_text_config() if c_dim == 1024 else CLIPTextConfig(width=c_dim)
    )
    p15 = jax.jit(lambda k: enc15.init(k, jnp.zeros((1, 77), jnp.int32)))(
        jax.random.PRNGKey(seed + 2)
    )
    processor = DualStableDiffusionPromptProcessor(
        PromptProcessorConfig(model_tag="sd15", negative_prompt=negative_prompt),
        enc15, p15,
        PromptProcessorConfig(model_tag="sd21", negative_prompt=negative_prompt),
        enc21, p21,
    )

    def embeds_for(prompts):
        out = processor(prompts)
        first, second = out["first"], out["second"]
        return {
            "cond_local": second.local_text_embeddings,
            "cond_21": second.local_text_embeddings,
            "uncond_21": second.get_uncond_text_embeddings(),
            "cond_15": first.local_text_embeddings,
            "uncond_15": first.get_uncond_text_embeddings(),
            "global_21": second.global_text_embeddings,
        }

    return processor, embeds_for
