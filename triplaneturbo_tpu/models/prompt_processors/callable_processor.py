"""Prompt processors: precomputed, disk-cached CLIP text embeddings.

Rebuild of the reference prompt-processor stack
(/root/reference/custom/triplaneturbo/models/prompt_processors/
base_callable.py:33-479, stable_diffusion_...py, dual_...py):

* embeddings are precomputed in batches and cached on disk keyed by
  md5(model+prompt+kind) (utils.py:5-12) so training never re-encodes;
* multi-host: each process encodes its ``prompts[rank::world]`` shard, then
  everyone loads the full set from the shared cache
  (base_callable.py:108-113);
* the **dual** variant carries both the SD-2.1 (1024-d, MVDream/SD teachers)
  and SD-1.5 (768-d, RichDreamer) text spaces plus per-model negative-prompt
  embeddings and the default "" unconditional (dual_...py:174-279).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import triplaneturbo_tpu as ttt

from ...utils.misc import barrier, get_rank, get_world_size
from ..clip_text import CLIPTextConfig, CLIPTextEncoder
from ..tokenizer import CLIPTokenizer


def _cache_key(model_tag: str, prompt: str, kind: str = "local", width: int = 0) -> str:
    # width participates in the key: differently-sized encoders sharing a tag
    # (tiny smoke configs vs full SD towers) must not collide in the cache
    ident = f"{model_tag}-w{width}-{prompt}-{kind}"
    return hashlib.md5(ident.encode()).hexdigest()


@dataclass
class PromptProcessorConfig:
    model_tag: str = "sd21"
    negative_prompt: str = ""
    cache_dir: str = ".cache/text_embeddings"
    use_local_text_embeddings: bool = True
    batch_size: int = 32


class PromptProcessorOutput:
    """API twin of the reference PromptProcessorOutput (base_callable.py:413-479)."""

    def __init__(
        self,
        local: jnp.ndarray,  # [N, 77, D]
        pooled: jnp.ndarray,  # [N, D]
        uncond_local: jnp.ndarray,  # [1, 77, D]
        uncond_pooled: jnp.ndarray,
        use_local_text_embeddings: bool = True,
    ):
        self.local_text_embeddings = local
        self.global_text_embeddings = pooled
        self.uncond_local = uncond_local
        self.uncond_pooled = uncond_pooled
        self.use_local = use_local_text_embeddings
        self.appendable_attributes = ["local_text_embeddings", "global_text_embeddings"]

    def get_global_text_embeddings(self, use_local_text_embeddings: Optional[bool] = None):
        use_local = self.use_local if use_local_text_embeddings is None else use_local_text_embeddings
        return self.local_text_embeddings if use_local else self.global_text_embeddings

    def get_uncond_text_embeddings(self):
        n = self.local_text_embeddings.shape[0]
        u = self.uncond_local if self.use_local else self.uncond_pooled
        return jnp.repeat(u, n, axis=0)

    def get_text_embeddings(self):
        """cat(cond, uncond) like the reference guidance input."""
        return jnp.concatenate(
            [self.get_global_text_embeddings(), self.get_uncond_text_embeddings()], axis=0
        )


class _Encoder:
    def __init__(self, cfg: PromptProcessorConfig, text_encoder: CLIPTextEncoder, params, tokenizer: CLIPTokenizer):
        self.cfg = cfg
        self.text_encoder = text_encoder
        self.params = params
        self.tokenizer = tokenizer
        self._encode = jax.jit(lambda p, ids: text_encoder.apply(p, ids))
        os.makedirs(cfg.cache_dir, exist_ok=True)

    def _path(self, prompt: str) -> str:
        width = int(getattr(self.text_encoder.cfg, "width", 0))
        return os.path.join(
            self.cfg.cache_dir,
            _cache_key(self.cfg.model_tag, prompt, width=width) + ".npz",
        )

    def prepare(self, prompts: List[str]) -> None:
        """Encode the rank's shard of uncached prompts and write the cache."""
        todo = [p for p in dict.fromkeys(prompts) if not os.path.exists(self._path(p))]
        shard = todo[get_rank() :: get_world_size()]
        bs = self.cfg.batch_size
        for i in range(0, len(shard), bs):
            chunk = shard[i : i + bs]
            ids = jnp.asarray(self.tokenizer.batch_encode(chunk))
            local, pooled = self._encode(self.params, ids)
            for j, p in enumerate(chunk):
                np.savez(self._path(p), local=np.asarray(local[j]), pooled=np.asarray(pooled[j]))
        barrier("prompt-embeddings")

    def load(self, prompts: List[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        missing = [p for p in prompts if not os.path.exists(self._path(p))]
        if missing:
            self.prepare(missing)
        locals_, pooleds = [], []
        width = int(getattr(self.text_encoder.cfg, "width", 0))
        stale = []
        for p in prompts:
            z = np.load(self._path(p))
            if width and z["local"].shape[-1] != width:
                stale.append(p)
                continue
            locals_.append(z["local"])
            pooleds.append(z["pooled"])
        if stale:
            # defensive re-encode for caches written before width-aware keys
            for p in stale:
                os.remove(self._path(p))
            self.prepare(stale)
            return self.load(prompts)
        return jnp.asarray(np.stack(locals_)), jnp.asarray(np.stack(pooleds))


@ttt.register("stable-diffusion-multi-prompt-processor-callable")
class StableDiffusionMultipromptPromptProcessor:
    """Single text space (SD-2.1 by default)."""

    def __init__(self, cfg: PromptProcessorConfig, text_encoder: CLIPTextEncoder, params, tokenizer: Optional[CLIPTokenizer] = None):
        self.cfg = cfg
        self.enc = _Encoder(cfg, text_encoder, params, tokenizer or CLIPTokenizer())

    def prepare_text_embeddings(self, prompts: List[str]) -> None:
        self.enc.prepare(prompts + [self.cfg.negative_prompt, ""])

    def __call__(self, prompts: List[str]) -> PromptProcessorOutput:
        local, pooled = self.enc.load(prompts)
        u_local, u_pooled = self.enc.load([self.cfg.negative_prompt])
        return PromptProcessorOutput(
            local, pooled, u_local, u_pooled, self.cfg.use_local_text_embeddings
        )


@ttt.register("dual-stable-diffusion-multi-prompt-processor-callable")
class DualStableDiffusionPromptProcessor:
    """Both teacher text spaces: SD-1.5 (768) for RichDreamer + SD-2.1 (1024)."""

    def __init__(
        self,
        cfg_1st: PromptProcessorConfig,  # SD-1.5 space
        enc_1st: CLIPTextEncoder,
        params_1st,
        cfg_2nd: PromptProcessorConfig,  # SD-2.1 space
        enc_2nd: CLIPTextEncoder,
        params_2nd,
        tokenizer: Optional[CLIPTokenizer] = None,
    ):
        tok = tokenizer or CLIPTokenizer()
        self.p1 = StableDiffusionMultipromptPromptProcessor(cfg_1st, enc_1st, params_1st, tok)
        self.p2 = StableDiffusionMultipromptPromptProcessor(cfg_2nd, enc_2nd, params_2nd, tok)

    def prepare_text_embeddings(self, prompts: List[str]) -> None:
        self.p1.prepare_text_embeddings(prompts)
        self.p2.prepare_text_embeddings(prompts)

    def __call__(self, prompts: List[str]) -> Dict[str, PromptProcessorOutput]:
        return {"first": self.p1(prompts), "second": self.p2(prompts)}
