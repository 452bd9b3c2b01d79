"""CLIP-score evaluation: similarity + Recall@1 on rendered mesh views.

Rebuild of /root/reference/evaluation/clipscore/compute.py:111-221: images
are scored against "A photo depicts <prompt>" with weight w=2.5 on the
clamped cosine (CLIPScore, Hessel et al.), plus R@1 retrieval accuracy over
the prompt set. Runs on TPU via the flax CLIP towers
(:mod:`..models.clip_vision`, :mod:`..models.clip_text`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextConfig, CLIPTextEncoder
from ..models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder, preprocess_for_clip
from ..models.tokenizer import CLIPTokenizer

PREFIX = "A photo depicts "
W = 2.5


def clip_b32_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(width=512, layers=12, heads=8, intermediate=2048, hidden_act="quick_gelu")


class CLIPScorer:
    """Image/text feature extraction + CLIPScore / R@1."""

    def __init__(
        self,
        vision: Optional[CLIPVisionEncoder] = None,
        vision_params=None,
        text: Optional[CLIPTextEncoder] = None,
        text_params=None,
        text_projection=None,  # [width, proj_dim]
        tokenizer: Optional[CLIPTokenizer] = None,
        seed: int = 0,
    ):
        self.vision = vision or CLIPVisionEncoder(CLIPVisionConfig())
        self.text = text or CLIPTextEncoder(clip_b32_text_config())
        self.tokenizer = tokenizer or CLIPTokenizer()
        key = jax.random.PRNGKey(seed)
        if vision_params is None:
            s = self.vision.cfg.image_size
            vision_params = self.vision.init(key, jnp.zeros((1, s, s, 3)))
        if text_params is None:
            text_params = self.text.init(
                jax.random.fold_in(key, 1), jnp.zeros((1, 77), jnp.int32)
            )
        self.vision_params = vision_params
        self.text_params = text_params
        proj_dim = self.vision.cfg.projection_dim
        if text_projection is None:
            text_projection = jax.random.normal(
                jax.random.fold_in(key, 2), (self.text.cfg.width, proj_dim)
            ) / np.sqrt(self.text.cfg.width)
        self.text_projection = text_projection
        img_size = self.vision.cfg.image_size
        self._embed_images = jax.jit(
            lambda p, im: self.vision.apply(p, preprocess_for_clip(im, img_size))
        )
        self._embed_text = jax.jit(
            lambda p, ids: self.text.apply(p, ids)[1] @ self.text_projection
        )

    @classmethod
    def from_msgpack(cls, path: str, seed: int = 0) -> "CLIPScorer":
        """Load the towers from tools/convert_checkpoints.py's
        clip_scorer.msgpack ({"vision", "text", "text_projection"})."""
        from flax import serialization

        scorer = cls(seed=seed)
        template = {
            "vision": scorer.vision_params,
            "text": scorer.text_params,
            "text_projection": jnp.asarray(scorer.text_projection),
        }
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        return cls(
            vision=scorer.vision,
            vision_params=restored["vision"],
            text=scorer.text,
            text_params=restored["text"],
            text_projection=jnp.asarray(restored["text_projection"]),
            tokenizer=scorer.tokenizer,
            seed=seed,
        )

    @classmethod
    def from_checkpoint(cls, path: str, seed: int = 0) -> "CLIPScorer":
        """Dispatch by extension: .msgpack (converted) or torch state dict."""
        if path.endswith(".msgpack"):
            return cls.from_msgpack(path, seed=seed)
        return cls.from_torch_checkpoint(path, seed=seed)

    @classmethod
    def from_torch_checkpoint(cls, path: str, seed: int = 0) -> "CLIPScorer":
        """Build a scorer from an HF CLIPModel (ViT-B/32) torch checkpoint.

        Accepts a .bin/.pt state dict or a {state_dict: ...} wrapper; converts
        the vision tower, text tower and text_projection so scores match the
        reference eval (compute.py:111-161) on real weights.
        """
        import torch

        from ..utils.convert_torch import (
            apply_flat_to_tree,
            convert_clip_text,
            convert_clip_vision,
        )

        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k: np.asarray(v.detach().cpu().float().numpy()) for k, v in sd.items()}

        scorer = cls(seed=seed)
        vis_flat = convert_clip_vision(sd, n_layers=scorer.vision.cfg.layers)
        text_projection = vis_flat.pop("__text_projection__", None)
        vision_params, v_loaded, v_miss = apply_flat_to_tree(vis_flat, scorer.vision_params)
        txt_flat = convert_clip_text(sd, n_layers=scorer.text.cfg.layers)
        text_params, t_loaded, t_miss = apply_flat_to_tree(txt_flat, scorer.text_params)
        bad = [m for m in v_miss + t_miss]
        if bad:
            raise ValueError(f"CLIP conversion mismatches: {bad[:10]}")
        return cls(
            vision=scorer.vision,
            vision_params=vision_params,
            text=scorer.text,
            text_params=text_params,
            text_projection=jnp.asarray(text_projection)
            if text_projection is not None
            else None,
            tokenizer=scorer.tokenizer,
            seed=seed,
        )

    def image_features(self, images: jnp.ndarray) -> jnp.ndarray:
        f = self._embed_images(self.vision_params, images)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def text_features(self, prompts: List[str], prefix: str = PREFIX) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer.batch_encode([prefix + p for p in prompts]))
        f = self._embed_text(self.text_params, ids)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def score(
        self, images_per_prompt: Dict[str, jnp.ndarray]
    ) -> Dict[str, float]:
        """images_per_prompt: prompt -> [V, H, W, 3] in [0,1].

        Returns {"clip_score", "recall_at_1"} matching compute.py:111-161
        (score = w * max(cos, 0) averaged over views and prompts; R@1 over the
        full prompt gallery using the mean image feature per prompt).
        """
        prompts = list(images_per_prompt.keys())
        tfeat = self.text_features(prompts)  # [P, D]
        sims, mean_feats = [], []
        for i, p in enumerate(prompts):
            ifeat = self.image_features(images_per_prompt[p])  # [V, D]
            cos = ifeat @ tfeat[i]
            sims.append(float(jnp.maximum(cos, 0.0).mean() * W))
            mean_feats.append(ifeat.mean(axis=0))
        gallery = jnp.stack(mean_feats)  # [P, D]
        gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)
        sim_matrix = gallery @ tfeat.T  # image x text
        r1 = float((jnp.argmax(sim_matrix, axis=1) == jnp.arange(len(prompts))).mean())
        return {"clip_score": float(np.mean(sims)), "recall_at_1": r1}
