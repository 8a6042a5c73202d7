"""Safety checker: CLIP-based concept scorer that flags but never blacks
out (the reference's FlagOnlySafetyChecker,
gyre/pipeline/safety_checkers.py:13-66, swapped in for nsfw=flag)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_mod


@dataclass
class SafetyChecker:
    vision_params: dict
    vision_cfg: clip_mod.CLIPVisionConfig
    concept_embeds: jax.Array          # [n_concepts, proj]
    concept_thresholds: jax.Array      # [n_concepts]
    special_embeds: jax.Array | None = None
    special_thresholds: jax.Array | None = None

    @classmethod
    def random(cls, seed: int = 0, cfg=None, n_concepts: int = 17):
        cfg = cfg or clip_mod.CLIP_VISION_TEST
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = clip_mod.vision_init(k1, cfg)
        concepts = jax.random.normal(k2, (n_concepts, cfg.projection_dim))
        concepts = concepts / jnp.linalg.norm(concepts, axis=-1,
                                              keepdims=True)
        # high thresholds: random checker flags ~nothing (flag-only anyway)
        return cls(params, cfg, concepts, jnp.full((n_concepts,), 0.95))

    def check(self, images) -> np.ndarray:
        """images [B,H,W,3] float 0..1 -> bool[B] nsfw flags."""
        imgs = jnp.asarray(images)
        size = self.vision_cfg.image_size
        imgs = jax.image.resize(
            imgs, (imgs.shape[0], size, size, 3), "bilinear")
        imgs = clip_mod.preprocess_image(imgs)
        out = clip_mod.vision_apply(self.vision_params, self.vision_cfg,
                                    imgs)
        sims = out["image_embeds"] @ self.concept_embeds.T  # [B, n]
        flags = (sims > self.concept_thresholds[None]).any(axis=-1)
        return np.asarray(flags)
