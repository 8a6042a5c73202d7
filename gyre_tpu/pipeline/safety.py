"""Safety checker: CLIP-based concept scorer (the reference's
FlagOnlySafetyChecker, gyre/pipeline/safety_checkers.py:13-66, swapped in
for nsfw=flag; diffusers StableDiffusionSafetyChecker weights load
directly).

Scoring follows the published checker: cosine similarity of the CLIP image
embedding against concept embeddings, thresholded by the per-concept
weights; "special care" concepts tighten every threshold by 0.01 when any
of them fires."""

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
    trained: bool = False              # True only for real checkpoint weights

    @classmethod
    def random(cls, seed: int = 0, cfg=None, n_concepts: int = 17):
        """Random-weight checker: keeps the compute graph exercisable in
        weight-less deployments. NEVER used to actually flag/block —
        callers must check `.trained` (flags from random weights are
        noise)."""
        cfg = cfg or clip_mod.CLIP_VISION_TEST
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = clip_mod.vision_init(k1, cfg)
        concepts = jax.random.normal(k2, (n_concepts, cfg.projection_dim))
        concepts = concepts / jnp.linalg.norm(concepts, axis=-1,
                                              keepdims=True)
        return cls(params, cfg, concepts, jnp.full((n_concepts,), 0.95),
                   trained=False)

    @classmethod
    def from_state_dict(cls, state: dict) -> "SafetyChecker":
        """Load diffusers StableDiffusionSafetyChecker weights: the CLIP
        vision tower + visual_projection + concept/special embeddings and
        their threshold weights."""
        from ..models.load import load_clip_vision_params

        params, cfg = load_clip_vision_params(state)

        def arr(*names):
            for n in names:
                if n in state:
                    return jnp.asarray(np.asarray(state[n], np.float32))
            return None

        concepts = arr("concept_embeds")
        thresholds = arr("concept_embeds_weights")
        if concepts is None or thresholds is None:
            raise KeyError("state dict lacks concept_embeds / "
                           "concept_embeds_weights — not a safety checker")
        return cls(params, cfg, concepts, thresholds,
                   special_embeds=arr("special_care_embeds"),
                   special_thresholds=arr("special_care_embeds_weights"),
                   trained=True)

    @classmethod
    def load(cls, path: str) -> "SafetyChecker":
        from ..models.load import read_safetensors

        return cls.from_state_dict(read_safetensors(path))

    def check(self, images) -> np.ndarray:
        """images [B,H,W,3] float 0..1 -> bool[B] nsfw flags."""
        imgs = jnp.asarray(images)
        size = self.vision_cfg.image_size
        imgs = jax.image.resize(
            imgs, (imgs.shape[0], size, size, 3), "bilinear")
        imgs = clip_mod.preprocess_image(imgs)
        out = clip_mod.vision_apply(self.vision_params, self.vision_cfg,
                                    imgs)
        emb = out["image_embeds"]
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                                1e-8)

        def cos(embeds):
            c = embeds / jnp.maximum(
                jnp.linalg.norm(embeds, axis=-1, keepdims=True), 1e-8)
            return emb @ c.T

        adjustment = jnp.zeros((emb.shape[0], 1), emb.dtype)
        if self.special_embeds is not None and \
                self.special_thresholds is not None:
            special = cos(self.special_embeds) - self.special_thresholds[None]
            adjustment = jnp.where((special > 0).any(axis=-1, keepdims=True),
                                   0.01, 0.0)
        scores = cos(self.concept_embeds) - self.concept_thresholds[None] + \
            adjustment
        return np.asarray((scores > 0).any(axis=-1))
