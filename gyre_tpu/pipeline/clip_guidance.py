"""CLIP guidance: steer the denoiser by the gradient of a CLIP similarity
loss on decoded cutouts (reference ClipGuidedMode,
gyre/pipeline/unet/clipguided.py:94-420).

Where the reference needs gradient-capable attention probing and processor
swapping (xformers reversibility dance, gyre/pipeline/xformers_utils.py:
37-60), JAX differentiates the whole composed denoiser natively — the
guided step is just value_and_grad over the x0 prediction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import clip as clip_mod
from ..utils import rng as rngu

# The community-standard linear latent->RGB approximation used for cheap
# guidance previews (reference VaeApproximator,
# gyre/pipeline/vae_approximator.py:4-44).
LATENT_RGB = jnp.asarray([
    [0.298, 0.207, 0.208],
    [0.187, 0.286, 0.173],
    [-0.158, 0.189, 0.264],
    [-0.184, -0.271, -0.473],
], jnp.float32)


def approx_decode(latents: jax.Array) -> jax.Array:
    """scaled latents [B,h,w,4] -> approx RGB [B,h,w,3] in [0,1]."""
    rgb = jnp.einsum("bhwc,cd->bhwd", latents.astype(jnp.float32),
                     LATENT_RGB)
    return jnp.clip(rgb * 0.5 + 0.5, 0.0, 1.0)


def make_cutouts(images: jax.Array, keys: jax.Array, num_cutouts: int,
                 cut_size: int, cut_power: float = 1.0):
    """Batch-independent random square crops resized to cut_size
    (reference MakeCutouts, gyre/pipeline/unet/clipguided.py:38-86).
    images [B,H,W,3] -> [B*num_cutouts, S, S, 3]."""
    b, h, w, _ = images.shape
    min_side = min(h, w)

    def cuts_for_sample(img, key):
        def one(i):
            k = jax.random.fold_in(key, i)
            k1, k2, k3 = jax.random.split(k, 3)
            frac = jax.random.uniform(k1) ** cut_power
            size = (frac * (min_side - cut_size) + cut_size).astype(jnp.int32)
            size = jnp.clip(size, 8, min_side)
            oy = jax.random.randint(k2, (), 0, jnp.maximum(h - size, 1))
            ox = jax.random.randint(k3, (), 0, jnp.maximum(w - size, 1))
            # dynamic crop at max size then mask-resize: to stay
            # static-shaped we crop min_side and rely on resize
            crop = jax.lax.dynamic_slice(
                img, (oy, ox, 0), (min(cut_size * 2, min_side),
                                   min(cut_size * 2, min_side), 3))
            return jax.image.resize(crop, (cut_size, cut_size, 3),
                                    "bilinear")

        return jnp.stack([one(i) for i in range(num_cutouts)])

    cuts = jax.vmap(cuts_for_sample)(images, keys)
    return cuts.reshape(b * num_cutouts, cut_size, cut_size, 3)


def spherical_dist(x, y):
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.arcsin(jnp.linalg.norm(x - y, axis=-1) / 2.0) ** 2 * 4.0


def make_clip_guided_denoiser(denoise, vision_params, vision_cfg,
                              text_embeds, keys, *, guidance_scale: float,
                              num_cutouts: int = 4):
    """Wrap denoise(x, sigma)->x0 with CLIP gradient steering.

    text_embeds: [B, proj] normalized text embedding targets.
    The correction is applied in x0 space: x0' = x0 - sigma^2 * grad
    (the k-diffusion cond_fn convention the reference's guided mode maps
    to in sigma space)."""

    def wrapped(x, sigma):
        def loss_fn(xv):
            x0 = denoise(xv, sigma)
            rgb = approx_decode(x0)  # matrix expects scaled latents
            cut_keys = jax.vmap(
                lambda k: rngu.stream(k, "clip_cuts"))(keys)
            cuts = make_cutouts(rgb, cut_keys, num_cutouts,
                                vision_cfg.image_size)
            cuts = clip_mod.preprocess_image(cuts)
            out = clip_mod.vision_apply(vision_params, vision_cfg, cuts)
            emb = out["image_embeds"].reshape(
                x.shape[0], num_cutouts, -1)
            target = text_embeds[:, None, :]
            loss = spherical_dist(emb, target).mean()
            return loss, x0

        (loss, x0), grad = jax.value_and_grad(loss_fn, has_aux=True)(x)
        sig = jnp.asarray(sigma, jnp.float32)
        return x0 - grad * (sig ** 2) * guidance_scale

    return wrapped
