"""CLIP guidance: steer the denoiser by the gradient of a CLIP similarity
loss on decoded cutouts (reference ClipGuidedMode,
gyre/pipeline/unet/clipguided.py:94-420).

Where the reference needs gradient-capable attention probing and processor
swapping (xformers reversibility dance, gyre/pipeline/xformers_utils.py:
37-60), JAX differentiates the whole composed denoiser natively — the
guided step is just value_and_grad over the x0 prediction.

Feature parity with the reference's ClipGuidanceConfig
(clipguided.py:27-35):
  * approx_cutouts — linear latent->RGB preview cutouts (VaeApproximator)
  * vae_cutouts    — latent-space cutouts decoded through the real VAE
  * no_cutouts     — "approx" | "vae": whole-image loss, no cutouts
  * guidance_base  — "guided": gradient through the cond stem only;
                     "mixed": gradient through the CFG-combined prediction
  * gradient_length/threshold/maxloss — the flat-loss early exit: stop
    guiding once the loss trend flattens below maxloss. The reference
    checks a rolling per-step window on the host (clipguided.py:152-173);
    here the loss is evaluated once per dispatch chunk inside the
    compiled program and the line-fit runs between chunks, so the check
    costs nothing inside the scan and stays jit-clean (an adaptation of
    the same stop rule to chunk granularity).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

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


@dataclass(frozen=True)
class ClipGuidanceConfig:
    """Hashable: lives inside the pipeline's StaticSpec jit key."""

    guidance_scale: float = 0.0
    guidance_base: str = "guided"       # "guided" | "mixed"
    gradient_length: int = 15           # steps of loss history for the fit
    gradient_threshold: float = 0.01
    gradient_maxloss: float = 1.0
    vae_cutouts: int = 2
    approx_cutouts: int = 2
    no_cutouts: str | bool = False      # False | "approx" | "vae"

    @property
    def num_cutouts(self) -> int:
        return self.vae_cutouts + self.approx_cutouts


def approx_decode(latents: jax.Array) -> jax.Array:
    """scaled latents [B,h,w,4] -> approx RGB [B,h,w,3] in [0,1]."""
    rgb = jnp.einsum("bhwc,cd->bhwd", latents.astype(jnp.float32),
                     LATENT_RGB)
    return jnp.clip(rgb * 0.5 + 0.5, 0.0, 1.0)


def make_cutouts(images: jax.Array, keys: jax.Array, num_cutouts: int,
                 cut_size: int, cut_power: float = 1.0):
    """Batch-independent random square crops resized to cut_size
    (reference MakeCutouts, gyre/pipeline/unet/clipguided.py:38-86).
    images [B,H,W,C] -> [B*num_cutouts, S, S, C]; works on RGB images and
    on 4-channel latents (the reference's vae-cutout path cuts latents)."""
    b, h, w, c = images.shape
    min_side = min(h, w)
    crop_side = min(cut_size * 2, min_side)

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
                img, (oy, ox, 0), (crop_side, crop_side, c))
            return jax.image.resize(crop, (cut_size, cut_size, c),
                                    "bilinear")

        return jnp.stack([one(i) for i in range(num_cutouts)])

    cuts = jax.vmap(cuts_for_sample)(images, keys)
    return cuts.reshape(b * num_cutouts, cut_size, cut_size, c)


def spherical_dist(x, y):
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.arcsin(jnp.linalg.norm(x - y, axis=-1) / 2.0) ** 2 * 4.0


def guidance_loss(x0, keys, vision_params, vision_cfg, text_embeds,
                  cfg: ClipGuidanceConfig, vae_decode=None,
                  latent_scale: float = 0.18215):
    """CLIP similarity loss on decoded views of the x0 prediction
    (reference cond_fn, gyre/pipeline/unet/clipguided.py:343-420).

    x0: scaled latents [B,h,w,4]. Returns a scalar loss (before the
    guidance_scale*500 factor)."""
    b = x0.shape[0]
    size = vision_cfg.image_size
    views = []

    if not cfg.num_cutouts:
        if cfg.no_cutouts == "vae" and vae_decode is not None:
            lat_size = max(size // 8, 8)
            lat = jax.image.resize(
                x0, (b, lat_size, lat_size, x0.shape[-1]), "bilinear")
            img = vae_decode(lat / latent_scale) * 0.5 + 0.5
            img = jax.image.resize(img, (b, size, size, 3), "bilinear")
        else:
            img = approx_decode(x0)
            img = jax.image.resize(img, (b, size, size, 3), "bilinear")
        views.append(img.reshape(b, 1, size, size, 3))
    else:
        if cfg.approx_cutouts:
            rgb = approx_decode(x0)
            rgb = jax.image.resize(
                rgb, (b, x0.shape[1] * 8, x0.shape[2] * 8, 3), "bilinear")
            cut_keys = jax.vmap(
                lambda k: rngu.stream(k, "clip_cuts_rgb"))(keys)
            cuts = make_cutouts(rgb, cut_keys, cfg.approx_cutouts, size)
            views.append(cuts.reshape(b, cfg.approx_cutouts,
                                      size, size, 3))
        if cfg.vae_cutouts and vae_decode is not None:
            cut_keys = jax.vmap(
                lambda k: rngu.stream(k, "clip_cuts_vae"))(keys)
            lat_cuts = make_cutouts(x0, cut_keys, cfg.vae_cutouts,
                                    max(size // 8, 8))
            dec = vae_decode(lat_cuts / latent_scale) * 0.5 + 0.5
            dec = jax.image.resize(
                dec, (dec.shape[0], size, size, 3), "bilinear")
            views.append(dec.reshape(b, cfg.vae_cutouts, size, size, 3))

    cuts = jnp.concatenate(views, axis=1)       # [B, n_views, S, S, 3]
    n_views = cuts.shape[1]
    cuts = jnp.clip(cuts, 0.0, 1.0).reshape(b * n_views, size, size, 3)
    cuts = clip_mod.preprocess_image(cuts)
    out = clip_mod.vision_apply(vision_params, vision_cfg, cuts)
    emb = out["image_embeds"].reshape(b, n_views, -1)
    dists = spherical_dist(emb, text_embeds[:, None, :])  # [B, n_views]
    if not cfg.num_cutouts:
        return dists.mean()
    # reference loss shape: mean over cutouts, sum over batch
    # (clipguided.py:411-415)
    return dists.mean(axis=1).sum()


def make_clip_guided_denoiser(denoise, vision_params, vision_cfg,
                              text_embeds, keys, *,
                              config: ClipGuidanceConfig,
                              cond_stem=None, vae_decode=None):
    """Wrap denoise(x, sigma)->x0 with CLIP gradient steering.

    text_embeds: [B, proj] normalized text embedding targets.
    cond_stem: optional cond-only denoiser for guidance_base="guided"
    (the reference computes the gradient through the guided stem alone,
    clipguided.py:276-296, while the returned prediction stays the full
    CFG combination).

    The correction is applied in x0 space: x0' = x0 - sigma^2 * grad
    (the k-diffusion cond_fn convention the reference's guided mode maps
    to in sigma space, clipguided.py:294-296), with the reference's
    scale*500 factor (clipguided.py:420)."""
    grad_stem = (cond_stem if config.guidance_base == "guided" and
                 cond_stem is not None else denoise)

    def wrapped(x, sigma):
        def loss_of(x0):
            return guidance_loss(x0, keys, vision_params, vision_cfg,
                                 text_embeds, config,
                                 vae_decode=vae_decode)

        if grad_stem is denoise:
            # "mixed": gradient through the returned prediction itself —
            # value_and_grad reuses the single denoiser forward
            def loss_fn(xv):
                x0 = denoise(xv, sigma)
                return loss_of(x0), x0

            (_, x0), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(x)
        else:
            grad = jax.grad(lambda xv: loss_of(grad_stem(xv, sigma)))(x)
            x0 = denoise(x, sigma)
        sig = jnp.asarray(sigma, jnp.float32)
        scale = config.guidance_scale * 500.0
        return x0 - grad * (sig ** 2) * scale

    return wrapped


def flatloss_check(losses, cfg: ClipGuidanceConfig,
                   samples_per_window: int | None = None) -> bool:
    """Host-side flat-loss detection between dispatch chunks: least-squares
    line over the recent loss history; flat once |slope| < threshold and
    intercept < maxloss (reference _has_flatloss,
    clipguided.py:152-173). `samples_per_window` overrides the window
    length when losses are recorded per-chunk rather than per-step."""
    window = samples_per_window or cfg.gradient_length
    window = max(window, 2)
    if len(losses) <= window:
        return False
    x = np.linspace(0, 1, window)
    a = np.vstack([x, np.ones(window)]).T
    y = np.asarray(losses[-window:], np.float64)
    try:
        m, c = np.linalg.lstsq(a, y, rcond=None)[0]
    except np.linalg.LinAlgError:
        return False
    return bool(abs(m) < cfg.gradient_threshold and
                c < cfg.gradient_maxloss)
