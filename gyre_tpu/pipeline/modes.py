"""Generation modes: txt2img / img2img / inpaint as latent-state functions.

The reference implements modes as classes producing initial latents and
wrapping the unet per step (gyre/pipeline/unified_pipeline.py:155-696). Here
a mode is two pure functions:

  initial_latents(...) -> x at sigma_max          (sigma-space, x0 + sigma*eps)
  wrap_denoise(denoise) -> denoise'               (per-step latent blending)

which compose with any sampler. Inpaint blending keys its per-sigma noise off
the sigma value itself (fold_in of the quantized log-sigma), so it works
identically under every sampler without threading step indices through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import rng as rngu


def txt2img_initial(keys, shape, sigma_max, dtype=jnp.float32,
                    natural: int = 0):
    """Pure-noise initial latents at sigma_max. keys [B,2].

    When `natural` (the model's native latent size) is given, noise is
    drawn on a fixed natural-size grid and center-placed into the target
    canvas, so the same seed renders the same subject across resolutions
    (reference Txt2imgMode's fixed-size noise crop/insert,
    gyre/pipeline/unified_pipeline.py:155-237). Border areas beyond the
    natural grid draw from an independent stream.
    """
    h, w, c = shape
    if not natural or (h == natural and w == natural):
        noise = rngu.batched_stream_normal(keys, "init", 0, shape, dtype)
        return noise * sigma_max
    base = rngu.batched_stream_normal(keys, "init", 0,
                                      (natural, natural, c), dtype)
    canvas = rngu.batched_stream_normal(keys, "init_border", 0, shape,
                                        dtype)
    # center placement: crop base if target smaller, insert if larger
    sy, sx = max(0, (natural - h) // 2), max(0, (natural - w) // 2)
    ty, tx = max(0, (h - natural) // 2), max(0, (w - natural) // 2)
    ch, cw = min(h, natural), min(w, natural)
    crop = base[:, sy:sy + ch, sx:sx + cw]
    canvas = canvas.at[:, ty:ty + ch, tx:tx + cw].set(crop)
    return canvas * sigma_max


def img2img_initial(init_latents, keys, sigma_start, dtype=jnp.float32):
    """x = x0 + sigma*eps at the (possibly truncated) start sigma."""
    noise = rngu.batched_stream_normal(
        keys, "init", 0, init_latents.shape[1:], dtype)
    return init_latents.astype(dtype) + noise * sigma_start


def masked_area_fill(init_latents, mask_keep, keys, mode: str = "random"):
    """Reinitialize the to-be-generated area (reference MASKED_AREA_INIT_*,
    gyre/pipeline/unified_pipeline.py:466-601 implements the fancier
    shaped-noise variants; zero/random/original are the protocol modes).

    mask_keep: [B,h,w,1], 1 = keep original pixels, 0 = generate.
    """
    if mode == "original":
        return init_latents
    if mode == "zero":
        fill = jnp.zeros_like(init_latents)
    elif mode == "random":
        std = jnp.std(init_latents, axis=(1, 2, 3), keepdims=True)
        mean = jnp.mean(init_latents, axis=(1, 2, 3), keepdims=True)
        noise = rngu.batched_stream_normal(
            keys, "mask_fill", 0, init_latents.shape[1:], init_latents.dtype)
        fill = mean + noise * std
    else:
        raise ValueError(f"unknown masked_area_init {mode}")
    return init_latents * mask_keep + fill * (1.0 - mask_keep)


def shaped_noise_fill(init_latents, mask_keep, keys):
    """Shaped-noise masked-area init: noise whose per-channel statistics are
    matched to the unmasked region via FFT-convolving noise with the image
    spectrum (the reference's default 'shaped' fill, reference
    gyre/pipeline/unified_pipeline.py:466-601, here done as a frequency-
    domain colorization — a TPU-friendly O(n log n) formulation)."""
    b, h, w, c = init_latents.shape
    noise = rngu.batched_stream_normal(keys, "shaped_fill", 0, (h, w, c),
                                       jnp.float32)
    lat = init_latents.astype(jnp.float32)
    spec = jnp.fft.rfft2(lat, axes=(1, 2))
    nspec = jnp.fft.rfft2(noise, axes=(1, 2))
    phase = nspec / jnp.maximum(jnp.abs(nspec), 1e-8)
    shaped = jnp.fft.irfft2(jnp.abs(spec) * phase, s=(h, w), axes=(1, 2))
    # renormalize to the unmasked region's statistics
    keep = mask_keep.astype(jnp.float32)
    denom = jnp.maximum(keep.sum(axis=(1, 2, 3), keepdims=True), 1.0)
    mean = (lat * keep).sum(axis=(1, 2, 3), keepdims=True) / denom
    var = ((lat - mean) ** 2 * keep).sum(axis=(1, 2, 3), keepdims=True) / denom
    smean = shaped.mean(axis=(1, 2, 3), keepdims=True)
    sstd = shaped.std(axis=(1, 2, 3), keepdims=True) + 1e-8
    shaped = (shaped - smean) / sstd * jnp.sqrt(var) + mean
    out = lat * keep + shaped * (1.0 - keep)
    return out.astype(init_latents.dtype)


def make_inpaint_blend(init_latents, mask_keep, sigma_max, sigma_min):
    """Per-step x0 blend for 4-channel inpainting.

    The denoiser's predicted x0 is blended with the *clean* original
    latents: pixels with mask_keep > u stay pinned to the original and the
    sampler re-noises them through its own update equations — the
    reference's k-space semantics (latent_blend_mask.gt(u) applied to PX0,
    gyre/pipeline/unified_pipeline.py:620-632), which compose with every
    sigma-space sampler. u (schedule progress 0..1) is derived from sigma in
    log space so no step index threading is needed.

    Returns wrap(denoise) and final_blend(x0) for the loop's tail.
    """
    log_max = jnp.log(sigma_max)
    log_min = jnp.log(jnp.maximum(sigma_min, 1e-4))

    def progress(sigma):
        u = (log_max - jnp.log(jnp.maximum(sigma, 1e-6))) / \
            jnp.maximum(log_max - log_min, 1e-6)
        return jnp.clip(u, 0.0, 1.0)

    def wrap(denoise):
        def wrapped(x, sigma):
            x0 = denoise(x, sigma)
            pin = (mask_keep > progress(sigma)).astype(x0.dtype)
            return init_latents.astype(x0.dtype) * pin + x0 * (1.0 - pin)

        return wrapped

    def final_blend(x0):
        pin = (mask_keep >= 1.0).astype(x0.dtype)
        return init_latents.astype(x0.dtype) * pin + x0 * (1.0 - pin)

    return wrap, final_blend


def _ease_out_cubic(u):
    return 1.0 - (1.0 - u) ** 3


def log_progress(sigma_max, sigma_min):
    """Schedule progress u(sigma) in [0,1], log-sigma space."""
    log_max = jnp.log(sigma_max)
    log_min = jnp.log(jnp.maximum(sigma_min, 1e-4))

    def progress(sigma):
        u = (log_max - jnp.log(jnp.maximum(sigma, 1e-6))) / \
            jnp.maximum(log_max - log_min, 1e-6)
        return jnp.clip(u, 0.0, 1.0)

    return progress


def make_hires_fix(keys, natural_h: int, natural_w: int, target_h: int,
                   target_w: int, oos_fraction: float = 0.25,
                   end_u: float = 0.667):
    """Hires fix: a lo/hi latent pair denoised together with per-step
    cross-injection (reference HiresUnetWrapper,
    gyre/pipeline/unet/hires_fix.py:123-235).

    The sampler state is [lo_padded ; hi] (batch-doubled). Each denoise
    call splits, runs the model at both resolutions, and cross-injects the
    x0 predictions: hi inherits lo's downscaled structure (random-map
    merge, cubic-eased off by end_u), lo inherits hi's center detail.

    Returns (wrap_denoise, initial_pack, final_unpack).
    """
    oy = (target_h - natural_h) // 2
    ox = (target_w - natural_w) // 2

    def pack(lo, hi):
        lo_pad = jnp.pad(lo, [(0, 0), (oy, target_h - natural_h - oy),
                              (ox, target_w - natural_w - ox), (0, 0)])
        return jnp.concatenate([lo_pad, hi], axis=0)

    def unpack(x):
        lo_pad, hi = jnp.split(x, 2, axis=0)
        lo = lo_pad[:, oy:oy + natural_h, ox:ox + natural_w]
        return lo, hi

    def wrap(denoise_lo, denoise_hi, progress):
        """denoise_lo/hi: denoise at each resolution; progress(sigma)->u."""

        def wrapped(x, sigma):
            lo, hi = unpack(x)
            x0_lo = denoise_lo(lo, sigma)
            x0_hi = denoise_hi(hi, sigma)
            u = progress(sigma)
            factor = jnp.clip(1.0 - _ease_out_cubic(u / end_u), 0.0, 1.0)
            # random map per sample, fixed across steps
            rmap_hi = rngu.batched_uniform(keys, (target_h, target_w, 1))
            rmap_lo = rmap_hi[:, oy:oy + natural_h, ox:ox + natural_w]
            # hi <- structure from lo (upscaled)
            lo_up = jax.image.resize(
                x0_lo, (x0_lo.shape[0], target_h, target_w, x0_lo.shape[-1]),
                "bicubic")
            x0_hi = jnp.where(rmap_hi < factor, lo_up.astype(x0_hi.dtype),
                              x0_hi)
            # lo <- detail from hi (downscaled center)
            hi_dn = jax.image.resize(
                x0_hi, (x0_hi.shape[0], natural_h, natural_w,
                        x0_hi.shape[-1]), "bicubic")
            x0_lo = jnp.where(rmap_lo < factor, hi_dn.astype(x0_lo.dtype),
                              x0_lo)
            return pack(x0_lo, x0_hi)

        return wrapped

    return wrap, pack, unpack


def make_graft(keys, start_u: float = 0.1):
    """Graft two denoisers (reference GraftUnets,
    gyre/pipeline/unet/graft.py:16-56 — powers "graftedpaint"): the root
    model (e.g. SD1.5-inpaint) carries the structure; past start_u the top
    model's (e.g. SD2.1) predictions blend in via an eased random map until
    it fully takes over."""

    def wrap(dn_root, dn_top, progress):
        def wrapped(x, sigma):
            u = progress(sigma)
            x0_root = dn_root(x, sigma)
            x0_top = dn_top(x, sigma)
            factor = jnp.clip(
                _ease_out_cubic((u - start_u) / (1.0 - start_u)), 0.0, 1.0)
            rmap = rngu.batched_uniform(keys, x0_root.shape[1:-1] + (1,))
            return jnp.where(rmap < factor, x0_top.astype(x0_root.dtype),
                             x0_root)

        return wrapped

    return wrap


def make_inpaint9_inputs(mask_keep, masked_image_latents):
    """Extra-channel builder for the 9-channel runway inpaint unet: the
    model consumes [x(4) | mask(1) | masked_latents(4)], with the extra
    channels NOT sigma-scaled (reference EnhancedRunwayInpaintMode,
    gyre/pipeline/unified_pipeline.py:648-696)."""
    mask_gen = 1.0 - mask_keep  # runway convention: 1 = regenerate

    def wrap_model(model_fn):
        def wrapped(x, t, context, **kw):
            b = x.shape[0]
            reps = b // mask_gen.shape[0]
            m = jnp.tile(mask_gen, (reps, 1, 1, 1)).astype(x.dtype)
            ml = jnp.tile(masked_image_latents, (reps, 1, 1, 1)).astype(x.dtype)
            x9 = jnp.concatenate([x, m, ml], axis=-1)
            return model_fn(x9, t, context, **kw)

        return wrapped

    return wrap_model


def make_extra_channels_wrapper(extra: jnp.ndarray):
    """Generic unscaled channel concat (depth2img's 5th channel; reference
    UnetWithExtraChannels, gyre/pipeline/unet/core.py)."""

    def wrap_model(model_fn):
        def wrapped(x, t, context, **kw):
            reps = x.shape[0] // extra.shape[0]
            e = jnp.tile(extra, (reps, 1, 1, 1)).astype(x.dtype)
            return model_fn(jnp.concatenate([x, e], axis=-1), t, context, **kw)

        return wrapped

    return wrap_model
