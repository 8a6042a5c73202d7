"""Latent diffusion upscaler (SD-x4 upscaler family).

The reference wraps diffusers' StableDiffusionUpscalePipeline
(gyre/pipeline/upscalers/diffusers_upscaler_wrapper.py, 217 LoC). Here the
same topology runs through this framework's denoiser/sampler machinery:

  * 7-channel UNet: [latents(4) | low-res RGB(3)], conditioned on the text
    context and a noise-level class embedding;
  * noise augmentation of the low-res conditioning image;
  * a 4x VAE (3-block) decodes latents at low-res resolution to 4x pixels.

Random-init in zero-egress deployments, weight-loadable via models/load.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import configs
from ..models.modelset import ModelSet, random_modelset
from ..utils import rng as rngu
from . import denoiser, prompts, samplers
from . import schedule as sched

UNET_X4 = configs.UNetConfig(
    in_channels=7,
    block_out_channels=(64, 128, 256, 256),
    num_heads=(8, 8, 8, 8),
    cross_attention_dim=768,
    class_embed=True,
)
VAE_X4 = configs.VAEConfig(block_out_channels=(128, 256, 512),
                           scaling_factor=0.08333)
X4_CONFIG = configs.ModelSetConfig(
    unet=UNET_X4, vae=VAE_X4, text_encoders=(configs.CLIP_VIT_L,),
    sample_size=128)
X4_TEST_CONFIG = configs.ModelSetConfig(
    unet=dataclasses.replace(UNET_X4, block_out_channels=(16, 32, 64, 64),
                             num_heads=(4, 4, 4, 4), cross_attention_dim=64,
                             time_embed_dim=64, norm_groups=8),
    vae=configs.VAEConfig(block_out_channels=(16, 32, 64), norm_groups=8,
                          scaling_factor=0.08333),
    text_encoders=(configs.CLIP_TEST,), sample_size=16)

configs.PRESETS["upscaler-x4"] = X4_CONFIG
configs.PRESETS["upscaler-x4-test"] = X4_TEST_CONFIG


class DiffusionUpscaler:
    """Text-guided 4x latent upscaler."""

    def __init__(self, modelset: ModelSet, compute_dtype=jnp.float32):
        self.ms = modelset
        self.compute_dtype = compute_dtype
        self._core = None

    @classmethod
    def random(cls, test: bool = True, seed: int = 0,
               compute_dtype=jnp.float32):
        cfg = X4_TEST_CONFIG if test else X4_CONFIG
        return cls(random_modelset(cfg, seed=seed, dtype=compute_dtype,
                                   engine_id="upscaler-x4"),
                   compute_dtype=compute_dtype)

    def __call__(self, image, *, prompt: str = "", steps: int = 20,
                 seeds=None, guidance_scale: float = 7.5,
                 noise_level: int = 20, sampler: str = "k_dpmpp_2m"):
        """image [B,H,W,3] 0..1 -> [B,4H,4W,3]."""
        from ..models import clip as clip_mod
        from ..models import unet as unet_mod
        from ..models import vae as vae_mod

        ms = self.ms
        img = jnp.asarray(image, jnp.float32)
        b = img.shape[0]
        seeds = seeds if seeds is not None else list(range(b))
        keys = rngu.keys_for_seeds(np.asarray(seeds, np.uint32))

        ids, w, _ = prompts.tokenize_weighted(
            ms.tokenizer, prompts.WeightedPrompt.parse(prompt or ""))
        te_cfg = ms.config.text_encoders[0]
        ctx = clip_mod.apply(ms.text_params[0], te_cfg,
                             jnp.asarray(ids[:1]))["last"]
        ctx_g = jnp.tile(ctx, (b, 1, 1))
        ctx_u = jnp.tile(clip_mod.apply(
            ms.text_params[0], te_cfg,
            jnp.asarray(prompts.tokenize_weighted(
                ms.tokenizer, prompts.WeightedPrompt.parse(""))[0][:1])
        )["last"], (b, 1, 1))

        sigmas = jnp.asarray(
            sched.build_sigmas(ms.schedule, steps, karras_rho=7.0),
            jnp.float32)
        cdt = self.compute_dtype
        unet_cfg = ms.config.unet

        # noise-augment the conditioning image (reference/diffusers
        # low_res noise_level augmentation)
        aug_noise = rngu.batched_stream_normal(keys, "lowres_aug", 0,
                                               img.shape[1:], jnp.float32)
        aug_sigma = float(np.sqrt(
            (1 - ms.schedule.alphas_cumprod[noise_level]) /
            ms.schedule.alphas_cumprod[noise_level]))
        low_res = (img * 2 - 1) + aug_noise * aug_sigma
        levels = jnp.full((b,), float(noise_level), jnp.float32)

        def model_fn(x, t, context, **kw):
            reps = x.shape[0] // low_res.shape[0]
            lr = jnp.tile(low_res, (reps, 1, 1, 1)).astype(cdt)
            lv = jnp.tile(levels, (reps,))
            x7 = jnp.concatenate([x.astype(cdt), lr], axis=-1)
            out = unet_mod.apply(ms.unet_params, unet_cfg, x7, t,
                                 context.astype(cdt), class_labels=lv)
            return out.astype(jnp.float32)

        model = denoiser.cfg_model(model_fn, ctx_u, ctx_g,
                                   jnp.float32(guidance_scale))
        dn = denoiser.make_denoiser(model, ms.schedule)

        @jax.jit
        def run(keys, sigmas):
            shape = img.shape[1:3] + (4,)
            x = rngu.batched_stream_normal(keys, "init", 0, shape) * \
                sigmas[0]

            def noise_fn(i, tag):
                return rngu.batched_stream_normal(keys, tag, i, shape)

            x0 = samplers.sample(sampler, dn, x, sigmas, noise_fn,
                                 samplers.SamplerParams())
            z = (x0 / ms.config.vae.scaling_factor).astype(cdt)
            out = vae_mod.decode(ms.vae_params, ms.config.vae, z)
            return jnp.clip(out.astype(jnp.float32) * 0.5 + 0.5, 0, 1)

        return run(keys, sigmas)


# ------------------------------------------------------------- x2 latent

# The sd-x2 latent upscaler (reference serves it via diffusers'
# StableDiffusionLatentUpscalePipeline, config/engines/upscaler.yaml:6-15):
# the k-upscaler UNet (models/kunet.py — fourier time embedding,
# ada_group FiLM resnets, KAttentionBlocks, blur resampling, no mid
# block) denoising 2x-resolution latents conditioned on the
# nearest-upsampled source latents (8 input channels) with
# c_noise = 0.25*ln(sigma) continuous noise conditioning. At load time
# the config is re-derived from the checkpoint's tensor shapes
# (models/kunet.load_kunet), so real weights dictate the architecture;
# the strict loader + torch-oracle parity live in tests/test_kunet.py.
from ..models import kunet as kunet_mod

X2_CONFIG = configs.ModelSetConfig(
    unet=kunet_mod.X2_DEFAULT, text_encoders=(configs.CLIP_VIT_L,),
    sample_size=128)
X2_TEST_CONFIG = configs.ModelSetConfig(
    unet=dataclasses.replace(kunet_mod.X2_TEST, cross_attention_dim=64),
    vae=configs.VAEConfig(block_out_channels=(16, 32, 64, 64),
                          norm_groups=8),
    text_encoders=(configs.CLIP_TEST,), sample_size=16)

configs.PRESETS["upscaler-x2"] = X2_CONFIG
configs.PRESETS["upscaler-x2-test"] = X2_TEST_CONFIG


class LatentUpscalerX2:
    """Text-guided 2x latent upscaler (k-upscaler conditioning)."""

    def __init__(self, modelset: ModelSet, compute_dtype=jnp.float32):
        self.ms = modelset
        self.compute_dtype = compute_dtype

    @classmethod
    def random(cls, test: bool = True, seed: int = 0,
               compute_dtype=jnp.float32):
        cfg = X2_TEST_CONFIG if test else X2_CONFIG
        return cls(random_modelset(cfg, seed=seed, dtype=compute_dtype,
                                   engine_id="upscaler-x2"),
                   compute_dtype=compute_dtype)

    def __call__(self, image, *, prompt: str = "", steps: int = 30,
                 seeds=None, guidance_scale: float = 7.5,
                 sampler: str = "k_euler"):
        """image [B,H,W,3] 0..1 -> [B,2H,2W,3] (via 2x latent diffusion)."""
        from ..models import clip as clip_mod
        from ..models import unet as unet_mod
        from ..models import vae as vae_mod

        ms = self.ms
        img = jnp.asarray(image, jnp.float32)
        b = img.shape[0]
        seeds = seeds if seeds is not None else list(range(b))
        keys = rngu.keys_for_seeds(np.asarray(seeds, np.uint32))
        cdt = self.compute_dtype
        sf = ms.config.vae.scaling_factor

        ids, _, _ = prompts.tokenize_weighted(
            ms.tokenizer, prompts.WeightedPrompt.parse(prompt or ""))
        te_cfg = ms.config.text_encoders[0]
        ctx_g = jnp.tile(clip_mod.apply(
            ms.text_params[0], te_cfg, jnp.asarray(ids[:1]))["last"],
            (b, 1, 1))
        uids, _, _ = prompts.tokenize_weighted(
            ms.tokenizer, prompts.WeightedPrompt.parse(""))
        ctx_u = jnp.tile(clip_mod.apply(
            ms.text_params[0], te_cfg, jnp.asarray(uids[:1]))["last"],
            (b, 1, 1))

        sigmas = jnp.asarray(
            sched.build_sigmas(ms.schedule, steps, karras_rho=7.0),
            jnp.float32)

        @jax.jit
        def run(keys, sigmas, img, ctx_u, ctx_g, gs):
            mean, _ = vae_mod.encode(ms.vae_params, ms.config.vae,
                                     (img * 2 - 1).astype(cdt))
            lat = mean.astype(jnp.float32) * sf
            bb, h, w, c = lat.shape
            cond = jax.image.resize(lat, (bb, h * 2, w * 2, c), "nearest")

            def model_fn(x, t, context, **kw):
                reps = x.shape[0] // cond.shape[0]
                cc = jnp.tile(cond, (reps, 1, 1, 1)).astype(cdt)
                x8 = jnp.concatenate([x.astype(cdt), cc], axis=-1)
                # t IS c_noise = 0.25*ln(sigma) (set in dn below); the
                # K-UNet's fourier embedding consumes it directly
                out = kunet_mod.apply(ms.unet_params, ms.config.unet, x8,
                                      t, context.astype(cdt))
                return out.astype(jnp.float32)

            model = denoiser.cfg_model(model_fn, ctx_u, ctx_g, gs)

            def dn(x, sigma):
                # epsilon-pred in sigma space with c_noise conditioning
                sig = jnp.asarray(sigma, jnp.float32)
                c_in = 1.0 / jnp.sqrt(sig ** 2 + 1.0)
                t = jnp.full((x.shape[0],), 0.0, jnp.float32) + \
                    0.25 * jnp.log(jnp.maximum(sig, 1e-8))
                eps = model(x * c_in, t)
                return x - sig * eps

            shape = (h * 2, w * 2, c)
            x = rngu.batched_stream_normal(keys, "init", 0, shape) * \
                sigmas[0]

            def noise_fn(i, tag):
                return rngu.batched_stream_normal(keys, tag, i, shape)

            x0 = samplers.sample(sampler, dn, x, sigmas, noise_fn,
                                 samplers.SamplerParams())
            out = vae_mod.decode(ms.vae_params, ms.config.vae,
                                 (x0 / sf).astype(cdt))
            return jnp.clip(out.astype(jnp.float32) * 0.5 + 0.5, 0, 1)

        return run(keys, sigmas, img, ctx_u, ctx_g,
                   jnp.float32(guidance_scale))
