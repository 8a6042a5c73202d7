"""UnifiedPipeline: the generation engine.

The TPU-native re-design of the reference's UnifiedPipeline
(gyre/pipeline/unified_pipeline.py:1722-2538): instead of an object graph of
unet wrappers invoked per step from python, the whole denoise loop — CFG,
mode blending, sampler update — is composed functionally and compiled into
ONE XLA program per static signature (batch, size, sampler, steps, mode,
prompt-chunk count). Dynamic values (sigmas, contexts, seeds, guidance
scale) are traced arguments, so e.g. changing cfg_scale or seed never
recompiles.

Text encode and VAE encode/decode are their own cached jits (they're
per-request, not per-step).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip as clip_mod
from ..models import unet as unet_mod
from ..models import vae as vae_mod
from ..utils import rng as rngu
from . import denoiser, modes, prompts, samplers
from . import schedule as sched


@dataclass(frozen=True)
class StaticSpec:
    """Everything that shapes the compiled program. Hashable = jit key."""

    batch: int
    height: int          # latent height
    width: int           # latent width
    sampler: str
    steps: int           # len(sigmas) - 1
    mode: str            # txt2img | img2img | inpaint | inpaint9
    guided: bool
    chunks: int          # prompt chunks (context length = chunks*75+2)
    tiling: tuple        # (tiling_x, tiling_y)
    cfg_parallel: bool = True
    n_controlnets: int = 0
    # per-controlnet cfg_only flags (priority=hint: residuals reach only
    # the guided CFG half; reference unified_pipeline.py:996-1015). Static
    # because it changes which batch rows the controlnet twin runs on.
    cn_cfg_only: tuple = ()
    has_adapter: bool = False
    has_adapter_g: bool = False  # cfg_only adapter states (guided half)
    hires: tuple | None = None   # (natural_h, natural_w) latent dims
    graft_cfg: object = None     # top model's UNetConfig (hashable)
    graft_prediction: str = "epsilon"
    clip_guidance: float = 0.0   # CLIP-gradient steering scale
    clip_cfg: object = None      # ClipGuidanceConfig (frozen, hashable)
    clip_flat: bool = False      # flat-loss schedule tripped: stop guiding
    noise_type: str = "normal"   # normal | brownian
    warmup_lms: bool = False     # dpm++2m midpoint warmup (graph shape)
    tome_ratio: float = 0.0      # token-merging fraction (0 = off)
    resume: bool = False         # chunked dispatch: x carried in, no init
    final_chunk: bool = True     # apply final blends / return x0


def _make_noise_fn(keys, sigmas, shape, noise_type: str):
    """Per-sample sampler noise, keyed by GLOBAL step index i (samplers
    scan global indices, so chunked dispatch draws identical noise).
    "normal" keys noise by step index; "brownian" keys it by the quantized
    sigma of the step, so draws are consistent across step counts (the
    reference's BrownianTreeNoiseSampler property,
    gyre/pipeline/common_scheduler.py:596-610, without torchsde's tree
    subdivision)."""

    def noise_fn(i, tag):
        if noise_type == "brownian":
            q = (jnp.log(jnp.maximum(sigmas[i], 1e-6)) * 256.0).astype(
                jnp.int32)
            sub = jax.vmap(lambda k: jax.random.fold_in(
                rngu.stream(k, tag), q))(keys)
            return jax.vmap(
                lambda k: jax.random.normal(k, shape, jnp.float32))(sub)
        return rngu.batched_stream_normal(keys, tag, i, shape)

    return noise_fn


class UnifiedPipeline:
    """Bundles one engine's models and serves generation requests."""

    def __init__(self, modelset, compute_dtype=jnp.bfloat16, graft_ms=None):
        self.ms = modelset
        self.graft_ms = graft_ms   # top model for grafted generation
        self.compute_dtype = compute_dtype
        self._core_cache: dict = {}
        self._fn_cache: dict = {}
        self._graft_pipe = (UnifiedPipeline(graft_ms, compute_dtype)
                            if graft_ms is not None else None)
        self._clip_vision = None      # lazy (params, cfg) for guidance
        self._clip_vision_cfg = None
        self._clip_text = None        # full-CLIP text tower (joint space)
        self._clip_text_cfg = None
        # set by the manager when the engine configures `clip:` — a
        # callable returning (text_params, text_cfg, vision_params,
        # vision_cfg) for a real CLIPModel (reference clip-common,
        # gyre/config/models/clip.yaml + gyre/manager.py:1540-1560)
        self.clip_source = None

    def clip_vision(self):
        """CLIP vision tower for guidance/style hints. Loads the real
        CLIPModel configured via the engine's `clip:` key (reference
        gyre/pipeline/unet/clipguided.py:94-420 consumes it); random-init
        is a logged last-resort fallback so the compute graph stays
        runnable in weightless test setups."""
        if self._clip_vision is None:
            from ..models import clip as clip_mod

            if self.clip_source is not None:
                (self._clip_text, self._clip_text_cfg,
                 self._clip_vision, self._clip_vision_cfg) = \
                    self.clip_source()
            else:
                import logging

                import dataclasses as dc

                logging.getLogger(__name__).warning(
                    "engine %s has no `clip:` model configured — CLIP "
                    "guidance / style hints will use a RANDOM-INIT vision"
                    " tower (noise steering). Configure a clip model "
                    "(e.g. clip: \"@clip-common\").", self.ms.id)
                text_dim = self.ms.config.text_encoders[0].hidden_size
                base_cfg = (clip_mod.CLIP_VISION_L if text_dim >= 768
                            else clip_mod.CLIP_VISION_TEST)
                cfg = dc.replace(base_cfg, projection_dim=text_dim)
                self._clip_vision_cfg = cfg
                self._clip_vision = clip_mod.vision_init(
                    jax.random.PRNGKey(0), cfg,
                    jnp.float32 if self.compute_dtype == jnp.float32
                    else jnp.bfloat16)
        return self._clip_vision

    def clip_text_target(self, text: str, batch: int) -> jax.Array:
        """Normalized joint-space text embedding target for CLIP
        guidance. With a real CLIP model: the CLIP text tower's projected
        pooled output (the space visual_projection maps images into,
        reference clipguided.py get_text_embedding). Fallback without
        one: the SD text encoder's pooled output (matches the random
        tower's projection_dim hack above)."""
        from ..models import clip as clip_mod
        from . import prompts

        self.clip_vision()  # ensures towers are loaded
        ids, _, _ = prompts.tokenize_weighted(
            self.ms.tokenizer, prompts.WeightedPrompt.parse(text or ""))
        use_clip = self._clip_text is not None
        cfg = (self._clip_text_cfg if use_clip
               else self.ms.config.text_encoders[0])
        key = ("clip_text_target", use_clip)
        if key not in self._fn_cache:

            @jax.jit
            def run(params, ids):
                pooled = clip_mod.apply(params, cfg,
                                        ids)["pooled"].astype(jnp.float32)
                return pooled / jnp.linalg.norm(pooled, axis=-1,
                                                keepdims=True)

            self._fn_cache[key] = run
        params = self._clip_text if use_clip else self.ms.text_params[0]
        pooled = self._fn_cache[key](params, jnp.asarray(ids[:1]))
        return jnp.tile(pooled, (batch, 1))

    # ------------------------------------------------------------- helpers

    def derive(self, new_modelset) -> "UnifiedPipeline":
        """A pipeline view over adapted weights (LoRA/TI/mixes) sharing
        every compiled program with the parent — params are traced
        arguments, so adapters never trigger recompilation."""
        import copy

        view = copy.copy(self)
        view.ms = new_modelset
        return view

    @property
    def schedule(self) -> sched.DiffusionSchedule:
        return self.ms.schedule

    def _encode_ids_fn(self, tower_idx: int, clip_layer: int):
        key = ("encode_ids", tower_idx, clip_layer)
        if key not in self._fn_cache:
            te_cfg = self.ms.config.text_encoders[tower_idx]

            @jax.jit
            def run(params, ids):
                out = clip_mod.apply(params, te_cfg, ids)
                return clip_mod.hidden_for_layer(params, te_cfg, out,
                                                 clip_layer)

            self._fn_cache[key] = run
        run = self._fn_cache[key]
        # params resolved per call so adapter-derived pipelines (LoRA/TI)
        # share the compiled function
        return lambda ids: run(self.ms.text_params[tower_idx], ids)

    def encode_prompt(self, prompt: prompts.WeightedPrompt,
                      pad_to_chunks: int = 0, tower_idx: int = 0,
                      clip_layer: int | None = None) -> jnp.ndarray:
        """Single-tower weighted/long-prompt context. For dual-tower
        models (SDXL) the per-tower contexts concat feature-wise."""
        layer = clip_layer if clip_layer is not None else self.ms.config.clip_layer
        if len(self.ms.config.text_encoders) > 1 and tower_idx == 0:
            parts = [prompts.encode_weighted_prompt(
                self._encode_ids_fn(i, layer), self.ms.tokenizer, prompt,
                pad_to_chunks=pad_to_chunks)
                for i in range(len(self.ms.config.text_encoders))]
            return jnp.concatenate(parts, axis=-1)
        return prompts.encode_weighted_prompt(
            self._encode_ids_fn(tower_idx, layer), self.ms.tokenizer, prompt,
            pad_to_chunks=pad_to_chunks)

    def encode_prompt_list(self, texts, pad_to_chunks: int,
                           clip_layer: int | None = None) -> jnp.ndarray:
        """Batched multi-prompt context [B, T, D]: coalesced requests
        encode all their (distinct) prompts through one tower dispatch
        per tower instead of one small program per sample — 2B CLIP
        dispatches collapse to n_towers on the serving path."""
        layer = (clip_layer if clip_layer is not None
                 else self.ms.config.clip_layer)
        parsed = [prompts.WeightedPrompt.parse(t or "") for t in texts]
        n_tow = len(self.ms.config.text_encoders)
        parts = [prompts.encode_weighted_prompts_batch(
            self._encode_ids_fn(i, layer), self.ms.tokenizer, parsed,
            pad_to_chunks=pad_to_chunks) for i in range(n_tow)]
        return jnp.concatenate(parts, axis=-1) if n_tow > 1 else parts[0]

    def _pooled_fn(self):
        """Jitted pooled-output tower (compiled once per ids batch
        shape). The eager per-op alternative costs ~1 s of per-request
        setup on the remote platform for the SDXL bigG tower."""
        key = ("encode_pooled_fn",)
        if key not in self._fn_cache:
            idx = len(self.ms.config.text_encoders) - 1
            te_cfg = self.ms.config.text_encoders[idx]

            @jax.jit
            def run(params, ids):
                return clip_mod.apply(params, te_cfg, ids)["pooled"]

            self._fn_cache[key] = (idx, run)
        idx, run = self._fn_cache[key]
        return lambda ids: run(self.ms.text_params[idx], ids)

    def encode_pooled_batch(self, texts) -> jnp.ndarray:
        """[B, D] pooled embeddings from the last tower (SDXL's
        text_embeds conditioning comes from the bigG tower), one jitted
        dispatch for the whole list — coalesced batches carry per-sample
        prompts, and positives+negatives ride the same program."""
        ids = np.stack([prompts.tokenize_weighted(
            self.ms.tokenizer, prompts.WeightedPrompt.parse(t or ""))[0][0]
            for t in texts])
        return self._pooled_fn()(jnp.asarray(ids))

    def encode_pooled(self, text: str) -> jnp.ndarray:
        """Pooled embedding [1, D] from the last tower."""
        return self.encode_pooled_batch([text])

    def chunk_count(self, *prompt_texts: str) -> int:
        n = 1
        for text in prompt_texts:
            if not text:
                continue
            p = prompts.WeightedPrompt.parse(text)
            _, _, c = prompts.tokenize_weighted(self.ms.tokenizer, p)
            n = max(n, c)
        return n

    def vae_encode(self, images: jnp.ndarray, keys) -> jnp.ndarray:
        """images [B,H,W,3] in [0,1] -> scaled latents (sampled posterior)."""
        key = ("vae_encode", images.shape)
        if key not in self._fn_cache:
            cfg = self.ms.config.vae

            @jax.jit
            def run(params, img, keys):
                x = (img.astype(self.compute_dtype) * 2.0 - 1.0)
                mean, logvar = vae_mod.encode(params, cfg, x)
                noise = rngu.batched_stream_normal(
                    keys, "vae", 0, mean.shape[1:], mean.dtype)
                z = vae_mod.sample_posterior(mean, logvar, noise)
                return (z * cfg.scaling_factor).astype(jnp.float32)

            self._fn_cache[key] = run
        return self._fn_cache[key](self.ms.vae_params, images, keys)

    # latent size above which the VAE decodes in overlapping tiles (the
    # reference's VAE tiling/slicing vram machinery,
    # gyre/pipeline/pipeline_wrapper.py:181-186; here it bounds HBM for
    # 1536-2048px outputs). 128 latents = 1024px.
    VAE_TILE_THRESHOLD = 160
    VAE_TILE = 96
    VAE_TILE_OVERLAP = 16

    # fixed sigma-ramp length for chunked dispatch: requests with any
    # step count <= 151 (the REST surface clamps at 150,
    # gyre/http/stability_rest_api.py:311-382) share the same compiled
    # chunk programs — a 20-step and a 50-step request differ only in
    # traced values
    SIGMA_PAD = 152

    def vae_decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """scaled latents -> images [B,H,W,3] in [0,1]."""
        b, lh, lw, _ = latents.shape
        if max(lh, lw) > self.VAE_TILE_THRESHOLD:
            return self._vae_decode_tiled(latents)
        return self._vae_decode_whole(latents)

    def _vae_decode_whole(self, latents: jnp.ndarray) -> jnp.ndarray:
        key = ("vae_decode", latents.shape)
        if key not in self._fn_cache:
            cfg = self.ms.config.vae

            @jax.jit
            def run(params, z):
                z = (z / cfg.scaling_factor).astype(self.compute_dtype)
                img = vae_mod.decode(params, cfg, z)
                return jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

            self._fn_cache[key] = run
        return self._fn_cache[key](self.ms.vae_params, latents)

    def _vae_decode_tiled(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Overlapping-tile decode with feathered blending: fixed tile
        shape -> one compiled program for any output size."""
        t, ov = self.VAE_TILE, self.VAE_TILE_OVERLAP
        b, lh, lw, c = latents.shape
        factor = 8
        step = t - 2 * ov
        out = np.zeros((b, lh * factor, lw * factor, 3), np.float32)
        weight = np.zeros((1, lh * factor, lw * factor, 1), np.float32)
        ramp = np.minimum(np.arange(t * factor) + 1,
                          np.arange(t * factor)[::-1] + 1)
        ramp = np.minimum(ramp / (ov * factor), 1.0).astype(np.float32)
        feather = (ramp[:, None] * ramp[None, :])[None, :, :, None]
        ys = sorted({min(y, lh - t) for y in range(0, max(lh - ov, 1), step)})
        xs = sorted({min(x, lw - t) for x in range(0, max(lw - ov, 1), step)})
        for y in ys:
            for x in xs:
                tile = jax.lax.dynamic_slice(latents, (0, y, x, 0),
                                             (b, t, t, c))
                dec = np.asarray(self._vae_decode_whole(tile), np.float32)
                oy, ox = y * factor, x * factor
                out[:, oy:oy + t * factor, ox:ox + t * factor] += \
                    dec * feather
                weight[:, oy:oy + t * factor, ox:ox + t * factor] += feather
        return jnp.asarray(out / np.maximum(weight, 1e-6))

    # ---------------------------------------------------------------- core

    def _chunk_init(self, spec: StaticSpec, keys, init_latents, sigmas):
        """Initial latents as their own tiny compiled program, so every
        dispatch chunk runs the SAME resume=True core program. Without
        this the first chunk (init inlined) and the later chunks are
        different XLA programs — an extra minutes-scale compile on the
        serving cold path for zero arithmetic difference."""
        key = ("chunk_init", spec.mode, spec.height, spec.width)
        if key not in self._fn_cache:
            shape = (spec.height, spec.width,
                     self.ms.config.unet.out_channels)
            natural = self.ms.config.sample_size
            if spec.mode == "txt2img":
                @jax.jit
                def initf(keys, sigma_start):
                    return modes.txt2img_initial(keys, shape, sigma_start,
                                                 natural=natural)
            else:
                @jax.jit
                def initf(init_latents, keys, sigma_start):
                    return modes.img2img_initial(init_latents, keys,
                                                 sigma_start)
            self._fn_cache[key] = initf
        if spec.mode == "txt2img":
            return self._fn_cache[key](keys, sigmas[0])
        return self._fn_cache[key](init_latents, keys, sigmas[0])

    def _build_core(self, spec: StaticSpec):
        """Compile the full denoise loop for one static signature."""
        unet_cfg = self.ms.config.unet
        schedule = self.schedule
        cdt = self.compute_dtype

        def raw_unet(params, x, t, context, **kw):
            out = unet_mod.apply(params, unet_cfg, x.astype(cdt), t,
                                 context.astype(cdt),
                                 tiling=spec.tiling,
                                 tome_ratio=spec.tome_ratio, **kw)
            return out.astype(jnp.float32)

        @jax.jit
        def core(unet_params, sigmas, keys, ctx_u, ctx_g, cfg_scale,
                 init_latents, mask_keep, extra_channels,
                 eta=0.0, churn=0.0, churn_tmin=0.0, churn_tmax=0.0,
                 ddim_cutoff=0.0,
                 controlnets=(), adapter_states=None, adapter_states_g=None,
                 graft=None,
                 clip_vision=None, clip_target=None, vae_params=None,
                 added_u=None, added_g=None, x_resume=None,
                 step_offset=0, carry_in=None, n_total=None):
            # eta/churn knobs are traced scalars: sweeping them never
            # recompiles (they only enter step arithmetic). sigmas is
            # ALWAYS the full request ramp — chunked dispatch scans a
            # global index window, so churn gamma, inpaint blend and
            # progress are independent of segment boundaries.
            p = samplers.SamplerParams(eta=eta, churn=churn,
                                       churn_tmin=churn_tmin,
                                       churn_tmax=churn_tmax,
                                       warmup_lms=spec.warmup_lms,
                                       ddim_cutoff=ddim_cutoff,
                                       n_total=n_total)
            shape = (spec.height, spec.width, unet_cfg.out_channels)
            sigma_start = sigmas[0]
            # final pre-zero sigma: sigmas may be padded past the true
            # ramp for compile-shape sharing, so index by the traced
            # count, not the array tail
            sigma_last = jnp.maximum(
                sigmas[-2] if n_total is None else sigmas[n_total - 1],
                1e-3)

            base_unet = raw_unet
            if spec.n_controlnets or spec.has_adapter or spec.has_adapter_g:
                from ..models import controlnet as cn_mod

                # cfg_only residuals need a known uncond/guided row split:
                # only the fused parallel-CFG layout ([uncond B; guided B])
                # provides one. The pipeline forces cfg_parallel when any
                # cfg_only hint is present, so this is the only live path.
                halves = spec.guided and spec.cfg_parallel

                def base_unet(params, x, t, context, **kw):  # noqa: F811
                    down_res, mid_res = None, None
                    for cn, cfg_only in zip(controlnets, spec.cn_cfg_only):
                        cond_emb = cn["emb"]
                        bh = cond_emb.shape[0]
                        # cfg_only needs exactly [uncond B; guided B] rows;
                        # packed layouts (hires lo/hi) fall back to both
                        if cfg_only and halves and x.shape[0] == 2 * bh:
                            # reference runs the controlnet twin on the
                            # guided half only and zeroes the uncond half
                            # (unified_pipeline.py:996-1015) — half the
                            # controlnet compute, same math
                            xin, tin = x[bh:], t[bh:]
                            ctx_in = context[bh:]
                        else:
                            cfg_only = False
                            xin, tin, ctx_in = x, t, context
                        reps = xin.shape[0] // bh
                        ce = jnp.tile(cond_emb, (reps, 1, 1, 1)).astype(cdt)
                        d, m = cn_mod.apply(cn["params"], unet_cfg,
                                            xin.astype(cdt), tin,
                                            ctx_in.astype(cdt), ce,
                                            conditioning_scale=cn["scale"])
                        lw, masks = cn["lw"], cn.get("masks")

                        def post(r, i, n=len(d), _lw=lw, _masks=masks,
                                 _cfg_only=cfg_only):
                            # soft_injection logspace layer weights: down
                            # residual i uses lw[i], mid uses lw[-1]
                            # (reference zips 13 weights over 12 downs,
                            # unified_pipeline.py:1044-1052)
                            r = r * _lw[min(i, n)].astype(r.dtype)
                            if _masks is not None:
                                r = r * _masks[i].astype(r.dtype)
                            if _cfg_only:
                                r = jnp.concatenate(
                                    [jnp.zeros_like(r), r], axis=0)
                            return r

                        d = [post(r, i) for i, r in enumerate(d)]
                        m = post(m, len(d))
                        down_res = d if down_res is None else \
                            [a + b for a, b in zip(down_res, d)]
                        mid_res = m if mid_res is None else mid_res + m
                    ast = None
                    if spec.has_adapter and adapter_states is not None:
                        ast = [jnp.tile(a, (x.shape[0] // a.shape[0], 1, 1, 1))
                               for a in adapter_states]
                    if spec.has_adapter_g and adapter_states_g is not None:
                        # cfg_only adapter features: zeros for the uncond
                        # rows, features for the guided rows (packed
                        # layouts fall back to tiling over all rows)
                        gst = [jnp.concatenate(
                            [jnp.zeros_like(a), a], axis=0)
                            if halves and x.shape[0] == 2 * a.shape[0]
                            else jnp.tile(
                                a, (x.shape[0] // a.shape[0], 1, 1, 1))
                            for a in adapter_states_g]
                        ast = gst if ast is None else \
                            [a + g for a, g in zip(ast, gst)]
                    return raw_unet(params, x, t, context,
                                    down_residuals=down_res,
                                    mid_residual=mid_res,
                                    adapter_states=ast, **kw)

            model_fn = partial(base_unet, unet_params)
            if spec.mode == "inpaint9":
                wrapm = modes.make_inpaint9_inputs(mask_keep, extra_channels)
                model_fn = wrapm(model_fn)
            elif extra_channels is not None and spec.mode == "depth2img":
                model_fn = modes.make_extra_channels_wrapper(extra_channels)(
                    model_fn)

            extra_u = {"added_cond": added_u} if added_u is not None else None
            extra_g = {"added_cond": added_g} if added_g is not None else None
            if spec.guided:
                model = denoiser.cfg_model(model_fn, ctx_u, ctx_g, cfg_scale,
                                           parallel=spec.cfg_parallel,
                                           extra_uncond=extra_u,
                                           extra_cond=extra_g)
            else:
                model = denoiser.plain_model(
                    model_fn, ctx_g, **(extra_g or {}))

            dn_base = denoiser.make_denoiser(model, schedule)

            if spec.graft_cfg is not None and graft is not None:
                def raw_top(params, x, t, context, **kw):
                    out = unet_mod.apply(params, spec.graft_cfg,
                                         x.astype(cdt), t,
                                         context.astype(cdt),
                                         tiling=spec.tiling, **kw)
                    return out.astype(jnp.float32)

                top_fn = partial(raw_top, graft["unet_params"])
                if spec.guided:
                    top_model = denoiser.cfg_model(
                        top_fn, graft["ctx_u"], graft["ctx_g"], cfg_scale,
                        parallel=spec.cfg_parallel)
                else:
                    top_model = denoiser.plain_model(top_fn, graft["ctx_g"])
                dn_top = denoiser.make_denoiser(
                    top_model, schedule,
                    prediction_type=spec.graft_prediction)
                gwrap = modes.make_graft(keys)
                progress = modes.log_progress(sigmas[0], sigma_last)
                dn_base = gwrap(dn_base, dn_top, progress)

            dn_unguided = dn_base
            clip_vae_decode = None
            ccfg = spec.clip_cfg
            if spec.clip_guidance > 0 and clip_vision is not None:
                from . import clip_guidance as cg

                if ccfg is None:
                    ccfg = cg.ClipGuidanceConfig(
                        guidance_scale=spec.clip_guidance)
                if ((ccfg.vae_cutouts or ccfg.no_cutouts == "vae") and
                        vae_params is not None):
                    def clip_vae_decode(z):
                        return vae_mod.decode(
                            vae_params, self.ms.config.vae,
                            z.astype(cdt)).astype(jnp.float32)
                cond_stem = None
                if spec.guided and ccfg.guidance_base == "guided":
                    cond_model = denoiser.plain_model(
                        model_fn, ctx_g, **(extra_g or {}))
                    cond_stem = denoiser.make_denoiser(cond_model, schedule)
                if not spec.clip_flat:
                    dn_base = cg.make_clip_guided_denoiser(
                        dn_base, clip_vision, self._clip_vision_cfg,
                        clip_target, keys, config=ccfg,
                        cond_stem=cond_stem, vae_decode=clip_vae_decode)

            dn = dn_base

            final_blend = None
            if spec.mode == "inpaint":
                wrap, final_blend = modes.make_inpaint_blend(
                    init_latents, mask_keep, sigmas[0], sigma_last)
                dn = wrap(dn_base)

            if spec.hires is not None:
                nh, nw = spec.hires
                hwrap, pack, unpack = modes.make_hires_fix(
                    keys, nh, nw, spec.height, spec.width)
                progress = modes.log_progress(sigmas[0], sigma_last)
                # per-step blending (inpaint) applies at target res only
                dn2 = hwrap(dn_base, dn, progress)
                if spec.mode == "txt2img":
                    hi = modes.txt2img_initial(keys, shape, sigma_start)
                    lo_keys = jax.vmap(
                        lambda k: rngu.stream(k, "hires_lo"))(keys)
                    lo = modes.txt2img_initial(
                        lo_keys, (nh, nw, shape[-1]), sigma_start)
                else:
                    hi = modes.img2img_initial(init_latents, keys,
                                               sigma_start)
                    lo_init = jax.image.resize(
                        init_latents,
                        (init_latents.shape[0], nh, nw,
                         init_latents.shape[-1]), "bicubic")
                    lo = modes.img2img_initial(lo_init, keys, sigma_start)
                x = pack(lo, hi)
                keys2 = jnp.concatenate(
                    [jax.vmap(lambda k: rngu.stream(k, "lo"))(keys), keys])

                noise_fn = _make_noise_fn(
                    keys2, sigmas, (spec.height, spec.width, shape[-1]),
                    spec.noise_type)
                x0 = samplers.sample(spec.sampler, dn2, x, sigmas,
                                     noise_fn, p)
                _, x0 = unpack(x0)
                if final_blend is not None:
                    x0 = final_blend(x0)
                return x0, (), {}

            if spec.resume:
                # chunked dispatch: continue from carried sigma-space state
                x = x_resume
            elif spec.mode == "txt2img":
                x = modes.txt2img_initial(
                    keys, shape, sigma_start,
                    natural=self.ms.config.sample_size)
            else:
                x = modes.img2img_initial(init_latents, keys, sigma_start)

            noise_fn = _make_noise_fn(keys, sigmas, shape, spec.noise_type)
            x0, carry_out = samplers.sample(
                spec.sampler, dn, x, sigmas, noise_fn, p,
                start=step_offset, steps=spec.steps, carry=carry_in,
                return_carry=True, first=not spec.resume)
            aux = {}
            if (spec.clip_guidance > 0 and clip_vision is not None and
                    not spec.clip_flat and not spec.final_chunk):
                # flat-loss schedule input: one unguided loss evaluation
                # per dispatch chunk (reference records per-step on the
                # host, clipguided.py:152-173 — here the history is
                # per-chunk, checked between chunks)
                from . import clip_guidance as cg

                sigma_end = jnp.maximum(
                    sigmas[step_offset + spec.steps], 1e-4)
                x0_est = dn_unguided(x0, sigma_end)
                aux["clip_loss"] = cg.guidance_loss(
                    x0_est, keys, clip_vision, self._clip_vision_cfg,
                    clip_target, ccfg, vae_decode=clip_vae_decode)
            if spec.final_chunk and final_blend is not None:
                x0 = final_blend(x0)
            return x0, carry_out, aux

        return core

    def core(self, spec: StaticSpec):
        if spec not in self._core_cache:
            self._core_cache[spec] = self._build_core(spec)
        return self._core_cache[spec]

    # ------------------------------------------------------------ generate

    def __call__(self, **kwargs):
        """Run generation; returns images [B,H,W,3] float32 in [0,1].
        See _generate for the argument surface."""
        gen = self._generate(**kwargs)
        while True:
            try:
                next(gen)
            except StopIteration as e:
                return e.value

    def begin(self, **kwargs):
        """Chunk-granular stepper for the dispatcher: a generator that
        yields (steps_done, steps_total) after every compiled chunk
        dispatch; its StopIteration value is the images (or None on
        cancel). Lets the single device-owner thread interleave several
        requests at chunk granularity — this framework's answer to the
        reference's per-GPU device pool (gyre/manager.py:2081-2139),
        where long requests can't head-of-line-block short ones because
        each GPU is its own queue."""
        return self._generate(**kwargs)

    def _generate(self, *,
                 prompt: str = "",
                 negative_prompt: str = "",
                 height: int = 512,
                 width: int = 512,
                 steps: int = 50,
                 sampler: str = "k_dpmpp_2m",
                 seeds=None,
                 num_samples: int = 1,
                 guidance_scale: float = 7.5,
                 init_image=None,          # [B,H,W,3] float 0..1
                 mask_image=None,          # [B,H,W,1] float, 1 = REGENERATE
                 strength: float = 0.8,
                 eta: float | None = None,
                 churn: float = 0.0,
                 churn_tmin: float = 0.0,
                 churn_tmax: float = 0.0,
                 warmup_lms: bool = False,
                 ddim_cutoff: float = 0.0,
                 karras_rho: float | None = None,
                 sigma_min: float | None = None,
                 sigma_max: float | None = None,
                 masked_area_init: str = "shaped",
                 tiling: bool | str = False,
                 hints: list | None = None,
                 depth_map=None,           # [B,H,W,1] for depth2img unets
                 hires_fix: bool | None = None,
                 hires_oos_fraction: float = 0.25,
                 clip_guidance_scale: float = 0.0,
                 clip_cutouts: int = 4,
                 clip_guidance_options: dict | None = None,
                 clip_layer: int = 0,
                 noise_type: str = "normal",
                 tome_ratio: float = 0.0,
                 cfg_sequential: bool = False,
                 progress_callback=None,
                 stop_event=None,
                 chunk_steps: int = 0,
                 return_latents: bool = False,
                 output_dtype: str | None = None):
        """Generator body behind __call__/begin; returns images
        [B,H,W,3] float32 in [0,1] (via StopIteration.value).

        mask convention: the proto/reference mask is white=regenerate
        (gyre/services/generate.py mask handling); internally we keep
        mask_keep = 1-mask.
        """
        ms = self.ms
        factor = 8
        lh, lw = height // factor, width // factor

        if seeds is None:
            seeds = list(range(num_samples))
        batch = len(seeds)
        keys = rngu.keys_for_seeds(np.asarray(seeds, np.uint32))

        mode = "txt2img"
        if init_image is not None:
            mode = "img2img"
        if mask_image is not None:
            mode = "inpaint9" if ms.config.unet.in_channels == 9 else "inpaint"
        elif ms.config.unet.in_channels == 5:
            mode = "depth2img"  # depth-conditioned unet (SD2-depth family)

        # default eta: ancestral k-samplers expect 1, ddim defaults 0
        if eta is None:
            eta = 1.0 if ("ancestral" in sampler or "sde" in sampler
                          or sampler == "ddpm") else 0.0

        full_strength = mode == "txt2img" or init_image is None or (
            mask_image is not None and strength >= 1.0)
        sigmas_np = sched.build_sigmas(
            self.schedule, steps,
            strength=1.0 if full_strength else min(strength, 1.0),
            karras_rho=karras_rho, sigma_min=sigma_min, sigma_max=sigma_max,
            uniform_lambda=(sampler == "dpm_fast"),
            spacing=("leading"
                     if sampler in samplers.DIFFUSERS_GRID_SAMPLERS
                     else "linspace"))
        sigmas = jnp.asarray(sigmas_np, jnp.float32)

        # prompts may be per-sample lists (request coalescing merges
        # different prompts/cfg scales into one batch)
        prompt_list = prompt if isinstance(prompt, (list, tuple)) else None
        neg_list = negative_prompt \
            if isinstance(negative_prompt, (list, tuple)) else None
        gs = np.asarray(guidance_scale, np.float32).reshape(-1)
        guided = bool((gs > 1.0).any())
        gs_arg = (jnp.asarray(np.broadcast_to(gs, (batch,)))
                  if gs.size > 1 else jnp.float32(float(gs[0])))

        # per-request CLIP-skip (reference text_embedding_layer /
        # prompt clip_layer, gyre/pipeline/text_embedding/): 0 = engine
        # default, negative = hidden layer from the end
        layer = clip_layer if clip_layer else None

        if prompt_list is not None:
            # row-alignment contract: the guided split below (and the
            # pooled SDXL path) slice enc[:batch]/enc[batch:], so a
            # short prompt list would silently mix positives and
            # negatives and fail later with a confusing UNet shape error
            if len(prompt_list) != batch:
                raise ValueError(
                    f"prompt list has {len(prompt_list)} entries but "
                    f"{batch} seeds — per-sample prompts must be "
                    "row-aligned with seeds")
            if neg_list is not None and len(neg_list) != batch:
                raise ValueError(
                    f"negative prompt list has {len(neg_list)} entries "
                    f"but {batch} seeds — per-sample negative prompts "
                    "must be row-aligned with seeds")
            chunks = self.chunk_count(*(list(prompt_list) +
                                        list(neg_list or [])))
            if guided:
                negs = neg_list or [""] * batch
                enc = self.encode_prompt_list(
                    list(prompt_list) + list(negs), chunks, clip_layer=layer)
                ctx_g, ctx_u = enc[:batch], enc[batch:]
            else:
                ctx_g = self.encode_prompt_list(list(prompt_list), chunks,
                                                clip_layer=layer)
                ctx_u = ctx_g
        else:
            chunks = self.chunk_count(prompt, negative_prompt or "")
            ctx_g = self.encode_prompt(
                prompts.WeightedPrompt.parse(prompt or ""),
                pad_to_chunks=chunks, clip_layer=layer)
            ctx_g = jnp.tile(ctx_g[None], (batch, 1, 1))
            if guided:
                ctx_u = self.encode_prompt(
                    prompts.WeightedPrompt.parse(negative_prompt or ""),
                    pad_to_chunks=chunks, clip_layer=layer)
                ctx_u = jnp.tile(ctx_u[None], (batch, 1, 1))
            else:
                ctx_u = ctx_g

        init_latents = jnp.zeros((batch, lh, lw, 4), jnp.float32)
        mask_keep = jnp.ones((batch, lh, lw, 1), jnp.float32)
        extra = None

        if init_image is not None:
            init_latents = self.vae_encode(jnp.asarray(init_image), keys)

        if mask_image is not None:
            # latent-resolution mask via box downscale (the reference's
            # mask pyramid seed, gyre/pipeline/unified_pipeline.py:340-373)
            m = jnp.asarray(mask_image, jnp.float32)
            m = m.reshape(batch, lh, factor, lw, factor, -1).mean((2, 4))
            m = m[..., :1]
            mask_keep = 1.0 - m
            if mode == "inpaint":
                if strength >= 1.0 and masked_area_init == "shaped":
                    init_latents = modes.shaped_noise_fill(
                        init_latents, (mask_keep > 0.5).astype(jnp.float32),
                        keys)
                elif masked_area_init in ("zero", "random"):
                    init_latents = modes.masked_area_fill(
                        init_latents, (mask_keep > 0.5).astype(jnp.float32),
                        keys, masked_area_init)
            else:  # inpaint9: masked image latents as extra channels
                hard_keep = (mask_keep > 0.5).astype(jnp.float32)
                masked_img = jnp.asarray(init_image) * \
                    jax.image.resize(hard_keep, (batch, height, width, 1),
                                     "nearest")
                extra = self.vae_encode(masked_img, keys)
                mk8 = hard_keep
                mask_keep = mk8
                # 9-channel inpaint diffuses the full canvas from noise
                init_latents = self.vae_encode(jnp.asarray(init_image), keys)

        if mode == "depth2img":
            # 5th unet channel: latent-res depth map, normalized to [-1,1]
            # (reference UnetWithExtraChannels, gyre/pipeline/unet/core.py)
            if depth_map is None and init_image is not None:
                from ..ops import images as I

                g = I.gaussian_blur(I.to_grayscale(jnp.asarray(init_image)),
                                    2.0)
                depth_map = I.normalise(g)
            if depth_map is None:
                raise ValueError("depth2img engine needs a depth_map or "
                                 "init image")
            d = jnp.asarray(depth_map, jnp.float32)[..., :1]
            d = jax.image.resize(d, (batch, lh, lw, 1), "bilinear")
            dmin = jnp.min(d, axis=(1, 2, 3), keepdims=True)
            dmax = jnp.max(d, axis=(1, 2, 3), keepdims=True)
            extra = 2.0 * (d - dmin) / jnp.maximum(dmax - dmin, 1e-6) - 1.0

        if isinstance(tiling, str):
            tiling_xy = (tiling in ("x", "xy", "both", "true"),
                         tiling in ("y", "xy", "both", "true"))
        else:
            tiling_xy = (bool(tiling), bool(tiling))

        # hint stack: controlnet cond embeddings + t2i adapter states are
        # x/t-independent -> computed outside the compiled step. Per-hint
        # priority semantics (reference unified_pipeline.py:2028-2032):
        #   balanced -> uniform weights, both CFG halves
        #   prompt   -> soft_injection (logspace per-layer weights)
        #   hint     -> soft_injection + cfg_only (guided half only)
        # Per-hint masks are resized to every residual resolution HERE
        # (x-independent) instead of per-step like the reference.
        controlnets = []
        cn_cfg_only = []
        adapter_states = None
        adapter_states_g = None

        def _hint_mask(hint):
            mk = hint.get("mask")
            if mk is None:
                return None
            mk = jnp.asarray(mk, jnp.float32)
            if mk.ndim == 3:
                mk = mk[None]
            return mk[:1, :, :, :1]  # [1,H,W,1], broadcast over batch

        def _level_masks(mask, resolutions):
            return tuple(
                jax.image.resize(mask, (1, rh, rw, 1), "bilinear")
                for rh, rw in resolutions)

        for hint in hints or []:
            img = jnp.asarray(hint["image"], jnp.float32)
            if img.shape[0] != batch:
                img = jnp.broadcast_to(img, (batch,) + img.shape[1:])
            soft = bool(hint.get("soft_injection"))
            cfg_only = bool(hint.get("cfg_only")) and guided
            if hint.get("kind") == "style":
                # style tokens appended to the cond context (uncond side
                # zero-padded; reference style-adapter call,
                # gyre/pipeline/unified_pipeline.py:834-954)
                from ..models import clip as clip_mod
                from ..models import t2i_adapter as t2i_mod

                vision = self.clip_vision()
                size = self._clip_vision_cfg.image_size
                simg = jax.image.resize(img, (batch, size, size, 3),
                                        "bilinear")
                vout = clip_mod.vision_apply(
                    vision, self._clip_vision_cfg,
                    clip_mod.preprocess_image(simg))
                style = t2i_mod.style_apply(hint["params"], vout["tokens"])
                style = style * float(hint.get("scale", 1.0))
                ctx_g = jnp.concatenate([ctx_g, style.astype(ctx_g.dtype)],
                                        axis=1)
                ctx_u = jnp.concatenate(
                    [ctx_u, jnp.zeros_like(style).astype(ctx_u.dtype)],
                    axis=1)
                continue
            if hint.get("kind", "controlnet") == "controlnet":
                from ..models import controlnet as cn_mod

                emb = cn_mod.embed_condition(hint["params"], img.astype(
                    self.compute_dtype))
                down_rs, mid_r = cn_mod.residual_resolutions(
                    ms.config.unet, lh, lw)
                # 13 weights for SD's 12 down residuals + mid: logspace
                # under soft_injection, mid always lands on 1.0
                # (reference unified_pipeline.py:1044)
                n_res = len(down_rs)
                lw_np = (np.logspace(-1, 0, n_res + 1) if soft
                         else np.ones(n_res + 1))
                entry = {"params": hint["params"], "emb": emb,
                         "scale": jnp.float32(hint.get("scale", 1.0)),
                         "lw": jnp.asarray(lw_np, jnp.float32)}
                mask = _hint_mask(hint)
                if mask is not None:
                    entry["masks"] = _level_masks(mask,
                                                  down_rs + [mid_r])
                controlnets.append(entry)
                cn_cfg_only.append(cfg_only)
            else:
                from ..models import t2i_adapter as t2i_mod

                feats = t2i_mod.apply(hint["params"],
                                      img.astype(self.compute_dtype))
                scale = float(hint.get("scale", 1.0))
                # soft_injection layer weights for the 4 adapter levels;
                # cfg_only additionally drops the first level to 0.25
                # (reference unified_pipeline.py:905-917)
                lw_np = np.ones(len(feats))
                if soft:
                    lw_np = np.logspace(-0.25, 0, len(feats))
                    if cfg_only:
                        lw_np[0] = 0.25
                feats = [f * (scale * float(lw_np[i]))
                         for i, f in enumerate(feats)]
                mask = _hint_mask(hint)
                if mask is not None:
                    feats = [f * jax.image.resize(
                        mask, (1,) + f.shape[1:3] + (1,),
                        "bilinear").astype(f.dtype) for f in feats]
                if cfg_only:
                    adapter_states_g = feats if adapter_states_g is None \
                        else [a + f for a, f in
                              zip(adapter_states_g, feats)]
                elif adapter_states is None:
                    adapter_states = feats
                else:
                    adapter_states = [a + f for a, f in
                                      zip(adapter_states, feats)]

        # cfg_only residuals split the batch into [uncond; guided] halves,
        # which only the fused parallel-CFG layout provides -> force it
        if any(cn_cfg_only) or adapter_states_g is not None:
            cfg_sequential = False

        # hires fix: engage when requested and the target exceeds the
        # model's natural resolution (reference enables past a threshold,
        # gyre/pipeline/unified_pipeline.py:2100-2181)
        hires = None
        natural = ms.config.sample_size
        if hires_fix and max(lh, lw) > natural and mode != "inpaint9":
            mult = 2 ** (ms.config.unet.levels - 1)  # unet spatial divisor
            aspect = lh / lw
            area = float(natural * natural) * (1.0 + hires_oos_fraction)
            nh = int(round((area * aspect) ** 0.5 / mult)) * mult
            nw = int(round(area / max(nh, 1) / mult)) * mult
            nh = min(max(nh, mult), lh)
            nw = min(max(nw, mult), lw)
            if (nh, nw) != (lh, lw):
                hires = (nh, nw)

        # grafted generation: second model's prompt encoding + params
        graft_args = None
        graft_cfg = None
        graft_pred = "epsilon"
        if self._graft_pipe is not None:
            gp = self._graft_pipe
            gprompt = prompt_list[0] if prompt_list else prompt
            gneg = (neg_list[0] if neg_list else negative_prompt) or ""
            gctx_g = gp.encode_prompt(
                prompts.WeightedPrompt.parse(gprompt or ""),
                pad_to_chunks=chunks)
            gctx_g = jnp.tile(gctx_g[None], (batch, 1, 1))
            if guided:
                gctx_u = gp.encode_prompt(
                    prompts.WeightedPrompt.parse(gneg),
                    pad_to_chunks=chunks)
                gctx_u = jnp.tile(gctx_u[None], (batch, 1, 1))
            else:
                gctx_u = gctx_g
            graft_args = {"unet_params": gp.ms.unet_params,
                          "ctx_g": gctx_g, "ctx_u": gctx_u}
            graft_cfg = gp.ms.config.unet
            graft_pred = gp.ms.schedule.prediction_type

        clip_cfg_obj = None
        if clip_guidance_scale > 0:
            from . import clip_guidance as cgmod

            copts = dict(clip_guidance_options or {})
            if not {"approx_cutouts", "vae_cutouts",
                    "no_cutouts"} & set(copts):
                # legacy clip_cutouts count split across the two cutout
                # families (reference defaults: 2 vae + 2 approx)
                copts["approx_cutouts"] = int(clip_cutouts) // 2
                copts["vae_cutouts"] = (int(clip_cutouts) -
                                        int(clip_cutouts) // 2)
            clip_cfg_obj = cgmod.ClipGuidanceConfig(
                guidance_scale=float(clip_guidance_scale), **copts)

        spec = StaticSpec(
            batch=batch, height=lh, width=lw, sampler=sampler,
            steps=len(sigmas_np) - 1, mode=mode, guided=guided,
            chunks=chunks, tiling=tiling_xy,
            n_controlnets=len(controlnets),
            cn_cfg_only=tuple(cn_cfg_only),
            has_adapter=adapter_states is not None,
            has_adapter_g=adapter_states_g is not None,
            hires=hires,
            graft_cfg=graft_cfg,
            graft_prediction=graft_pred,
            clip_guidance=float(clip_guidance_scale),
            clip_cfg=clip_cfg_obj,
            noise_type=noise_type,
            warmup_lms=bool(warmup_lms),
            tome_ratio=float(tome_ratio),
            cfg_parallel=not cfg_sequential)

        clip_vision_params = None
        clip_target = None
        if clip_guidance_scale > 0:
            clip_vision_params = self.clip_vision()
            cg_prompt = prompt_list[0] if prompt_list else prompt
            clip_target = self.clip_text_target(cg_prompt or "", batch)

        # SDXL "text_time" conditioning: pooled text + size/crop time ids.
        # The 5-id refiner convention replaces target-size ids with an
        # aesthetic score (published defaults 6.0 cond / 2.5 uncond)
        added_u = added_g = None
        if ms.config.unet.addition_embed_dim:
            n_ids = ms.config.unet.addition_time_ids
            if n_ids == 5:
                tids_g = jnp.asarray([[height, width, 0, 0, 6.0]],
                                     jnp.float32)
                tids_u = jnp.asarray([[height, width, 0, 0, 2.5]],
                                     jnp.float32)
            else:
                tids_g = tids_u = jnp.asarray(
                    [[height, width, 0, 0, height, width]],
                    jnp.float32)[:, :n_ids]
            tids_g = jnp.tile(tids_g, (batch, 1))
            tids_u = jnp.tile(tids_u, (batch, 1))
            # per-sample pooled embeddings (coalesced batches carry
            # distinct prompts); positives + negatives in ONE dispatch
            gps = ([t or "" for t in prompt_list]
                   if prompt_list is not None else [prompt or ""])
            gns = []
            if guided:
                gns = ([t or "" for t in neg_list] if neg_list is not None
                       else [negative_prompt or ""] * len(gps))
            pooled_all = self.encode_pooled_batch(gps + gns)
            pg = pooled_all[:len(gps)]
            pooled_g = pg if len(gps) == batch else jnp.tile(pg, (batch, 1))
            added_g = {"text_embeds": pooled_g, "time_ids": tids_g}
            if guided:
                pu = pooled_all[len(gps):]
                pooled_u = (pu if len(gns) == batch
                            else jnp.tile(pu, (batch, 1)))
            else:
                pooled_u = pooled_g
            added_u = {"text_embeds": pooled_u, "time_ids": tids_u}

        core_kwargs = dict(
            eta=float(eta), churn=float(churn),
            churn_tmin=float(churn_tmin), churn_tmax=float(churn_tmax),
            ddim_cutoff=float(ddim_cutoff),
            controlnets=tuple(controlnets),
            adapter_states=adapter_states,
            adapter_states_g=adapter_states_g,
            graft=graft_args,
            clip_vision=clip_vision_params,
            clip_target=clip_target,
            vae_params=(self.ms.vae_params if clip_cfg_obj is not None and
                        (clip_cfg_obj.vae_cutouts or
                         clip_cfg_obj.no_cutouts == "vae") else None),
            added_u=added_u, added_g=added_g)
        core_args = (self.ms.unet_params, keys, ctx_u, ctx_g, gs_arg,
                     init_latents, mask_keep,
                     extra if extra is not None
                     else jnp.zeros((batch, lh, lw, 4), jnp.float32))

        from ..utils.latent_debug import log_latents

        if mode != "txt2img" and init_latents is not None:
            log_latents("init", init_latents)
        n_steps = len(sigmas_np) - 1
        # dpm_adaptive chunks by bounded while_loop segments; its final
        # chunk isn't known ahead of time, so when the final chunk
        # MATTERS to the trace (inpaint blend / clip flat-loss) it runs
        # unchunked instead of compiling a second tail program
        adaptive = sampler == "dpm_adaptive"
        adaptive_fc = adaptive and (
            mode == "inpaint" or
            (spec.clip_guidance > 0 and clip_vision_params is not None))
        chunkable = (chunk_steps and chunk_steps < n_steps and
                     hires is None and not adaptive_fc and
                     sampler in samplers.CHUNKABLE_SAMPLERS and
                     (progress_callback is not None or
                      stop_event is not None))
        if chunkable:
            # chunked dispatch: the sampler scans a GLOBAL step-index
            # window over the full sigma ramp, carrying its multistep
            # state across segments — bit-identical to one scan, for
            # every sampler incl. the dpm++ multistep family. Enables
            # progress + mid-request cancellation (replacing the
            # reference's tqdm-driven abort,
            # gyre/pipeline/pipeline_wrapper.py:22-79). Latent init runs
            # as its own tiny program (_chunk_init) so every chunk is
            # resume=True, and final_chunk is normalized away when it
            # cannot affect the trace (no inpaint blend, no clip
            # guidance): the common serving request then needs exactly
            # ONE compiled chunk program (equal segments share it via
            # the traced step offset) — the dominant cold-start compile.
            import dataclasses as dc

            # pad the sigma ramp to a fixed length so ANY step count
            # runs the same compiled chunk program (sigma values are
            # traced; only the array LENGTH is a compile signature —
            # samplers index by the global step, so the padded tail is
            # never read; the true count rides along as the traced
            # n_total). k_lms included: its Adams-Bashforth coefficients
            # are computed vectorized over the ramp inside the trace.
            sigmas_t = sigmas
            n_total_t = jnp.asarray(n_steps, jnp.int32)
            if len(sigmas_np) < self.SIGMA_PAD:
                sigmas_t = jnp.concatenate(
                    [sigmas, jnp.zeros(self.SIGMA_PAD - len(sigmas_np),
                                       jnp.float32)])

            x0 = self._chunk_init(spec, keys, init_latents, sigmas)
            carry = samplers.init_carry(
                sampler, jnp.zeros((batch, lh, lw, 4), jnp.float32))
            done = 0
            clip_losses: list[float] = []
            clip_flat = False
            # final_chunk gates only the inpaint final blend and the
            # clip flat-loss aux; when neither is active every value
            # traces identically, so pin it to avoid duplicate programs
            fc_matters = (spec.mode == "inpaint" or
                          (spec.clip_guidance > 0 and
                           clip_vision_params is not None))
            # adaptive: every segment caps chunk_steps solver iterations
            # and shares ONE compiled program; the host loop watches the
            # carried finished flag (bounded by ADAPTIVE_MAX_STEPS)
            loop_total = n_steps
            if adaptive:
                loop_total = -(-samplers.ADAPTIVE_MAX_STEPS //
                               chunk_steps) * chunk_steps
            while done < loop_total:
                seg = min(chunk_steps, loop_total - done)
                spec_i = dc.replace(spec, steps=seg, resume=True,
                                    final_chunk=(done + seg >= n_steps
                                                 if fc_matters else True),
                                    clip_flat=clip_flat)
                up, ks, cu, cg, ga, il, mk, ex = core_args
                x0, carry, aux = self.core(spec_i)(
                    up, sigmas_t, ks, cu, cg, ga, il, mk, ex,
                    x_resume=x0, n_total=n_total_t,
                    step_offset=done, carry_in=carry, **core_kwargs)
                done += seg
                if adaptive and int(np.asarray(carry[-1])):
                    done = loop_total  # solver reached sigma_min
                log_latents(f"chunk:{done}", x0)
                if "clip_loss" in aux and clip_cfg_obj is not None:
                    # flat-loss schedule (reference clipguided.py:152-173),
                    # adapted to one loss sample per chunk: window spans
                    # ~gradient_length steps' worth of chunks
                    clip_losses.append(
                        float(aux["clip_loss"]) / spec.batch)
                    window = max(
                        2, -(-clip_cfg_obj.gradient_length
                             // max(chunk_steps, 1)) + 1)
                    clip_flat = clip_flat or cgmod.flatloss_check(
                        clip_losses, clip_cfg_obj,
                        samples_per_window=window)
                if progress_callback is not None:
                    progress_callback(done, loop_total)
                if stop_event is not None and stop_event.is_set():
                    return None
                yield done, loop_total
        else:
            up, ks, cu, cg, ga, il, mk, ex = core_args
            x0, _, _ = self.core(spec)(up, sigmas, ks, cu, cg, ga, il,
                                       mk, ex, **core_kwargs)
            if progress_callback is not None:
                progress_callback(n_steps, n_steps)

        log_latents("final", x0)
        if return_latents:
            return x0
        images = self.vae_decode(x0)

        # image-space outmask composite: histogram-match the generated
        # region to the original, then blend (reference outmask handling,
        # gyre/pipeline/unified_pipeline.py:2493-2510)
        if mask_image is not None and init_image is not None:
            from ..ops import images as I

            init = jnp.asarray(init_image, jnp.float32)
            mk = jax.image.resize(mask_keep, (batch, height, width, 1),
                                  "bilinear")
            hard = (mk >= 1.0).astype(jnp.float32)
            gen = images
            # histogram matching to a near-constant original is degenerate
            if float(jnp.std(init)) > 0.02:
                gen = I.match_histograms(images, init)
            images = init * hard + gen * (1 - hard)
        if output_dtype == "uint8":
            # quantize on device: the host only ever needs uint8 for PNG
            # encoding, and the transfer is 4x smaller than f32 (material
            # over a tunneled/PCIe link)
            if "to_uint8" not in self._fn_cache:
                self._fn_cache["to_uint8"] = jax.jit(lambda x: jnp.clip(
                    x * 255.0 + 0.5, 0, 255).astype(jnp.uint8))
            images = self._fn_cache["to_uint8"](images)
        return images
