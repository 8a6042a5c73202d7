"""Sigma-space denoiser construction: model wrapping + CFG.

The functional equivalent of the reference's UNet wrapper algebra
(gyre/pipeline/unet/types.py, cfg.py, core.py): instead of an object graph
of wrappers called per step, each concern is a function combinator over

    denoise(x, sigma) -> x0_prediction        (sigma-space, k-diffusion style)

and the composed function is closed over by the jitted sampler scan.

c_in/c_skip/c_out follow the standard VP parameterization:
    eps-pred:  x0 = x - sigma * model(x * c_in, t)
    v-pred:    x0 = x * c_skip + c_out * model(x * c_in, t)
with c_in = 1/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1),
     c_out = -sigma/sqrt(sigma^2+1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import schedule as sched


def make_denoiser(model_fn, schedule: sched.DiffusionSchedule,
                  prediction_type: str | None = None):
    """model_fn(x_scaled, t) -> model output (eps or v), x NHWC [B,H,W,C].

    Returns denoise(x, sigma) -> x0. sigma may be scalar or [B].
    """
    pred = prediction_type or schedule.prediction_type
    log_sigmas = jnp.asarray(schedule.log_sigmas, jnp.float32)

    def denoise(x, sigma):
        sigma = jnp.asarray(sigma, jnp.float32)
        sig_b = jnp.broadcast_to(sigma, (x.shape[0],))
        c_in = (1.0 / jnp.sqrt(sig_b ** 2 + 1.0)).astype(x.dtype)
        t = sched.sigma_to_t(log_sigmas, sig_b)
        out = model_fn(x * c_in[:, None, None, None], t)
        sig4 = sig_b.astype(x.dtype)[:, None, None, None]
        if pred == "v_prediction":
            c_skip = (1.0 / (sig4 ** 2 + 1.0))
            c_out = -sig4 / jnp.sqrt(sig4 ** 2 + 1.0)
            return x * c_skip + out * c_out
        return x - out * sig4

    return denoise


def cfg_model(unet_fn, context_uncond, context_cond, guidance_scale,
              *, parallel: bool = True, extra_uncond=None, extra_cond=None):
    """Classifier-free guidance over a raw model_fn(x, t, context, **kw).

    parallel=True doubles the batch for one fused pass (reference
    CFGUNet_Parallel, gyre/pipeline/unet/cfg.py:41-57); False runs two
    passes (the low-memory CFGUNet_Sequential) — on TPU parallel is almost
    always right, the MXU loves the bigger batch.

    Returns model_fn(x, t) with guidance folded in. guidance_scale may be a
    python float, a traced scalar, or a per-sample [B] vector (request
    coalescing batches requests with different cfg_scales).
    """
    extra_uncond = extra_uncond or {}
    extra_cond = extra_cond or {}

    def fn(x, t):
        scale = jnp.asarray(guidance_scale, jnp.float32)
        if scale.ndim == 1:
            scale = scale[:, None, None, None].astype(x.dtype)
        else:
            scale = scale.astype(x.dtype)
        if parallel:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate([context_uncond, context_cond], axis=0)
            kw = {}
            for k in set(extra_uncond) | set(extra_cond):
                u, c = extra_uncond.get(k), extra_cond.get(k)
                if isinstance(u, dict):
                    kw[k] = {kk: jnp.concatenate([u[kk], c[kk]], axis=0)
                             for kk in u}
                else:
                    kw[k] = jnp.concatenate([u, c], axis=0)
            out = unet_fn(x2, t2, ctx, **kw)
            un, gu = jnp.split(out, 2, axis=0)
        else:
            un = unet_fn(x, t, context_uncond, **extra_uncond)
            gu = unet_fn(x, t, context_cond, **extra_cond)
        return un + scale * (gu - un)

    return fn


def plain_model(unet_fn, context, **extra):
    """No-guidance wrapping (guidance_scale <= 1)."""

    def fn(x, t):
        return unet_fn(x, t, context, **extra)

    return fn
