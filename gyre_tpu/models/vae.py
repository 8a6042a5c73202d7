"""AutoencoderKL (the SD VAE), as pure JAX functions.

Original implementation of the latent autoencoder the reference uses via
diffusers (encode at reference gyre/pipeline/unified_pipeline.py:240-337
img2img, decode at :2486-2489). NHWC, bf16-friendly; encode returns the
gaussian posterior's (mean, logvar) so sampling stays under the caller's
per-sample RNG contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .configs import VAEConfig

Params = dict
_EPS = 1e-6


def _resnet_init(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": L.norm_init(c_in, dtype),
        "conv1": L.conv_init(ks[0], 3, 3, c_in, c_out, dtype),
        "norm2": L.norm_init(c_out, dtype),
        "conv2": L.conv_init(ks[1], 3, 3, c_out, c_out, dtype),
    }
    if c_in != c_out:
        p["shortcut"] = L.conv_init(ks[2], 1, 1, c_in, c_out, dtype)
    return p


def _gn_silu_conv(norm_p, conv_p, x, groups):
    """GN -> SiLU -> 3x3 conv; the fused Pallas path cuts the chain from
    5 to 3 HBM traversals on TPU (ops/fused_norm_conv.py)."""
    from ..ops import fusion

    if fusion.enabled() and fusion.gn_conv_fusable(x.shape,
                                                  conv_p["w"].shape):
        from ..ops.fused_norm_conv import gn_silu_conv3x3

        return gn_silu_conv3x3(x, norm_p["scale"], norm_p["bias"],
                               conv_p["w"], conv_p.get(
                                   "b", jnp.zeros(conv_p["w"].shape[-1])),
                               groups=groups, eps=_EPS)
    h = L.silu(L.group_norm(norm_p, x, groups, eps=_EPS))
    return L.conv2d(conv_p, h)


def _resnet(p, x, groups):
    h = _gn_silu_conv(p["norm1"], p["conv1"], x, groups)
    h = _gn_silu_conv(p["norm2"], p["conv2"], h, groups)
    if "shortcut" in p:
        x = L.conv2d(p["shortcut"], x)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": L.norm_init(c, dtype),
        "q": L.linear_init(ks[0], c, c, dtype),
        "k": L.linear_init(ks[1], c, c, dtype),
        "v": L.linear_init(ks[2], c, c, dtype),
        "out": L.linear_init(ks[3], c, c, dtype),
    }


def _attn(p, x, groups):
    b, h, w, c = x.shape
    res = x
    x = L.group_norm(p["norm"], x, groups, eps=_EPS).reshape(b, h * w, c)
    q = L.linear(p["q"], x)[:, :, None, :]
    k = L.linear(p["k"], x)[:, :, None, :]
    v = L.linear(p["v"], x)[:, :, None, :]
    o = L.attention(q, k, v).reshape(b, h * w, c)
    o = L.linear(p["out"], o).reshape(b, h, w, c)
    return o + res


def init(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 96))
    chs = cfg.block_out_channels
    lc = cfg.latent_channels

    enc: Params = {"conv_in": L.conv_init(next(keys), 3, 3, cfg.in_channels,
                                          chs[0], dtype)}
    blocks = []
    c_prev = chs[0]
    for lvl, c_out in enumerate(chs):
        blk = {"resnets": [_resnet_init(next(keys), c_prev if i == 0 else c_out,
                                        c_out, dtype)
                           for i in range(cfg.layers_per_block)]}
        if lvl < len(chs) - 1:
            blk["downsample"] = L.conv_init(next(keys), 3, 3, c_out, c_out, dtype)
        blocks.append(blk)
        c_prev = c_out
    enc["down"] = blocks
    enc["mid"] = {
        "res1": _resnet_init(next(keys), chs[-1], chs[-1], dtype),
        "attn": _attn_init(next(keys), chs[-1], dtype),
        "res2": _resnet_init(next(keys), chs[-1], chs[-1], dtype),
    }
    enc["norm_out"] = L.norm_init(chs[-1], dtype)
    enc["conv_out"] = L.conv_init(next(keys), 3, 3, chs[-1], 2 * lc, dtype)

    dec: Params = {"conv_in": L.conv_init(next(keys), 3, 3, lc, chs[-1], dtype)}
    dec["mid"] = {
        "res1": _resnet_init(next(keys), chs[-1], chs[-1], dtype),
        "attn": _attn_init(next(keys), chs[-1], dtype),
        "res2": _resnet_init(next(keys), chs[-1], chs[-1], dtype),
    }
    blocks = []
    c_prev = chs[-1]
    for i, c_out in enumerate(reversed(chs)):
        blk = {"resnets": [_resnet_init(next(keys), c_prev if j == 0 else c_out,
                                        c_out, dtype)
                           for j in range(cfg.layers_per_block + 1)]}
        if i < len(chs) - 1:
            blk["upsample"] = L.conv_init(next(keys), 3, 3, c_out, c_out, dtype)
        blocks.append(blk)
        c_prev = c_out
    dec["up"] = blocks
    dec["norm_out"] = L.norm_init(chs[0], dtype)
    dec["conv_out"] = L.conv_init(next(keys), 3, 3, chs[0], cfg.out_channels, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.conv_init(next(keys), 1, 1, 2 * lc, 2 * lc, dtype),
        "post_quant_conv": L.conv_init(next(keys), 1, 1, lc, lc, dtype),
    }


def encode(params: Params, cfg: VAEConfig, x: jax.Array):
    """x: [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,H/8,W/8,latent]."""
    p = params["encoder"]
    g = cfg.norm_groups
    h = L.conv2d(p["conv_in"], x)
    for blk in p["down"]:
        for res in blk["resnets"]:
            h = _resnet(res, h, g)
        if "downsample" in blk:
            # diffusers pads (0,1,0,1) before stride-2 VALID conv
            h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
            h = L.conv2d(blk["downsample"], h, stride=2, padding="VALID")
    h = _resnet(p["mid"]["res1"], h, g)
    h = _attn(p["mid"]["attn"], h, g)
    h = _resnet(p["mid"]["res2"], h, g)
    h = L.silu(L.group_norm(p["norm_out"], h, g, eps=_EPS))
    h = L.conv2d(p["conv_out"], h)
    h = L.conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_posterior(mean, logvar, noise):
    return mean + jnp.exp(0.5 * logvar) * noise


def decode(params: Params, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    """z: [B,h,w,latent] (already un-scaled) -> [B,8h,8w,3] in [-1,1]."""
    p = params["decoder"]
    g = cfg.norm_groups
    z = L.conv2d(params["post_quant_conv"], z)
    h = L.conv2d(p["conv_in"], z)
    h = _resnet(p["mid"]["res1"], h, g)
    h = _attn(p["mid"]["attn"], h, g)
    h = _resnet(p["mid"]["res2"], h, g)
    for blk in p["up"]:
        for res in blk["resnets"]:
            h = _resnet(res, h, g)
        if "upsample" in blk:
            h = L.upsample_nearest_2x(h)
            h = L.conv2d(blk["upsample"], h)
    h = L.silu(L.group_norm(p["norm_out"], h, g, eps=_EPS))
    return L.conv2d(p["conv_out"], h)
