"""T2I-Adapter: lightweight conditioning pyramid whose features are added
to the UNet down path (reference gyre/pipeline/t2i_adapter/adapter.py:
102-300). Unlike ControlNet it is x/t-independent, so it runs ONCE per
request outside the denoise loop; its outputs are traced args of the
compiled step.

Covers the full and light variants; the style (CLIP-vision) adapter lands
with the CLIP vision tower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L

Params = dict

FULL_CHANNELS = (320, 640, 1280, 1280)
LIGHT_CHANNELS = (320, 640, 1280, 1280)


def _resblock_init(key, c, dtype):
    k1, k2 = jax.random.split(key)
    return {"conv1": L.conv_init(k1, 3, 3, c, c, dtype),
            "conv2": L.conv_init(k2, 3, 3, c, c, dtype)}


def _resblock(p, x):
    h = L.conv2d(p["conv1"], jax.nn.relu(x))
    h = L.conv2d(p["conv2"], jax.nn.relu(h))
    return x + h


def init(key, channels=FULL_CHANNELS, cond_channels: int = 3,
         n_res_blocks: int = 2, downscale: int = 8,
         dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    p: Params = {
        "conv_in": L.conv_init(next(keys), 3, 3,
                               cond_channels * downscale * downscale,
                               channels[0], dtype),
        "levels": [],
        "downscale": downscale,
    }
    c_prev = channels[0]
    for lvl, c in enumerate(channels):
        level = {"blocks": [], "proj": None}
        if c != c_prev:
            level["proj"] = L.conv_init(next(keys), 1, 1, c_prev, c, dtype)
        for _ in range(n_res_blocks):
            level["blocks"].append(_resblock_init(next(keys), c, dtype))
        p["levels"].append(level)
        c_prev = c
    return p


def _pixel_unshuffle(x, factor):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // factor, w // factor, factor * factor * c)


def apply(params: Params, cond_image: jax.Array) -> list[jax.Array]:
    """cond image [B,H,W,C] -> per-level feature maps (latent res and
    downsampled), aligned with unet down-path levels."""
    ds = params["downscale"]
    h = _pixel_unshuffle(cond_image, ds)
    h = L.conv2d(params["conv_in"], h)
    feats = []
    for lvl, level in enumerate(params["levels"]):
        if lvl > 0:
            h = L.avg_pool_2x(h)
        if level["proj"] is not None:
            h = L.conv2d(level["proj"], h)
        for blk in level["blocks"]:
            h = _resblock(blk, h)
        feats.append(h)
    return feats
