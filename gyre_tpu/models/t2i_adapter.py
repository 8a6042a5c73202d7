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
import numpy as np

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


def load_params(state: dict, dtype=None) -> Params:
    """TencentARC full-adapter checkpoint -> our tree.

    Expected naming (t2iadapter_* releases): `conv_in.weight/bias`,
    `body.{k}.block1.weight`, `body.{k}.block2.weight`, and
    `body.{k}.in_conv.weight` on channel-changing blocks, where k flattens
    (level, block) with 2 blocks per level."""
    from .load import _t_conv

    def conv(prefix):
        w = np.asarray(state[f"{prefix}.weight"])
        p = {"w": jnp.asarray(_t_conv(w), dtype) if dtype
             else jnp.asarray(_t_conv(w))}
        bk = f"{prefix}.bias"
        if bk in state:
            p["b"] = jnp.asarray(np.asarray(state[bk]))
        return p

    n_body = 0
    while f"body.{n_body}.block1.weight" in state:
        n_body += 1
    n_res = 2
    n_levels = n_body // n_res
    p: Params = {"conv_in": conv("conv_in"), "levels": [], "downscale": 8}
    for lvl in range(n_levels):
        level = {"blocks": [], "proj": None}
        for j in range(n_res):
            k = lvl * n_res + j
            if j == 0 and f"body.{k}.in_conv.weight" in state:
                level["proj"] = conv(f"body.{k}.in_conv")
            level["blocks"].append({
                "conv1": conv(f"body.{k}.block1"),
                "conv2": conv(f"body.{k}.block2"),
            })
        p["levels"].append(level)
    return p


def export_state(params: Params) -> dict:
    """Inverse of load_params (testing/export)."""
    from .load import _inv_conv

    out = {}

    def put(prefix, p):
        out[f"{prefix}.weight"] = _inv_conv(np.asarray(p["w"]))
        if "b" in p:
            out[f"{prefix}.bias"] = np.asarray(p["b"])

    put("conv_in", params["conv_in"])
    n_res = len(params["levels"][0]["blocks"])
    for lvl, level in enumerate(params["levels"]):
        for j, blk in enumerate(level["blocks"]):
            k = lvl * n_res + j
            if j == 0 and level["proj"] is not None:
                put(f"body.{k}.in_conv", level["proj"])
            put(f"body.{k}.block1", blk["conv1"])
            put(f"body.{k}.block2", blk["conv2"])
    return out


# ------------------------------------------------------------ style adapter


def style_init(key, *, context_dim: int = 768, vision_dim: int = 1024,
               n_tokens: int = 8, n_layers: int = 3, heads: int = 8,
               dtype=jnp.float32) -> Params:
    """StyleAdapter (reference gyre/pipeline/t2i_adapter/adapter.py
    StyleAdapter): learned style queries attend over CLIP-vision tokens;
    outputs style tokens appended to the text context."""
    ks = iter(jax.random.split(key, n_layers * 6 + 4))
    p: Params = {
        "proj_in": L.linear_init(next(ks), vision_dim, context_dim, dtype),
        "queries": jax.random.normal(next(ks), (n_tokens, context_dim),
                                     dtype) * 0.02,
        "blocks": [],
        "ln_out": L.norm_init(context_dim, dtype),
        "proj_out": L.linear_init(next(ks), context_dim, context_dim, dtype),
    }
    for _ in range(n_layers):
        p["blocks"].append({
            "ln1": L.norm_init(context_dim, dtype),
            "attn": {
                "q": L.linear_init(next(ks), context_dim, context_dim, dtype),
                "k": L.linear_init(next(ks), context_dim, context_dim, dtype),
                "v": L.linear_init(next(ks), context_dim, context_dim, dtype),
                "out": L.linear_init(next(ks), context_dim, context_dim,
                                     dtype),
            },
            "ln2": L.norm_init(context_dim, dtype),
            "fc1": L.linear_init(next(ks), context_dim, context_dim * 4,
                                 dtype),
            "fc2": L.linear_init(next(ks), context_dim * 4, context_dim,
                                 dtype),
        })
    return p


def style_apply(params: Params, vision_tokens: jax.Array,
                heads: int = 8) -> jax.Array:
    """vision_tokens [B, N, vision_dim] -> style tokens [B, n_tokens, ctx]."""
    b = vision_tokens.shape[0]
    ctx = L.linear(params["proj_in"], vision_tokens)
    n_tok = params["queries"].shape[0]
    x = jnp.concatenate(
        [ctx, jnp.broadcast_to(params["queries"][None],
                               (b,) + params["queries"].shape)], axis=1)
    d = x.shape[-1]
    hd = d // heads
    for blk in params["blocks"]:
        h = L.layer_norm(blk["ln1"], x)
        q = L.linear(blk["attn"]["q"], h).reshape(b, -1, heads, hd)
        k = L.linear(blk["attn"]["k"], h).reshape(b, -1, heads, hd)
        v = L.linear(blk["attn"]["v"], h).reshape(b, -1, heads, hd)
        o = L.attention(q, k, v).reshape(b, -1, d)
        x = x + L.linear(blk["attn"]["out"], o)
        h = L.layer_norm(blk["ln2"], x)
        x = x + L.linear(blk["fc2"], jax.nn.gelu(L.linear(blk["fc1"], h)))
    style = L.layer_norm(params["ln_out"], x[:, -n_tok:])
    return L.linear(params["proj_out"], style)


def coadapter_fuse(feature_sets: list[list[jax.Array]],
                   weights: list[float] | None = None) -> list[jax.Array]:
    """CoAdapter fuser (reference CoAdapterFuser): combine multiple
    adapters' per-level features with scalar weights."""
    weights = weights or [1.0] * len(feature_sets)
    out = None
    for feats, w in zip(feature_sets, weights):
        scaled = [f * w for f in feats]
        out = scaled if out is None else [a + b for a, b in zip(out, scaled)]
    return out


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
