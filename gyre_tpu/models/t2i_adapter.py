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
    """StyleAdapter, matching the published TencentARC checkpoint layout
    (reference gyre/pipeline/t2i_adapter/adapter.py:173-200): learned
    style tokens appended to the CLIP-vision token sequence, a width-space
    transformer (fused-qkv MultiheadAttention + QuickGELU MLP), ln_post
    over the style tokens and a width->context projection matrix."""
    ks = iter(jax.random.split(key, n_layers * 4 + 4))
    w = vision_dim
    scale = w ** -0.5
    p: Params = {
        "style_embedding": jax.random.normal(
            next(ks), (1, n_tokens, w), dtype) * scale,
        "ln_pre": L.norm_init(w, dtype),
        "ln_post": L.norm_init(w, dtype),
        "proj": jax.random.normal(next(ks), (w, context_dim),
                                  dtype) * scale,
        "blocks": [],
    }
    for _ in range(n_layers):
        p["blocks"].append({
            "ln1": L.norm_init(w, dtype),
            "qkv": L.linear_init(next(ks), w, 3 * w, dtype),
            "out": L.linear_init(next(ks), w, w, dtype),
            "ln2": L.norm_init(w, dtype),
            "fc1": L.linear_init(next(ks), w, w * 4, dtype),
            "fc2": L.linear_init(next(ks), w * 4, w, dtype),
        })
    return p


def style_apply(params: Params, vision_tokens: jax.Array,
                heads: int = 8) -> jax.Array:
    """vision_tokens [B, N, width] -> style tokens [B, n_tokens, ctx]."""
    b = vision_tokens.shape[0]
    n_tok = params["style_embedding"].shape[1]
    x = jnp.concatenate(
        [vision_tokens,
         jnp.broadcast_to(params["style_embedding"],
                          (b,) + params["style_embedding"].shape[1:])],
        axis=1)
    x = L.layer_norm(params["ln_pre"], x)
    d = x.shape[-1]
    hd = d // heads
    for blk in params["blocks"]:
        h = L.layer_norm(blk["ln1"], x)
        qkv = L.linear(blk["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, -1, heads, hd)
        k = k.reshape(b, -1, heads, hd)
        v = v.reshape(b, -1, heads, hd)
        o = L.attention(q, k, v).reshape(b, -1, d)
        x = x + L.linear(blk["out"], o)
        h = L.layer_norm(blk["ln2"], x)
        x = x + L.linear(blk["fc2"], L.quick_gelu(L.linear(blk["fc1"], h)))
    style = L.layer_norm(params["ln_post"], x[:, -n_tok:])
    return style @ params["proj"].astype(style.dtype)


def load_style_params(state: dict, dtype=None) -> Params:
    """Published style-adapter checkpoint (coadapter-style/t2iadapter_style
    key names: style_embedding, ln_pre/ln_post, proj,
    transformer_layes.{i}.attn.in_proj_weight/out_proj + ln_1/ln_2 +
    mlp.c_fc/c_proj) -> our tree."""
    from .load import _t_linear

    def j(a):
        a = np.asarray(a)
        return jnp.asarray(a, dtype) if dtype else jnp.asarray(a)

    def lin(w, b=None):
        p = {"w": j(_t_linear(np.asarray(w)))}
        if b is not None:
            p["b"] = j(b)
        return p

    def norm(pre):
        return {"scale": j(state[f"{pre}.weight"]),
                "bias": j(state[f"{pre}.bias"])}

    p: Params = {
        "style_embedding": j(state["style_embedding"]),
        "ln_pre": norm("ln_pre"),
        "ln_post": norm("ln_post"),
        "proj": j(state["proj"]),
        "blocks": [],
    }
    i = 0
    while f"transformer_layes.{i}.ln_1.weight" in state:
        pre = f"transformer_layes.{i}"
        p["blocks"].append({
            "ln1": norm(f"{pre}.ln_1"),
            "qkv": lin(state[f"{pre}.attn.in_proj_weight"],
                       state[f"{pre}.attn.in_proj_bias"]),
            "out": lin(state[f"{pre}.attn.out_proj.weight"],
                       state[f"{pre}.attn.out_proj.bias"]),
            "ln2": norm(f"{pre}.ln_2"),
            "fc1": lin(state[f"{pre}.mlp.c_fc.weight"],
                       state[f"{pre}.mlp.c_fc.bias"]),
            "fc2": lin(state[f"{pre}.mlp.c_proj.weight"],
                       state[f"{pre}.mlp.c_proj.bias"]),
        })
        i += 1
    return p


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
