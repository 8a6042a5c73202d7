"""ControlNet: UNet-encoder twin producing per-level conditioning residuals
(reference carries a full torch implementation at
gyre/pipeline/controlnet/models.py:97-547 and patches the unet with hooks;
here residuals are explicit unet.apply arguments, so the conditioned step
stays one XLA program).

Shares the resnet/transformer building blocks with models/unet.py — a
ControlNet IS the unet down path + a conditioning embed + zero-convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .configs import UNetConfig
from .unet import _resnet, _resnet_init, _transformer, _transformer_init

Params = dict

# conditioning-embedding channel ladder (diffusers-compatible)
COND_CHANNELS = (16, 32, 96, 256)


def init(key, cfg: UNetConfig, dtype=jnp.float32, cond_channels: int = 3) -> Params:
    keys = iter(jax.random.split(key, 256))
    ch0 = cfg.block_out_channels[0]
    ted = cfg.time_embed_dim

    p: Params = {
        "conv_in": L.conv_init(next(keys), 3, 3, cfg.in_channels, ch0, dtype),
        "time_embed": {
            "lin1": L.linear_init(next(keys), ch0, ted, dtype),
            "lin2": L.linear_init(next(keys), ted, ted, dtype),
        },
    }

    # conditioning embedding: image -> ch0 feature map at latent res
    ce = {"conv_in": L.conv_init(next(keys), 3, 3, cond_channels,
                                 COND_CHANNELS[0], dtype), "blocks": []}
    c_prev = COND_CHANNELS[0]
    for c_out in COND_CHANNELS[1:]:
        ce["blocks"].append({
            "conv1": L.conv_init(next(keys), 3, 3, c_prev, c_prev, dtype),
            "conv2": L.conv_init(next(keys), 3, 3, c_prev, c_out, dtype),
        })
        c_prev = c_out
    # zero-initialized output conv (controlnet's "zero conv" trick)
    ce["conv_out"] = {
        "w": jnp.zeros((3, 3, c_prev, ch0), dtype),
        "b": jnp.zeros((ch0,), dtype),
    }
    p["cond_embed"] = ce

    down = []
    zero_convs = [{"w": jnp.zeros((1, 1, ch0, ch0), dtype),
                   "b": jnp.zeros((ch0,), dtype)}]
    c_prev = ch0
    for lvl, c_out in enumerate(cfg.block_out_channels):
        blk: Params = {"resnets": [], "attns": []}
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_init(
                next(keys), c_prev if i == 0 else c_out, c_out, ted, dtype))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_transformer_init(
                    next(keys), c_out, cfg.cross_attention_dim,
                    cfg.transformer_layers[lvl], cfg.linear_projection,
                    cfg.norm_groups, dtype))
            zero_convs.append({"w": jnp.zeros((1, 1, c_out, c_out), dtype),
                               "b": jnp.zeros((c_out,), dtype)})
        if lvl < cfg.levels - 1:
            blk["downsample"] = L.conv_init(next(keys), 3, 3, c_out, c_out,
                                            dtype)
            zero_convs.append({"w": jnp.zeros((1, 1, c_out, c_out), dtype),
                               "b": jnp.zeros((c_out,), dtype)})
        down.append(blk)
        c_prev = c_out
    p["down"] = down
    p["zero_convs"] = zero_convs

    c_mid = cfg.block_out_channels[-1]
    p["mid"] = {
        "res1": _resnet_init(next(keys), c_mid, c_mid, ted, dtype),
        "res2": _resnet_init(next(keys), c_mid, c_mid, ted, dtype),
    }
    if cfg.mid_attn:
        p["mid"]["attn"] = _transformer_init(
            next(keys), c_mid, cfg.cross_attention_dim,
            cfg.mid_transformer_layers, cfg.linear_projection,
            cfg.norm_groups, dtype)
    p["mid_zero"] = {"w": jnp.zeros((1, 1, c_mid, c_mid), dtype),
                     "b": jnp.zeros((c_mid,), dtype)}
    return p


def residual_resolutions(cfg: UNetConfig, h: int, w: int):
    """Spatial dims of each down residual + the mid residual at latent
    size (h, w) — mirrors the feats list built in apply() (conv_in, then
    layers_per_block resnets per level, then the stride-2 downsample on
    all but the last level). Used to pre-resize per-hint masks outside
    the compiled step (reference resizes per call,
    gyre/pipeline/unified_pipeline.py:810-830)."""
    down = [(h, w)]
    ch, cw = h, w
    for lvl in range(cfg.levels):
        down.extend([(ch, cw)] * cfg.layers_per_block)
        if lvl < cfg.levels - 1:
            ch, cw = (ch - 1) // 2 + 1, (cw - 1) // 2 + 1
            down.append((ch, cw))
    return down, (ch, cw)


def embed_condition(params: Params, cond_image: jax.Array) -> jax.Array:
    """cond image [B,H,W,3] (pixel res) -> [B,H/8,W/8,ch0]."""
    ce = params["cond_embed"]
    h = L.silu(L.conv2d(ce["conv_in"], cond_image))
    for blk in ce["blocks"]:
        h = L.silu(L.conv2d(blk["conv1"], h))
        h = L.silu(L.conv2d(blk["conv2"], h, stride=2,
                            padding=[(1, 1), (1, 1)]))
    return L.conv2d(ce["conv_out"], h)


def apply(params: Params, cfg: UNetConfig, x: jax.Array, timesteps,
          context: jax.Array, cond_embedding: jax.Array,
          conditioning_scale: float | jax.Array = 1.0):
    """-> (down_residuals [len=unet skips], mid_residual).

    cond_embedding: precomputed embed_condition output (it's x-independent,
    so the per-step cost is just the encoder twin).
    """
    dtype = x.dtype
    groups = cfg.norm_groups
    temb = L.timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = L.linear(params["time_embed"]["lin2"],
                    L.silu(L.linear(params["time_embed"]["lin1"],
                                    temb.astype(dtype))))

    h = L.conv2d(params["conv_in"], x) + cond_embedding.astype(dtype)
    feats = [h]
    for lvl, blk in enumerate(params["down"]):
        for i, res in enumerate(blk["resnets"]):
            h = _resnet(res, h, temb, groups)
            if blk["attns"]:
                h = _transformer(blk["attns"][i], h, context,
                                 cfg.num_heads[lvl], groups,
                                 cfg.linear_projection)
            feats.append(h)
        if "downsample" in blk:
            h = L.conv2d(blk["downsample"], h, stride=2,
                         padding=[(1, 1), (1, 1)])
            feats.append(h)

    mid = params["mid"]
    h = _resnet(mid["res1"], h, temb, groups)
    if "attn" in mid:
        h = _transformer(mid["attn"], h, context,
                         cfg.num_heads[cfg.levels - 1], groups,
                         cfg.linear_projection)
    h = _resnet(mid["res2"], h, temb, groups)

    scale = conditioning_scale
    down_res = [L.conv2d(zc, f) * scale
                for zc, f in zip(params["zero_convs"], feats)]
    mid_res = L.conv2d(params["mid_zero"], h) * scale
    return down_res, mid_res
