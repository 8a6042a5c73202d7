"""Stable Diffusion conditional UNet, as a pure JAX function.

Original TPU-first implementation of the denoiser architecture the reference
serves through diffusers' UNet2DConditionModel (reference
gyre/pipeline/unified_pipeline.py uses it via the unet wrapper algebra,
gyre/pipeline/unet/types.py). Differences from the torch design, by intent:

  * NHWC everywhere; bf16 compute; one pure `apply` — no modules/hooks.
  * ControlNet/T2I-Adapter conditioning are explicit arguments
    (down_residuals / mid_residual / adapter_states) rather than runtime
    unet patching (reference gyre/pipeline/controlnet/unet_patcher.py) —
    the whole conditioned step composes into a single XLA program.
  * Covers SD1.x / SD2.x / SDXL (incl. 9-channel inpaint and 5-channel
    depth2img variants) through UNetConfig.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .configs import UNetConfig

Params = dict


# ------------------------------------------------------------------- resnet


def _resnet_init(key, c_in, c_out, temb_dim, dtype, scale_shift=False):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": L.norm_init(c_in, dtype),
        "conv1": L.conv_init(ks[0], 3, 3, c_in, c_out, dtype),
        "norm2": L.norm_init(c_out, dtype),
        "conv2": L.conv_init(ks[1], 3, 3, c_out, c_out, dtype),
    }
    if temb_dim:
        p["time_emb"] = L.linear_init(
            ks[2], temb_dim, c_out * (2 if scale_shift else 1), dtype)
    if c_in != c_out:
        p["shortcut"] = L.conv_init(ks[3], 1, 1, c_in, c_out, dtype)
    return p


def _gn_silu_conv(norm_p, conv_p, x, groups):
    """GN -> SiLU -> conv3x3, fused into a Pallas kernel on TPU (5 -> 3
    HBM traversals, ops/fused_norm_conv.py); XLA chain otherwise."""
    from ..ops import fusion

    if fusion.enabled() and fusion.gn_conv_fusable(x.shape,
                                                  conv_p["w"].shape):
        from ..ops.fused_norm_conv import gn_silu_conv3x3

        return gn_silu_conv3x3(x, norm_p["scale"], norm_p["bias"],
                               conv_p["w"], conv_p.get(
                                   "b", jnp.zeros(conv_p["w"].shape[-1])),
                               groups=groups, eps=1e-5)
    return L.conv2d(conv_p, L.silu(L.group_norm(norm_p, x, groups)))


def _resnet(p, x, temb, groups, tiling=(False, False)):
    plain = not (tiling[0] or tiling[1])
    if plain:
        h = _gn_silu_conv(p["norm1"], p["conv1"], x, groups)
    else:
        h = L.silu(L.group_norm(p["norm1"], x, groups))
        h = L.conv2d_tiled(p["conv1"], h, tiling_x=tiling[0],
                           tiling_y=tiling[1])
    te = None
    if temb is not None and "time_emb" in p:
        te = L.linear(p["time_emb"], L.silu(temb))
    if te is not None and te.shape[-1] == 2 * h.shape[-1]:
        # diffusers resnet_time_scale_shift="scale_shift" (FiLM-style
        # modulation; the sd-x2 latent upscaler's k-upscaler blocks use
        # this instead of additive time conditioning) — detected from the
        # time_emb_proj weight shape, which is static at trace time
        scale, shift = jnp.split(te, 2, axis=-1)
        h = L.group_norm(p["norm2"], h, groups)
        h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        h = L.silu(h)
        h = L.conv2d_tiled(p["conv2"], h, tiling_x=tiling[0],
                           tiling_y=tiling[1])
    else:
        if te is not None:
            h = h + te[:, None, None, :]
        if plain:
            h = _gn_silu_conv(p["norm2"], p["conv2"], h, groups)
        else:
            h = L.silu(L.group_norm(p["norm2"], h, groups))
            h = L.conv2d_tiled(p["conv2"], h, tiling_x=tiling[0],
                               tiling_y=tiling[1])
    if "shortcut" in p:
        x = L.conv2d(p["shortcut"], x)
    return x + h


# -------------------------------------------------------------- transformer


def _attn_init(key, dim, ctx_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": L.linear_init(ks[0], dim, dim, dtype, bias=False),
        "k": L.linear_init(ks[1], ctx_dim, dim, dtype, bias=False),
        "v": L.linear_init(ks[2], ctx_dim, dim, dtype, bias=False),
        "out": L.linear_init(ks[3], dim, dim, dtype),
    }


def _attn(p, x, ctx, heads):
    """x: [B, T, C]; ctx: [B, S, Cc] (or x for self-attention).

    Q/K/V projections are fused into one matmul (self) or a KV pair
    (cross): wider N keeps the MXU tiles full (320 -> 960 output columns)
    and XLA hoists the loop-invariant weight concat out of the denoise
    scan. Weights stay separate in the params tree so LoRA targeting and
    checkpoint export are unaffected."""
    b, t, c = x.shape
    d = c // heads
    if ctx is x:
        w = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]],
                            axis=1).astype(x.dtype)
        qkv = jnp.dot(x, w, preferred_element_type=x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        wkv = jnp.concatenate([p["k"]["w"], p["v"]["w"]],
                              axis=1).astype(ctx.dtype)
        kv = jnp.dot(ctx, wkv, preferred_element_type=ctx.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        q = L.linear(p["q"], x)
    q = q.reshape(b, t, heads, d)
    k = k.reshape(b, ctx.shape[1], heads, d)
    v = v.reshape(b, ctx.shape[1], heads, d)
    o = L.attention(q, k, v).reshape(b, t, c)
    return L.linear(p["out"], o)


def _tblock_init(key, dim, ctx_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "ln1": L.norm_init(dim, dtype),
        "attn1": _attn_init(ks[0], dim, dim, dtype),
        "ln2": L.norm_init(dim, dtype),
        "attn2": _attn_init(ks[1], dim, ctx_dim, dtype),
        "ln3": L.norm_init(dim, dtype),
        "ff1": L.linear_init(ks[2], dim, dim * 8, dtype),   # GEGLU (4d pairs)
        "ff2": L.linear_init(ks[3], dim * 4, dim, dtype),
    }


def _tblock(p, x, ctx, heads, tome_ratio: float = 0.0):
    h = L.layer_norm(p["ln1"], x)
    if tome_ratio > 0:
        from ..ops import tome

        x = x + tome.tome_self_attention(
            lambda t: _attn(p["attn1"], t, t, heads), h, tome_ratio)
    else:
        x = x + _attn(p["attn1"], h, h, heads)
    h = L.layer_norm(p["ln2"], x)
    x = x + _attn(p["attn2"], h, ctx, heads)
    h = L.layer_norm(p["ln3"], x)
    x = x + L.linear(p["ff2"], L.geglu(p["ff1"], h))
    return x


def _transformer_init(key, dim, ctx_dim, n_layers, linear_proj, groups, dtype):
    ks = jax.random.split(key, n_layers + 2)
    p = {
        "norm": L.norm_init(dim, dtype),
        "blocks": [_tblock_init(ks[i], dim, ctx_dim, dtype)
                   for i in range(n_layers)],
    }
    if linear_proj:
        p["proj_in"] = L.linear_init(ks[-2], dim, dim, dtype)
        p["proj_out"] = L.linear_init(ks[-1], dim, dim, dtype)
    else:
        p["proj_in"] = L.conv_init(ks[-2], 1, 1, dim, dim, dtype)
        p["proj_out"] = L.conv_init(ks[-1], 1, 1, dim, dim, dtype)
    return p


def _transformer(p, x, ctx, heads, groups, linear_proj, tome_ratio=0.0):
    """Spatial transformer over NHWC feature map."""
    b, h, w, c = x.shape
    res = x
    x = L.group_norm(p["norm"], x, groups, eps=1e-6)
    if linear_proj:
        x = x.reshape(b, h * w, c)
        x = L.linear(p["proj_in"], x)
    else:
        x = L.conv2d(p["proj_in"], x)
        x = x.reshape(b, h * w, c)
    for blk in p["blocks"]:
        x = _tblock(blk, x, ctx, heads, tome_ratio)
    if linear_proj:
        x = L.linear(p["proj_out"], x)
        x = x.reshape(b, h, w, c)
    else:
        x = x.reshape(b, h, w, c)
        x = L.conv2d(p["proj_out"], x)
    return x + res


# --------------------------------------------------------------------- init


def init(key, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    ch0 = cfg.block_out_channels[0]
    ted = cfg.time_embed_dim
    p: Params = {
        "conv_in": L.conv_init(next(keys), 3, 3, cfg.in_channels, ch0, dtype),
        "time_embed": {
            "lin1": L.linear_init(next(keys), ch0, ted, dtype),
            "lin2": L.linear_init(next(keys), ted, ted, dtype),
        },
        "norm_out": L.norm_init(ch0, dtype),
        "conv_out": L.conv_init(next(keys), 3, 3, ch0, cfg.out_channels, dtype),
    }
    if cfg.addition_embed_dim:
        add_in = cfg.addition_embed_dim + cfg.addition_time_dim * cfg.addition_time_ids
        p["add_embed"] = {
            "lin1": L.linear_init(next(keys), add_in, ted, dtype),
            "lin2": L.linear_init(next(keys), ted, ted, dtype),
        }
    if cfg.class_embed:
        p["class_embed"] = {
            "lin1": L.linear_init(next(keys), ch0, ted, dtype),
            "lin2": L.linear_init(next(keys), ted, ted, dtype),
        }

    down = []
    c_prev = ch0
    for lvl, c_out in enumerate(cfg.block_out_channels):
        blk: Params = {"resnets": [], "attns": []}
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(
                _resnet_init(next(keys), c_prev if i == 0 else c_out, c_out,
                             ted, dtype, cfg.time_scale_shift))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_transformer_init(
                    next(keys), c_out, cfg.cross_attention_dim,
                    cfg.transformer_layers[lvl], cfg.linear_projection,
                    cfg.norm_groups, dtype))
        if lvl < cfg.levels - 1:
            blk["downsample"] = L.conv_init(next(keys), 3, 3, c_out, c_out, dtype)
        down.append(blk)
        c_prev = c_out
    p["down"] = down

    c_mid = cfg.block_out_channels[-1]
    p["mid"] = {
        "res1": _resnet_init(next(keys), c_mid, c_mid, ted, dtype,
                             cfg.time_scale_shift),
        "res2": _resnet_init(next(keys), c_mid, c_mid, ted, dtype,
                             cfg.time_scale_shift),
    }
    if cfg.mid_attn:
        p["mid"]["attn"] = _transformer_init(
            next(keys), c_mid, cfg.cross_attention_dim,
            cfg.mid_transformer_layers, cfg.linear_projection,
            cfg.norm_groups, dtype)

    up = []
    rev = list(reversed(cfg.block_out_channels))
    for i, c_out in enumerate(rev):
        lvl = cfg.levels - 1 - i
        c_skip_base = rev[min(i + 1, cfg.levels - 1)]
        c_prev_blk = rev[max(i - 1, 0)] if i > 0 else c_mid
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            # skip channels: innermost skips first, outermost last
            res_skip = c_skip_base if j == cfg.layers_per_block else c_out
            res_in = (c_prev_blk if j == 0 else c_out) + res_skip
            blk["resnets"].append(_resnet_init(next(keys), res_in, c_out,
                                               ted, dtype,
                                               cfg.time_scale_shift))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_transformer_init(
                    next(keys), c_out, cfg.cross_attention_dim,
                    cfg.transformer_layers[lvl], cfg.linear_projection,
                    cfg.norm_groups, dtype))
        if i < cfg.levels - 1:
            blk["upsample"] = L.conv_init(next(keys), 3, 3, c_out, c_out, dtype)
        up.append(blk)
    p["up"] = up
    return p


# -------------------------------------------------------------------- apply


def apply(params: Params, cfg: UNetConfig, x: jax.Array, timesteps: jax.Array,
          context: jax.Array, *,
          added_cond: dict | None = None,
          class_labels: jax.Array | None = None,
          down_residuals: list | None = None,
          mid_residual: jax.Array | None = None,
          adapter_states: list | None = None,
          tiling: tuple[bool, bool] = (False, False),
          tome_ratio: float = 0.0) -> jax.Array:
    """Predict noise (or v): x [B,H,W,Cin], timesteps [B], context [B,S,D].

    added_cond (SDXL): {"text_embeds": [B,1280], "time_ids": [B,6]}.
    down_residuals/mid_residual: ControlNet residuals (reference
      gyre/pipeline/unified_pipeline.py:957-1058 feeds these per step).
    adapter_states: T2I-Adapter per-level feature maps, added to the down
      path input at each level.
    """
    dtype = x.dtype
    groups = cfg.norm_groups
    temb = L.timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = L.linear(params["time_embed"]["lin2"],
                    L.silu(L.linear(params["time_embed"]["lin1"],
                                    temb.astype(dtype))))
    if cfg.addition_embed_dim and added_cond is not None:
        tids = L.timestep_embedding(
            added_cond["time_ids"].reshape(-1), cfg.addition_time_dim)
        tids = tids.reshape(x.shape[0], -1)
        aug = jnp.concatenate(
            [added_cond["text_embeds"].astype(jnp.float32), tids], axis=-1)
        aug = L.linear(params["add_embed"]["lin2"],
                       L.silu(L.linear(params["add_embed"]["lin1"],
                                       aug.astype(dtype))))
        temb = temb + aug
    if cfg.class_embed and class_labels is not None:
        cemb = L.timestep_embedding(class_labels,
                                    cfg.block_out_channels[0])
        cemb = L.linear(params["class_embed"]["lin2"],
                        L.silu(L.linear(params["class_embed"]["lin1"],
                                        cemb.astype(dtype))))
        temb = temb + cemb

    h = L.conv2d_tiled(params["conv_in"], x, tiling_x=tiling[0], tiling_y=tiling[1])
    skips = [h]
    for lvl, blk in enumerate(params["down"]):
        for i, res in enumerate(blk["resnets"]):
            h = _resnet(res, h, temb, groups, tiling)
            if blk["attns"]:
                h = _transformer(blk["attns"][i], h, context,
                                 cfg.num_heads[lvl], groups,
                                 cfg.linear_projection, tome_ratio)
            # T2I-Adapter features: added after the level's last resnet
            # (channels == block_out[lvl], the adapter's ladder)
            if (adapter_states is not None and
                    i == len(blk["resnets"]) - 1 and
                    lvl < len(adapter_states) and
                    adapter_states[lvl] is not None):
                h = h + adapter_states[lvl].astype(dtype)
            skips.append(h)
        if "downsample" in blk:
            h = L.conv2d(blk["downsample"], h, stride=2,
                         padding=[(1, 1), (1, 1)])
            skips.append(h)

    if down_residuals is not None:
        skips = [s + r.astype(dtype) for s, r in zip(skips, down_residuals)]

    mid = params["mid"]
    h = _resnet(mid["res1"], h, temb, groups, tiling)
    if "attn" in mid:
        h = _transformer(mid["attn"], h, context,
                         cfg.num_heads[cfg.levels - 1], groups,
                         cfg.linear_projection, tome_ratio)
    h = _resnet(mid["res2"], h, temb, groups, tiling)
    if mid_residual is not None:
        h = h + mid_residual.astype(dtype)

    for i, blk in enumerate(params["up"]):
        lvl = cfg.levels - 1 - i
        for j, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(res, h, temb, groups, tiling)
            if blk["attns"]:
                h = _transformer(blk["attns"][j], h, context,
                                 cfg.num_heads[lvl], groups,
                                 cfg.linear_projection, tome_ratio)
        if "upsample" in blk:
            h = L.upsample_nearest_2x(h)
            h = L.conv2d_tiled(blk["upsample"], h,
                               tiling_x=tiling[0], tiling_y=tiling[1])

    h = L.silu(L.group_norm(params["norm_out"], h, groups))
    h = L.conv2d_tiled(params["conv_out"], h,
                       tiling_x=tiling[0], tiling_y=tiling[1])
    return h
