"""K-UNet: the sd-x2 latent upscaler's architecture, TPU-native.

The reference serves ``stabilityai/sd-x2-latent-upscaler`` through
diffusers' StableDiffusionLatentUpscalePipeline
(gyre/pipeline/upscalers/diffusers_upscaler_wrapper.py, engine config
gyre/config/engines/upscaler.yaml:6-15). That checkpoint is NOT a
standard SD UNet: it is Katherine Crowson's k-upscaler design, stored
with diffusers' KBlock module names:

  * GaussianFourierProjection time embedding (``time_proj.weight``, a
    fixed random frequency vector; input is c_noise = 0.25*ln(sigma)),
    then the usual two-linear TimestepEmbedding with GELU.
  * 4 down / 4 up KBlocks, NO mid block. Resnets are "ada_group":
    GroupNorm without affine, FiLM-modulated per block by a linear of
    the time embedding (``norm{1,2}.linear``), GELU nonlinearity,
    1x1 bias-free conv shortcut.
  * KAttentionBlock: AdaGroupNorm then flattened-HW attention;
    cross-attention everywhere (``norm2``/``attn2``, with layer-normed
    encoder states ``attn2.norm_cross``), plus self-attention
    (``norm1``/``attn1``) only where the published config's
    only_cross_attention is False (the deepest level).
  * Up block i consumes cat([h, skip_i]) ONCE at block start (first
    resnet in = 2*out_channels, last resnet out = next level's
    channels — diffusers KUpBlock2D's k_in/k_out quirk).
  * Fixed [1,3,3,1]/8 blur resampling (KDownsample2D stride-2 conv /
    KUpsample2D stride-2 transposed conv, both depthwise, reflect pad).

``load_kunet`` consumes 100% of the checkpoint keys (strict: unknown
or missing keys raise) and derives every dimension from tensor shapes,
so the published file dictates the architecture. The torch oracle in
tests/torch_oracles.py (KUnet) reimplements the same module structure
with the published key names for numeric parity tests.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


@dataclasses.dataclass(frozen=True)
class KUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple = (384, 768, 768, 1536)
    layers_per_block: int = 4          # resnets per down block
    # levels whose KAttentionBlocks also self-attend (published config:
    # only_cross_attention=[True]*3+[False] -> deepest level only)
    self_attn_levels: tuple = (False, False, False, True)
    # levels with attention at all (level 0 is a plain KDownBlock2D)
    attn_levels: tuple = (False, True, True, True)
    head_dim: int = 64
    cross_attention_dim: int = 768
    group_size: int = 32               # ada_group: groups = C // 32

    @property
    def levels(self) -> int:
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self) -> int:
        return 2 * self.block_out_channels[0]


X2_DEFAULT = KUNetConfig()
X2_TEST = KUNetConfig(block_out_channels=(32, 64), layers_per_block=2,
                      self_attn_levels=(False, True),
                      attn_levels=(False, True), head_dim=16,
                      cross_attention_dim=64, group_size=16)


# ------------------------------------------------------------------ pieces


_BLUR_1D = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32) / 8.0
_BLUR_2D = np.outer(_BLUR_1D, _BLUR_1D)                      # [4,4]


def _blur_down(x: jax.Array) -> jax.Array:
    """KDownsample2D: reflect-pad 1, depthwise 4x4 blur, stride 2."""
    c = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    w = jnp.asarray(_BLUR_2D, x.dtype)[:, :, None, None] * \
        jnp.ones((1, 1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=x.dtype)


def _blur_up(x: jax.Array) -> jax.Array:
    """KUpsample2D: reflect-pad 1, depthwise 4x4 blur*2 transposed conv
    with stride 2 — exactly 2x output (torch conv_transpose2d with
    effective padding 3 on the padded input; only that padding yields
    H -> 2H, which the K up path's skip shapes require). Equivalent
    lax form: 2x lhs_dilation + VALID conv with the flipped kernel."""
    c = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    # diffusers doubles the 1-D kernel BEFORE the outer product, so the
    # 2-D upsample kernel is 4x the blur (sums to 4 — magnitude-
    # preserving for stride-2 scatter)
    w = jnp.asarray(_BLUR_2D * 4.0, x.dtype)[:, :, None, None] * \
        jnp.ones((1, 1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, w[::-1, ::-1],
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=x.dtype)


def _ada_group_norm(p: Params, x: jax.Array, temb: jax.Array,
                    groups: int) -> jax.Array:
    """AdaGroupNorm: affine-free GroupNorm, FiLM scale/shift from a
    linear of the time embedding (diffusers models/normalization.py)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[0], -1, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xf = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
    emb = L.linear(p["linear"], temb.astype(x.dtype)).astype(jnp.float32)
    scale, shift = jnp.split(emb, 2, axis=-1)
    while scale.ndim < xf.ndim:
        scale = scale[:, None]
        shift = shift[:, None]
    return (xf * (1.0 + scale) + shift).astype(x.dtype)


def _resnet(p: Params, x: jax.Array, temb: jax.Array,
            cfg: KUNetConfig) -> jax.Array:
    gin = max(1, x.shape[-1] // cfg.group_size)
    h = L.gelu(_ada_group_norm(p["norm1"], x, temb, gin))
    h = L.conv2d(p["conv1"], h)
    gout = max(1, h.shape[-1] // cfg.group_size)
    h = L.gelu(_ada_group_norm(p["norm2"], h, temb, gout))
    h = L.conv2d(p["conv2"], h)
    sc = L.conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return sc + h


def _attn(p: Params, x: jax.Array, ctx: jax.Array, heads: int) -> jax.Array:
    """One Attention module over flattened HW (or ctx tokens)."""
    b = x.shape[0]
    t = x.shape[1]
    d = p["q"]["w"].shape[1] // heads
    q = L.linear(p["q"], x).reshape(b, t, heads, d)
    src = ctx if ctx is not None else x
    k = L.linear(p["k"], src).reshape(b, src.shape[1], heads, d)
    v = L.linear(p["v"], src).reshape(b, src.shape[1], heads, d)
    o = L.attention(q, k, v).reshape(b, t, heads * d)
    return L.linear(p["out"], o)


def _kattention(p: Params, x: jax.Array, temb: jax.Array,
                ctx: jax.Array, cfg: KUNetConfig) -> jax.Array:
    """KAttentionBlock: optional self-attn (norm1/attn1) then
    cross-attn (norm2/attn2 with layer-normed encoder states)."""
    b, h, w, c = x.shape
    heads = max(1, c // cfg.head_dim)
    groups = max(1, c // cfg.group_size)
    if "attn1" in p:
        n = _ada_group_norm(p["norm1"], x, temb, groups)
        a = _attn(p["attn1"], n.reshape(b, h * w, c), None, heads)
        x = x + a.reshape(b, h, w, c)
    n = _ada_group_norm(p["norm2"], x, temb, groups)
    cctx = ctx
    if "norm_cross" in p["attn2"]:
        cctx = L.layer_norm(p["attn2"]["norm_cross"], ctx)
    a = _attn(p["attn2"], n.reshape(b, h * w, c), cctx, heads)
    return x + a.reshape(b, h, w, c)


# ------------------------------------------------------------------- apply


def apply(params: Params, cfg: KUNetConfig, x: jax.Array,
          c_noise: jax.Array, context: jax.Array) -> jax.Array:
    """x [B,H,W,in_ch] (latents | upsampled source latents), c_noise [B]
    (= 0.25*ln(sigma), the k-upscaler conditioning), context [B,T,D]
    (CLIP text states) -> eps [B,H,W,out_ch]."""
    # Gaussian Fourier features: cos/sin of 2*pi*W*t (flip_sin_to_cos)
    t = jnp.asarray(c_noise, jnp.float32).reshape(-1)
    freqs = params["time_proj"].astype(jnp.float32)          # [E]
    ang = 2.0 * math.pi * t[:, None] * freqs[None, :]
    temb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    temb = temb.astype(x.dtype)
    temb = L.linear(params["time_emb2"],
                    L.gelu(L.linear(params["time_emb1"], temb)))

    h = L.conv2d(params["conv_in"], x)
    skips = []
    for li, blk in enumerate(params["down"]):
        for ri, rp in enumerate(blk["resnets"]):
            h = _resnet(rp, h, temb, cfg)
            if "attentions" in blk:
                h = _kattention(blk["attentions"][ri], h, temb, context,
                                cfg)
        skips.append(h)
        if li != len(params["down"]) - 1:
            h = _blur_down(h)

    for li, blk in enumerate(params["up"]):
        h = jnp.concatenate([h, skips[-(li + 1)]], axis=-1)
        for ri, rp in enumerate(blk["resnets"]):
            h = _resnet(rp, h, temb, cfg)
            if "attentions" in blk:
                h = _kattention(blk["attentions"][ri], h, temb, context,
                                cfg)
        if li != len(params["up"]) - 1:
            h = _blur_up(h)

    if "conv_norm_out" in params:
        h = L.gelu(L.group_norm(params["conv_norm_out"], h,
                                max(1, h.shape[-1] // cfg.group_size)))
    return L.conv2d(params["conv_out"], h)


# -------------------------------------------------------------------- init


def init(key, cfg: KUNetConfig = X2_TEST, dtype=jnp.float32) -> Params:
    """Random init with the checkpoint tree layout (weightless tests)."""
    ks = iter(jax.random.split(key, 4096))
    ted = cfg.time_embed_dim
    boc = cfg.block_out_channels

    def ada(c):
        return {"linear": L.linear_init(next(ks), ted, 2 * c, dtype)}

    def resnet(ci, co):
        p = {"norm1": ada(ci),
             "conv1": L.conv_init(next(ks), 3, 3, ci, co, dtype),
             "norm2": ada(co),
             "conv2": L.conv_init(next(ks), 3, 3, co, co, dtype)}
        if ci != co:
            p["conv_shortcut"] = L.conv_init(next(ks), 1, 1, ci, co,
                                             dtype, bias=False)
        return p

    def attn_mod(c, kv):
        return {"q": L.linear_init(next(ks), c, c, dtype, bias=False),
                "k": L.linear_init(next(ks), kv, c, dtype, bias=False),
                "v": L.linear_init(next(ks), kv, c, dtype, bias=False),
                "out": L.linear_init(next(ks), c, c, dtype)}

    def katt(c, self_attn):
        p = {"norm2": ada(c),
             "attn2": {**attn_mod(c, cfg.cross_attention_dim),
                       "norm_cross": L.norm_init(cfg.cross_attention_dim,
                                                 dtype)}}
        if self_attn:
            p["norm1"] = ada(c)
            p["attn1"] = attn_mod(c, c)
        return p

    p: Params = {
        "time_proj": jax.random.normal(next(ks), (boc[0],), dtype) * 16.0,
        "time_emb1": L.linear_init(next(ks), ted, ted, dtype),
        "time_emb2": L.linear_init(next(ks), ted, ted, dtype),
        "conv_in": L.conv_init(next(ks), 3, 3, cfg.in_channels, boc[0],
                               dtype),
        "down": [], "up": [],
        "conv_out": L.conv_init(next(ks), 3, 3, boc[0], cfg.out_channels,
                                dtype),
    }
    for li, co in enumerate(boc):
        ci = boc[max(li - 1, 0)]
        blk = {"resnets": []}
        if cfg.attn_levels[li]:
            blk["attentions"] = []
        for ri in range(cfg.layers_per_block):
            blk["resnets"].append(resnet(ci if ri == 0 else co, co))
            if cfg.attn_levels[li]:
                blk["attentions"].append(
                    katt(co, cfg.self_attn_levels[li]))
        p["down"].append(blk)
    rev = list(reversed(boc))
    for li in range(len(boc)):
        c_here = rev[li]                       # incoming/skip channels
        c_out = rev[min(li + 1, len(boc) - 1)]  # next level's channels
        blk = {"resnets": []}
        lvl = len(boc) - 1 - li
        if cfg.attn_levels[lvl]:
            blk["attentions"] = []
        n = cfg.layers_per_block
        for ri in range(n):
            ci = 2 * c_here if ri == 0 else c_here
            co = c_out if ri == n - 1 else c_here
            blk["resnets"].append(resnet(ci, co))
            if cfg.attn_levels[lvl]:
                blk["attentions"].append(
                    katt(co, cfg.self_attn_levels[lvl]))
        p["up"].append(blk)
    return p


# -------------------------------------------------------------------- load


def load_kunet(state: dict, dtype=None):
    """Published sd-x2 layout -> (params, KUNetConfig), shapes derived
    from tensors, 100% key consumption enforced."""
    used: set[str] = set()

    def raw(key):
        used.add(key)
        return np.asarray(state[key], np.float32)

    def arr(key):
        return jnp.asarray(raw(key), dtype)

    def lin(prefix, bias=True):
        p = {"w": jnp.asarray(np.transpose(raw(f"{prefix}.weight")),
                              dtype)}
        if f"{prefix}.bias" in state:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def conv(prefix):
        p = {"w": jnp.asarray(np.transpose(
            raw(f"{prefix}.weight"), (2, 3, 1, 0)), dtype)}
        if f"{prefix}.bias" in state:
            p["b"] = arr(f"{prefix}.bias")
        return p

    def ada(prefix):
        return {"linear": lin(f"{prefix}.linear")}

    def resnet(prefix):
        p = {"norm1": ada(f"{prefix}.norm1"),
             "conv1": conv(f"{prefix}.conv1"),
             "norm2": ada(f"{prefix}.norm2"),
             "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.conv_shortcut.weight" in state:
            p["conv_shortcut"] = conv(f"{prefix}.conv_shortcut")
        return p

    def attn_mod(prefix):
        p = {"q": lin(f"{prefix}.to_q"), "k": lin(f"{prefix}.to_k"),
             "v": lin(f"{prefix}.to_v"), "out": lin(f"{prefix}.to_out.0")}
        if f"{prefix}.norm_cross.weight" in state:
            p["norm_cross"] = {"scale": arr(f"{prefix}.norm_cross.weight"),
                               "bias": arr(f"{prefix}.norm_cross.bias")}
        return p

    def katt(prefix):
        p = {"norm2": ada(f"{prefix}.norm2"),
             "attn2": attn_mod(f"{prefix}.attn2")}
        if f"{prefix}.attn1.to_q.weight" in state:
            p["norm1"] = ada(f"{prefix}.norm1")
            p["attn1"] = attn_mod(f"{prefix}.attn1")
        return p

    def block(prefix):
        blk = {"resnets": []}
        ri = 0
        while f"{prefix}.resnets.{ri}.conv1.weight" in state:
            blk["resnets"].append(resnet(f"{prefix}.resnets.{ri}"))
            if f"{prefix}.attentions.{ri}.attn2.to_q.weight" in state:
                blk.setdefault("attentions", []).append(
                    katt(f"{prefix}.attentions.{ri}"))
            ri += 1
        return blk

    p: Params = {
        "time_proj": arr("time_proj.weight"),
        "time_emb1": lin("time_embedding.linear_1"),
        "time_emb2": lin("time_embedding.linear_2"),
        "conv_in": conv("conv_in"),
        "down": [], "up": [],
    }
    li = 0
    while f"down_blocks.{li}.resnets.0.conv1.weight" in state:
        p["down"].append(block(f"down_blocks.{li}"))
        li += 1
    li = 0
    while f"up_blocks.{li}.resnets.0.conv1.weight" in state:
        p["up"].append(block(f"up_blocks.{li}"))
        li += 1
    if "conv_norm_out.weight" in state:
        p["conv_norm_out"] = {"scale": arr("conv_norm_out.weight"),
                              "bias": arr("conv_norm_out.bias")}
    p["conv_out"] = conv("conv_out")

    left = [k for k in state if k not in used]
    if left:
        raise KeyError(f"unconsumed K-UNet checkpoint keys: {left[:8]}"
                       f"{'...' if len(left) > 8 else ''}")

    # derive config from shapes
    boc = tuple(blk["resnets"][-1]["conv2"]["w"].shape[-1]
                for blk in p["down"])
    in_ch = p["conv_in"]["w"].shape[2]
    out_ch = p["conv_out"]["w"].shape[-1]
    attn_lv = tuple("attentions" in blk for blk in p["down"])
    self_lv = tuple("attentions" in blk and "attn1" in blk["attentions"][0]
                    for blk in p["down"])
    cross_dim = None
    head_dim = 64
    for blk in p["down"]:
        for a in blk.get("attentions", []):
            cross_dim = a["attn2"]["k"]["w"].shape[0]
    cfg = KUNetConfig(
        in_channels=in_ch, out_channels=out_ch, block_out_channels=boc,
        layers_per_block=len(p["down"][0]["resnets"]),
        self_attn_levels=self_lv, attn_levels=attn_lv,
        head_dim=head_dim,
        cross_attention_dim=cross_dim or 768,
    )
    return p, cfg
