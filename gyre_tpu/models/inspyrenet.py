"""InSPyReNet salient-object segmentation (background removal).

The reference's background-removal hinter (gyre/pipeline/hinters/
inspyrenet_pipeline.py over the vendored model, gyre/pipeline/hinters/
inspyrenet/InSPyReNet.py:12-144): a SwinB backbone feeding a saliency
pyramid — PAA context modules per level, a PAA decoder at 1/16, SICA
attention refiners at 1/4, 1/2 and 1/1, and Laplacian image-pyramid
reconstruction between levels. Deployed with threshold=None (reference
config/models/hinters.yaml:151), i.e. the direct single-pass path.

Layout split, by intent: the Swin backbone (all the FLOPs) runs NHWC with
windows folded into the batch axis (same scheme as models/swinir.py); the
lightweight decoder mirrors the reference's NCHW tensor semantics exactly
(its strided views and bmm reshapes are layout-sensitive), with BatchNorms
folded into convs at load."""

from __future__ import annotations

import dataclasses
import math

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import layers as L

Params = dict


@dataclasses.dataclass(frozen=True)
class SwinBConfig:
    embed_dim: int = 128
    depths: tuple = (2, 2, 18, 2)
    heads: tuple = (4, 8, 16, 32)
    window: int = 12
    mlp_ratio: int = 4


SWIN_B = SwinBConfig()
SWIN_TEST = SwinBConfig(embed_dim=16, depths=(1, 1, 2, 1),
                        heads=(2, 2, 2, 2), window=4)


# ----------------------------------------------------------- swin backbone


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


def _block_init(key, dim, heads, window, ratio, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm1": L.norm_init(dim, dtype),
        "qkv": L.linear_init(ks[0], dim, dim * 3, dtype),
        "proj": L.linear_init(ks[1], dim, dim, dtype),
        "rel_bias": jax.random.normal(
            ks[2], ((2 * window - 1) ** 2, heads), dtype) * 0.02,
        "norm2": L.norm_init(dim, dtype),
        "fc1": L.linear_init(ks[3], dim, dim * ratio, dtype),
        "fc2": L.linear_init(jax.random.fold_in(ks[3], 1), dim * ratio,
                             dim, dtype),
    }


def _win_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _win_reverse(wins, w, h, ww):
    b = wins.shape[0] // ((h // w) * (ww // w))
    x = wins.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def _swin_block(p, x, heads, window, shift, rel_idx):
    b, h, w, c = x.shape
    shortcut = x
    xn = L.layer_norm(p["norm1"], x)
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    xn = jnp.pad(xn, [(0, 0), (0, pad_b), (0, pad_r), (0, 0)])
    hp, wp = h + pad_b, w + pad_r
    if shift:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    wins = _win_partition(xn, window)                   # [B*nW, w*w, C]
    t = wins.shape[1]
    qkv = L.linear(p["qkv"], wins).reshape(-1, t, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    bias = p["rel_bias"][rel_idx.reshape(-1)].reshape(t, t, heads)
    logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)
    if shift or pad_b or pad_r:
        # cross-boundary mask over the (shifted, padded) canvas
        img_mask = np.zeros((1, hp, wp, 1), np.int32)
        cnt = 0
        stops = ((slice(0, hp - window), slice(hp - window, hp - shift),
                  slice(hp - shift, hp)) if shift else
                 (slice(0, hp),))
        stops_w = ((slice(0, wp - window), slice(wp - window, wp - shift),
                    slice(wp - shift, wp)) if shift else
                   (slice(0, wp),))
        for hs in stops:
            for ws_ in stops_w:
                img_mask[:, hs, ws_, :] = cnt
                cnt += 1
        mw = _win_partition(jnp.asarray(img_mask, jnp.float32), window)
        mw = mw[..., 0]
        amask = (mw[:, None, :] == mw[:, :, None])
        n_win = amask.shape[0]
        logits = logits.reshape(-1, n_win, heads, t, t)
        logits = jnp.where(amask[None, :, None], logits, -1e9)
        logits = logits.reshape(-1, heads, t, t)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(-1, t, c)
    out = L.linear(p["proj"], out)
    out = _win_reverse(out, window, hp, wp)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    out = out[:, :h, :w]
    x = shortcut + out
    xn = L.layer_norm(p["norm2"], x)
    xn = L.linear(p["fc2"], jax.nn.gelu(L.linear(p["fc1"], xn),
                                        approximate=False))
    return x + xn


def _merge_init(key, dim, dtype):
    return {"norm": L.norm_init(4 * dim, dtype),
            "reduction": L.linear_init(key, 4 * dim, 2 * dim, dtype,
                                       bias=False)}


def _patch_merge(p, x):
    b, h, w, c = x.shape
    x = jnp.pad(x, [(0, 0), (0, h % 2), (0, w % 2), (0, 0)])
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    return L.linear(p["reduction"], L.layer_norm(p["norm"], x))


def swin_init(key, cfg: SwinBConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {
        "patch_conv": L.conv_init(next(ks), 4, 4, 3, cfg.embed_dim, dtype),
        "patch_norm": L.norm_init(cfg.embed_dim, dtype),
        "stages": [],
        "out_norms": [L.norm_init(cfg.embed_dim * 2 ** i, dtype)
                      for i in range(4)],
    }
    for i, depth in enumerate(cfg.depths):
        dim = cfg.embed_dim * 2 ** i
        stage = {"blocks": [
            _block_init(next(ks), dim, cfg.heads[i], cfg.window,
                        cfg.mlp_ratio, dtype) for _ in range(depth)]}
        if i < len(cfg.depths) - 1:
            stage["merge"] = _merge_init(next(ks), dim, dtype)
        p["stages"].append(stage)
    return p


def swin_apply(params: Params, cfg: SwinBConfig, x: jax.Array):
    """x [B,H,W,3] (normalized) -> 5 NHWC maps: 1/4 (embed), then per
    stage 1/4, 1/8, 1/16, 1/32 at dims C, C, 2C, 4C, 8C."""
    h, w = x.shape[1], x.shape[2]
    x = jnp.pad(x, [(0, 0), (0, (4 - h % 4) % 4), (0, (4 - w % 4) % 4),
                    (0, 0)])
    x = L.conv2d(params["patch_conv"], x, stride=4, padding="VALID")
    x = L.layer_norm(params["patch_norm"], x)
    outs = [x]
    rel_idx = jnp.asarray(_rel_pos_index(cfg.window))
    for i, stage in enumerate(params["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            shift = (cfg.window // 2) if j % 2 else 0
            x = _swin_block(blk, x, cfg.heads[i], cfg.window, shift,
                            rel_idx)
        outs.append(L.layer_norm(params["out_norms"][i], x))
        if "merge" in stage:
            x = _patch_merge(stage["merge"], x)
    return outs


# ------------------------------------------------------ decoder (NCHW)


def _convf_init(key, c_in, c_out, k, dtype, kh=None, kw=None):
    kh = kh or k
    kw = kw or k
    scale = 1.0 / math.sqrt(c_in * kh * kw)
    return {"w": jax.random.uniform(key, (c_out, c_in, kh, kw), dtype,
                                    -scale, scale),
            "b": jnp.zeros((c_out,), dtype)}


def _convf(p, x, dilation=1, groups=1):
    """NCHW conv with torch-'same' padding (BN already folded into w/b)."""
    kh, kw = p["w"].shape[2], p["w"].shape[3]
    ph = dilation * (kh - 1) // 2
    pw = dilation * (kw - 1) // 2
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(ph, ph), (pw, pw)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None, None]
    return y


def _resize_nchw(x, size, align_corners=False):
    b, c, h, w = x.shape
    if (h, w) == tuple(size):
        return x
    if not align_corners:
        return jax.image.resize(x, (b, c, size[0], size[1]), "bilinear")
    # align_corners=True: endpoints map to endpoints
    def grid(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,))
        return jnp.linspace(0.0, n_in - 1.0, n_out)

    ys = grid(size[0], h)
    xs = grid(size[1], w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, None, :, None]
    wx = (xs - x0)[None, None, None, :]
    g = x[:, :, y0][:, :, :, x0] * (1 - wy) * (1 - wx) + \
        x[:, :, y1][:, :, :, x0] * wy * (1 - wx) + \
        x[:, :, y0][:, :, :, x1] * (1 - wy) * wx + \
        x[:, :, y1][:, :, :, x1] * wy * wx
    return g


def _self_attention(p, x, mode):
    """Reference SelfAttention (hinters/inspyrenet/modules/layers.py):
    1x1 q/k/v convs, attention over the reshaped trailing axis given by
    `mode` ('h' or 'w'), gamma-gated residual. The torch row-major
    view(B,-1,axis) semantics are reproduced verbatim."""
    b, c, h, w = x.shape
    axis = {"h": h, "w": w}[mode]
    q = _convf(p["query"], x).reshape(b, -1, axis)
    k = _convf(p["key"], x).reshape(b, -1, axis)
    v = _convf(p["value"], x).reshape(b, -1, axis)
    attn = jax.nn.softmax(
        jnp.einsum("bcq,bck->bqk", q, k,
                   preferred_element_type=jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bck,bqk->bcq", v, attn).reshape(b, c, h, w)
    return p["gamma"].astype(x.dtype) * out + x


def _paa_kernel(p, x, receptive):
    x = _convf(p["conv0"], x)
    x = _convf(p["conv1"], x)
    x = _convf(p["conv2"], x)
    hx = _self_attention(p["Hattn"], x, "h")
    wx = _self_attention(p["Wattn"], x, "w")
    return _convf(p["conv3"], hx + wx, dilation=receptive)


def _paa_e(p, x):
    x0 = _convf(p["branch0"], x)
    x1 = _paa_kernel(p["branch1"], x, 3)
    x2 = _paa_kernel(p["branch2"], x, 5)
    x3 = _paa_kernel(p["branch3"], x, 7)
    cat = _convf(p["conv_cat"], jnp.concatenate([x0, x1, x2, x3], axis=1))
    return jax.nn.relu(cat + _convf(p["conv_res"], x))


def _paa_d(p, fs):
    """fs = [f3, f4, f5]; upsample f4/f5 to f3, concat reversed."""
    size = fs[0].shape[-2:]
    ups = [fs[0]] + [_resize_nchw(f, size, align_corners=True)
                     for f in fs[1:]]
    fx = jnp.concatenate(ups[::-1], axis=1)
    fx = _convf(p["conv1"], fx)
    fx = _convf(p["conv2"], _self_attention(p["Hattn"], fx, "h") +
                _self_attention(p["Wattn"], fx, "w"))
    fx = _convf(p["conv3"], fx)
    fx = _convf(p["conv4"], fx)
    out = _convf(p["conv5"], fx)
    return fx, out


def _sica(p, x, smap, lmap=None):
    b, c, h, w = x.shape
    depth = p["conv_out1"]["w"].shape[1]
    smap = jax.nn.sigmoid(_resize_nchw(smap, (h, w)))
    pr = smap - p["threshold"].astype(x.dtype)
    probs = [jnp.clip(pr, 0, 1), jnp.clip(-pr, 0, 1),
             p["threshold"].astype(x.dtype) - jnp.abs(pr)]
    if lmap is not None:
        lmap = jax.nn.sigmoid(_resize_nchw(lmap, (h, w)))
        lp = lmap - p["lthreshold"].astype(x.dtype)
        probs += [jnp.clip(lp, 0, 1), jnp.clip(-lp, 0, 1)]
    prob = jnp.concatenate(probs, axis=1)                # [B,ctx,H,W]
    ctx = prob.shape[1]

    # the reference raw-views the NCHW feature as (B, HW, C) WITHOUT a
    # transpose (modules/attention_module.py:80 x.view(b, shape_mul, -1)
    # on a contiguous NCHW tensor) — a memory reinterpretation the
    # published checkpoints were trained with; reproduce it verbatim
    f = x.reshape(b, h * w, c)                           # raw reinterpret
    pr_ = prob.reshape(b, ctx, h * w)
    context = jnp.einsum("bcn,bnd->bcd", pr_, f)         # [B,ctx,C]
    context = context.transpose(0, 2, 1)[..., None]      # [B,C,ctx,1]

    def seq(pp, t):
        t = jax.nn.relu(_convf(pp[0], t))
        return jax.nn.relu(_convf(pp[1], t))

    query = seq(p["conv_query"], x).reshape(b, depth, h * w)
    query = query.transpose(0, 2, 1)                     # [B,HW,d]
    key = seq(p["conv_key"], context).reshape(b, depth, ctx)
    value = seq(p["conv_value"], context).reshape(b, depth, ctx)
    value = value.transpose(0, 2, 1)                     # [B,ctx,d]
    sim = jax.nn.softmax(
        jnp.einsum("bnd,bdc->bnc", query, key) * depth ** -0.5, -1)
    refined = jnp.einsum("bnc,bcd->bnd", sim, value)
    refined = refined.transpose(0, 2, 1).reshape(b, depth, h, w)
    refined = jax.nn.relu(_convf(p["conv_out1"], refined))
    x = jnp.concatenate([x, refined], axis=1)
    x = jax.nn.relu(_convf(p["conv_out2"], x))
    x = jax.nn.relu(_convf(p["conv_out3"], x))
    return x, _convf(p["conv_out4"], x)


def _gauss_kernel(ksize=7, sigma=1.0):
    k = cv2.getGaussianKernel(ksize, sigma)
    return np.outer(k, k).astype(np.float32)


def _pyr_expand(x, kernel):
    b, c, h, w = x.shape
    up = jnp.zeros((b, c, 2 * h, 2 * w), x.dtype).at[:, :, ::2, ::2].set(x)
    pad = kernel.shape[0] // 2
    up = jnp.pad(up, [(0, 0), (0, 0), (pad, pad), (pad, pad)],
                 mode="reflect")
    kw = jnp.asarray(kernel * 4.0, x.dtype)[None, None]
    kw = jnp.tile(kw, (c, 1, 1, 1))
    return lax.conv_general_dilated(
        up, kw, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c, preferred_element_type=x.dtype)


def _pyr_reconstruct(x, lap, kernel):
    ex = _pyr_expand(x, kernel)
    if lap.shape != ex.shape:
        lap = _resize_nchw(lap, ex.shape[-2:], align_corners=True)
    return ex + lap


# ----------------------------------------------------------------- model


_IN_CH = {  # per swin level, embed 128
    128: (128, 128, 256, 512, 1024),
    16: (16, 16, 32, 64, 128),
}


def init(key, swin_cfg: SwinBConfig = SWIN_B, depth: int = 64,
         dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 512))
    e = swin_cfg.embed_dim
    in_ch = (e, e, 2 * e, 4 * e, 8 * e)

    def conv(ci, co, k, kh=None, kw=None):
        return _convf_init(next(ks), ci, co, k, dtype, kh, kw)

    def attn_p(c):
        return {"query": conv(c, max(c // 8, 1), 1),
                "key": conv(c, max(c // 8, 1), 1),
                "value": conv(c, c, 1),
                "gamma": jnp.zeros((1,), dtype)}

    def paa_kernel_p(ci, co, r):
        return {"conv0": conv(ci, co, 1),
                "conv1": conv(co, co, 1, kh=1, kw=r),
                "conv2": conv(co, co, 1, kh=r, kw=1),
                "conv3": conv(co, co, 3),
                "Hattn": attn_p(co), "Wattn": attn_p(co)}

    def paa_e_p(ci, co):
        return {"branch0": conv(ci, co, 1),
                "branch1": paa_kernel_p(ci, co, 3),
                "branch2": paa_kernel_p(ci, co, 5),
                "branch3": paa_kernel_p(ci, co, 7),
                "conv_cat": conv(4 * co, co, 3),
                "conv_res": conv(ci, co, 1)}

    def sica_p(ci, lmap_in):
        p = {"conv_query": [conv(ci, depth, 3), conv(depth, depth, 3)],
             "conv_key": [conv(ci, depth, 1), conv(depth, depth, 1)],
             "conv_value": [conv(ci, depth, 1), conv(depth, depth, 1)],
             "conv_out1": conv(depth, depth, 3),
             "conv_out2": conv(ci + depth, depth, 3),
             "conv_out3": conv(depth, depth, 3),
             "conv_out4": conv(depth, 1, 1),
             "threshold": jnp.asarray([0.5], dtype)}
        if lmap_in:
            p["lthreshold"] = jnp.asarray([0.5], dtype)
        return p

    return {
        "backbone": swin_init(next(ks), swin_cfg, dtype),
        "contexts": [paa_e_p(ci, depth) for ci in in_ch],
        "decoder": {"conv1": conv(depth * 3, depth, 3),
                    "conv2": conv(depth, depth, 3),
                    "conv3": conv(depth, depth, 3),
                    "conv4": conv(depth, depth, 3),
                    "conv5": conv(depth, 1, 3),
                    "Hattn": attn_p(depth), "Wattn": attn_p(depth)},
        "attention0": sica_p(depth, True),
        "attention1": sica_p(depth * 2, True),
        "attention2": sica_p(depth * 2, False),
    }


IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def apply(params: Params, images: jax.Array,
          swin_cfg: SwinBConfig = SWIN_B,
          return_logits: bool = False) -> jax.Array:
    """images [B,H,W,3] 0..1 -> saliency [B,H,W,1] 0..1 (the reference's
    forward_inference with threshold=None, min/max normalised)."""
    b, h, w, _ = images.shape
    x = (images - jnp.asarray(IMAGE_MEAN, images.dtype)) / \
        jnp.asarray(IMAGE_STD, images.dtype)
    feats = swin_apply(params["backbone"], swin_cfg, x)
    # NHWC -> NCHW for the reference-faithful decoder
    f = [jnp.transpose(t, (0, 3, 1, 2)) for t in feats]
    x1, x2, x3, x4, x5 = [
        _paa_e(cp, t) for cp, t in zip(params["contexts"], f)]

    f3, d3 = _paa_d(params["decoder"], [x3, x4, x5])

    kernel = _gauss_kernel()
    f3 = _resize_nchw(f3, (h // 4, w // 4))
    f2, p2 = _sica(params["attention2"],
                   jnp.concatenate([x2, f3], axis=1), d3)
    d2 = _pyr_reconstruct(d3, p2, kernel)

    x1r = _resize_nchw(x1, (h // 2, w // 2))
    f2 = _resize_nchw(f2, (h // 2, w // 2))
    f1, p1 = _sica(params["attention1"],
                   jnp.concatenate([x1r, f2], axis=1), d2, p2)
    d1 = _pyr_reconstruct(d2, p1, kernel)

    f1 = _resize_nchw(f1, (h, w))
    _, p0 = _sica(params["attention0"], f1, d1, p1)
    d0 = _pyr_reconstruct(d1, p0, kernel)
    d0 = _resize_nchw(d0, (h, w))

    if return_logits:
        return jnp.transpose(d0, (0, 2, 3, 1))
    pred = jax.nn.sigmoid(d0)
    lo = pred.min(axis=(1, 2, 3), keepdims=True)
    hi = pred.max(axis=(1, 2, 3), keepdims=True)
    pred = (pred - lo) / (hi - lo + 1e-8)
    return jnp.transpose(pred, (0, 2, 3, 1))


# ----------------------------------------------------------------- loader


def _fold_bn_oihw(w, b, state, pre, eps=1e-5):
    if f"{pre}.weight" not in state:
        return w, b
    g = np.asarray(state[f"{pre}.weight"])
    bt = np.asarray(state[f"{pre}.bias"])
    rm = np.asarray(state[f"{pre}.running_mean"])
    rv = np.asarray(state[f"{pre}.running_var"])
    s = g / np.sqrt(rv + eps)
    return w * s[:, None, None, None], (b - rm) * s + bt


def load_inspyrenet(state: dict, dtype=None):
    """Published InSPyReNet-SwinB checkpoint -> (params, SwinBConfig).
    Key names per the vendored reference modules: backbone.* (SwinB),
    context{1..5}.*, decoder.*, attention{0,1,2}.* with every Conv2d
    wrapper as .conv + .bn (folded here)."""
    from .load import _t_conv, _t_linear

    def j(a):
        return jnp.asarray(a, dtype) if dtype else jnp.asarray(a)

    def lin(pre, bias=True):
        p = {"w": j(_t_linear(np.asarray(state[f"{pre}.weight"])))}
        if bias and f"{pre}.bias" in state:
            p["b"] = j(np.asarray(state[f"{pre}.bias"]))
        return p

    def norm(pre):
        return {"scale": j(np.asarray(state[f"{pre}.weight"])),
                "bias": j(np.asarray(state[f"{pre}.bias"]))}

    def convf(pre):
        w = np.asarray(state[f"{pre}.conv.weight"], np.float32)
        b = np.asarray(state.get(f"{pre}.conv.bias",
                                 np.zeros(w.shape[0], np.float32)))
        w, b = _fold_bn_oihw(w, b, state, f"{pre}.bn")
        return {"w": j(w), "b": j(b)}

    def attn_p(pre):
        return {"query": convf(f"{pre}.query_conv"),
                "key": convf(f"{pre}.key_conv"),
                "value": convf(f"{pre}.value_conv"),
                "gamma": j(np.asarray(state[f"{pre}.gamma"]))}

    def paa_kernel_p(pre):
        return {"conv0": convf(f"{pre}.conv0"),
                "conv1": convf(f"{pre}.conv1"),
                "conv2": convf(f"{pre}.conv2"),
                "conv3": convf(f"{pre}.conv3"),
                "Hattn": attn_p(f"{pre}.Hattn"),
                "Wattn": attn_p(f"{pre}.Wattn")}

    def paa_e_p(pre):
        return {"branch0": convf(f"{pre}.branch0"),
                "branch1": paa_kernel_p(f"{pre}.branch1"),
                "branch2": paa_kernel_p(f"{pre}.branch2"),
                "branch3": paa_kernel_p(f"{pre}.branch3"),
                "conv_cat": convf(f"{pre}.conv_cat"),
                "conv_res": convf(f"{pre}.conv_res")}

    def sica_p(pre, lmap_in):
        p = {"conv_query": [convf(f"{pre}.conv_query.0"),
                            convf(f"{pre}.conv_query.1")],
             "conv_key": [convf(f"{pre}.conv_key.0"),
                          convf(f"{pre}.conv_key.1")],
             "conv_value": [convf(f"{pre}.conv_value.0"),
                            convf(f"{pre}.conv_value.1")],
             "conv_out1": convf(f"{pre}.conv_out1"),
             "conv_out2": convf(f"{pre}.conv_out2"),
             "conv_out3": convf(f"{pre}.conv_out3"),
             "conv_out4": convf(f"{pre}.conv_out4"),
             "threshold": j(np.asarray(state[f"{pre}.threshold"]))}
        if lmap_in:
            p["lthreshold"] = j(np.asarray(state[f"{pre}.lthreshold"]))
        return p

    # swin dims from the checkpoint
    embed = int(np.asarray(
        state["backbone.patch_embed.proj.weight"]).shape[0])
    depths = []
    i = 0
    while f"backbone.layers.{i}.blocks.0.norm1.weight" in state:
        jd = 0
        while f"backbone.layers.{i}.blocks.{jd}.norm1.weight" in state:
            jd += 1
        depths.append(jd)
        i += 1
    table = np.asarray(
        state["backbone.layers.0.blocks.0.attn."
              "relative_position_bias_table"])
    window = (int(round(table.shape[0] ** 0.5)) + 1) // 2
    heads = tuple(int(np.asarray(state[
        f"backbone.layers.{i}.blocks.0.attn."
        f"relative_position_bias_table"]).shape[1])
        for i in range(len(depths)))
    cfg = SwinBConfig(embed_dim=embed, depths=tuple(depths),
                      heads=heads, window=window)

    bk: Params = {
        "patch_conv": {
            "w": j(_t_conv(np.asarray(
                state["backbone.patch_embed.proj.weight"]))),
            "b": j(np.asarray(state["backbone.patch_embed.proj.bias"]))},
        "patch_norm": norm("backbone.patch_embed.norm"),
        "stages": [],
        "out_norms": [norm(f"backbone.norm{i}")
                      for i in range(len(depths))],
    }
    for si, d in enumerate(depths):
        stage: Params = {"blocks": []}
        for bi in range(d):
            pre = f"backbone.layers.{si}.blocks.{bi}"
            stage["blocks"].append({
                "norm1": norm(f"{pre}.norm1"),
                "qkv": lin(f"{pre}.attn.qkv"),
                "proj": lin(f"{pre}.attn.proj"),
                "rel_bias": j(np.asarray(
                    state[f"{pre}.attn.relative_position_bias_table"])),
                "norm2": norm(f"{pre}.norm2"),
                "fc1": lin(f"{pre}.mlp.fc1"),
                "fc2": lin(f"{pre}.mlp.fc2"),
            })
        if f"backbone.layers.{si}.downsample.reduction.weight" in state:
            stage["merge"] = {
                "norm": norm(f"backbone.layers.{si}.downsample.norm"),
                "reduction": lin(
                    f"backbone.layers.{si}.downsample.reduction",
                    bias=False)}
        bk["stages"].append(stage)

    params = {
        "backbone": bk,
        "contexts": [paa_e_p(f"context{i}") for i in range(1, 6)],
        "decoder": {
            "conv1": convf("decoder.conv1"),
            "conv2": convf("decoder.conv2"),
            "conv3": convf("decoder.conv3"),
            "conv4": convf("decoder.conv4"),
            "conv5": convf("decoder.conv5"),
            "Hattn": attn_p("decoder.Hattn"),
            "Wattn": attn_p("decoder.Wattn")},
        "attention0": sica_p("attention0", True),
        "attention1": sica_p("attention1", True),
        "attention2": sica_p("attention2", False),
    }
    return params, cfg
