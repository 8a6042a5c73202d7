"""SwinIR super-resolution in JAX (reference serves it via BasicSR,
gyre/pipeline/upscalers/models/ SwinIR ~872 LoC torch).

Standard SwinIR-M topology: shallow conv embed -> residual Swin transformer
blocks (window attention with relative position bias, alternating shifted
windows) -> conv reconstruction -> pixel-shuffle upsampling. NHWC; windows
fold into the batch axis so attention runs as one big MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


def _window_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(wins, w, h, ww):
    b = wins.shape[0] // ((h // w) * (ww // w))
    x = wins.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _block_init(key, dim, heads, window, mlp_ratio, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": L.norm_init(dim, dtype),
        "qkv": L.linear_init(ks[0], dim, dim * 3, dtype),
        "proj": L.linear_init(ks[1], dim, dim, dtype),
        "rpb": jax.random.normal(
            ks[2], ((2 * window - 1) ** 2, heads), dtype) * 0.02,
        "ln2": L.norm_init(dim, dtype),
        "fc1": L.linear_init(ks[3], dim, dim * mlp_ratio, dtype),
        "fc2": L.linear_init(ks[4], dim * mlp_ratio, dim, dtype),
    }


def _swin_block(p, x, heads, window, shift, rel_idx):
    b, h, w, c = x.shape
    res = x
    xn = L.layer_norm(p["ln1"], x)
    if shift:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(xn, window)           # [nW, w*w, C]
    n, t, _ = wins.shape
    qkv = L.linear(p["qkv"], wins).reshape(n, t, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    attn = jnp.einsum("nthd,nshd->nhts", q, k,
                      preferred_element_type=jnp.float32) * scale
    bias = p["rpb"][rel_idx.reshape(-1)].reshape(t, t, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    # shifted windows: mask cross-boundary attention
    if shift:
        img_mask = np.zeros((1, h, w, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                img_mask[:, hs, ws] = cnt
                cnt += 1
        mw = _window_partition(jnp.asarray(img_mask), window)[..., 0]
        amask = (mw[:, None, :] != mw[:, :, None])
        attn = jnp.where(amask[:, None].astype(bool), -1e9, attn)
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, v).reshape(n, t, c)
    out = L.linear(p["proj"], out)
    out = _window_reverse(out, window, h, w)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = res + out
    h2 = L.layer_norm(p["ln2"], x)
    return x + L.linear(p["fc2"], jax.nn.gelu(L.linear(p["fc1"], h2)))


def init(key, *, embed_dim: int = 60, depths=(6, 6, 6, 6), heads: int = 6,
         window: int = 8, mlp_ratio: int = 2, scale: int = 4,
         dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, sum(depths) + len(depths) + 8))
    p: Params = {
        "conv_first": L.conv_init(next(ks), 3, 3, 3, embed_dim, dtype),
        "groups": [],
        "norm": L.norm_init(embed_dim, dtype),
        "conv_body": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim,
                                 dtype),
        "conv_up1": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim,
                                dtype),
        "conv_up2": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim,
                                dtype),
        "conv_hr": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim, dtype),
        "conv_last": L.conv_init(next(ks), 3, 3, embed_dim, 3, dtype),
    }
    for depth in depths:
        p["groups"].append({
            "blocks": [_block_init(next(ks), embed_dim, heads, window,
                                   mlp_ratio, dtype) for _ in range(depth)],
            "conv": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim,
                                dtype),
        })
    return p


def apply(params: Params, x: jax.Array, *, heads: int = 6, window: int = 8,
          scale: int = 4) -> jax.Array:
    """x [B,H,W,3] in [0,1], H/W multiples of window -> [B,sH,sW,3]."""
    rel_idx = jnp.asarray(_rel_pos_index(window))
    feat = L.conv2d(params["conv_first"], x)
    body = feat
    for group in params["groups"]:
        g_in = body
        for i, blk in enumerate(group["blocks"]):
            body = _swin_block(blk, body, heads, window,
                               (window // 2) if i % 2 else 0, rel_idx)
        body = L.conv2d(group["conv"], body) + g_in
    body = L.layer_norm(params["norm"], body)
    feat = feat + L.conv2d(params["conv_body"], body)
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    if scale >= 2:
        feat = lrelu(L.conv2d(params["conv_up1"],
                              L.upsample_nearest_2x(feat)))
    if scale >= 4:
        feat = lrelu(L.conv2d(params["conv_up2"],
                              L.upsample_nearest_2x(feat)))
    out = L.conv2d(params["conv_last"],
                   lrelu(L.conv2d(params["conv_hr"], feat)))
    return jnp.clip(out + jax.image.resize(x, out.shape, "bilinear"),
                    0.0, 1.0)
