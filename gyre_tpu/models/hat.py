"""HAT (Hybrid Attention Transformer) super-resolution.

The reference serves HAT via BasicSR (gyre/pipeline/upscalers/models/,
~989 LoC torch). Faithful compact topology built on the SwinIR machinery:

  * HAB: Swin window attention + a parallel Channel Attention Block
    (conv -> squeeze-excite) weighted by alpha;
  * OCAB at each group end: window queries attend over larger OVERLAPPING
    key/value windows (the "cross" part);
  * same shallow-conv embed + residual groups + upsampler as SwinIR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .swinir import (_block_init, _rel_pos_index, _swin_block,
                     _window_partition, _window_reverse)

Params = dict


def _cab_init(key, dim, squeeze: int = 4, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "conv1": L.conv_init(ks[0], 3, 3, dim, dim // squeeze, dtype),
        "conv2": L.conv_init(ks[1], 3, 3, dim // squeeze, dim, dtype),
        "se1": L.linear_init(ks[2], dim, dim // squeeze, dtype),
        "se2": L.linear_init(ks[3], dim // squeeze, dim, dtype),
    }


def _cab(p, x):
    h = jax.nn.gelu(L.conv2d(p["conv1"], x))
    h = L.conv2d(p["conv2"], h)
    # squeeze-excite channel attention
    s = jnp.mean(h, axis=(1, 2))
    s = jax.nn.sigmoid(L.linear(p["se2"], jax.nn.relu(L.linear(p["se1"],
                                                               s))))
    return h * s[:, None, None, :]


def _ocab_init(key, dim, heads, window, overlap, dtype):
    ks = jax.random.split(key, 4)
    win_kv = window + 2 * overlap
    return {
        "ln": L.norm_init(dim, dtype),
        "q": L.linear_init(ks[0], dim, dim, dtype),
        "kv": L.linear_init(ks[1], dim, dim * 2, dtype),
        "proj": L.linear_init(ks[2], dim, dim, dtype),
        "rpb": jax.random.normal(
            ks[3], ((window + win_kv - 1) ** 2, heads), dtype) * 0.02,
    }


def _ocab(p, x, heads, window, overlap):
    """Overlapping cross-attention: queries from w-windows, keys/values
    from (w+2*ov)-windows around them."""
    b, h, w, c = x.shape
    res = x
    xn = L.layer_norm(p["ln"], x)
    q = L.linear(p["q"], xn)
    kv = L.linear(p["kv"], xn)
    kv_pad = jnp.pad(kv, [(0, 0), (overlap, overlap), (overlap, overlap),
                          (0, 0)], mode="reflect")
    qw = _window_partition(q, window)                  # [nW, w*w, C]
    # overlapping kv windows: gather (w+2ov)^2 patches strided by w
    wk = window + 2 * overlap
    nh, nw = h // window, w // window
    kv_wins = []
    for dy in range(nh):
        for dx in range(nw):
            kv_wins.append(jax.lax.dynamic_slice(
                kv_pad, (0, dy * window, dx * window, 0),
                (b, wk, wk, 2 * c)))
    kvw = jnp.stack(kv_wins, axis=1).reshape(b * nh * nw, wk * wk, 2 * c)
    kw_, vw = jnp.split(kvw, 2, axis=-1)
    n, tq, _ = qw.shape
    hd = c // heads
    qh = qw.reshape(n, tq, heads, hd)
    kh = kw_.reshape(n, wk * wk, heads, hd)
    vh = vw.reshape(n, wk * wk, heads, hd)
    attn = jnp.einsum("nthd,nshd->nhts", qh, kh,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, vh).reshape(n, tq, c)
    out = L.linear(p["proj"], out)
    out = _window_reverse(out, window, h, w)
    return res + out


def init(key, *, embed_dim: int = 48, depths=(4, 4), heads: int = 4,
         window: int = 8, overlap: int = 2, alpha: float = 0.01,
         scale: int = 4, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, sum(depths) * 2 + len(depths) * 2 + 8))
    p: Params = {
        "alpha": alpha,
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
        group = {"blocks": [], "cabs": [],
                 "ocab": _ocab_init(next(ks), embed_dim, heads, window,
                                    overlap, dtype),
                 "conv": L.conv_init(next(ks), 3, 3, embed_dim, embed_dim,
                                     dtype)}
        for _ in range(depth):
            group["blocks"].append(_block_init(next(ks), embed_dim, heads,
                                               window, 2, dtype))
            group["cabs"].append(_cab_init(next(ks), embed_dim,
                                           dtype=dtype))
        p["groups"].append(group)
    return p


def apply(params: Params, x: jax.Array, *, heads: int = 4, window: int = 8,
          overlap: int = 2, scale: int = 4) -> jax.Array:
    """x [B,H,W,3] 0..1 (H,W multiples of window) -> [B,sH,sW,3]."""
    rel_idx = jnp.asarray(_rel_pos_index(window))
    alpha = params["alpha"]
    feat = L.conv2d(params["conv_first"], x)
    body = feat
    for group in params["groups"]:
        g_in = body
        for i, (blk, cab) in enumerate(zip(group["blocks"],
                                           group["cabs"])):
            attn_out = _swin_block(blk, body, heads, window,
                                   (window // 2) if i % 2 else 0, rel_idx)
            body = attn_out + alpha * _cab(cab, body)
        body = _ocab(group["ocab"], body, heads, window, overlap)
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
