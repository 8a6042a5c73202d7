"""CodeFormer-style face restoration: VQ codebook + code-prediction
transformer with controllable fidelity (the reference ships CodeFormer
under nonfree/, ~413 LoC torch + facexlib detection).

Topology (faithful at reduced scale): conv encoder to a 16x-downsampled
token grid -> transformer predicts codebook indices from degraded features
-> nearest-codebook quantization -> conv decoder; encoder features blend
into the decoder scaled by fidelity w (w=0 max quality / w=1 max fidelity).
Face detection/alignment is out of scope here — the restorer runs on the
full frame or pre-cropped faces (the reference uses facexlib crops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


def _down_block(key, c_in, c_out, dtype):
    k1, k2 = jax.random.split(key)
    return {"conv1": L.conv_init(k1, 3, 3, c_in, c_out, dtype),
            "conv2": L.conv_init(k2, 3, 3, c_out, c_out, dtype),
            "norm": L.norm_init(c_out, dtype)}


def init(key, *, widths=(32, 64, 128, 256), embed_dim: int = 256,
         codebook_size: int = 512, n_layers: int = 4, heads: int = 4,
         dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {
        "stem": L.conv_init(next(ks), 3, 3, 3, widths[0], dtype),
        "enc": [], "dec": [],
        "codebook": jax.random.normal(next(ks),
                                      (codebook_size, embed_dim),
                                      dtype) * 0.05,
        "to_embed": L.conv_init(next(ks), 1, 1, widths[-1], embed_dim,
                                dtype),
        "from_embed": L.conv_init(next(ks), 1, 1, embed_dim, widths[-1],
                                  dtype),
        "blocks": [],
        "logits": L.linear_init(next(ks), embed_dim, codebook_size, dtype),
        "head": L.conv_init(next(ks), 3, 3, widths[0], 3, dtype),
    }
    c_prev = widths[0]
    skip_widths = [widths[0]]  # encoder inputs (stem out, then each level)
    for w in widths:
        p["enc"].append(_down_block(next(ks), c_prev, w, dtype))
        skip_widths.append(w)
        c_prev = w
    skip_widths.pop()  # last entry is the bottleneck, not a skip
    for w in reversed(skip_widths):
        p["dec"].append(_down_block(next(ks), c_prev + w, w, dtype))
        c_prev = w
    for _ in range(n_layers):
        k = next(ks)
        kk = jax.random.split(k, 6)
        p["blocks"].append({
            "ln1": L.norm_init(embed_dim, dtype),
            "attn": {"q": L.linear_init(kk[0], embed_dim, embed_dim, dtype),
                     "k": L.linear_init(kk[1], embed_dim, embed_dim, dtype),
                     "v": L.linear_init(kk[2], embed_dim, embed_dim, dtype),
                     "out": L.linear_init(kk[3], embed_dim, embed_dim,
                                          dtype)},
            "ln2": L.norm_init(embed_dim, dtype),
            "fc1": L.linear_init(kk[4], embed_dim, embed_dim * 4, dtype),
            "fc2": L.linear_init(kk[5], embed_dim * 4, embed_dim, dtype),
        })
    return p


def _down(p, x):
    h = jax.nn.silu(L.conv2d(p["conv1"], x, stride=2,
                             padding=[(1, 1), (1, 1)]))
    h = L.conv2d(p["conv2"], h)
    return jax.nn.silu(L.group_norm(p["norm"], h, 8))


def _up(p, x, skip):
    x = L.upsample_nearest_2x(x)
    x = jnp.concatenate([x, skip], axis=-1)
    h = jax.nn.silu(L.conv2d(p["conv1"], x, padding="SAME"))
    h = L.conv2d(p["conv2"], h)
    return jax.nn.silu(L.group_norm(p["norm"], h, 8))


def restore(params: Params, images: jax.Array, fidelity: float = 0.5,
            heads: int = 4) -> jax.Array:
    """images [B,H,W,3] 0..1 (H,W mult of 16) -> restored [B,H,W,3].

    fidelity in [0,1]: how strongly degraded-input features steer the
    decoder (the reference's w parameter)."""
    x = images * 2.0 - 1.0
    h = L.conv2d(params["stem"], x)
    skips = []
    for enc in params["enc"]:
        skips.append(h)
        h = _down(enc, h)

    # token grid -> transformer -> code prediction
    z = L.conv2d(params["to_embed"], h)
    b, th, tw, d = z.shape
    tokens = z.reshape(b, th * tw, d)
    t = tokens
    for blk in params["blocks"]:
        hh = L.layer_norm(blk["ln1"], t)
        q = L.linear(blk["attn"]["q"], hh).reshape(b, -1, heads, d // heads)
        k = L.linear(blk["attn"]["k"], hh).reshape(b, -1, heads, d // heads)
        v = L.linear(blk["attn"]["v"], hh).reshape(b, -1, heads, d // heads)
        o = L.attention(q, k, v).reshape(b, -1, d)
        t = t + L.linear(blk["attn"]["out"], o)
        hh = L.layer_norm(blk["ln2"], t)
        t = t + L.linear(blk["fc2"], jax.nn.gelu(L.linear(blk["fc1"], hh)))
    logits = L.linear(params["logits"], t)              # [B, N, K]
    codes = jnp.argmax(logits, axis=-1)
    quant = params["codebook"][codes]                   # [B, N, D]
    # fidelity: blend degraded features into the quantized codes
    quant = quant * (1.0 - fidelity) + tokens * fidelity
    h = L.conv2d(params["from_embed"], quant.reshape(b, th, tw, d))

    for dec, skip in zip(params["dec"], reversed(skips)):
        h = _up(dec, h, skip)
    out = L.conv2d(params["head"], h)
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)
