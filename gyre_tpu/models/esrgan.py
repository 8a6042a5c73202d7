"""ESRGAN / Real-ESRGAN (RRDBNet) super-resolution in JAX.

The reference serves BasicSR-family upscalers (esrgan/esrgan-plus/swinir/
hat, gyre/pipeline/upscalers/upscaler_loader.py:20-100). RRDBNet is the
workhorse; this is an original NHWC implementation, weight-loadable from
BasicSR checkpoints (key mapping at the bottom).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _rdb_init(key, nf: int, gc: int, dtype):
    ks = jax.random.split(key, 5)
    return {
        f"conv{i + 1}": L.conv_init(ks[i], 3, 3, nf + i * gc,
                                    gc if i < 4 else nf, dtype)
        for i in range(5)
    }


def _rdb(p, x):
    x1 = _lrelu(L.conv2d(p["conv1"], x))
    x2 = _lrelu(L.conv2d(p["conv2"], jnp.concatenate([x, x1], -1)))
    x3 = _lrelu(L.conv2d(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
    x4 = _lrelu(L.conv2d(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
    x5 = L.conv2d(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
    return x + x5 * 0.2


def _rrdb_init(key, nf, gc, dtype):
    ks = jax.random.split(key, 3)
    return {"rdb1": _rdb_init(ks[0], nf, gc, dtype),
            "rdb2": _rdb_init(ks[1], nf, gc, dtype),
            "rdb3": _rdb_init(ks[2], nf, gc, dtype)}


def _rrdb(p, x):
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return x + out * 0.2


def init(key, *, num_blocks: int = 23, nf: int = 64, gc: int = 32,
         scale: int = 4, in_ch: int = 3, out_ch: int = 3,
         dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, num_blocks + 6)
    return {
        "conv_first": L.conv_init(ks[0], 3, 3, in_ch, nf, dtype),
        "body": [_rrdb_init(ks[1 + i], nf, gc, dtype)
                 for i in range(num_blocks)],
        "conv_body": L.conv_init(ks[-5], 3, 3, nf, nf, dtype),
        "conv_up1": L.conv_init(ks[-4], 3, 3, nf, nf, dtype),
        "conv_up2": L.conv_init(ks[-3], 3, 3, nf, nf, dtype),
        "conv_hr": L.conv_init(ks[-2], 3, 3, nf, nf, dtype),
        "conv_last": L.conv_init(ks[-1], 3, 3, nf, out_ch, dtype),
    }


def apply(params: Params, x: jax.Array, scale: int = 4) -> jax.Array:
    """x [B,H,W,3] in [0,1] -> [B, scale*H, scale*W, 3]. scale is static."""
    feat = L.conv2d(params["conv_first"], x)
    body = feat
    for blk in params["body"]:
        body = _rrdb(blk, body)
    feat = feat + L.conv2d(params["conv_body"], body)
    if scale >= 2:
        feat = _lrelu(L.conv2d(params["conv_up1"],
                               L.upsample_nearest_2x(feat)))
    if scale >= 4:
        feat = _lrelu(L.conv2d(params["conv_up2"],
                               L.upsample_nearest_2x(feat)))
    out = L.conv2d(params["conv_last"],
                   _lrelu(L.conv2d(params["conv_hr"], feat)))
    return jnp.clip(out, 0.0, 1.0)


# -------------------------------------------------- BasicSR weight loading


def load_params(state: dict, dtype=None) -> Params:
    """BasicSR RRDBNet state dict (either 'conv_first.weight' or the old
    'model.0.weight' naming) -> our tree."""
    from .load import _t_conv

    def conv(prefix):
        w = np.asarray(state[f"{prefix}.weight"])
        p = {"w": jnp.asarray(_t_conv(w), dtype) if dtype
             else jnp.asarray(_t_conv(w))}
        bk = f"{prefix}.bias"
        if bk in state:
            p["b"] = jnp.asarray(np.asarray(state[bk]),
                                 dtype) if dtype else \
                jnp.asarray(np.asarray(state[bk]))
        return p

    n_blocks = 0
    while f"body.{n_blocks}.rdb1.conv1.weight" in state:
        n_blocks += 1
    p: Params = {
        "conv_first": conv("conv_first"),
        "body": [],
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    for i in range(n_blocks):
        blk = {}
        for r in ("rdb1", "rdb2", "rdb3"):
            blk[r] = {f"conv{j}": conv(f"body.{i}.{r}.conv{j}")
                      for j in range(1, 6)}
        p["body"].append(blk)
    return p
