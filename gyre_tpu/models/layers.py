"""Functional neural-net primitives, TPU-first.

Design: every model in gyre_tpu is a pure function over an immutable params
pytree (nested dicts of jax arrays). There are no modules, no hooks, no
mutable state — LoRA/model-mixing/offload become functional transforms of the
params tree, and the whole denoise step jits into one XLA program.

Conventions:
  * Image tensors are NHWC (TPU-native conv layout; the reference's torch
    code is NCHW — conversion happens once at the IO boundary).
  * Linear weights are stored (in, out); conv kernels HWIO. Torch checkpoints
    are transposed at load time (models/load.py).
  * Compute dtype is bf16 by default; normalization statistics and softmax
    run in f32 for stability. Params may be stored bf16 or f32.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


# ---------------------------------------------------------------- init utils


def _split(key, n):
    return jax.random.split(key, n)


def linear_init(key, d_in, d_out, dtype=jnp.float32, bias=True) -> Params:
    wkey, _ = _split(key, 2)
    scale = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(wkey, (d_in, d_out), dtype, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def conv_init(key, h, w, c_in, c_out, dtype=jnp.float32, bias=True) -> Params:
    wkey, _ = _split(key, 2)
    fan_in = h * w * c_in
    scale = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(wkey, (h, w, c_in, c_out), dtype, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((c_out,), dtype)
    return p


def norm_init(c, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ------------------------------------------------------------------- applies


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding="SAME",
           feature_group_count: int = 1, dilation: int = 1) -> jax.Array:
    """NHWC conv. padding: 'SAME'|'VALID'|explicit list|'CIRCULAR' tuple."""
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_tiled(p: Params, x: jax.Array, stride: int = 1,
                 tiling_x: bool = False, tiling_y: bool = False) -> jax.Array:
    """3x3-style conv with optional circular (seamless-tiling) padding on
    either axis — the functional equivalent of the reference's circular-pad
    conv monkeypatch (gyre/pipeline/unified_pipeline.py:1671-1712)."""
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    if tiling_y and ph:
        x = jnp.concatenate([x[:, -ph:], x, x[:, :ph]], axis=1)
    if tiling_x and pw:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    pad = [
        (0, 0) if tiling_y else (ph, ph),
        (0, 0) if tiling_x else (pw, pw),
    ]
    return conv2d(p, x, stride=stride, padding=pad)


def group_norm(p: Params, x: jax.Array, groups: int = 32,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the channel (last) axis of NHWC or (..., C) tensors.
    Statistics in f32."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[0], -1, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    xf = xg.reshape(x.shape)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(p: Params, x: jax.Array) -> jax.Array:
    """GEGLU feed-forward gate used by SD transformer blocks."""
    h = linear(p, x)
    h, gate = jnp.split(h, 2, axis=-1)
    return h * gelu(gate)


# ---------------------------------------------------------------- attention


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array | None = None,
              scale: float | None = None) -> jax.Array:
    """Multi-head scaled-dot-product attention, [B, T, H, D] layout.

    Dispatches to the Pallas flash kernel for long self-attention on TPU
    (ops/attention.py) and the XLA einsum path otherwise; softmax in f32
    either way.
    """
    from ..ops import attention as attn_ops

    return attn_ops.attention(q, k, v, mask=mask, scale=scale)


# ------------------------------------------------------------ timestep embed


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       flip_sin_cos: bool = True, shift: float = 0.0,
                       scale: float = 1.0) -> jax.Array:
    """Sinusoidal embedding of (possibly fractional) timesteps.

    flip_sin_cos=True gives [cos, sin] ordering (diffusers UNet convention).
    Computed in f32 regardless of ambient dtype.
    """
    t = jnp.asarray(t, jnp.float32).reshape(-1)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / (half - shift if shift else half))
    args = t[:, None] * freqs[None, :] * scale
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


# ------------------------------------------------------------------ up/down


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") * 0.25


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d (affine=False) over NHWC: per-sample, per-channel
    spatial statistics in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def conv_transpose2d(p: Params, x: jax.Array, stride: int = 2,
                     padding: int = 1, output_padding: int = 1) -> jax.Array:
    """torch ConvTranspose2d equivalent: conv with lhs dilation = stride,
    spatially-flipped kernel, pad (k-1-p, k-1-p+op). Weight stored HWIO
    with I = torch in-channels (models/load maps [in,out,kh,kw] ->
    [kh,kw,in,out])."""
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x, w[::-1, ::-1],
        window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def reflect_pad2d(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                   mode="reflect")
