"""CLIP / OpenCLIP text encoders as pure JAX functions.

Covers the reference's text towers (ViT-L for SD1.x, OpenCLIP-H penultimate
for SD2.x, ViT-L + OpenCLIP-bigG with pooled projection for SDXL; layer
selection mirrors reference
gyre/pipeline/text_embedding/text_encoder_alt_layer.py:6-30).

`apply` returns all hidden states so the prompt machinery can pick any
clip_layer (including per-fragment clip skip) without re-running the tower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .configs import CLIPTextConfig

Params = dict


def _block_init(key, cfg: CLIPTextConfig, dtype):
    ks = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "ln1": L.norm_init(d, dtype),
        "attn": {
            "q": L.linear_init(ks[0], d, d, dtype),
            "k": L.linear_init(ks[1], d, d, dtype),
            "v": L.linear_init(ks[2], d, d, dtype),
            "out": L.linear_init(ks[3], d, d, dtype),
        },
        "ln2": L.norm_init(d, dtype),
        "fc1": L.linear_init(ks[4], d, cfg.intermediate_size, dtype),
        "fc2": L.linear_init(ks[5], cfg.intermediate_size, d, dtype),
    }


def init(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.num_layers + 3)
    p: Params = {
        "token_embedding": jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            ks[1], (cfg.max_position_embeddings, cfg.hidden_size), dtype) * 0.01,
        "blocks": [_block_init(ks[2 + i], cfg, dtype)
                   for i in range(cfg.num_layers)],
        "final_ln": L.norm_init(cfg.hidden_size, dtype),
    }
    if cfg.projection_dim:
        p["text_projection"] = L.linear_init(
            ks[-1], cfg.hidden_size, cfg.projection_dim, dtype, bias=False)
    return p


def _block(p, x, heads, act):
    b, t, d = x.shape
    hd = d // heads
    h = L.layer_norm(p["ln1"], x)
    q = L.linear(p["attn"]["q"], h).reshape(b, t, heads, hd)
    k = L.linear(p["attn"]["k"], h).reshape(b, t, heads, hd)
    v = L.linear(p["attn"]["v"], h).reshape(b, t, heads, hd)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    o = L.attention(q, k, v, mask=causal).reshape(b, t, d)
    x = x + L.linear(p["attn"]["out"], o)
    h = L.layer_norm(p["ln2"], x)
    h = L.linear(p["fc2"], act(L.linear(p["fc1"], h)))
    return x + h


def apply(params: Params, cfg: CLIPTextConfig, input_ids: jax.Array):
    """input_ids [B, T<=77] -> dict with:
      hidden_states: list of [B,T,D] per layer (post-block, pre-final-LN)
      last: final-LN output [B,T,D]
      pooled: EOS-token pooled embedding (projected if cfg.projection_dim)
    """
    act = L.quick_gelu if cfg.activation == "quick_gelu" else L.gelu
    t = input_ids.shape[-1]
    x = params["token_embedding"][input_ids] + \
        params["position_embedding"][:t][None]
    hidden = []
    for blk in params["blocks"]:
        x = _block(blk, x, cfg.num_heads, act)
        hidden.append(x)
    last = L.layer_norm(params["final_ln"], x)

    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = L.linear(params["text_projection"], pooled)
    return {"hidden_states": hidden, "last": last, "pooled": pooled}


# ------------------------------------------------------------ vision tower


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    activation: str = "quick_gelu"


CLIP_VISION_L = CLIPVisionConfig()
CLIP_VISION_TEST = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=32)

# CLIP preprocessing constants
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def vision_init(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    tcfg = CLIPTextConfig(hidden_size=cfg.hidden_size,
                          num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                          intermediate_size=cfg.intermediate_size,
                          activation=cfg.activation)
    ks = jax.random.split(key, cfg.num_layers + 4)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "patch_embed": {"w": jax.random.normal(
            ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
            dtype) * 0.02},
        "class_embed": jax.random.normal(ks[1], (cfg.hidden_size,),
                                         dtype) * 0.02,
        "position_embedding": jax.random.normal(
            ks[2], (n_patches + 1, cfg.hidden_size), dtype) * 0.01,
        "pre_ln": L.norm_init(cfg.hidden_size, dtype),
        "blocks": [_block_init(ks[3 + i], tcfg, dtype)
                   for i in range(cfg.num_layers)],
        "post_ln": L.norm_init(cfg.hidden_size, dtype),
        "visual_projection": L.linear_init(
            ks[-1], cfg.hidden_size, cfg.projection_dim, dtype, bias=False),
    }


def _vision_block(p, x, heads, act):
    """Non-causal transformer block (same params layout as text blocks)."""
    b, t, d = x.shape
    hd = d // heads
    h = L.layer_norm(p["ln1"], x)
    q = L.linear(p["attn"]["q"], h).reshape(b, t, heads, hd)
    k = L.linear(p["attn"]["k"], h).reshape(b, t, heads, hd)
    v = L.linear(p["attn"]["v"], h).reshape(b, t, heads, hd)
    o = L.attention(q, k, v).reshape(b, t, d)
    x = x + L.linear(p["attn"]["out"], o)
    h = L.layer_norm(p["ln2"], x)
    h = L.linear(p["fc2"], act(L.linear(p["fc1"], h)))
    return x + h


def preprocess_image(images: jax.Array) -> jax.Array:
    """[B,H,W,3] in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(IMAGE_MEAN, images.dtype)
    std = jnp.asarray(IMAGE_STD, images.dtype)
    return (images - mean) / std


def vision_apply(params: Params, cfg: CLIPVisionConfig, images: jax.Array,
                 normalize: bool = True):
    """images [B, S, S, 3], CLIP-preprocessed -> dict with
    image_embeds [B, proj], pooled [B, D], tokens [B, N+1, D]."""
    act = L.quick_gelu if cfg.activation == "quick_gelu" else L.gelu
    b = images.shape[0]
    h = L.conv2d(params["patch_embed"], images, stride=cfg.patch_size,
                 padding="VALID")
    h = h.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embed"].astype(h.dtype),
                           (b, 1, cfg.hidden_size))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embedding"][None, :h.shape[1]].astype(h.dtype)
    h = L.layer_norm(params["pre_ln"], h)
    for blk in params["blocks"]:
        h = _vision_block(blk, h, cfg.num_heads, act)
    pooled = L.layer_norm(params["post_ln"], h[:, 0])
    embeds = L.linear(params["visual_projection"], pooled)
    if normalize:
        embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    return {"image_embeds": embeds, "pooled": pooled, "tokens": h}


def hidden_for_layer(params, cfg, out: dict, clip_layer: int) -> jax.Array:
    """clip_layer: -1 = final LN output; -n = nth-from-last block output with
    final layer norm applied (the SD2/penultimate convention used by
    transformers' hidden_states[-2] + final_layer_norm)."""
    if clip_layer == -1:
        return out["last"]
    if not -cfg.num_layers <= clip_layer < 0:
        raise ValueError(
            f"clip_layer {clip_layer} out of range for a {cfg.num_layers}-"
            f"layer tower (expected -1..-{cfg.num_layers})")
    h = out["hidden_states"][clip_layer + cfg.num_layers]
    if clip_layer < -1:
        h = h  # raw block output; SD2 applies final LN after selecting
        h = L.layer_norm(params["final_ln"], h)
    return h
