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


def hidden_for_layer(params, cfg, out: dict, clip_layer: int) -> jax.Array:
    """clip_layer: -1 = final LN output; -n = nth-from-last block output with
    final layer norm applied (the SD2/penultimate convention used by
    transformers' hidden_states[-2] + final_layer_norm)."""
    if clip_layer == -1:
        return out["last"]
    h = out["hidden_states"][clip_layer + cfg.num_layers]
    if clip_layer < -1:
        h = h  # raw block output; SD2 applies final LN after selecting
        h = L.layer_norm(params["final_ln"], h)
    return h
