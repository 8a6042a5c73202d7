"""Checkpoint loading: diffusers-layout safetensors -> gyre_tpu params.

The reference loads models through diffusers from_pretrained
(gyre/manager.py:1145-1252); here the mapping is explicit: torch state-dict
keys/layouts (Linear [out,in], Conv [out,in,kh,kw], NCHW) are converted to
this framework's functional trees (Linear (in,out), Conv HWIO, NHWC).

Every loader has an exact inverse (export_*) so `--save_safetensors`
(reference gyre/manager.py:1863-2035) round-trips, and tests verify
load(export(params)) == params without needing real checkpoints.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..pipeline import schedule as sched
from ..pipeline.tokenizer import load_tokenizer
from . import configs
from .configs import CLIPTextConfig, ModelSetConfig, UNetConfig, VAEConfig


def _t_linear(w):        # torch [out,in] -> (in,out)
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):          # torch [out,in,kh,kw] -> HWIO [kh,kw,in,out]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _inv_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _inv_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


class KeyMapper:
    """Bidirectional (torch key -> tree path) mapping accumulator."""

    def __init__(self, state: dict | None, dtype=None):
        self.state = state
        self.dtype = dtype
        self.out: dict[str, np.ndarray] = {}  # used in export direction

    def get(self, key, kind):
        w = self.state[key]
        if kind == "linear":
            w = _t_linear(w)
        elif kind == "conv":
            w = _t_conv(w)
        else:
            w = np.asarray(w)
        return jnp.asarray(w, self.dtype) if self.dtype else jnp.asarray(w)

    def put(self, key, value, kind):
        v = np.asarray(value, np.float32)
        if kind == "linear":
            v = _inv_linear(v)
        elif kind == "conv":
            v = _inv_conv(v)
        self.out[key] = v


def _linear_p(m: KeyMapper, prefix: str, bias=True):
    p = {"w": m.get(f"{prefix}.weight", "linear")}
    if bias and f"{prefix}.bias" in m.state:
        p["b"] = m.get(f"{prefix}.bias", "raw")
    return p


def _conv_p(m: KeyMapper, prefix: str):
    p = {"w": m.get(f"{prefix}.weight", "conv")}
    if f"{prefix}.bias" in m.state:
        p["b"] = m.get(f"{prefix}.bias", "raw")
    return p


def _norm_p(m: KeyMapper, prefix: str):
    return {"scale": m.get(f"{prefix}.weight", "raw"),
            "bias": m.get(f"{prefix}.bias", "raw")}


# --------------------------------------------------------------------- UNet


def _unet_resnet(m, prefix):
    p = {
        "norm1": _norm_p(m, f"{prefix}.norm1"),
        "conv1": _conv_p(m, f"{prefix}.conv1"),
        "norm2": _norm_p(m, f"{prefix}.norm2"),
        "conv2": _conv_p(m, f"{prefix}.conv2"),
    }
    if f"{prefix}.time_emb_proj.weight" in m.state:
        p["time_emb"] = _linear_p(m, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in m.state:
        p["shortcut"] = _conv_p(m, f"{prefix}.conv_shortcut")
    return p


def _unet_attn(m, prefix):
    return {
        "q": _linear_p(m, f"{prefix}.to_q", bias=False),
        "k": _linear_p(m, f"{prefix}.to_k", bias=False),
        "v": _linear_p(m, f"{prefix}.to_v", bias=False),
        "out": _linear_p(m, f"{prefix}.to_out.0"),
    }


def _unet_tblock(m, prefix):
    return {
        "ln1": _norm_p(m, f"{prefix}.norm1"),
        "attn1": _unet_attn(m, f"{prefix}.attn1"),
        "ln2": _norm_p(m, f"{prefix}.norm2"),
        "attn2": _unet_attn(m, f"{prefix}.attn2"),
        "ln3": _norm_p(m, f"{prefix}.norm3"),
        "ff1": _linear_p(m, f"{prefix}.ff.net.0.proj"),
        "ff2": _linear_p(m, f"{prefix}.ff.net.2"),
    }


def _unet_transformer(m, prefix, linear_proj):
    n_blocks = 0
    while f"{prefix}.transformer_blocks.{n_blocks}.norm1.weight" in m.state:
        n_blocks += 1
    kind = "linear" if linear_proj else "conv"
    builder = _linear_p if linear_proj else _conv_p
    return {
        "norm": _norm_p(m, f"{prefix}.norm"),
        "proj_in": builder(m, f"{prefix}.proj_in"),
        "proj_out": builder(m, f"{prefix}.proj_out"),
        "blocks": [_unet_tblock(m, f"{prefix}.transformer_blocks.{k}")
                   for k in range(n_blocks)],
    }


def load_unet_params(state: dict, cfg: UNetConfig, dtype=None) -> dict:
    m = KeyMapper(state, dtype)
    p = {
        "conv_in": _conv_p(m, "conv_in"),
        "time_embed": {
            "lin1": _linear_p(m, "time_embedding.linear_1"),
            "lin2": _linear_p(m, "time_embedding.linear_2"),
        },
        "norm_out": _norm_p(m, "conv_norm_out"),
        "conv_out": _conv_p(m, "conv_out"),
    }
    if cfg.addition_embed_dim and "add_embedding.linear_1.weight" in state:
        p["add_embed"] = {
            "lin1": _linear_p(m, "add_embedding.linear_1"),
            "lin2": _linear_p(m, "add_embedding.linear_2"),
        }

    down = []
    for i in range(cfg.levels):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                _unet_resnet(m, f"down_blocks.{i}.resnets.{j}"))
            if cfg.attn_levels[i]:
                blk["attns"].append(_unet_transformer(
                    m, f"down_blocks.{i}.attentions.{j}",
                    cfg.linear_projection))
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in state:
            blk["downsample"] = _conv_p(m, f"down_blocks.{i}.downsamplers.0.conv")
        down.append(blk)
    p["down"] = down

    p["mid"] = {
        "res1": _unet_resnet(m, "mid_block.resnets.0"),
        "res2": _unet_resnet(m, "mid_block.resnets.1"),
    }
    if cfg.mid_attn:
        p["mid"]["attn"] = _unet_transformer(m, "mid_block.attentions.0",
                                             cfg.linear_projection)

    up = []
    for i in range(cfg.levels):
        lvl = cfg.levels - 1 - i
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_unet_resnet(m, f"up_blocks.{i}.resnets.{j}"))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_unet_transformer(
                    m, f"up_blocks.{i}.attentions.{j}", cfg.linear_projection))
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in state:
            blk["upsample"] = _conv_p(m, f"up_blocks.{i}.upsamplers.0.conv")
        up.append(blk)
    p["up"] = up
    return p


def load_controlnet_params(state: dict, cfg: UNetConfig, dtype=None) -> dict:
    """diffusers ControlNetModel safetensors -> our controlnet tree."""
    m = KeyMapper(state, dtype)
    p = {
        "conv_in": _conv_p(m, "conv_in"),
        "time_embed": {
            "lin1": _linear_p(m, "time_embedding.linear_1"),
            "lin2": _linear_p(m, "time_embedding.linear_2"),
        },
    }
    ce = {"conv_in": _conv_p(m, "controlnet_cond_embedding.conv_in"),
          "blocks": []}
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in state:
        ce["blocks"].append({
            "conv1": _conv_p(m, f"controlnet_cond_embedding.blocks.{i}"),
            "conv2": _conv_p(m, f"controlnet_cond_embedding.blocks.{i + 1}"),
        })
        i += 2
    ce["conv_out"] = _conv_p(m, "controlnet_cond_embedding.conv_out")
    p["cond_embed"] = ce

    down = []
    for lvl in range(cfg.levels):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                _unet_resnet(m, f"down_blocks.{lvl}.resnets.{j}"))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_unet_transformer(
                    m, f"down_blocks.{lvl}.attentions.{j}",
                    cfg.linear_projection))
        if f"down_blocks.{lvl}.downsamplers.0.conv.weight" in state:
            blk["downsample"] = _conv_p(
                m, f"down_blocks.{lvl}.downsamplers.0.conv")
        down.append(blk)
    p["down"] = down
    p["zero_convs"] = [
        _conv_p(m, f"controlnet_down_blocks.{i}")
        for i in range(sum(1 for k in state
                           if re.match(r"controlnet_down_blocks\.\d+\.weight",
                                       k)))]
    p["mid"] = {
        "res1": _unet_resnet(m, "mid_block.resnets.0"),
        "res2": _unet_resnet(m, "mid_block.resnets.1"),
    }
    if cfg.mid_attn:
        p["mid"]["attn"] = _unet_transformer(m, "mid_block.attentions.0",
                                             cfg.linear_projection)
    p["mid_zero"] = _conv_p(m, "controlnet_mid_block")
    return p


import re  # noqa: E402


def export_controlnet_state(params: dict, cfg: UNetConfig) -> dict:
    """Inverse of load_controlnet_params (testing + export)."""
    m = KeyMapper({}, None)
    _put_conv(m, "conv_in", params["conv_in"])
    _put_linear(m, "time_embedding.linear_1", params["time_embed"]["lin1"])
    _put_linear(m, "time_embedding.linear_2", params["time_embed"]["lin2"])
    ce = params["cond_embed"]
    _put_conv(m, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for i, blk in enumerate(ce["blocks"]):
        _put_conv(m, f"controlnet_cond_embedding.blocks.{i * 2}",
                  blk["conv1"])
        _put_conv(m, f"controlnet_cond_embedding.blocks.{i * 2 + 1}",
                  blk["conv2"])
    _put_conv(m, "controlnet_cond_embedding.conv_out", ce["conv_out"])
    for lvl, blk in enumerate(params["down"]):
        for j, res in enumerate(blk["resnets"]):
            _put_unet_resnet(m, f"down_blocks.{lvl}.resnets.{j}", res)
        for j, attn in enumerate(blk["attns"]):
            _put_unet_transformer(m, f"down_blocks.{lvl}.attentions.{j}",
                                  attn, cfg.linear_projection)
        if "downsample" in blk:
            _put_conv(m, f"down_blocks.{lvl}.downsamplers.0.conv",
                      blk["downsample"])
    for i, zc in enumerate(params["zero_convs"]):
        _put_conv(m, f"controlnet_down_blocks.{i}", zc)
    _put_unet_resnet(m, "mid_block.resnets.0", params["mid"]["res1"])
    _put_unet_resnet(m, "mid_block.resnets.1", params["mid"]["res2"])
    if "attn" in params["mid"]:
        _put_unet_transformer(m, "mid_block.attentions.0",
                              params["mid"]["attn"], cfg.linear_projection)
    _put_conv(m, "controlnet_mid_block", params["mid_zero"])
    return m.out


# ---------------------------------------------------------------------- VAE


def _vae_attn(m, prefix):
    """Supports both modern (to_q) and legacy (query) VAE attn keys."""
    modern = f"{prefix}.to_q.weight" in m.state
    q, k, v, o = (("to_q", "to_k", "to_v", "to_out.0") if modern else
                  ("query", "key", "value", "proj_attn"))
    norm = "group_norm" if f"{prefix}.group_norm.weight" in m.state else "norm"

    def lin(name):
        w = m.state[f"{prefix}.{name}.weight"]
        w = np.asarray(w)
        if w.ndim == 4:  # very old ckpts use 1x1 convs
            w = w[:, :, 0, 0]
        p = {"w": jnp.asarray(_t_linear(w), m.dtype) if m.dtype
             else jnp.asarray(_t_linear(w))}
        bkey = f"{prefix}.{name}.bias"
        if bkey in m.state:
            p["b"] = m.get(bkey, "raw")
        return p

    return {"norm": _norm_p(m, f"{prefix}.{norm}"),
            "q": lin(q), "k": lin(k), "v": lin(v), "out": lin(o)}


def _vae_resnet(m, prefix):
    p = {
        "norm1": _norm_p(m, f"{prefix}.norm1"),
        "conv1": _conv_p(m, f"{prefix}.conv1"),
        "norm2": _norm_p(m, f"{prefix}.norm2"),
        "conv2": _conv_p(m, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in m.state:
        p["shortcut"] = _conv_p(m, f"{prefix}.conv_shortcut")
    return p


def load_vae_params(state: dict, cfg: VAEConfig, dtype=None) -> dict:
    m = KeyMapper(state, dtype)
    n = len(cfg.block_out_channels)

    enc = {"conv_in": _conv_p(m, "encoder.conv_in"), "down": []}
    for i in range(n):
        blk = {"resnets": [_vae_resnet(m, f"encoder.down_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in state:
            blk["downsample"] = _conv_p(
                m, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc["down"].append(blk)
    enc["mid"] = {
        "res1": _vae_resnet(m, "encoder.mid_block.resnets.0"),
        "attn": _vae_attn(m, "encoder.mid_block.attentions.0"),
        "res2": _vae_resnet(m, "encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _norm_p(m, "encoder.conv_norm_out")
    enc["conv_out"] = _conv_p(m, "encoder.conv_out")

    dec = {"conv_in": _conv_p(m, "decoder.conv_in"), "up": []}
    dec["mid"] = {
        "res1": _vae_resnet(m, "decoder.mid_block.resnets.0"),
        "attn": _vae_attn(m, "decoder.mid_block.attentions.0"),
        "res2": _vae_resnet(m, "decoder.mid_block.resnets.1"),
    }
    for i in range(n):
        blk = {"resnets": [_vae_resnet(m, f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in state:
            blk["upsample"] = _conv_p(
                m, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec["up"].append(blk)
    dec["norm_out"] = _norm_p(m, "decoder.conv_norm_out")
    dec["conv_out"] = _conv_p(m, "decoder.conv_out")

    return {
        "encoder": enc, "decoder": dec,
        "quant_conv": _conv_p(m, "quant_conv"),
        "post_quant_conv": _conv_p(m, "post_quant_conv"),
    }


# --------------------------------------------------------------------- CLIP


def load_clip_params(state: dict, cfg: CLIPTextConfig, dtype=None) -> dict:
    m = KeyMapper(state, dtype)
    pre = "text_model."
    if not any(k.startswith(pre) for k in state):
        pre = ""
    p = {
        "token_embedding": m.get(f"{pre}embeddings.token_embedding.weight",
                                 "raw"),
        "position_embedding": m.get(
            f"{pre}embeddings.position_embedding.weight", "raw"),
        "final_ln": _norm_p(m, f"{pre}final_layer_norm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        p["blocks"].append({
            "ln1": _norm_p(m, f"{lp}.layer_norm1"),
            "attn": {
                "q": _linear_p(m, f"{lp}.self_attn.q_proj"),
                "k": _linear_p(m, f"{lp}.self_attn.k_proj"),
                "v": _linear_p(m, f"{lp}.self_attn.v_proj"),
                "out": _linear_p(m, f"{lp}.self_attn.out_proj"),
            },
            "ln2": _norm_p(m, f"{lp}.layer_norm2"),
            "fc1": _linear_p(m, f"{lp}.mlp.fc1"),
            "fc2": _linear_p(m, f"{lp}.mlp.fc2"),
        })
    if cfg.projection_dim and "text_projection.weight" in state:
        p["text_projection"] = _linear_p(m, "text_projection", bias=False)
    return p


def load_clip_vision_params(state: dict, dtype=None,
                            num_heads: int | None = None):
    """Load a CLIP vision tower (+ visual_projection) from a torch state
    dict — diffusers StableDiffusionSafetyChecker ('vision_model.
    vision_model.*'), CLIPVisionModel(WithProjection) ('vision_model.*'),
    or bare keys. Returns (params, CLIPVisionConfig) with the config
    derived from tensor shapes (reference loads this via transformers,
    gyre/pipeline/safety_checkers.py:13-66)."""
    from .clip import CLIPVisionConfig

    cls_key = next((k for k in state
                    if k.endswith("embeddings.class_embedding")), None)
    if cls_key is None:
        raise KeyError("no CLIP vision tower in state dict")
    pre = cls_key[:-len("embeddings.class_embedding")]
    hidden = int(state[cls_key].shape[-1])
    patch_w = state[f"{pre}embeddings.patch_embedding.weight"]
    patch = int(patch_w.shape[-1])
    n_pos = int(state[f"{pre}embeddings.position_embedding.weight"].shape[0])
    image_size = int(round((n_pos - 1) ** 0.5)) * patch
    n_layers = 0
    while f"{pre}encoder.layers.{n_layers}.layer_norm1.weight" in state:
        n_layers += 1
    # head count isn't in the weights. Published CLIP/OpenCLIP vision
    # towers: ViT-B 768/12, ViT-L 1024/16, ViT-H 1280/16, ViT-g 1408/16,
    # ViT-bigG 1664/16 (head_dim is NOT uniformly 64 — H is 80, g is 88)
    vision_heads = {768: 12, 1024: 16, 1280: 16, 1408: 16, 1664: 16}
    heads = num_heads or vision_heads.get(hidden) or max(hidden // 64, 1)
    fc1 = state[f"{pre}encoder.layers.0.mlp.fc1.weight"]
    inter = int(fc1.shape[0])
    # visual_projection sits above the tower prefix (or absent)
    proj_key = None
    for cand in ("visual_projection.weight", pre + "visual_projection.weight"):
        if cand in state:
            proj_key = cand
            break
    root = pre[:-len("vision_model.")] if pre.endswith("vision_model.") \
        else pre
    if proj_key is None and root + "visual_projection.weight" in state:
        proj_key = root + "visual_projection.weight"
    proj_dim = int(state[proj_key].shape[0]) if proj_key else hidden

    cfg = CLIPVisionConfig(image_size=image_size, patch_size=patch,
                           hidden_size=hidden, num_layers=n_layers,
                           num_heads=heads, intermediate_size=inter,
                           projection_dim=proj_dim)
    m = KeyMapper(state, dtype)
    # HF ships the pre-LN key with a historical typo ("pre_layrnorm")
    pre_ln_key = f"{pre}pre_layrnorm" if f"{pre}pre_layrnorm.weight" in \
        state else f"{pre}pre_layernorm"
    p = {
        "patch_embed": {"w": m.get(f"{pre}embeddings.patch_embedding.weight",
                                   "conv")},
        "class_embed": m.get(cls_key, "raw"),
        "position_embedding": m.get(
            f"{pre}embeddings.position_embedding.weight", "raw"),
        "pre_ln": _norm_p(m, pre_ln_key),
        "post_ln": _norm_p(m, f"{pre}post_layernorm"),
        "blocks": [],
    }
    for i in range(n_layers):
        lp = f"{pre}encoder.layers.{i}"
        p["blocks"].append({
            "ln1": _norm_p(m, f"{lp}.layer_norm1"),
            "attn": {
                "q": _linear_p(m, f"{lp}.self_attn.q_proj"),
                "k": _linear_p(m, f"{lp}.self_attn.k_proj"),
                "v": _linear_p(m, f"{lp}.self_attn.v_proj"),
                "out": _linear_p(m, f"{lp}.self_attn.out_proj"),
            },
            "ln2": _norm_p(m, f"{lp}.layer_norm2"),
            "fc1": _linear_p(m, f"{lp}.mlp.fc1"),
            "fc2": _linear_p(m, f"{lp}.mlp.fc2"),
        })
    if proj_key:
        p["visual_projection"] = {"w": m.get(proj_key, "linear")}
    else:
        p["visual_projection"] = {
            "w": np.eye(hidden, dtype=np.float32)}
    return p, cfg


def load_clip_model_params(state: dict, dtype=None,
                           activation: str | None = None,
                           text_heads: int | None = None,
                           vision_heads: int | None = None):
    """Load a full transformers `CLIPModel` state dict (both towers plus
    the joint-space projections) — the reference's `clip` model type loads
    the same weights into CLIPModel + CLIPTokenizer
    (gyre/manager.py:1540-1560) and CLIP guidance compares the towers'
    *projected* embeddings (gyre/pipeline/unet/clipguided.py:94-420).

    Returns (text_params, text_cfg, vision_params, vision_cfg): both
    configs shape-derived, both param trees including their projection
    heads so image/text embeddings land in the shared joint space.
    """
    from .configs import CLIPTextConfig

    tpre = "text_model."
    tok_key = f"{tpre}embeddings.token_embedding.weight"
    if tok_key not in state:
        raise KeyError("no CLIP text tower (text_model.*) in state dict")
    vocab, hidden = (int(s) for s in state[tok_key].shape)
    n_pos = int(state[f"{tpre}embeddings.position_embedding.weight"].shape[0])
    n_layers = 0
    while f"{tpre}encoder.layers.{n_layers}.layer_norm1.weight" in state:
        n_layers += 1
    inter = int(state[f"{tpre}encoder.layers.0.mlp.fc1.weight"].shape[0])
    proj_dim = int(state["text_projection.weight"].shape[0]) \
        if "text_projection.weight" in state else 0
    # activation isn't in the weights: openai CLIP uses quick_gelu,
    # laion OpenCLIP conversions use gelu — callers with a config.json
    # pass it through (manager reads hidden_act when available)
    act = activation or "quick_gelu"
    # CLIP text towers uniformly use 64-dim heads (512/8, 768/12,
    # 1024/16, 1280/20-bigG); EOS is the top BPE token id
    text_cfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, num_layers=n_layers,
        num_heads=text_heads or max(hidden // 64, 1),
        intermediate_size=inter,
        max_position_embeddings=n_pos, projection_dim=proj_dim,
        activation=act, eos_token_id=vocab - 1)
    text_params = load_clip_params(state, text_cfg, dtype)
    vision_params, vision_cfg = load_clip_vision_params(
        state, dtype, num_heads=vision_heads)
    if act != vision_cfg.activation:
        import dataclasses as _dc
        vision_cfg = _dc.replace(vision_cfg, activation=act)
    return text_params, text_cfg, vision_params, vision_cfg


# ------------------------------------------------------------------- export


def _put_norm(m, prefix, p):
    m.put(f"{prefix}.weight", p["scale"], "raw")
    m.put(f"{prefix}.bias", p["bias"], "raw")


def _put_conv(m, prefix, p):
    m.put(f"{prefix}.weight", p["w"], "conv")
    if "b" in p:
        m.put(f"{prefix}.bias", p["b"], "raw")


def _put_linear(m, prefix, p):
    m.put(f"{prefix}.weight", p["w"], "linear")
    if "b" in p:
        m.put(f"{prefix}.bias", p["b"], "raw")


def _put_unet_resnet(m, prefix, p):
    _put_norm(m, f"{prefix}.norm1", p["norm1"])
    _put_conv(m, f"{prefix}.conv1", p["conv1"])
    _put_norm(m, f"{prefix}.norm2", p["norm2"])
    _put_conv(m, f"{prefix}.conv2", p["conv2"])
    if "time_emb" in p:
        _put_linear(m, f"{prefix}.time_emb_proj", p["time_emb"])
    if "shortcut" in p:
        _put_conv(m, f"{prefix}.conv_shortcut", p["shortcut"])


def _put_unet_transformer(m, prefix, p, linear_proj):
    put_proj = _put_linear if linear_proj else _put_conv
    _put_norm(m, f"{prefix}.norm", p["norm"])
    put_proj(m, f"{prefix}.proj_in", p["proj_in"])
    put_proj(m, f"{prefix}.proj_out", p["proj_out"])
    for k, blk in enumerate(p["blocks"]):
        bp = f"{prefix}.transformer_blocks.{k}"
        _put_norm(m, f"{bp}.norm1", blk["ln1"])
        _put_norm(m, f"{bp}.norm2", blk["ln2"])
        _put_norm(m, f"{bp}.norm3", blk["ln3"])
        for ours, theirs in (("attn1", "attn1"), ("attn2", "attn2")):
            _put_linear(m, f"{bp}.{theirs}.to_q", blk[ours]["q"])
            _put_linear(m, f"{bp}.{theirs}.to_k", blk[ours]["k"])
            _put_linear(m, f"{bp}.{theirs}.to_v", blk[ours]["v"])
            _put_linear(m, f"{bp}.{theirs}.to_out.0", blk[ours]["out"])
        _put_linear(m, f"{bp}.ff.net.0.proj", blk["ff1"])
        _put_linear(m, f"{bp}.ff.net.2", blk["ff2"])


def export_unet_state(params: dict, cfg: UNetConfig) -> dict:
    m = KeyMapper({}, None)
    _put_conv(m, "conv_in", params["conv_in"])
    _put_linear(m, "time_embedding.linear_1", params["time_embed"]["lin1"])
    _put_linear(m, "time_embedding.linear_2", params["time_embed"]["lin2"])
    if "add_embed" in params:
        _put_linear(m, "add_embedding.linear_1", params["add_embed"]["lin1"])
        _put_linear(m, "add_embedding.linear_2", params["add_embed"]["lin2"])
    for i, blk in enumerate(params["down"]):
        for j, res in enumerate(blk["resnets"]):
            _put_unet_resnet(m, f"down_blocks.{i}.resnets.{j}", res)
        for j, attn in enumerate(blk["attns"]):
            _put_unet_transformer(m, f"down_blocks.{i}.attentions.{j}", attn,
                                  cfg.linear_projection)
        if "downsample" in blk:
            _put_conv(m, f"down_blocks.{i}.downsamplers.0.conv",
                      blk["downsample"])
    _put_unet_resnet(m, "mid_block.resnets.0", params["mid"]["res1"])
    _put_unet_resnet(m, "mid_block.resnets.1", params["mid"]["res2"])
    if "attn" in params["mid"]:
        _put_unet_transformer(m, "mid_block.attentions.0",
                              params["mid"]["attn"], cfg.linear_projection)
    for i, blk in enumerate(params["up"]):
        for j, res in enumerate(blk["resnets"]):
            _put_unet_resnet(m, f"up_blocks.{i}.resnets.{j}", res)
        for j, attn in enumerate(blk["attns"]):
            _put_unet_transformer(m, f"up_blocks.{i}.attentions.{j}", attn,
                                  cfg.linear_projection)
        if "upsample" in blk:
            _put_conv(m, f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    _put_norm(m, "conv_norm_out", params["norm_out"])
    _put_conv(m, "conv_out", params["conv_out"])
    return m.out


def _put_vae_resnet(m, prefix, p):
    _put_norm(m, f"{prefix}.norm1", p["norm1"])
    _put_conv(m, f"{prefix}.conv1", p["conv1"])
    _put_norm(m, f"{prefix}.norm2", p["norm2"])
    _put_conv(m, f"{prefix}.conv2", p["conv2"])
    if "shortcut" in p:
        _put_conv(m, f"{prefix}.conv_shortcut", p["shortcut"])


def _put_vae_attn(m, prefix, p):
    _put_norm(m, f"{prefix}.group_norm", p["norm"])
    _put_linear(m, f"{prefix}.to_q", p["q"])
    _put_linear(m, f"{prefix}.to_k", p["k"])
    _put_linear(m, f"{prefix}.to_v", p["v"])
    _put_linear(m, f"{prefix}.to_out.0", p["out"])


def export_vae_state(params: dict, cfg: VAEConfig) -> dict:
    m = KeyMapper({}, None)
    enc, dec = params["encoder"], params["decoder"]
    _put_conv(m, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down"]):
        for j, res in enumerate(blk["resnets"]):
            _put_vae_resnet(m, f"encoder.down_blocks.{i}.resnets.{j}", res)
        if "downsample" in blk:
            _put_conv(m, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      blk["downsample"])
    _put_vae_resnet(m, "encoder.mid_block.resnets.0", enc["mid"]["res1"])
    _put_vae_attn(m, "encoder.mid_block.attentions.0", enc["mid"]["attn"])
    _put_vae_resnet(m, "encoder.mid_block.resnets.1", enc["mid"]["res2"])
    _put_norm(m, "encoder.conv_norm_out", enc["norm_out"])
    _put_conv(m, "encoder.conv_out", enc["conv_out"])
    _put_conv(m, "decoder.conv_in", dec["conv_in"])
    _put_vae_resnet(m, "decoder.mid_block.resnets.0", dec["mid"]["res1"])
    _put_vae_attn(m, "decoder.mid_block.attentions.0", dec["mid"]["attn"])
    _put_vae_resnet(m, "decoder.mid_block.resnets.1", dec["mid"]["res2"])
    for i, blk in enumerate(dec["up"]):
        for j, res in enumerate(blk["resnets"]):
            _put_vae_resnet(m, f"decoder.up_blocks.{i}.resnets.{j}", res)
        if "upsample" in blk:
            _put_conv(m, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      blk["upsample"])
    _put_norm(m, "decoder.conv_norm_out", dec["norm_out"])
    _put_conv(m, "decoder.conv_out", dec["conv_out"])
    _put_conv(m, "quant_conv", params["quant_conv"])
    _put_conv(m, "post_quant_conv", params["post_quant_conv"])
    return m.out


def export_clip_state(params: dict, cfg: CLIPTextConfig) -> dict:
    m = KeyMapper({}, None)
    pre = "text_model."
    m.put(f"{pre}embeddings.token_embedding.weight",
          params["token_embedding"], "raw")
    m.put(f"{pre}embeddings.position_embedding.weight",
          params["position_embedding"], "raw")
    m.put(f"{pre}final_layer_norm.weight", params["final_ln"]["scale"], "raw")
    m.put(f"{pre}final_layer_norm.bias", params["final_ln"]["bias"], "raw")
    for i, blk in enumerate(params["blocks"]):
        lp = f"{pre}encoder.layers.{i}"
        for ln, name in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            m.put(f"{lp}.{name}.weight", blk[ln]["scale"], "raw")
            m.put(f"{lp}.{name}.bias", blk[ln]["bias"], "raw")
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("out", "out_proj")):
            m.put(f"{lp}.self_attn.{theirs}.weight",
                  blk["attn"][ours]["w"], "linear")
            m.put(f"{lp}.self_attn.{theirs}.bias",
                  blk["attn"][ours]["b"], "raw")
        m.put(f"{lp}.mlp.fc1.weight", blk["fc1"]["w"], "linear")
        m.put(f"{lp}.mlp.fc1.bias", blk["fc1"]["b"], "raw")
        m.put(f"{lp}.mlp.fc2.weight", blk["fc2"]["w"], "linear")
        m.put(f"{lp}.mlp.fc2.bias", blk["fc2"]["b"], "raw")
    if "text_projection" in params:
        m.put("text_projection.weight", params["text_projection"]["w"],
              "linear")
    return m.out


# ----------------------------------------------------------------- modelset


def read_safetensors(path: str) -> dict:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as fh:
        for key in fh.keys():
            out[key] = fh.get_tensor(key)
    return out


def write_safetensors(path: str, state: dict):
    from safetensors.numpy import save_file

    save_file({k: np.asarray(v) for k, v in state.items()}, path)


def _find_weights(dirpath: str, names=("diffusion_pytorch_model.safetensors",
                                       "model.safetensors")) -> str | None:
    for n in names:
        p = os.path.join(dirpath, n)
        if os.path.exists(p):
            return p
    # fp16 variants
    for n in names:
        p = os.path.join(dirpath, n.replace(".safetensors",
                                            ".fp16.safetensors"))
        if os.path.exists(p):
            return p
    return None


def read_state_dict(path: str) -> dict:
    """Checkpoint file or directory -> flat {key: np.ndarray}. Handles
    safetensors and torch zip checkpoints (via the restricted unpickler);
    directories search the usual diffusers/BasicSR file names."""
    if os.path.isdir(path):
        found = _find_weights(path)
        if found is None:
            for n in sorted(os.listdir(path)):
                if n.endswith((".safetensors", ".pth", ".pt", ".ckpt",
                               ".bin")):
                    found = os.path.join(path, n)
                    break
        if found is None:
            raise FileNotFoundError(f"no checkpoint files under {path}")
        path = found
    if path.endswith(".safetensors"):
        return read_safetensors(path)
    from ..utils.safe_unpickle import load_torch_checkpoint

    with open(path, "rb") as fh:
        state = load_torch_checkpoint(fh.read())
    # unwrap the usual nesting ({'state_dict': ...}, {'params_ema': ...})
    for wrap in ("state_dict", "params_ema", "params"):
        if isinstance(state, dict) and wrap in state and \
                isinstance(state[wrap], dict) and len(state[wrap]) > 1:
            state = state[wrap]
    return {k: v for k, v in state.items() if isinstance(v, np.ndarray)}


def _read_json(path: str) -> dict | None:
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return None


def derive_modelset_config(path: str,
                           fallback: ModelSetConfig) -> ModelSetConfig:
    """Derive the architecture from the checkpoint's own config.json files
    (what diffusers from_pretrained does for the reference,
    gyre/manager.py:1145-1294); the preset is only a fallback for
    checkpoints without configs and for fields configs can't carry
    (clip_layer)."""
    import dataclasses

    from . import configs as C

    cfg = fallback
    uc = _read_json(os.path.join(path, "unet", "config.json"))
    if uc and ("KDownBlock2D" in (uc.get("down_block_types") or []) or
               uc.get("time_embedding_type") == "fourier"):
        # k-upscaler UNet (sd-x2-latent-upscaler); the real dims come
        # from tensor shapes in kunet.load_kunet — keep the fallback's
        # KUNetConfig here, just pick up the sample size
        cfg = dataclasses.replace(
            cfg, sample_size=int(uc.get("sample_size",
                                        fallback.sample_size)))
    elif uc:
        cfg = dataclasses.replace(
            cfg, unet=C.unet_config_from_diffusers(uc, fallback.unet),
            sample_size=int(uc.get("sample_size", fallback.sample_size)))
    vc = _read_json(os.path.join(path, "vae", "config.json"))
    if vc:
        cfg = dataclasses.replace(
            cfg, vae=C.vae_config_from_diffusers(vc, fallback.vae))
    tes = []
    for i in range(4):
        sub = "text_encoder" if i == 0 else f"text_encoder_{i + 1}"
        tc = _read_json(os.path.join(path, sub, "config.json"))
        if tc is None:
            break
        fb = fallback.text_encoders[min(i, len(fallback.text_encoders) - 1)]
        tes.append(C.clip_config_from_diffusers(tc, fb))
    if tes:
        cfg = dataclasses.replace(cfg, text_encoders=tuple(tes))
    return cfg


def load_modelset(path: str, cfg: ModelSetConfig, dtype=None,
                  engine_id: str = "loaded"):
    """Load a diffusers-layout checkpoint directory:
    unet/ vae/ text_encoder/ (text_encoder_2/) tokenizer/. The directory's
    config.json files define the architecture; `cfg` fills the gaps."""
    from .modelset import ModelSet

    cfg = derive_modelset_config(path, cfg)
    unet_file = _find_weights(os.path.join(path, "unet"))
    vae_file = _find_weights(os.path.join(path, "vae"))
    if not unet_file or not vae_file:
        raise FileNotFoundError(f"no unet/vae safetensors under {path}")
    unet_state = read_safetensors(unet_file)
    if "time_proj.weight" in unet_state and \
            not any(k.startswith("mid_block.") for k in unet_state):
        # k-upscaler layout (sd-x2-latent-upscaler): fourier time proj,
        # no mid block — strict KBlock loader, config from shapes
        import dataclasses as _dc

        from . import kunet as kunet_mod

        unet_params, kcfg = kunet_mod.load_kunet(unet_state, dtype)
        cfg = _dc.replace(cfg, unet=kcfg)
    else:
        unet_params = load_unet_params(unet_state, cfg.unet, dtype)
    vae_params = load_vae_params(read_safetensors(vae_file), cfg.vae, dtype)
    text_params = []
    for i, te_cfg in enumerate(cfg.text_encoders):
        sub = "text_encoder" if i == 0 else f"text_encoder_{i + 1}"
        f = _find_weights(os.path.join(path, sub))
        if not f:
            raise FileNotFoundError(f"no {sub} safetensors under {path}")
        text_params.append(load_clip_params(read_safetensors(f), te_cfg,
                                            dtype))

    # scheduler config if present
    pred = cfg.prediction_type
    sf = os.path.join(path, "scheduler", "scheduler_config.json")
    if os.path.exists(sf):
        with open(sf) as fh:
            scfg = json.load(fh)
        pred = scfg.get("prediction_type", pred)
        schedule = sched.scaled_linear_schedule(
            num_timesteps=scfg.get("num_train_timesteps", 1000),
            beta_start=scfg.get("beta_start", 0.00085),
            beta_end=scfg.get("beta_end", 0.012),
            prediction_type=pred)
    else:
        schedule = sched.scaled_linear_schedule(prediction_type=pred)

    tokenizer = load_tokenizer(os.path.join(path, "tokenizer"))
    return ModelSet(config=cfg, unet_params=unet_params,
                    vae_params=vae_params, text_params=text_params,
                    tokenizer=tokenizer, schedule=schedule, id=engine_id)


def save_modelset(ms, path: str):
    """Export a ModelSet as a diffusers-layout safetensors directory with
    per-submodule config.json and the tokenizer, so exports reload
    anywhere — including through diffusers itself (the --save_safetensors
    feature, reference gyre/manager.py:1863-2035)."""
    from . import configs as C

    cfg = ms.config
    os.makedirs(os.path.join(path, "unet"), exist_ok=True)
    os.makedirs(os.path.join(path, "vae"), exist_ok=True)
    write_safetensors(
        os.path.join(path, "unet", "diffusion_pytorch_model.safetensors"),
        export_unet_state(ms.unet_params, cfg.unet))
    with open(os.path.join(path, "unet", "config.json"), "w") as fh:
        json.dump(C.unet_config_to_diffusers(cfg.unet, cfg.sample_size), fh,
                  indent=2)
    write_safetensors(
        os.path.join(path, "vae", "diffusion_pytorch_model.safetensors"),
        export_vae_state(ms.vae_params, cfg.vae))
    with open(os.path.join(path, "vae", "config.json"), "w") as fh:
        json.dump(C.vae_config_to_diffusers(cfg.vae), fh, indent=2)
    index = {"_class_name": "StableDiffusionPipeline",
             "unet": ["diffusers", "UNet2DConditionModel"],
             "vae": ["diffusers", "AutoencoderKL"],
             "scheduler": ["diffusers", "DPMSolverMultistepScheduler"]}
    for i, (tp, te_cfg) in enumerate(zip(ms.text_params, cfg.text_encoders)):
        sub = "text_encoder" if i == 0 else f"text_encoder_{i + 1}"
        os.makedirs(os.path.join(path, sub), exist_ok=True)
        write_safetensors(os.path.join(path, sub, "model.safetensors"),
                          export_clip_state(tp, te_cfg))
        with open(os.path.join(path, sub, "config.json"), "w") as fh:
            json.dump(C.clip_config_to_diffusers(te_cfg), fh, indent=2)
        index[sub] = ["transformers",
                      "CLIPTextModelWithProjection"
                      if te_cfg.projection_dim else "CLIPTextModel"]
    if hasattr(ms.tokenizer, "save"):
        ms.tokenizer.save(os.path.join(path, "tokenizer"))
        index["tokenizer"] = ["transformers", "CLIPTokenizer"]
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"),
              "w") as fh:
        json.dump({
            "num_train_timesteps": ms.schedule.num_train_timesteps,
            "beta_schedule": "scaled_linear",
            "beta_start": 0.00085, "beta_end": 0.012,
            "prediction_type": ms.schedule.prediction_type,
        }, fh, indent=2)
    with open(os.path.join(path, "model_index.json"), "w") as fh:
        json.dump(index, fh, indent=2)
