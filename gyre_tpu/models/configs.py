"""Architecture configs for the Stable Diffusion model family.

These mirror the hyperparameters the reference serves via diffusers model
configs (reference gyre/manager.py DEFAULT_LIBRARIES / engines yamls); the
implementations here are original JAX code, configured to be weight-loadable
from the same safetensors checkpoints.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which levels have cross-attention transformers (True) vs plain resnets
    attn_levels: tuple[bool, ...] = (True, True, True, False)
    transformer_layers: tuple[int, ...] = (1, 1, 1, 0)
    num_heads: tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    time_embed_dim: int = 1280
    norm_groups: int = 32
    mid_attn: bool = True
    mid_transformer_layers: int = 1
    linear_projection: bool = False  # SD2/SDXL use linear proj_in/out
    # SDXL "text_time" additional conditioning
    addition_embed_dim: int = 0      # pooled-text dim (1280 for SDXL)
    addition_time_dim: int = 0       # per-time_id sinusoid dim (256 for SDXL)
    addition_time_ids: int = 0       # number of time_ids (6 for SDXL base)
    # class conditioning (SD-x4 upscaler's noise-level embedding)
    class_embed: bool = False
    # FiLM-style time conditioning (diffusers resnet_time_scale_shift=
    # "scale_shift"; the sd-x2 latent upscaler's k-blocks)
    time_scale_shift: bool = False

    @property
    def levels(self) -> int:
        return len(self.block_out_channels)

    def head_dim(self, level: int) -> int:
        return self.block_out_channels[level] // self.num_heads[level]


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    activation: str = "quick_gelu"  # "quick_gelu" (openai) | "gelu" (openclip)
    projection_dim: int = 0         # >0: text_projection head (SDXL enc 2)
    eos_token_id: int = 49407


# ------------------------------------------------------------------ presets

UNET_SD15 = UNetConfig()
UNET_SD15_INPAINT = dataclasses.replace(UNET_SD15, in_channels=9)
UNET_SD15_DEPTH = dataclasses.replace(UNET_SD15, in_channels=5)
UNET_SD21 = dataclasses.replace(
    UNET_SD15,
    cross_attention_dim=1024,
    num_heads=(5, 10, 20, 20),
    linear_projection=True,
)
UNET_SD21_INPAINT = dataclasses.replace(UNET_SD21, in_channels=9)
UNET_SDXL = UNetConfig(
    block_out_channels=(320, 640, 1280),
    attn_levels=(False, True, True),
    transformer_layers=(0, 2, 10),
    num_heads=(5, 10, 20),
    cross_attention_dim=2048,
    mid_transformer_layers=10,
    linear_projection=True,
    addition_embed_dim=1280,
    addition_time_dim=256,
    addition_time_ids=6,
)
UNET_SDXL_REFINER = dataclasses.replace(
    UNET_SDXL,
    block_out_channels=(384, 768, 1536, 1536),
    time_embed_dim=1536,
    attn_levels=(False, True, True, False),
    transformer_layers=(0, 4, 4, 0),
    num_heads=(6, 12, 24, 24),
    cross_attention_dim=1280,
    mid_transformer_layers=4,
    addition_time_ids=5,
    addition_embed_dim=1280,
)
# tiny config for tests — same topology as SD1.5, a fraction of the width
UNET_TEST = UNetConfig(
    block_out_channels=(32, 64, 128, 128),
    num_heads=(4, 4, 4, 4),
    cross_attention_dim=64,
    time_embed_dim=128,
    norm_groups=8,
)

VAE_SD = VAEConfig()
VAE_SDXL = VAEConfig(scaling_factor=0.13025)
VAE_TEST = VAEConfig(block_out_channels=(16, 32, 64, 64), norm_groups=8)

CLIP_VIT_L = CLIPTextConfig()
OPENCLIP_H = CLIPTextConfig(
    hidden_size=1024, num_layers=24, num_heads=16,
    intermediate_size=4096, activation="gelu",
)
OPENCLIP_BIGG = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20,
    intermediate_size=5120, activation="gelu", projection_dim=1280,
)
CLIP_TEST = CLIPTextConfig(
    vocab_size=49408, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128,
)


@dataclass(frozen=True)
class ModelSetConfig:
    """Everything needed to build one engine's model set."""
    unet: UNetConfig = UNET_SD15
    vae: VAEConfig = VAE_SD
    text_encoders: tuple[CLIPTextConfig, ...] = (CLIP_VIT_L,)
    # which hidden layer feeds the unet: -1 = final LN output,
    # -2 = penultimate (SD2 convention)
    clip_layer: int = -1
    prediction_type: str = "epsilon"  # or "v_prediction"
    sample_size: int = 64             # native latent size (64 -> 512px)


SD15 = ModelSetConfig()
SD15_INPAINT = dataclasses.replace(SD15, unet=UNET_SD15_INPAINT)
SD21 = ModelSetConfig(
    unet=UNET_SD21, text_encoders=(OPENCLIP_H,), clip_layer=-2,
    prediction_type="v_prediction", sample_size=96,
)
SD21_BASE = dataclasses.replace(SD21, prediction_type="epsilon", sample_size=64)
SDXL = ModelSetConfig(
    unet=UNET_SDXL, vae=VAE_SDXL,
    text_encoders=(CLIP_VIT_L, OPENCLIP_BIGG), clip_layer=-2,
    sample_size=128,
)
SD_TEST = ModelSetConfig(
    unet=UNET_TEST, vae=VAE_TEST, text_encoders=(CLIP_TEST,), sample_size=8,
)
# tiny SDXL-topology config: dual towers + text_time conditioning
UNET_TEST_XL = UNetConfig(
    block_out_channels=(32, 64),
    attn_levels=(False, True),
    transformer_layers=(0, 2),
    num_heads=(4, 4),
    cross_attention_dim=96,   # 64 + 32 dual-tower concat
    time_embed_dim=128,
    norm_groups=8,
    mid_transformer_layers=2,
    linear_projection=True,
    addition_embed_dim=32,
    addition_time_dim=16,
    addition_time_ids=6,
)
CLIP_TEST2 = CLIPTextConfig(
    vocab_size=49408, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, projection_dim=32,
)
SDXL_TEST = ModelSetConfig(
    unet=UNET_TEST_XL, vae=VAE_TEST, text_encoders=(CLIP_TEST, CLIP_TEST2),
    clip_layer=-2, sample_size=8,
)
# SDXL refiner: single OpenCLIP-bigG tower, 4-level unet, 5 time_ids
# (orig/crop sizes + aesthetic score) — BASELINE config 5's second stage
SDXL_REFINER = ModelSetConfig(
    unet=UNET_SDXL_REFINER, vae=VAE_SDXL,
    text_encoders=(OPENCLIP_BIGG,), clip_layer=-2, sample_size=128,
)
UNET_TEST_XL_REFINER = dataclasses.replace(
    UNET_TEST_XL,
    cross_attention_dim=32,      # single test tower
    addition_time_ids=5,
)
SDXL_REFINER_TEST = ModelSetConfig(
    unet=UNET_TEST_XL_REFINER, vae=VAE_TEST, text_encoders=(CLIP_TEST2,),
    clip_layer=-2, sample_size=8,
)

PRESETS: dict[str, ModelSetConfig] = {
    "sd15": SD15,
    "sd15-inpaint": SD15_INPAINT,
    "sd21": SD21,
    "sd21-base": SD21_BASE,
    "sdxl": SDXL,
    "sdxl-refiner": SDXL_REFINER,
    "test": SD_TEST,
    "test-xl": SDXL_TEST,
    "test-xl-refiner": SDXL_REFINER_TEST,
}


# ------------------------------------------------ diffusers config interop
# Real checkpoints carry per-submodule config.json files; the loader derives
# architecture from THEM, using presets only as fallback (the reference gets
# this via diffusers from_pretrained; gyre/manager.py:1145-1294).

_SDXL_POOLED_DIM = 1280  # pooled text width across the SDXL family


def unet_config_from_diffusers(d: dict,
                               fallback: UNetConfig = UNET_SD15) -> UNetConfig:
    boc = tuple(d.get("block_out_channels", fallback.block_out_channels))
    n = len(boc)
    down = d.get("down_block_types") or \
        ["CrossAttnDownBlock2D"] * (n - 1) + ["DownBlock2D"]
    attn_levels = tuple("CrossAttn" in t for t in down)
    tl = d.get("transformer_layers_per_block", 1)
    if isinstance(tl, int):
        tl = [tl if a else 0 for a in attn_levels]
    tl = tuple(int(x) for x in tl)
    # diffusers quirk: legacy checkpoints store the head COUNT in
    # attention_head_dim (SD1.x: 8, SD2.x: [5,10,20,20])
    heads = d.get("num_attention_heads") or d.get("attention_head_dim", 8)
    if isinstance(heads, int):
        heads = [heads] * n
    heads = tuple(int(h) for h in heads)
    cross = d.get("cross_attention_dim", fallback.cross_attention_dim)
    if isinstance(cross, (list, tuple)):
        cross = max(cross)
    add_embed = add_time = add_ids = 0
    if d.get("addition_embed_type") == "text_time":
        add_time = int(d.get("addition_time_embed_dim", 256))
        proj_in = int(d.get("projection_class_embeddings_input_dim",
                            _SDXL_POOLED_DIM))
        # proj_in = pooled_dim + n_time_ids * time_dim; diffusers doesn't
        # store the split, so recover it: SDXL-family pooled dim first,
        # then the conventional id counts (6 base / 5 refiner)
        if proj_in >= _SDXL_POOLED_DIM and \
                (proj_in - _SDXL_POOLED_DIM) % max(add_time, 1) == 0:
            add_embed = _SDXL_POOLED_DIM
            add_ids = (proj_in - add_embed) // max(add_time, 1)
        else:
            for ids in (6, 5):
                if proj_in - ids * add_time > 0:
                    add_embed, add_ids = proj_in - ids * add_time, ids
                    break
    return UNetConfig(
        in_channels=int(d.get("in_channels", fallback.in_channels)),
        out_channels=int(d.get("out_channels", fallback.out_channels)),
        block_out_channels=boc,
        layers_per_block=int(d.get("layers_per_block",
                                   fallback.layers_per_block)),
        attn_levels=attn_levels,
        transformer_layers=tl,
        num_heads=heads,
        cross_attention_dim=int(cross),
        time_embed_dim=int(d.get("time_embedding_dim") or boc[0] * 4),
        norm_groups=int(d.get("norm_num_groups", fallback.norm_groups)),
        mid_attn="MidBlock2DCrossAttn" in str(
            d.get("mid_block_type", "UNetMidBlock2DCrossAttn")),
        mid_transformer_layers=max(tl) if any(tl) else 1,
        linear_projection=bool(d.get("use_linear_projection", False)),
        addition_embed_dim=add_embed,
        addition_time_dim=add_time,
        addition_time_ids=add_ids,
        class_embed=d.get("num_class_embeds") is not None,
    )


def unet_config_to_diffusers(cfg: UNetConfig, sample_size: int = 64) -> dict:
    down = ["CrossAttnDownBlock2D" if a else "DownBlock2D"
            for a in cfg.attn_levels]
    up = ["CrossAttnUpBlock2D" if a else "UpBlock2D"
          for a in reversed(cfg.attn_levels)]
    d = {
        "_class_name": "UNet2DConditionModel",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "sample_size": sample_size,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "down_block_types": down,
        "up_block_types": up,
        "transformer_layers_per_block": list(cfg.transformer_layers),
        "attention_head_dim": list(cfg.num_heads),
        "cross_attention_dim": cfg.cross_attention_dim,
        "norm_num_groups": cfg.norm_groups,
        "mid_block_type": "UNetMidBlock2DCrossAttn" if cfg.mid_attn
        else "UNetMidBlock2D",
        "use_linear_projection": cfg.linear_projection,
    }
    if cfg.time_embed_dim != cfg.block_out_channels[0] * 4:
        d["time_embedding_dim"] = cfg.time_embed_dim
    if cfg.addition_embed_dim:
        d["addition_embed_type"] = "text_time"
        d["addition_time_embed_dim"] = cfg.addition_time_dim
        d["projection_class_embeddings_input_dim"] = (
            cfg.addition_embed_dim +
            cfg.addition_time_ids * cfg.addition_time_dim)
    if cfg.class_embed:
        d["num_class_embeds"] = 1000
    return d


def vae_config_from_diffusers(d: dict,
                              fallback: VAEConfig = VAE_SD) -> VAEConfig:
    return VAEConfig(
        in_channels=int(d.get("in_channels", fallback.in_channels)),
        out_channels=int(d.get("out_channels", fallback.out_channels)),
        latent_channels=int(d.get("latent_channels",
                                  fallback.latent_channels)),
        block_out_channels=tuple(d.get("block_out_channels",
                                       fallback.block_out_channels)),
        layers_per_block=int(d.get("layers_per_block",
                                   fallback.layers_per_block)),
        norm_groups=int(d.get("norm_num_groups", fallback.norm_groups)),
        scaling_factor=float(d.get("scaling_factor",
                                   fallback.scaling_factor)),
    )


def vae_config_to_diffusers(cfg: VAEConfig) -> dict:
    return {
        "_class_name": "AutoencoderKL",
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "latent_channels": cfg.latent_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": cfg.norm_groups,
        "scaling_factor": cfg.scaling_factor,
        "down_block_types": ["DownEncoderBlock2D"] *
        len(cfg.block_out_channels),
        "up_block_types": ["UpDecoderBlock2D"] * len(cfg.block_out_channels),
    }


def clip_config_from_diffusers(d: dict,
                               fallback: CLIPTextConfig = CLIP_VIT_L
                               ) -> CLIPTextConfig:
    archs = d.get("architectures") or []
    with_proj = any("WithProjection" in a for a in archs) or \
        bool(d.get("projection_dim")) and "CLIPTextModel" not in archs
    return CLIPTextConfig(
        vocab_size=int(d.get("vocab_size", fallback.vocab_size)),
        hidden_size=int(d.get("hidden_size", fallback.hidden_size)),
        num_layers=int(d.get("num_hidden_layers", fallback.num_layers)),
        num_heads=int(d.get("num_attention_heads", fallback.num_heads)),
        intermediate_size=int(d.get("intermediate_size",
                                    fallback.intermediate_size)),
        max_position_embeddings=int(d.get("max_position_embeddings",
                                          fallback.max_position_embeddings)),
        activation=d.get("hidden_act", fallback.activation),
        projection_dim=int(d.get("projection_dim", 0)) if with_proj else 0,
        eos_token_id=int(d.get("eos_token_id", fallback.eos_token_id)),
    )


def clip_config_to_diffusers(cfg: CLIPTextConfig) -> dict:
    return {
        "architectures": ["CLIPTextModelWithProjection"
                          if cfg.projection_dim else "CLIPTextModel"],
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": cfg.activation,
        "projection_dim": cfg.projection_dim or cfg.hidden_size,
        "eos_token_id": cfg.eos_token_id,
    }
