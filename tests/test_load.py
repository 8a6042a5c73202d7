"""Checkpoint mapping tests: export->load round-trips prove the torch
key/layout mapping is exact without needing real downloaded weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import clip, configs, load, unet, vae
from gyre_tpu.models.modelset import random_modelset


def trees_equal(a, b, atol=0.0):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, f"tree structure mismatch: {ta} vs {tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=atol)


def test_unet_state_roundtrip(rng_key):
    cfg = configs.UNET_TEST
    params = unet.init(rng_key, cfg)
    state = load.export_unet_state(params, cfg)
    # torch-convention shapes
    assert state["conv_in.weight"].shape[:2] == (32, 4)  # [out,in,kh,kw]
    assert state["time_embedding.linear_1.weight"].shape == (128, 32)
    back = load.load_unet_params(state, cfg)
    trees_equal(params, back)


def test_unet_state_roundtrip_sdxl_style(rng_key):
    cfg = configs.UNetConfig(
        block_out_channels=(32, 64), attn_levels=(False, True),
        transformer_layers=(0, 2), num_heads=(4, 4), cross_attention_dim=64,
        time_embed_dim=128, norm_groups=8, mid_transformer_layers=2,
        linear_projection=True, addition_embed_dim=32, addition_time_dim=16,
        addition_time_ids=6)
    params = unet.init(rng_key, cfg)
    state = load.export_unet_state(params, cfg)
    assert "add_embedding.linear_1.weight" in state
    back = load.load_unet_params(state, cfg)
    trees_equal(params, back)


def test_vae_state_roundtrip(rng_key):
    cfg = configs.VAE_TEST
    params = vae.init(rng_key, cfg)
    state = load.export_vae_state(params, cfg)
    back = load.load_vae_params(state, cfg)
    trees_equal(params, back)


def test_vae_legacy_attention_keys(rng_key):
    cfg = configs.VAE_TEST
    params = vae.init(rng_key, cfg)
    state = load.export_vae_state(params, cfg)
    legacy = {}
    for k, v in state.items():
        k = k.replace(".to_q.", ".query.").replace(".to_k.", ".key.")
        k = k.replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn.")
        legacy[k] = v
    back = load.load_vae_params(legacy, cfg)
    trees_equal(params, back)


def test_clip_state_roundtrip(rng_key):
    cfg = configs.CLIP_TEST
    params = clip.init(rng_key, cfg)
    state = load.export_clip_state(params, cfg)
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in state
    back = load.load_clip_params(state, cfg)
    trees_equal(params, back)


def test_controlnet_state_roundtrip(rng_key):
    from gyre_tpu.models import controlnet

    cfg = configs.UNET_TEST
    params = controlnet.init(rng_key, cfg)
    state = load.export_controlnet_state(params, cfg)
    assert "controlnet_cond_embedding.conv_in.weight" in state
    assert "controlnet_mid_block.weight" in state
    back = load.load_controlnet_params(state, cfg)
    trees_equal(params, back)


def test_save_and_load_modelset(tmp_path, rng_key):
    ms = random_modelset(configs.SD_TEST, seed=3, dtype=jnp.float32)
    load.save_modelset(ms, str(tmp_path))
    assert os.path.exists(tmp_path / "unet" /
                          "diffusion_pytorch_model.safetensors")
    back = load.load_modelset(str(tmp_path), configs.SD_TEST)
    trees_equal(ms.unet_params, back.unet_params, atol=0)
    trees_equal(ms.vae_params, back.vae_params, atol=0)
    trees_equal(ms.text_params[0], back.text_params[0], atol=0)
    assert back.schedule.prediction_type == ms.schedule.prediction_type

    # loaded weights drive the pipeline identically
    from gyre_tpu.pipeline.unified import UnifiedPipeline

    a = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    b = UnifiedPipeline(back, compute_dtype=jnp.float32)
    kw = dict(prompt="x", height=64, width=64, steps=2, sampler="k_euler",
              seeds=[1], guidance_scale=7.5)
    np.testing.assert_array_equal(np.asarray(a(**kw)), np.asarray(b(**kw)))


def test_export_reloads_with_derived_config(tmp_path):
    """save_modelset writes per-submodule config.json; load_modelset must
    derive the architecture from THEM even when the caller passes a
    mismatched preset (real checkpoints never match a preset exactly)."""
    import numpy as np

    from gyre_tpu.models import configs
    from gyre_tpu.models.load import load_modelset, save_modelset
    from gyre_tpu.models.modelset import random_modelset

    ms = random_modelset(configs.SD_TEST, seed=3, dtype=jnp.float32)
    out = str(tmp_path / "export")
    save_modelset(ms, out)
    assert os.path.exists(os.path.join(out, "unet", "config.json"))
    assert os.path.exists(os.path.join(out, "text_encoder", "config.json"))
    # deliberately wrong fallback preset: derived configs must win
    ms2 = load_modelset(out, configs.SD15, dtype=jnp.float32,
                        engine_id="rt")
    assert ms2.config.unet == configs.SD_TEST.unet
    assert ms2.config.text_encoders == configs.SD_TEST.text_encoders
    assert ms2.config.sample_size == configs.SD_TEST.sample_size
    a = jax.tree_util.tree_leaves(ms.unet_params)
    b = jax.tree_util.tree_leaves(ms2.unet_params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
