"""LDM checkpoint conversion tests: diffusers->LDM->diffusers renaming
round trip proves the key maps without real checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import configs, ldm, load, unet


def test_unet_ldm_roundtrip(rng_key):
    cfg = configs.UNET_TEST
    params = unet.init(rng_key, cfg)
    dif = load.export_unet_state(params, cfg)
    ldm_state = ldm.diffusers_unet_to_ldm(dif, cfg)
    assert all(k.startswith("model.diffusion_model.") for k in ldm_state)
    assert "model.diffusion_model.input_blocks.0.0.weight" in ldm_state
    assert ("model.diffusion_model.input_blocks.1.0.in_layers.2.weight"
            in ldm_state)
    back = ldm.ldm_unet_to_diffusers(ldm_state, cfg)
    assert set(back) == set(dif), (
        f"missing: {sorted(set(dif) - set(back))[:5]} "
        f"extra: {sorted(set(back) - set(dif))[:5]}")
    reloaded = load.load_unet_params(back, cfg)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(reloaded)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_vae_ldm_roundtrip(rng_key):
    from gyre_tpu.models import vae as vae_mod

    cfg = configs.VAE_TEST
    params = vae_mod.init(rng_key, cfg)
    dif = load.export_vae_state(params, cfg)
    # build LDM naming by inverting the rename pairs
    pairs = sorted(ldm._vae_rename_pairs(cfg), key=lambda p: -len(p[1]))
    ldm_state = {}
    for key, val in dif.items():
        for ldm_p, dif_p in pairs:
            if key.startswith(dif_p + "."):
                rest = key[len(dif_p) + 1:]
                inner = ldm._VAE_ATTN_INNER if "attn" in ldm_p else \
                    ldm._VAE_RES_INNER
                for li, di in inner:
                    if rest.startswith(di + "."):
                        rest = li + rest[len(di):]
                        break
                v = np.asarray(val)
                if "attn" in ldm_p and rest.split(".")[0] in \
                        ("q", "k", "v", "proj_out") and \
                        rest.endswith("weight") and v.ndim == 2:
                    v = v[:, :, None, None]  # LDM stores 1x1 convs
                ldm_state["first_stage_model." + ldm_p + "." + rest] = v
                break
    back = ldm.ldm_vae_to_diffusers(ldm_state, cfg)
    assert set(back) == set(dif), (
        f"missing: {sorted(set(dif) - set(back))[:5]} "
        f"extra: {sorted(set(back) - set(dif))[:5]}")
    reloaded = load.load_vae_params(back, cfg)
    for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_full_ldm_modelset(rng_key):
    from gyre_tpu.models import clip as clip_mod
    from gyre_tpu.models import vae as vae_mod
    from gyre_tpu.models.modelset import random_modelset

    ms = random_modelset(configs.SD_TEST, seed=1, dtype=jnp.float32)
    cfg = configs.SD_TEST
    state = {}
    state.update(ldm.diffusers_unet_to_ldm(
        load.export_unet_state(ms.unet_params, cfg.unet), cfg.unet))
    # vae via test helper path above (reuse export+invert quickly)
    dif_vae = load.export_vae_state(ms.vae_params, cfg.vae)
    pairs = sorted(ldm._vae_rename_pairs(cfg.vae), key=lambda p: -len(p[1]))
    for key, val in dif_vae.items():
        for ldm_p, dif_p in pairs:
            if key.startswith(dif_p + "."):
                rest = key[len(dif_p) + 1:]
                inner = ldm._VAE_ATTN_INNER if "attn" in ldm_p else \
                    ldm._VAE_RES_INNER
                for li, di in inner:
                    if rest.startswith(di + "."):
                        rest = li + rest[len(di):]
                        break
                v = np.asarray(val)
                if "attn" in ldm_p and rest.split(".")[0] in \
                        ("q", "k", "v", "proj_out") and \
                        rest.endswith("weight") and v.ndim == 2:
                    v = v[:, :, None, None]
                state["first_stage_model." + ldm_p + "." + rest] = v
                break
    for k, v in load.export_clip_state(ms.text_params[0],
                                       cfg.text_encoders[0]).items():
        state["cond_stage_model.transformer." + k] = np.asarray(v)

    ms2 = ldm.load_ldm_modelset(state, cfg)
    for x, y in zip(jax.tree.leaves(ms.unet_params),
                    jax.tree.leaves(ms2.unet_params)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32))
