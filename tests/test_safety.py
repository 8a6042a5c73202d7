"""Safety-checker tests: real-weight loading (diffusers
StableDiffusionSafetyChecker layout), concept scoring, and the fail-closed
serving contract (round-1 advisor high finding: random-weight flags are
noise and block mode must refuse them)."""

import dataclasses

import numpy as np
import pytest

from gyre_tpu.pipeline.safety import SafetyChecker

D, LAYERS, PATCH, IMG, INTER, PROJ = 64, 2, 8, 32, 128, 32


def synth_safety_state(seed=0, n_concepts=17, n_special=3):
    """A state dict shaped exactly like the published checker's (torch
    layouts, HF key names incl. the historical 'pre_layrnorm' typo)."""
    r = np.random.RandomState(seed)

    def t(*shape):
        return (r.randn(*shape) * 0.02).astype(np.float32)

    pre = "vision_model.vision_model."
    state = {
        pre + "embeddings.class_embedding": t(D),
        pre + "embeddings.patch_embedding.weight": t(D, 3, PATCH, PATCH),
        pre + "embeddings.position_embedding.weight":
            t((IMG // PATCH) ** 2 + 1, D),
        pre + "pre_layrnorm.weight": np.ones(D, np.float32),
        pre + "pre_layrnorm.bias": np.zeros(D, np.float32),
        pre + "post_layernorm.weight": np.ones(D, np.float32),
        pre + "post_layernorm.bias": np.zeros(D, np.float32),
        "visual_projection.weight": t(PROJ, D),
        "concept_embeds": t(n_concepts, PROJ),
        "concept_embeds_weights": np.full(n_concepts, 0.5, np.float32),
        "special_care_embeds": t(n_special, PROJ),
        "special_care_embeds_weights": np.full(n_special, 0.5, np.float32),
    }
    for i in range(LAYERS):
        lp = pre + f"encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            state[f"{lp}.{ln}.weight"] = np.ones(D, np.float32)
            state[f"{lp}.{ln}.bias"] = np.zeros(D, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{lp}.self_attn.{proj}.weight"] = t(D, D)
            state[f"{lp}.self_attn.{proj}.bias"] = np.zeros(D, np.float32)
        state[f"{lp}.mlp.fc1.weight"] = t(INTER, D)
        state[f"{lp}.mlp.fc1.bias"] = np.zeros(INTER, np.float32)
        state[f"{lp}.mlp.fc2.weight"] = t(D, INTER)
        state[f"{lp}.mlp.fc2.bias"] = np.zeros(D, np.float32)
    return state


def test_loads_real_layout_and_derives_config():
    chk = SafetyChecker.from_state_dict(synth_safety_state())
    assert chk.trained
    cfg = chk.vision_cfg
    assert (cfg.hidden_size, cfg.num_layers, cfg.patch_size,
            cfg.image_size, cfg.intermediate_size,
            cfg.projection_dim) == (D, LAYERS, PATCH, IMG, INTER, PROJ)
    assert chk.concept_embeds.shape == (17, PROJ)
    assert chk.special_embeds.shape == (3, PROJ)
    flags = chk.check(np.random.RandomState(1).rand(2, 48, 48, 3)
                      .astype(np.float32))
    assert flags.shape == (2,) and flags.dtype == bool


def test_concept_scoring_flags_matching_image():
    """An image whose CLIP embedding IS a concept embedding must flag; a
    high threshold must unflag it (the published cosine scoring)."""
    import jax.numpy as jnp

    from gyre_tpu.models import clip as clip_mod

    chk = SafetyChecker.from_state_dict(synth_safety_state())
    img = np.random.RandomState(2).rand(1, IMG, IMG, 3).astype(np.float32)
    out = clip_mod.vision_apply(chk.vision_params, chk.vision_cfg,
                                clip_mod.preprocess_image(jnp.asarray(img)))
    emb = np.asarray(out["image_embeds"])[0]
    emb = emb / np.linalg.norm(emb)

    concepts = np.asarray(chk.concept_embeds).copy()
    concepts[0] = emb
    hot = dataclasses.replace(
        chk, concept_embeds=jnp.asarray(concepts),
        concept_thresholds=jnp.full((17,), 0.5),
        special_embeds=None, special_thresholds=None)
    assert hot.check(img)[0]
    cold = dataclasses.replace(hot,
                               concept_thresholds=jnp.full((17,), 1.5))
    assert not cold.check(img)[0]
    # special-care tightening: a borderline concept (just under threshold)
    # flips when a special concept fires
    borderline = dataclasses.replace(
        hot, concept_thresholds=jnp.full((17,), 1.0 + 0.005),
        special_embeds=jnp.asarray(emb[None]),
        special_thresholds=jnp.asarray([0.5]))
    assert borderline.check(img)[0]


def test_block_mode_fails_closed_without_trained_weights():
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.services.generate import GenerationServiceServicer

    m = EngineManager(
        [{"id": "t", "model": "preset/test", "default": True}],
        compute_dtype=jnp.float32, batch_max=1)
    svc = GenerationServiceServicer(m, nsfw_behaviour="block", batch_max=1)
    with pytest.raises(RuntimeError, match="trained safety-checker"):
        svc._safety_check(np.zeros((1, 64, 64, 3), np.float32))

    # flag mode: no trained weights -> flags nothing (not random noise)
    svc2 = GenerationServiceServicer(m, nsfw_behaviour="flag", batch_max=1)
    flags = svc2._safety_check(np.zeros((2, 64, 64, 3), np.float32))
    assert not flags.any()


def test_manager_loads_checker_from_spec(tmp_path):
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.models.load import write_safetensors

    path = tmp_path / "checker.safetensors"
    write_safetensors(str(path), synth_safety_state())
    m = EngineManager(
        [{"id": "t", "model": "preset/test", "default": True,
          "safety_checker": str(path)}],
        compute_dtype=jnp.float32, batch_max=1)
    chk = m.safety_checker()
    assert chk is not None and chk.trained
    # servicer picks it up and uses real scoring
    from gyre_tpu.services.generate import GenerationServiceServicer

    svc = GenerationServiceServicer(m, nsfw_behaviour="block", batch_max=1)
    flags = svc._safety_check(np.zeros((1, 64, 64, 3), np.float32))
    assert flags.shape == (1,)
