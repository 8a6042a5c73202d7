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
