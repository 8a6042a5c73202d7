"""Tiled VAE decode: large latents decode in overlapping tiles and agree
with whole-image decode away from seams."""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline.unified import UnifiedPipeline


def test_tiled_decode_matches_whole():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    pipe.VAE_TILE_THRESHOLD = 24
    pipe.VAE_TILE = 16
    pipe.VAE_TILE_OVERLAP = 4
    lat = jnp.asarray(
        np.random.RandomState(0).randn(1, 32, 40, 4).astype(np.float32))
    whole = np.asarray(pipe._vae_decode_whole(lat))
    tiled = np.asarray(pipe.vae_decode(lat))
    assert tiled.shape == whole.shape == (1, 256, 320, 3)
    # interiors agree; conv halo effects only near tile seams
    diff = np.abs(tiled - whole)
    assert np.median(diff) < 0.02
    assert np.isfinite(tiled).all()


def test_small_latents_bypass_tiling():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    lat = jnp.zeros((1, 8, 8, 4))
    out = pipe.vae_decode(lat)
    assert out.shape == (1, 64, 64, 3)
