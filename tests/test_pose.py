"""Pose model + OpenPose renderer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import pose


def test_heatmaps_and_decode(rng_key):
    params = pose.init(rng_key, width=16, n_blocks=2)
    img = jax.random.uniform(rng_key, (2, 64, 64, 3))
    maps = pose.heatmaps(params, img)
    assert maps.shape == (2, 8, 8, pose.N_KEYPOINTS)
    kps, conf = pose.decode_keypoints(maps)
    assert kps.shape == (2, 18, 2) and conf.shape == (2, 18)
    assert float(kps.min()) >= 0 and float(kps.max()) <= 1


def test_render_openpose_draws_limbs():
    # synthetic stick figure: all keypoints confident, laid out vertically
    kps = np.zeros((1, 18, 2), np.float32)
    kps[0, :, 0] = 0.5
    kps[0, :, 1] = np.linspace(0.1, 0.9, 18)
    conf = np.ones((1, 18), np.float32)
    canvas = pose.render_openpose(jnp.asarray(kps), jnp.asarray(conf),
                                  64, 64)
    canvas = np.asarray(canvas)
    assert canvas.shape == (1, 64, 64, 3)
    assert canvas.max() > 0.5            # limbs drawn
    assert canvas[:, :, :20].max() == 0  # left margin empty


def test_render_respects_confidence():
    kps = np.random.RandomState(0).rand(1, 18, 2).astype(np.float32)
    conf = np.zeros((1, 18), np.float32)
    canvas = pose.render_openpose(jnp.asarray(kps), jnp.asarray(conf),
                                  32, 32)
    assert float(jnp.max(canvas)) == 0.0


def test_pose_task_engine():
    from gyre_tpu.generated import generation_pb2 as pb
    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.services.adjustments import apply_image_adjustment

    m = EngineManager(
        [{"id": "gen", "model": "preset/test", "default": True},
         {"id": "openpose", "task": "pose"}],
        compute_dtype=jnp.float32)
    adj = pb.ImageAdjustment()
    adj.openpose.SetInParent()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    out = apply_image_adjustment(img, [adj], m, None)
    assert out.shape == (1, 64, 64, 3)
