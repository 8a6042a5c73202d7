"""Model mixing tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.manager.mixing import add_difference, mix_trees
from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset


def test_weighted_sum_leaves():
    a = {"w": jnp.ones((2, 2)), "nested": [{"x": jnp.zeros(3)}]}
    b = {"w": jnp.zeros((2, 2)), "nested": [{"x": jnp.ones(3)}]}
    out = mix_trees(a, b, 0.25)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.75)
    np.testing.assert_allclose(np.asarray(out["nested"][0]["x"]), 0.25)


def test_inpaint_channel_mismatch():
    """9ch conv_in (HWIO in-dim 9) mixes only the shared 4 channels."""
    a = {"w": jnp.ones((3, 3, 9, 8))}
    b = {"w": jnp.zeros((3, 3, 4, 8))}
    out = mix_trees(a, b, 0.5)
    np.testing.assert_allclose(np.asarray(out["w"][:, :, :4]), 0.5)
    np.testing.assert_allclose(np.asarray(out["w"][:, :, 4:]), 1.0)


def test_add_difference():
    base = {"w": jnp.full((2,), 1.0)}
    x = {"w": jnp.full((2,), 3.0)}
    y = {"w": jnp.full((2,), 2.0)}
    out = add_difference(base, x, y, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0)


def test_sigmoid_weights_monotonic():
    a = {"w": jnp.zeros(4)}
    b = {"w": jnp.ones(4)}
    vals = [float(mix_trees(a, b, al, "sigmoid")["w"][0])
            for al in (0.1, 0.5, 0.9)]
    assert vals[0] < vals[1] < vals[2]
    assert abs(vals[1] - 0.5) < 1e-6


def test_submodel_references_share_params():
    """'@engine' submodel refs reuse (not copy) another engine's parts."""
    m = EngineManager(
        [{"id": "base", "model": {"preset": "test", "seed": 0}},
         {"id": "variant", "default": True,
          "model": {"preset": "test", "seed": 5, "vae": "@base",
                    "text_encoder": "@base"}}],
        compute_dtype=jnp.float32)
    base = m.modelset("base")
    var = m.modelset("variant")
    # vae/text shared by identity; unet independent
    leaf_a = base.vae_params["encoder"]["conv_in"]["w"]
    leaf_b = var.vae_params["encoder"]["conv_in"]["w"]
    assert leaf_a is leaf_b
    assert var.text_params[0]["token_embedding"] is \
        base.text_params[0]["token_embedding"]
    assert not np.allclose(
        np.asarray(var.unet_params["conv_in"]["w"]),
        np.asarray(base.unet_params["conv_in"]["w"]))
    # variant generates fine
    img = m.pipeline("variant")(prompt="x", height=64, width=64, steps=2,
                                sampler="k_euler", seeds=[1])
    assert np.isfinite(np.asarray(img)).all()


def test_mixed_engine_in_manager():
    m = EngineManager(
        [{"id": "m1", "model": {"preset": "test", "seed": 0}},
         {"id": "m2", "model": {"preset": "test", "seed": 9}},
         {"id": "mixed", "default": True,
          "model": {"mix": [{"source": "m1", "weight": 0.5},
                            {"source": "m2", "weight": 0.5}],
                    "algorithm": "weighted_sum"}}],
        compute_dtype=jnp.float32)
    ms = m.modelset("mixed")
    w_mixed = np.asarray(ms.unet_params["conv_in"]["w"], np.float32)
    w1 = np.asarray(m.modelset("m1").unet_params["conv_in"]["w"], np.float32)
    w2 = np.asarray(m.modelset("m2").unet_params["conv_in"]["w"], np.float32)
    np.testing.assert_allclose(w_mixed, (w1 + w2) / 2, atol=1e-6)
    # mixed engine generates
    img = m.pipeline("mixed")(prompt="x", height=64, width=64, steps=2,
                              sampler="k_euler", seeds=[1])
    assert np.isfinite(np.asarray(img)).all()