"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(jax.devices()[:8], tp=2)


def test_mesh_axes(mesh):
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_param_specs_pattern_rules(mesh):
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    sharded = pmesh.shard_params(ms.unet_params, mesh)
    blk = sharded["down"][0]["attns"][0]["blocks"][0]
    # q/k/v columns sharded over tp
    q_spec = blk["attn1"]["q"]["w"].sharding.spec
    assert q_spec == P(None, "tp")
    out_spec = blk["attn1"]["out"]["w"].sharding.spec
    assert out_spec == P("tp", None)
    ff1 = blk["ff1"]["w"].sharding.spec
    assert ff1 == P(None, "tp")
    # convs replicated
    conv_spec = sharded["conv_in"]["w"].sharding.spec
    assert conv_spec == P()


def test_sharded_generation_matches_unsharded(mesh):
    """The tp/dp-sharded pipeline must produce the same images as the
    single-device run (GSPMD only changes layout, not math)."""
    from gyre_tpu.pipeline.unified import UnifiedPipeline

    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    plain = UnifiedPipeline(ms, compute_dtype=jnp.float32)
    kw = dict(prompt="mesh test", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[1, 2, 3, 4], guidance_scale=7.5)
    ref = np.asarray(plain(**kw))

    ms2 = pmesh.shard_modelset(ms, mesh)
    sharded_pipe = UnifiedPipeline(ms2, compute_dtype=jnp.float32)
    out = np.asarray(sharded_pipe(**kw))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_indivisible_dims_fall_back_replicated(mesh):
    # a weight whose tp dim doesn't divide stays replicated, not an error
    params = {"attn1": {"q": {"w": jnp.ones((7, 5))}}}
    out = pmesh.shard_params(params, mesh)
    assert out["attn1"]["q"]["w"].sharding.spec == P()
