"""Request-coalescing dispatcher tests: merged batches must be
sample-for-sample identical to solo runs (batch independence makes
coalescing lossless)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.manager.scheduler import CoalescingDispatcher, Job
from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline.unified import UnifiedPipeline


@pytest.fixture(scope="module")
def pipe():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    return UnifiedPipeline(ms, compute_dtype=jnp.float32)


KW = dict(height=64, width=64, steps=2, sampler="k_euler")


def test_coalesce_key_rules(pipe):
    a = Job(pipe, dict(KW, prompt="x", seeds=[1], guidance_scale=7.5))
    b = Job(pipe, dict(KW, prompt="y", seeds=[2], guidance_scale=9.0))
    assert a.coalesce_key() == b.coalesce_key() is not None
    c = Job(pipe, dict(KW, prompt="x", seeds=[1], steps=3))
    assert c.coalesce_key() != a.coalesce_key()
    d = Job(pipe, dict(KW, prompt="x", seeds=[1],
                       init_image=np.zeros((1, 64, 64, 3), np.float32)))
    assert d.coalesce_key() is None


def test_concurrent_requests_coalesce_and_match_solo(pipe):
    dispatcher = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    reqs = [dict(KW, prompt=f"prompt {i}", seeds=[100 + i],
                 guidance_scale=5.0 + i) for i in range(3)]
    solo = [np.asarray(pipe(**r)) for r in reqs]

    futures = [dispatcher.submit(pipe, r) for r in reqs]
    merged = [np.asarray(f.result(timeout=300)) for f in futures]
    dispatcher.stop()
    for s, m in zip(solo, merged):
        assert m.shape == s.shape
        # merged batch runs at a different batch shape; float-tolerance
        np.testing.assert_allclose(m, s, atol=0.03)


def test_per_sample_guidance_matches_scalar(pipe):
    a = np.asarray(pipe(prompt=["a cat", "a cat"], seeds=[1, 2],
                        guidance_scale=[7.5, 7.5], **KW))
    b = np.asarray(pipe(prompt="a cat", seeds=[1, 2], guidance_scale=7.5,
                        **KW))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mixed_prompts_per_row(pipe):
    out = np.asarray(pipe(prompt=["a cat", "a dog"], seeds=[1, 1],
                          guidance_scale=[7.5, 7.5], **KW))
    # same seed, different prompt -> different images
    assert np.abs(out[0] - out[1]).max() > 1e-4
