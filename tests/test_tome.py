"""Token merging (ToMe) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.ops import tome


def test_merge_unmerge_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 16))
    merged, info = tome.merge(x, r=16)
    assert merged.shape == (2, 64 - 16, 16)
    back = tome.unmerge(merged, info)
    assert back.shape == (2, 64, 16)
    assert np.isfinite(np.asarray(back)).all()


def test_identity_attention_roundtrip():
    """With identity attention, unmerged kept tokens return exactly; merged
    sources adopt their destination's (averaged) value."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 8))
    out = tome.tome_self_attention(lambda t: t, x, ratio=0.5)
    assert out.shape == x.shape
    # a large fraction of tokens should be exactly preserved
    exact = np.isclose(np.asarray(out), np.asarray(x), atol=1e-5)
    frac_exact = exact.all(axis=-1).mean()
    assert frac_exact > 0.4


def test_duplicate_tokens_merge_losslessly():
    """If sources equal their destinations exactly, merging is lossless
    under identity attention."""
    base = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8))
    x = jnp.repeat(base, 2, axis=1)  # pairs of identical tokens
    out = tome.tome_self_attention(lambda t: t, x, ratio=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_ratio_zero_noop():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 8))
    out = tome.tome_self_attention(lambda t: t * 2, x, ratio=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)
