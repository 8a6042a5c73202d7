"""Flash attention kernel vs reference implementation (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.ops import attention as A


def _make(b, h, tq, tk, d, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, tq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, tk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, tk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("tq,tk,d", [
    (128, 128, 64),
    (256, 256, 40),    # SD1 head_dim 40: lane padding path
    (384, 128, 64),    # cross-attention shape (kv shorter)
    (130, 256, 64),    # ragged q: q-padding path
])
def test_flash_matches_reference(tq, tk, d):
    q, k, v = _make(2, 3, tq, tk, d)
    scale = 1.0 / np.sqrt(d)
    ref = A._ref_attention(q, k, v, scale)
    out = A.flash_attention_bhtd(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    q, k, v = _make(1, 2, 256, 256, 64, dtype=jnp.bfloat16)
    scale = 1.0 / 8.0
    ref = A._ref_attention(q, k, v, scale)
    out = A.flash_attention_bhtd(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_attention_wrapper_layout():
    """[B,T,H,D] wrapper agrees with einsum path."""
    b, t, h, d = 2, 128, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, t, h, d))
    v = jax.random.normal(ks[2], (b, t, h, d))
    ref = A.attention(q, k, v, impl="ref")
    out = A.attention(q, k, v, impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_grad_matches_reference():
    """jax.grad through the flash path (CLIP guidance differentiates the
    whole denoiser) — the custom_vjp's chunked backward must agree with
    autodiff of the einsum reference. tq=160 exercises q-block padding
    in the grad path too."""
    q, k, v = _make(1, 2, 160, 128, 32)
    scale = 1.0 / np.sqrt(32)

    def loss(attn):
        def f(q, k, v):
            out = attn(q, k, v, scale).astype(jnp.float32)
            return jnp.sum(jnp.sin(out))
        return f

    gf = jax.grad(loss(A.flash_attention_bhtd), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(A._ref_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_chunked_matches_reference():
    q, k, v = _make(2, 2, 200, 131, 64, seed=3)
    scale = 0.125
    out = A.chunked_attention_bhtd(q, k, v, scale, block_q=64)
    ref = A._ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attention_wrapper_grad():
    """grad through the [B,T,H,D] wrapper with impl=flash (the UNet's
    layout) works and matches the ref impl."""
    b, t, h, d = 1, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(kk, (b, t, h, d)) for kk in ks)

    def f(impl):
        return lambda q: jnp.sum(
            jnp.cos(A.attention(q, k, v, impl=impl).astype(jnp.float32)))

    gf = jax.grad(f("flash"))(q)
    gr = jax.grad(f("ref"))(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)


def test_ragged_kv_masked_correctly():
    """KV lengths that don't divide the block (77 = CLIP context) are
    zero-padded and masked with -inf logits."""
    q, k, v = _make(1, 2, 128, 77, 64)
    scale = 0.125
    ref = A._ref_attention(q, k, v, scale)
    out = A.flash_attention_bhtd(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
