"""Prompt parsing / weighting / tokenization tests (no weights needed)."""

import pytest
import jax.numpy as jnp
import numpy as np

from gyre_tpu.pipeline import prompts as P
from gyre_tpu.pipeline.tokenizer import FallbackTokenizer


pytestmark = pytest.mark.smoke


def test_parse_attention_basic():
    assert P.parse_attention("a cat") == [("a cat", 1.0)]
    out = P.parse_attention("a (cat)")
    assert out == [("a ", 1.0), ("cat", 1.1)]
    out = P.parse_attention("a [cat]")
    assert abs(dict(out)["cat"] - 1 / 1.1) < 1e-9


def test_parse_attention_explicit_weight():
    out = P.parse_attention("a (cat:1.5) dog")
    d = dict(out)
    assert d["cat"] == 1.5
    out = P.parse_attention("(red:0.5) and (blue:2)")
    assert dict(out) == {"red": 0.5, " and ": 1.0, "blue": 2.0}


def test_parse_attention_nesting_and_escapes():
    out = dict(P.parse_attention("((cat))"))
    assert abs(out["cat"] - 1.21) < 1e-9
    out = P.parse_attention(r"\(literal\)")
    assert out == [("(literal)", 1.0)]
    # unbalanced parens still apply
    out = dict(P.parse_attention("(cat"))
    assert abs(out["cat"] - 1.1) < 1e-9


def test_tokenize_weighted_alignment():
    tok = FallbackTokenizer()
    prompt = P.WeightedPrompt.parse("hello (world:2.0)")
    ids, w, n = P.tokenize_weighted(tok, prompt)
    assert n == 1 and ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos
    n_hello = len(tok.encode("hello "))
    n_world = len(tok.encode("world"))
    assert (w[0, 1:1 + n_hello] == 1.0).all()
    assert (w[0, 1 + n_hello:1 + n_hello + n_world] == 2.0).all()
    assert ids[0, 1 + n_hello + n_world] == tok.eos


def test_long_prompt_chunks():
    tok = FallbackTokenizer()
    text = " ".join(f"word{i}" for i in range(120))
    prompt = P.WeightedPrompt.parse(text)
    n_tokens = len(tok.encode(text))
    expected = min(3, -(-n_tokens // 75))
    ids, w, n = P.tokenize_weighted(tok, prompt)
    assert n == expected > 1
    stitched = P.stitch_weights(w)
    assert stitched.shape == (n * 75 + 2,)


def test_stitch_and_weight_shapes():
    emb = jnp.ones((2, 77, 16))
    out = P.stitch_chunks(emb)
    assert out.shape == (152, 16)
    w = jnp.full((152,), 2.0)
    weighted = P.apply_weights(out, w)
    # mean restored: weighting by a constant is a no-op
    np.testing.assert_allclose(np.asarray(weighted), np.asarray(out),
                               rtol=1e-5)


def test_encode_weighted_prompt_end_to_end():
    tok = FallbackTokenizer()

    def encode_ids(ids):
        # fake encoder: embedding = id broadcast
        return jnp.asarray(ids)[:, :, None] * jnp.ones((1, 1, 8))

    prompt = P.WeightedPrompt.parse("a (big:1.3) test")
    emb = P.encode_weighted_prompt(encode_ids, tok, prompt)
    assert emb.shape == (77, 8)
    emb2 = P.encode_weighted_prompt(encode_ids, tok, prompt, pad_to_chunks=2)
    assert emb2.shape == (152, 8)


def test_batch_encode_matches_per_sample():
    """The coalesced-batch path (one tower dispatch for all merged
    prompts) must return exactly what per-sample encodes return."""
    tok = FallbackTokenizer()
    calls = []

    def encode_ids(ids):
        calls.append(np.asarray(ids).shape)
        return jnp.asarray(ids)[:, :, None] * jnp.ones((1, 1, 8))

    texts = ["a (big:1.3) test", "", "another prompt entirely",
             " ".join(f"w{i}" for i in range(120))]
    parsed = [P.WeightedPrompt.parse(t) for t in texts]
    chunks = max(P.tokenize_weighted(tok, p)[2] for p in parsed)
    singles = np.stack([np.asarray(P.encode_weighted_prompt(
        encode_ids, tok, p, pad_to_chunks=chunks)) for p in parsed])
    calls.clear()
    batched = np.asarray(P.encode_weighted_prompts_batch(
        encode_ids, tok, parsed, pad_to_chunks=chunks))
    assert len(calls) == 1 and calls[0] == (len(texts) * chunks, 77)
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-6)


def test_batch_encode_rejects_undersized_pad():
    tok = FallbackTokenizer()
    long = P.WeightedPrompt.parse(" ".join(f"w{i}" for i in range(120)))
    with pytest.raises(ValueError, match="chunk_count"):
        P.encode_weighted_prompts_batch(lambda i: jnp.zeros((1, 77, 8)),
                                        tok, [long], pad_to_chunks=1)
