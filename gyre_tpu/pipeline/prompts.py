"""Weighted / long prompt machinery.

Implements the A1111 prompt-attention dialect the reference supports
(reference gyre/pipeline/text_embedding/lpw_text_embedding.py:35-119):
`(word)` ×1.1, `[word]` ÷1.1, `(word:1.25)` explicit, `\\(` literals —
plus >77-token prompts via chunked re-encoding with bos/eos stitching
(reference :195-236) and per-token weighting with mean-norm restore
(reference :238-388). Token weighting happens on the embedding tensor, so
the whole thing stays a pure function of (ids, weights) and jits cleanly.

Prompt fragments may carry a clip_layer override (reference
gyre/pipeline/prompt_types.py) — fragments are grouped by layer and each
group is encoded with its own hidden-state selection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

CHUNK = 75  # tokens per window between bos/eos

_ATTN_RE = re.compile(r"""
\\\(|\\\)|\\\[|\\]|\\\\|\\|\(|\[|:\s*([+-]?[.\d]+)\s*\)|\)|]|[^\\()\[\]:]+|:
""", re.X)


def parse_attention(text: str) -> list[tuple[str, float]]:
    """Parse A1111 attention syntax into [(fragment, weight)]."""
    out: list[list] = []
    round_stack: list[int] = []
    square_stack: list[int] = []

    def multiply(start, mult):
        for item in out[start:]:
            item[1] *= mult

    for m in _ATTN_RE.finditer(text):
        tok = m.group(0)
        w = m.group(1)
        if tok.startswith("\\"):
            out.append([tok[1:], 1.0])
        elif tok == "(":
            round_stack.append(len(out))
        elif tok == "[":
            square_stack.append(len(out))
        elif w is not None and round_stack:
            multiply(round_stack.pop(), float(w))
        elif tok == ")" and round_stack:
            multiply(round_stack.pop(), 1.1)
        elif tok == "]" and square_stack:
            multiply(square_stack.pop(), 1.0 / 1.1)
        else:
            out.append([tok, 1.0])
    for pos in round_stack:
        multiply(pos, 1.1)
    for pos in square_stack:
        multiply(pos, 1.0 / 1.1)
    if not out:
        out = [["", 1.0]]
    # merge adjacent fragments with identical weight
    merged: list[list] = []
    for frag, weight in out:
        if merged and abs(merged[-1][1] - weight) < 1e-9:
            merged[-1][0] += frag
        else:
            merged.append([frag, weight])
    return [(f, w) for f, w in merged]


@dataclass(frozen=True)
class Fragment:
    text: str
    weight: float = 1.0
    clip_layer: int = 0  # 0 = engine default; -1 final; -2 penultimate...


@dataclass(frozen=True)
class WeightedPrompt:
    """One prompt: weighted fragments (the proto's repeated Prompt entries
    with PromptParameters.weight collapse into this)."""

    fragments: tuple[Fragment, ...]

    @classmethod
    def parse(cls, text: str, base_weight: float = 1.0, clip_layer: int = 0):
        frags = tuple(
            Fragment(t, w * base_weight, clip_layer)
            for t, w in parse_attention(text))
        return cls(frags)


def tokenize_weighted(tokenizer, prompt: WeightedPrompt,
                      max_chunks: int = 3) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (ids [n_chunks, 77], weights [n_chunks, 77], n_chunks).

    Fragments are tokenized individually so weights align exactly with
    their tokens; chunks are padded with the tokenizer's pad token at
    weight 1.
    """
    ids: list[int] = []
    weights: list[float] = []
    for frag in prompt.fragments:
        t = tokenizer.encode(frag.text)
        ids.extend(t)
        weights.extend([frag.weight] * len(t))
    ids = ids[:CHUNK * max_chunks]
    weights = weights[:CHUNK * max_chunks]
    n_chunks = max(1, -(-len(ids) // CHUNK))
    out_ids = np.full((n_chunks, CHUNK + 2), tokenizer.pad, np.int32)
    out_w = np.ones((n_chunks, CHUNK + 2), np.float32)
    out_ids[:, 0] = tokenizer.bos
    for c in range(n_chunks):
        seg = ids[c * CHUNK:(c + 1) * CHUNK]
        out_ids[c, 1:1 + len(seg)] = seg
        out_ids[c, 1 + len(seg)] = tokenizer.eos
        out_w[c, 1:1 + len(seg)] = weights[c * CHUNK:(c + 1) * CHUNK]
    return out_ids, out_w, n_chunks


def stitch_chunks(chunk_embeddings: jnp.ndarray) -> jnp.ndarray:
    """[n_chunks, 77, D] -> [n_chunks*75 + 2, D]: keep the first chunk's
    bos and the last chunk's eos, drop the stitching tokens between."""
    n, t, d = chunk_embeddings.shape
    middle = chunk_embeddings[:, 1:-1].reshape(n * (t - 2), d)
    return jnp.concatenate(
        [chunk_embeddings[0, :1], middle, chunk_embeddings[-1, -1:]], axis=0)


def apply_weights(emb: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """emb [T, D] * weights [T], restoring the pre-weighting mean so CFG
    magnitude stays calibrated (reference lpw mean-norm restore)."""
    prev_mean = jnp.mean(jnp.abs(emb).astype(jnp.float32))
    emb = emb * weights[:, None].astype(emb.dtype)
    new_mean = jnp.mean(jnp.abs(emb).astype(jnp.float32))
    return emb * (prev_mean / jnp.maximum(new_mean, 1e-8)).astype(emb.dtype)


def stitch_weights(weights: np.ndarray) -> np.ndarray:
    """[n_chunks, 77] -> [n_chunks*75+2] aligned with stitch_chunks."""
    n, t = weights.shape
    return np.concatenate(
        [weights[0, :1], weights[:, 1:-1].reshape(-1), weights[-1, -1:]])


def encode_weighted_prompt(encode_ids, tokenizer, prompt: WeightedPrompt,
                           max_chunks: int = 3, pad_to_chunks: int = 0):
    """Full path: parse -> tokenize -> chunked encode -> stitch -> weight.

    encode_ids: callable [n,77] int32 -> [n,77,D] (CLIP tower w/ layer pick).
    pad_to_chunks: force a chunk count (batch/jit shape bucketing).
    Returns [T, D] with T = chunks*75 + 2.
    """
    ids, w, n = tokenize_weighted(tokenizer, prompt, max_chunks)
    if pad_to_chunks and pad_to_chunks > n:
        extra = pad_to_chunks - n
        pad_ids = np.full((extra, CHUNK + 2), tokenizer.pad, np.int32)
        pad_ids[:, 0] = tokenizer.bos
        pad_ids[:, 1] = tokenizer.eos
        ids = np.concatenate([ids, pad_ids])
        w = np.concatenate([w, np.ones((extra, CHUNK + 2), np.float32)])
    emb = encode_ids(jnp.asarray(ids))
    emb = stitch_chunks(emb)
    return apply_weights(emb, jnp.asarray(stitch_weights(w)))
