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


def _pad_chunks(tokenizer, ids: np.ndarray, w: np.ndarray,
                to_chunks: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad (ids, weights) with empty bos/eos chunks up to `to_chunks`."""
    extra = to_chunks - ids.shape[0]
    if extra <= 0:
        return ids, w
    pad_ids = np.full((extra, CHUNK + 2), tokenizer.pad, np.int32)
    pad_ids[:, 0] = tokenizer.bos
    pad_ids[:, 1] = tokenizer.eos
    return (np.concatenate([ids, pad_ids]),
            np.concatenate([w, np.ones((extra, CHUNK + 2), np.float32)]))


def encode_weighted_prompt(encode_ids, tokenizer, prompt: WeightedPrompt,
                           max_chunks: int = 3, pad_to_chunks: int = 0):
    """Full path: parse -> tokenize -> chunked encode -> stitch -> weight.

    encode_ids: callable [n,77] int32 -> [n,77,D] (CLIP tower w/ layer pick).
    pad_to_chunks: force a chunk count (batch/jit shape bucketing).
    Returns [T, D] with T = chunks*75 + 2.
    """
    ids, w, n = tokenize_weighted(tokenizer, prompt, max_chunks)
    if pad_to_chunks:
        ids, w = _pad_chunks(tokenizer, ids, w, pad_to_chunks)
    emb = encode_ids(jnp.asarray(ids))
    emb = stitch_chunks(emb)
    return apply_weights(emb, jnp.asarray(stitch_weights(w)))


def encode_weighted_prompts_batch(encode_ids, tokenizer,
                                  prompt_list, pad_to_chunks: int = 1,
                                  max_chunks: int = 3) -> jnp.ndarray:
    """Batch variant of encode_weighted_prompt: every prompt padded to
    the same chunk count and encoded through ONE tower dispatch.

    The request coalescer merges up to max_batch requests with distinct
    prompts+negatives into one device batch; encoding each separately is
    2B small CLIP programs on the serving path (per-dispatch tunnel
    latency dominates their device time). The CLIP tower is
    batch-independent (per-token layernorm, per-row causal attention),
    so one [B*chunks, 77] call with vectorized stitch/weighting returns
    exactly the per-sample results. Returns [B, T, D], T = chunks*75+2.
    """
    chunks = max(int(pad_to_chunks), 1)
    ids_l, w_l = [], []
    for p in prompt_list:
        ids, w, n = tokenize_weighted(tokenizer, p, max_chunks)
        if n > chunks:
            raise ValueError(f"prompt needs {n} chunks > pad_to_chunks="
                             f"{chunks}; compute chunk_count over the "
                             f"whole batch first")
        ids, w = _pad_chunks(tokenizer, ids, w, chunks)
        ids_l.append(ids)
        w_l.append(stitch_weights(w))
    b = len(prompt_list)
    emb = encode_ids(jnp.asarray(np.concatenate(ids_l)))  # [b*chunks,77,D]
    d = emb.shape[-1]
    emb = emb.reshape(b, chunks, CHUNK + 2, d)
    middle = emb[:, :, 1:-1].reshape(b, chunks * CHUNK, d)
    stitched = jnp.concatenate([emb[:, 0, :1], middle, emb[:, -1, -1:]],
                               axis=1)                    # [b, T, D]
    w = jnp.asarray(np.stack(w_l))                        # [b, T]
    prev = jnp.mean(jnp.abs(stitched).astype(jnp.float32), axis=(1, 2),
                    keepdims=True)
    out = stitched * w[:, :, None].astype(stitched.dtype)
    new = jnp.mean(jnp.abs(out).astype(jnp.float32), axis=(1, 2),
                   keepdims=True)
    return out * (prev / jnp.maximum(new, 1e-8)).astype(out.dtype)
