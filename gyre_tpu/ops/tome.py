"""Token merging (ToMe) for SD transformer blocks, static-shape TPU form.

The reference patches tome-sd onto the unet (gyre/nonfree/tome_patcher.py,
used at gyre/pipeline/unified_pipeline.py:1580-1588) — torch gathers with
data-dependent shapes. TPU variant: a FIXED merge count r (static shapes),
bipartite soft matching between a strided destination grid and the
remaining source tokens, mean-merge of the top-r most similar sources, and
exact unmerge after self-attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bipartite_sets(n: int, stride: int = 2):
    """dst = every `stride`-th token (grid anchors), src = the rest."""
    idx = jnp.arange(n)
    dst_mask = (idx % stride) == 0
    dst_idx = jnp.where(dst_mask, size=(n + stride - 1) // stride)[0]
    src_idx = jnp.where(~dst_mask, size=n - (n + stride - 1) // stride)[0]
    return dst_idx, src_idx


def merge(x: jax.Array, r: int, stride: int = 2):
    """x [B,N,C] -> (merged [B, N-r, C], info for unmerge).

    The r source tokens most similar to their best destination are
    averaged into it; the remaining tokens pass through.
    """
    b, n, c = x.shape
    dst_idx, src_idx = _bipartite_sets(n, stride)
    n_dst, n_src = dst_idx.shape[0], src_idx.shape[0]
    r = min(r, n_src - 1)

    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    dst = jnp.take(xn, dst_idx, axis=1)            # [B, n_dst, C]
    src = jnp.take(xn, src_idx, axis=1)            # [B, n_src, C]
    sim = jnp.einsum("bsc,bdc->bsd", src, dst)     # [B, n_src, n_dst]
    best_dst = jnp.argmax(sim, axis=-1)            # [B, n_src]
    best_sim = jnp.max(sim, axis=-1)
    # top-r sources to merge
    _, merge_rank = jax.lax.top_k(best_sim, r)     # [B, r] src positions
    merged_mask = jnp.zeros((b, n_src), bool)
    merged_mask = jax.vmap(lambda m, idx: m.at[idx].set(True))(
        merged_mask, merge_rank)

    src_vals = jnp.take(x, src_idx, axis=1)
    dst_vals = jnp.take(x, dst_idx, axis=1)

    # scatter-mean merged sources into their destinations
    weights = merged_mask.astype(x.dtype)

    def scatter(dstv, srcv, bd, w):
        add = jax.ops.segment_sum(srcv * w[:, None], bd, num_segments=n_dst)
        cnt = jax.ops.segment_sum(w, bd, num_segments=n_dst)
        return (dstv + add) / (1.0 + cnt[:, None])

    new_dst = jax.vmap(scatter)(dst_vals, src_vals, best_dst, weights)

    # kept sources: compact the unmerged ones to the front (stable order)
    keep_rank = jnp.argsort(merged_mask, axis=-1, stable=True)  # False first
    keep_idx = keep_rank[:, : n_src - r]                        # [B, n_src-r]
    kept_src = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(src_vals,
                                                             keep_idx)
    merged = jnp.concatenate([new_dst, kept_src], axis=1)
    info = {"n": n, "dst_idx": dst_idx, "src_idx": src_idx,
            "best_dst": best_dst, "merged_mask": merged_mask,
            "keep_idx": keep_idx}
    return merged, info


def unmerge(out: jax.Array, info) -> jax.Array:
    """[B, N-r, C] -> [B, N, C]: merged sources copy their destination's
    output; kept tokens scatter back to their original positions."""
    n = info["n"]
    dst_idx, src_idx = info["dst_idx"], info["src_idx"]
    n_dst = dst_idx.shape[0]
    dst_out = out[:, :n_dst]
    kept_out = out[:, n_dst:]

    def restore(d, k, bd, mm, ki):
        full_src = jnp.take(d, bd, axis=0)          # merged src <- dst out
        # place kept outputs at their src positions
        full_src = full_src.at[ki].set(
            jnp.where(mm[ki][:, None], full_src[ki], k))
        canvas = jnp.zeros((n, d.shape[-1]), d.dtype)
        canvas = canvas.at[dst_idx].set(d)
        canvas = canvas.at[src_idx].set(full_src)
        return canvas

    return jax.vmap(restore)(dst_out, kept_out, info["best_dst"],
                             info["merged_mask"], info["keep_idx"])


def tome_self_attention(attn_fn, x: jax.Array, ratio: float,
                        stride: int = 2) -> jax.Array:
    """Run attn_fn(tokens)->tokens on a ToMe-reduced token set.

    ratio: fraction of source tokens to merge (0 disables)."""
    if ratio <= 0:
        return attn_fn(x)
    n = x.shape[1]
    n_src = n - (n + stride - 1) // stride
    r = int(n_src * min(ratio, 0.9))
    if r < 1:
        return attn_fn(x)
    merged, info = merge(x, r, stride)
    out = attn_fn(merged)
    return unmerge(out, info)
