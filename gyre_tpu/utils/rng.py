"""Batch-independent random number generation.

The reference guarantees that generation results depend only on each sample's
seed, never on how samples are packed into batches (one torch generator per
batch row, reference gyre/pipeline/randtools.py:11-64 and the batch
independence test tests/batch_independance.py). On TPU that contract is
natural: derive one JAX key per sample from its seed, and vmap sampling over
the per-sample key axis. Every noise draw in the pipeline flows from these
helpers; nothing may call jax.random with a shared batch-level key.

Streams are namespaced with fold_in(hash(name)) so e.g. the initial-latent
noise, sampler churn noise at step k, and brownian noise never collide.
"""

from __future__ import annotations

import zlib
from functools import partial

import jax
import jax.numpy as jnp


def key_for_seed(seed) -> jax.Array:
    """One root key per sample seed. Accepts python int or int array."""
    return jax.random.PRNGKey(jnp.asarray(seed, dtype=jnp.uint32))


def keys_for_seeds(seeds) -> jax.Array:
    """[B] seeds -> [B, 2] keys (vmapped PRNGKey)."""
    seeds = jnp.asarray(seeds, dtype=jnp.uint32)
    return jax.vmap(jax.random.PRNGKey)(seeds)


def stream(key: jax.Array, name: str) -> jax.Array:
    """Derive a named substream, stable across runs/processes."""
    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)


def step_key(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)


@partial(jax.jit, static_argnames=("shape", "dtype"))
def batched_normal(keys: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Per-sample gaussian noise: keys [B,2] -> [B, *shape].

    Row i depends only on keys[i], so packing is irrelevant — the TPU-native
    equivalent of the reference's per-row torch generators
    (gyre/pipeline/randtools.py:39).
    """
    return jax.vmap(lambda k: jax.random.normal(k, shape, dtype))(keys)


@partial(jax.jit, static_argnames=("shape", "dtype"))
def batched_uniform(keys: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jax.vmap(lambda k: jax.random.uniform(k, shape, dtype))(keys)


def batched_stream_normal(keys, name, step, shape, dtype=jnp.float32):
    """Noise for stream `name` at step `step`, per sample."""
    sub = jax.vmap(lambda k: step_key(stream(k, name), step))(keys)
    return batched_normal(sub, shape, dtype)
