"""Attention profile at SD2-768 / SDXL-1024 serving shapes on TPU.

VERDICT r3 #2: the flash kernel is exp-bound at T=16384/d=64
(SDXL-1024 level 0) — ~2.35 s/step end to end. This script times the
kernel (and the XLA reference where it doesn't OOM) at exactly those
shapes so the exp2/log2-domain softmax + larger-q-block changes can be
measured as a before/after on the real chip. One JSON line per probe.

Run: python scripts/profile_attn_sdxl.py  (on the tunneled TPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gyre_tpu.ops import attention as attn_ops

BF = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timeit(fn, *args, n=10):
    # scalar-reduction sync (axon: block_until_ready unreliable,
    # full-output transfer swamps compute)
    def summed(*a):
        return jnp.sum(jnp.asarray(fn(*a), jnp.float32))

    g = jax.jit(summed)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000


def report(name, ms, flops):
    print(json.dumps({"probe": name, "ms": round(ms, 3),
                      "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 1)}),
          flush=True)


# (T, heads, d, batch): SDXL-1024 level0/level1 self-attn (d=64),
# SD2-768 level0 (d=40 T=9216) — the shapes where flash dispatches
SHAPES = [
    (16384, 10, 64, 2),   # SDXL 1024^2 level 0, CFG batch 2
    (4096, 20, 64, 2),    # SDXL 1024^2 level 1
    (9216, 5, 64, 2),     # SD2 768^2 level 0 (64-wide heads at 320ch)
    (4096, 8, 40, 16),    # SD1.5 512^2 level 0, serving batch
]

for t, h, d, b in SHAPES:
    q = jax.random.normal(key, (b, t, h, d), BF)
    fl = 4 * b * t * t * h * d
    ms = timeit(lambda q: attn_ops.attention(q, q, q, impl="flash"), q)
    report(f"flash T={t} h={h} d={d} b={b}", ms, fl)
    if t * t * b * h * 4 < 16e9:  # XLA ref would OOM above ~16 GB logits
        ms = timeit(lambda q: attn_ops.attention(q, q, q, impl="ref"), q)
        report(f"xla-ref T={t} h={h} d={d} b={b}", ms, fl)
