"""Attention profile at SD2-768 / SDXL-1024 serving shapes on TPU.

VERDICT r3 #2: the flash kernel is exp-bound at T=16384/d=64
(SDXL-1024 level 0). This script (a) sweeps the kernel's block/exp
knobs at exactly that shape, (b) times the chosen default at every
shape where flash dispatches, (c) checks numerics of each variant
against the f32 baseline kernel. One JSON line per probe.

Run: python scripts/profile_attn_sdxl.py  (on the tunneled TPU)
"""
import functools
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


def report(name, ms, flops, **kw):
    print(json.dumps({"probe": name, "ms": round(ms, 3),
                      "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 1),
                      **kw}), flush=True)


def flash(q, **kw):
    d = q.shape[-1]
    qt = jnp.swapaxes(q, 1, 2)
    out = attn_ops.flash_attention_bhtd(qt, qt, qt, 1.0 / d**0.5, **kw)
    return jnp.swapaxes(out, 1, 2)


# --- sweep at the SDXL-1024 level-0 shape (T=16384, h=10, d=64, CFG b=2)
t, h, d, b = 16384, 10, 64, 2
q = jax.random.normal(key, (b, t, h, d), BF)
fl = 4 * b * t * t * h * d

base = np.asarray(flash(q), np.float32)
SWEEP = [
    dict(block_q=512, block_k=1024),               # round-2 layout
    dict(block_q=1024, block_k=512),               # big q, small score tile
    dict(block_q=1024, block_k=1024, kv_budget=2 * 2**20),
    dict(block_q=512, block_k=512),
    dict(block_q=1024, block_k=512, exp_bf16=True),
    dict(block_q=512, block_k=1024, exp_bf16=True),
]
for kw in SWEEP:
    try:
        out = np.asarray(flash(q, **kw), np.float32)
        err = float(np.max(np.abs(out - base)))
        ms = timeit(functools.partial(flash, **kw), q)
        report(f"sweep T={t} {kw}", ms, fl, max_abs_err=round(err, 5))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": f"sweep T={t} {kw}",
                          "error": str(e)[:200]}), flush=True)

# --- default kernel at every shape where flash dispatches
# (T, heads, d, batch): SDXL-1024 level0/level1 self-attn (d=64),
# SD2-768 level0 (d=64 T=9216), SD1.5 512^2 level 0 (d=40, XLA territory)
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
