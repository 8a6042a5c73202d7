"""Flash-vs-XLA dispatch boundary probes at the exact SDXL/SD shapes.

The round-4 sweep found XLA's fused attention collapses to ~8 TF/s at
(T=4096, d=64, b*h=40) — the SDXL-1024 level-1 shape — while the flash
kernel runs 3.7x faster there. This script measures both paths at every
self-attention shape in the SDXL/SD2/SD1.5 UNets (and batch variants)
to place FLASH_MIN_SEQ / the d>=64 dispatch rule on data.
One JSON line per probe."""
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


def timeit(fn, *args, n=20):
    def summed(*a):
        return jnp.sum(jnp.asarray(fn(*a), jnp.float32))

    g = jax.jit(summed)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000


# (T, heads, d, batch) — every self-attn shape in the serving UNets
SHAPES = [
    (4096, 10, 64, 2),    # SDXL 1024^2 level 1 (640ch), CFG b=2
    (4096, 10, 64, 8),    # same, batch 4 images
    (1024, 20, 64, 2),    # SDXL 1024^2 level 2 (1280ch) + mid
    (1024, 20, 64, 8),
    (2304, 10, 64, 2),    # SDXL 768^2 level 1
    (9216, 5, 64, 2),     # SD2 768^2 level 0
    (2304, 10, 64, 2),    # SD2 768^2 level 1
    (4096, 8, 40, 16),    # SD1.5 512^2 level 0, serving batch
    (1024, 8, 80, 16),    # SD1.5 512^2 level 1
]

seen = set()
for t, h, d, b in SHAPES:
    if (t, h, d, b) in seen:
        continue
    seen.add((t, h, d, b))
    q = jax.random.normal(key, (b, t, h, d), BF)
    fl = 4 * b * t * t * h * d
    for impl in ("flash", "ref"):
        try:
            ms = timeit(lambda x, i=impl: attn_ops.attention(x, x, x, impl=i),
                        q)
            print(json.dumps({
                "probe": f"{impl} T={t} h={h} d={d} b={b}",
                "ms": round(ms, 3),
                "tflops_per_s": round(fl / (ms / 1e3) / 1e12, 1)}),
                flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": f"{impl} T={t} h={h} d={d} b={b}",
                              "error": str(e)[:200]}), flush=True)


# cross-attention: Tq long, Tk=77 — dispatch must not send these to
# flash if XLA is better (the [Tq,77] logits tensor is tiny)
XSHAPES = [
    (4096, 77, 10, 64, 2),
    (9216, 77, 5, 64, 2),
    (16384, 77, 10, 64, 2),
    (4096, 77, 8, 40, 16),
]
for tq, tk, h, d, b in XSHAPES:
    q = jax.random.normal(key, (b, tq, h, d), BF)
    kv = jax.random.normal(key, (b, tk, h, d), BF)
    fl = 4 * b * tq * tk * h * d
    for impl in ("flash", "ref"):
        try:
            ms = timeit(lambda a, c, i=impl: attn_ops.attention(
                a, c, c, impl=i), q, kv)
            print(json.dumps({
                "probe": f"x-{impl} Tq={tq} Tk={tk} h={h} d={d} b={b}",
                "ms": round(ms, 3),
                "tflops_per_s": round(fl / (ms / 1e3) / 1e12, 1)}),
                flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": f"x-{impl} Tq={tq} h={h}",
                              "error": str(e)[:200]}), flush=True)
