"""Fused GN+SiLU->conv3x3 Pallas kernel vs XLA chain, on the real chip.

Shapes: the VAE decoder's big tail convs and the UNet resnet levels —
the chains scripts/profile_gn.py identified as 5-traversal memory-bound.
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

from gyre_tpu.ops import fused_norm_conv as F

key = jax.random.PRNGKey(0)
BF = jnp.bfloat16


def timeit(fn, *args, n=10):
    # sum-to-scalar + host transfer: block_until_ready alone returns
    # early on the axon remote platform
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000


SHAPES = [
    # (B, H, W, C, Co, groups, th)   VAE decode tail + UNet levels
    (8, 512, 512, 128, 128, 32, 8),
    (8, 256, 256, 256, 256, 32, 8),
    (8, 256, 256, 512, 512, 32, 4),
    (8, 128, 128, 512, 512, 32, 8),
    (16, 64, 64, 320, 320, 32, 16),
    (16, 32, 32, 640, 640, 32, 16),
    (16, 16, 16, 1280, 1280, 32, 16),
]

for (B, H, W, C, Co, g, th) in SHAPES:
    if C % 128 or Co % 128:
        # 320/640 channels: matmul pads 320->384 lanes; still worth
        # measuring, bypass the gate
        pass
    x = jax.random.normal(key, (B, H, W, C), BF)
    sc = jnp.ones((C,), BF)
    bi = jnp.zeros((C,), BF)
    w = jax.random.normal(key, (3, 3, C, Co), BF) * 0.05
    cb = jnp.zeros((Co,), jnp.float32)

    ref_fn = jax.jit(functools.partial(
        F.gn_silu_conv3x3_reference, groups=g))
    fused_fn = functools.partial(F.gn_silu_conv3x3, groups=g, th=th)

    label = f"{B}x{H}x{W}x{C}->{Co}"
    try:
        t_ref = timeit(ref_fn, x, sc, bi, w, cb, n=8)
        t_fused = timeit(fused_fn, x, sc, bi, w, cb, n=8)
        d = jax.jit(lambda *a: jnp.max(jnp.abs(
            ref_fn(*a).astype(jnp.float32) -
            fused_fn(*a).astype(jnp.float32))))(x, sc, bi, w, cb)
        print(json.dumps({
            "shape": label, "xla_ms": round(t_ref, 3),
            "fused_ms": round(t_fused, 3),
            "speedup": round(t_ref / t_fused, 3),
            "maxdiff": float(d)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"shape": label, "error": str(e)[:300]}),
              flush=True)
