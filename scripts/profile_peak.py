"""Calibrate the tunneled chip: dispatch overhead, matmul peak, conv peak,
and UNet step scaling with batch."""
import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)
BF = jnp.bfloat16


def timeit(fn, *args, n=20):
    def summed(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    g = jax.jit(summed)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000


def report(name, ms, flops=None):
    row = {"probe": name, "ms": round(ms, 3)}
    if flops:
        row["tflops_per_s"] = round(flops / (ms / 1000) / 1e12, 1)
    print(json.dumps(row), flush=True)


# dispatch overhead: trivial scalar op
s = jnp.float32(1.0)
report("overhead_scalar", timeit(lambda x: x + 1, s, n=50))

# matmul peak, bf16
for m in [4096, 8192]:
    a = jax.random.normal(key, (m, m), BF)
    b = jax.random.normal(key, (m, m), BF)
    fl = 2 * m * m * m
    report(f"matmul_{m}", timeit(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16),
        a, b), fl)

# matmul chain (amortizes dispatch): 8 matmuls
a = jax.random.normal(key, (8192, 8192), BF)
b = jax.random.normal(key, (8192, 8192), BF)


def chain(a, b):
    x = a
    for _ in range(8):
        x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
    return x


report("matmul_8192_x8", timeit(chain, a, b, n=5), 8 * 2 * 8192 ** 3)

# conv peak at UNet level-0 shape
from gyre_tpu.models import layers as L

x0 = jax.random.normal(key, (16, 64, 64, 320), BF)
cp = {"w": jax.random.normal(key, (3, 3, 320, 320), BF) * 0.02,
      "b": jnp.zeros((320,), BF)}


def conv_chain(p, x):
    for _ in range(8):
        x = L.conv2d(p, x)
    return x


report("conv3x3_lvl0_x8", timeit(conv_chain, cp, x0, n=5),
       8 * 2 * 16 * 64 * 64 * 9 * 320 * 320)

# UNet step at batch 32 (16 images CFG) for throughput scaling
from gyre_tpu.models import configs, unet as unet_mod
from gyre_tpu.models.modelset import random_modelset

ms = random_modelset(configs.SD15, seed=0, dtype=jnp.bfloat16,
                     engine_id="prof")
for B in (16, 32):
    x = jnp.zeros((B, 64, 64, 4), BF)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jnp.zeros((B, 77, 768), BF)
    msu = timeit(lambda p, x, t, c: unet_mod.apply(
        p, ms.config.unet, x, t, c), ms.unet_params, x, t, ctx, n=10)
    report(f"unet_step_b{B}", msu)
    print(json.dumps({"probe": f"img_per_s_b{B}",
                      "value": round((B / 2) / (20 * msu / 1000 +
                                                0.028 * (B / 2)), 3)}),
          flush=True)
