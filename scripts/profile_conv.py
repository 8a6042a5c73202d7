"""Conv formulation shootout at UNet/VAE hot shapes (chained x8 to
amortize dispatch)."""
import os
import sys
import time
import json
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)
BF = jnp.bfloat16


def timeit(fn, *args, n=10):
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


def conv(w, x):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def chain(f, w, x, n=8):
    for _ in range(n):
        x = f(w, x)
    return x


# hot shapes: (B, HW, C)
SHAPES = [(16, 64, 320), (16, 32, 640), (16, 16, 1280),
          (8, 128, 512), (8, 512, 128)]
for (b, hw, c) in SHAPES:
    x = jax.random.normal(key, (b, hw, hw, c), BF)
    w = jax.random.normal(key, (3, 3, c, c), BF) * 0.02
    fl = 8 * 2 * b * hw * hw * 9 * c * c
    report(f"conv_{hw}x{c}_x8", timeit(functools.partial(chain, conv),
                                       w, x, n=5), fl)

# channel-padded variant for C=320 -> 384 (multiple of 128)
b, hw, c, cp = 16, 64, 320, 384
x = jax.random.normal(key, (b, hw, hw, cp), BF)
w = jax.random.normal(key, (3, 3, cp, cp), BF) * 0.02
fl = 8 * 2 * b * hw * hw * 9 * c * c  # useful flops only
report("conv_64x320pad384_x8", timeit(functools.partial(chain, conv),
                                      w, x, n=5), fl)

# matmul ceiling for the same K: [B*HW^2, C] @ [C, C] chain
x = jax.random.normal(key, (16 * 64 * 64, 320), BF)
w = jax.random.normal(key, (320, 320), BF) * 0.02
fl = 8 * 2 * x.shape[0] * 320 * 320
report("mm_65536x320_x8", timeit(functools.partial(
    chain, lambda w, x: jnp.dot(x, w, preferred_element_type=x.dtype)),
    w, x, n=5), fl)

# wide-K matmul ceiling (K=2880 = 9*320, the im2col K)
x = jax.random.normal(key, (16 * 64 * 64, 2880), BF)
w = jax.random.normal(key, (2880, 320), BF) * 0.02
fl = 5 * 2 * x.shape[0] * 2880 * 320


def chain_wide(w, x0):
    # can't chain (shape changes); repeat same matmul 5x on fresh reads
    outs = []
    for i in range(5):
        outs.append(jnp.dot(x0, w, preferred_element_type=x0.dtype))
    return sum(o.sum() for o in outs)


report("mm_65536x2880x320_x5", timeit(chain_wide, w, x, n=5), fl)

# conv as 9 shifted matmuls (single conv, fused in one jit)
def conv9(w, x):
    b, h, ww, c = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + ww, :].reshape(b * h * ww, c)
            y = jnp.dot(xs, w[dy, dx], preferred_element_type=x.dtype)
            acc = y if acc is None else acc + y
    return acc.reshape(b, h, ww, c)


x = jax.random.normal(key, (16, 64, 64, 320), BF)
w = jax.random.normal(key, (3, 3, 320, 320), BF) * 0.02
fl = 8 * 2 * 16 * 64 * 64 * 9 * 320 * 320
report("conv9shift_64x320_x8", timeit(functools.partial(chain, conv9),
                                      w, x, n=5), fl)
