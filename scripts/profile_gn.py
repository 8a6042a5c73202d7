"""GroupNorm formulation shootout + VAE attention flash check, on TPU."""
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

from gyre_tpu.models import layers as L
from gyre_tpu.ops import attention as attn_ops

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


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 3)}), flush=True)


def gn_current(p, x, groups=32, eps=1e-6):
    return L.silu(L.group_norm(p, x, groups, eps=eps))


def gn_lanefriendly(p, x, groups=32, eps=1e-6):
    """Channel-sum first ([B,C], lane-preserving), then group-reduce the
    tiny array; single fused apply pass."""
    b = x.shape[0]
    c = x.shape[-1]
    n_sp = x.size // (b * c)
    s1 = jnp.sum(x, axis=(1, 2), dtype=jnp.float32)          # [B, C]
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
    g1 = s1.reshape(b, groups, c // groups).sum(-1)
    g2 = s2.reshape(b, groups, c // groups).sum(-1)
    cnt = n_sp * (c // groups)
    mean_g = g1 / cnt
    var_g = g2 / cnt - mean_g * mean_g
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=-1)         # [B, C]
    inv_c = jnp.repeat(inv_g, c // groups, axis=-1)
    scale = inv_c * p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32) - mean_c * scale
    y = x.astype(jnp.float32) * scale[:, None, None, :] + \
        bias[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


# raw HBM bandwidth reference: elementwise copy+1 at the big VAE shape
xbw = jax.random.normal(key, (8, 512, 512, 128), BF)
bw_ms = timeit(jax.jit(lambda x: x + 1.0), xbw, n=10)
print(json.dumps({"probe": "bw_copy_537MBx2", "ms": round(bw_ms, 3),
                  "gb_per_s": round(2 * xbw.nbytes / 1e9 / (bw_ms / 1e3),
                                    1)}), flush=True)

shapes = [((8, 512, 512, 128), 32), ((8, 256, 256, 256), 32),
          ((16, 64, 64, 320), 32), ((8, 64, 64, 512), 32)]
for shape, g in shapes:
    x = jax.random.normal(key, shape, BF)
    p = {"scale": jnp.ones((shape[-1],), BF),
         "bias": jnp.zeros((shape[-1],), BF)}
    cur = timeit(jax.jit(functools.partial(gn_current, groups=g)), p, x,
                 n=8)
    lane = timeit(jax.jit(functools.partial(gn_lanefriendly, groups=g)),
                  p, x, n=8)
    report(f"gn_cur_{shape[1]}x{shape[-1]}", cur)
    report(f"gn_lane_{shape[1]}x{shape[-1]}", lane)
    # numerics check vs current (jitted: eager ops crawl over the tunnel)
    diff = jax.jit(lambda p, x: jnp.max(jnp.abs(
        gn_current(p, x, g).astype(jnp.float32) -
        gn_lanefriendly(p, x, g).astype(jnp.float32))))(p, x)
    print(json.dumps({"probe": f"gn_maxdiff_{shape[1]}x{shape[-1]}",
                      "maxdiff": float(diff)}), flush=True)

# VAE attention: single head d=512, T=4096 — flash vs xla
q = jax.random.normal(key, (8, 4096, 1, 512), BF)
report("vae_attn_xla", timeit(jax.jit(
    functools.partial(attn_ops.attention, impl="ref")), q, q, q, n=8))
report("vae_attn_flash", timeit(jax.jit(
    functools.partial(attn_ops.attention, impl="flash")), q, q, q, n=8))
