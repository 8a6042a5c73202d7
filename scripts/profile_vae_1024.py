"""Why is SDXL VAE decode at 1024^2 ~4 s? (bench round 4 / profile_sdxl_parts)

Times vae.decode at several latent sizes and the mid-block attention
alone (T=H*W, single head, d=512) to separate conv cost from attention
cost. One JSON line per probe.
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

from gyre_tpu.models import configs, vae as vae_mod
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.ops import attention as attn_ops

ms = random_modelset(configs.SDXL, seed=0, dtype=jnp.bfloat16,
                     engine_id="vae-prof")
cfg = ms.config.vae


def timeit(label, fn, *args, n=3):
    g = jax.jit(lambda *a: jnp.sum(jnp.asarray(fn(*a), jnp.float32)))
    np.asarray(g(*args))   # compile
    np.asarray(g(*args))   # axon warm-up execution
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"part": label, "s": round(dt, 4)}), flush=True)
    return dt


for L in (64, 96, 128):
    z = jax.random.normal(jax.random.PRNGKey(0), (1, L, L, 4), jnp.bfloat16)
    timeit(f"vae decode {L}x{L} latents",
           lambda p, zz: vae_mod.decode(p, cfg, zz), ms.vae_params, z)

# mid-block attention alone at the 1024^2 shape: [1, T=16384, 1, 512]
for T in (4096, 16384):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 1, 512), jnp.bfloat16)
    timeit(f"vae mid attention T={T} d=512 flash",
           lambda q: attn_ops.attention(q, q, q, impl="flash"), x)
    timeit(f"vae mid attention T={T} d=512 ref",
           lambda q: attn_ops.attention(q, q, q, impl="ref"), x)
