"""Time one UNet denoise step at the bench shape (batch 16 = 8 images CFG).
Fast iteration loop for kernel/fusion work. Prints ms + TFLOP/s."""
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

from gyre_tpu.models import configs, unet as unet_mod
from gyre_tpu.models.modelset import random_modelset

ms = random_modelset(configs.SD15, seed=0, dtype=jnp.bfloat16,
                     engine_id="prof")
cfg = ms.config
B = 16
x = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
t = jnp.full((B,), 500.0, jnp.float32)
ctx = jnp.zeros((B, 77, 768), jnp.bfloat16)

f = jax.jit(lambda p, x, t, c: jnp.sum(
    unet_mod.apply(p, cfg.unet, x, t, c).astype(jnp.float32)))
t0 = time.perf_counter()
np.asarray(f(ms.unet_params, x, t, ctx))
compile_s = time.perf_counter() - t0

n = 20
t0 = time.perf_counter()
for _ in range(n):
    out = f(ms.unet_params, x, t, ctx)
np.asarray(out)
ms_step = (time.perf_counter() - t0) / n * 1000

low = jax.jit(lambda p, x, t, c: unet_mod.apply(
    p, cfg.unet, x, t, c)).lower(ms.unet_params, x, t, ctx)
ca = low.compile().cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
flops = ca.get("flops", 0.0)
print(json.dumps({
    "unet_step_ms": round(ms_step, 2),
    "tflops_per_s": round(flops / (ms_step / 1000) / 1e12, 1),
    "mfu_pct_v5e": round(flops / (ms_step / 1000) / 197e12 * 100, 1),
    "compile_s": round(compile_s, 1),
    "denoise20_plus_vae_est_img_s": round(
        8 / (20 * ms_step / 1000 + 0.4), 3),
}))
