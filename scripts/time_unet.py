"""Time one UNet denoise step. Fast iteration loop for kernel/fusion work.

Default: SD1.5 at the bench shape (batch 16 = 8 images CFG).
--config sdxl --res 1024 --batch 2 times the BASELINE config-5 shape
(dual-tower context 77x2048 + text_time conditioning).
Prints ms + TFLOP/s as one JSON line.
"""
import argparse
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

ap = argparse.ArgumentParser()
ap.add_argument("--config", default="sd15", choices=list(configs.PRESETS))
ap.add_argument("--res", type=int, default=512)
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--steps", type=int, default=20, help="steps for img/s est")
args = ap.parse_args()

msc = configs.PRESETS[args.config]
ms = random_modelset(msc, seed=0, dtype=jnp.bfloat16, engine_id="prof")
cfg = ms.config
B = args.batch
L = args.res // 8
x = jnp.zeros((B, L, L, 4), jnp.bfloat16)
t = jnp.full((B,), 500.0, jnp.float32)
ctx = jnp.zeros((B, 77, cfg.unet.cross_attention_dim), jnp.bfloat16)
kw = {}
if cfg.unet.addition_embed_dim:
    kw["added_cond"] = {
        "text_embeds": jnp.zeros((B, cfg.unet.addition_embed_dim),
                                 jnp.bfloat16),
        "time_ids": jnp.zeros((B, cfg.unet.addition_time_ids), jnp.float32),
    }

f = jax.jit(lambda p, x, t, c: jnp.sum(
    unet_mod.apply(p, cfg.unet, x, t, c, **kw).astype(jnp.float32)))
t0 = time.perf_counter()
np.asarray(f(ms.unet_params, x, t, ctx))
compile_s = time.perf_counter() - t0

n = 10
t0 = time.perf_counter()
for _ in range(n):
    out = f(ms.unet_params, x, t, ctx)
np.asarray(out)
ms_step = (time.perf_counter() - t0) / n * 1000

low = jax.jit(lambda p, x, t, c: unet_mod.apply(
    p, cfg.unet, x, t, c, **kw)).lower(ms.unet_params, x, t, ctx)
ca = low.compile().cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
flops = ca.get("flops", 0.0)
imgs = B // 2  # CFG pairs
print(json.dumps({
    "config": args.config, "res": args.res, "batch": B,
    "unet_step_ms": round(ms_step, 2),
    "tflops_per_s": round(flops / (ms_step / 1000) / 1e12, 1),
    "mfu_pct_v5e": round(flops / (ms_step / 1000) / 197e12 * 100, 1),
    "compile_s": round(compile_s, 1),
    f"denoise{args.steps}_plus_vae_est_img_s": round(
        imgs / (args.steps * ms_step / 1000 + 0.4), 3),
}))
