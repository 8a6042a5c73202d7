"""Component timing for the SD1.5 bench shape on TPU."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gyre_tpu.models import configs, unet as unet_mod, vae as vae_mod, clip as clip_mod
from gyre_tpu.models.modelset import random_modelset

ms = random_modelset(configs.SD15, seed=0, dtype=jnp.bfloat16, engine_id="prof")
cfg = ms.config

B = 16  # CFG-parallel batch for 8 images
x = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
t = jnp.full((B,), 500.0, jnp.float32)
ctx = jnp.zeros((B, 77, 768), jnp.bfloat16)

unet_fn = jax.jit(lambda p, x, t, c: unet_mod.apply(p, cfg.unet, x, t, c))
lat8 = jnp.zeros((8, 64, 64, 4), jnp.bfloat16)
vae_fn = jax.jit(lambda p, z: vae_mod.decode(p, cfg.vae, z))

def timeit(fn, *args, n=10):
    # block_until_ready is unreliable over the tunneled (axon) platform;
    # a device->host transfer is the only dependable sync
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n

ut = timeit(unet_fn, ms.unet_params, x, t, ctx)
vt = timeit(vae_fn, ms.vae_params, lat8, n=3)

lowered = jax.jit(lambda p, x, t, c: unet_mod.apply(p, cfg.unet, x, t, c)).lower(ms.unet_params, x, t, ctx)
comp = lowered.compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
flops = ca.get("flops", 0.0)

print(json.dumps({
    "unet_step_b16_ms": round(ut*1000, 2),
    "vae_decode_b8_ms": round(vt*1000, 2),
    "unet_flops_T": round(flops/1e12, 3),
    "unet_tflops_per_s": round(flops/ut/1e12, 1),
    "denoise_20_steps_s": round(20*ut, 3),
    "est_total_s": round(20*ut + vt, 3),
    "est_img_per_s": round(8/(20*ut+vt), 3),
}))
