"""Micro-profile of UNet/VAE components at SD1.5-512 bench shapes on TPU.

Times standalone jitted pieces so the throughput work (VERDICT #6) can
target the actual hot spots rather than guesses. One JSON line per probe.
"""
import os
import sys
import time
import json
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gyre_tpu.models import layers as L
from gyre_tpu.models import unet as unet_mod, vae as vae_mod, configs
from gyre_tpu.ops import attention as attn_ops

key = jax.random.PRNGKey(0)
BF = jnp.bfloat16


def timeit(fn, *args, n=20):
    # Sync on a scalar reduction: pulling the full output over the
    # tunneled (axon) platform costs seconds per 100MB and swamps the
    # compute time; block_until_ready is likewise unreliable there.
    def summed(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    g = jax.jit(summed)
    np.asarray(g(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def report(name, ms, flops=None):
    row = {"probe": name, "ms": round(ms, 3)}
    if flops:
        row["tflops_per_s"] = round(flops / (ms / 1000) / 1e12, 1)
    print(json.dumps(row), flush=True)


B = 16  # CFG batch for 8 images

# ---- attention at level shapes
for (T, C, H) in [(4096, 320, 8), (1024, 640, 8), (256, 1280, 8)]:
    d = C // H
    q = jax.random.normal(key, (B, T, H, d), BF)
    kv = q
    fl = 4 * B * T * T * C
    f_xla = jax.jit(functools.partial(attn_ops.attention, impl="ref"))
    f_flash = jax.jit(functools.partial(attn_ops.attention, impl="flash"))
    report(f"self_attn_xla_T{T}_C{C}", timeit(f_xla, q, kv, kv), fl)
    report(f"self_attn_flash_T{T}_C{C}", timeit(f_flash, q, kv, kv), fl)
    # cross attention S=77
    ckv = jax.random.normal(key, (B, 77, H, d), BF)
    flc = 4 * B * T * 77 * C
    report(f"cross_attn_xla_T{T}_C{C}", timeit(f_xla, q, ckv, ckv), flc)

# ---- linear projections at level-0 transformer shapes
x320 = jax.random.normal(key, (B, 4096, 320), BF)
w = {"w": jax.random.normal(key, (320, 320), BF)}
w3 = {"w": jax.random.normal(key, (320, 960), BF)}
report("linear_320x320", timeit(jax.jit(L.linear), w, x320),
       2 * B * 4096 * 320 * 320)
report("linear_320x960_fusedqkv", timeit(jax.jit(L.linear), w3, x320),
       2 * B * 4096 * 320 * 960)

# ---- group norm / silu at level-0 resnet shape
h0 = jax.random.normal(key, (B, 64, 64, 320), BF)
gn = {"scale": jnp.ones((320,), BF), "bias": jnp.zeros((320,), BF)}
report("group_norm_64x64x320", timeit(jax.jit(
    functools.partial(L.group_norm, groups=32)), gn, h0))
report("gn_silu_64x64x320", timeit(jax.jit(
    lambda p, x: L.silu(L.group_norm(p, x, 32))), gn, h0))

# ---- conv3x3 at level shapes
for (hw, c) in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
    xx = jax.random.normal(key, (B, hw, hw, c), BF)
    cp = {"w": jax.random.normal(key, (3, 3, c, c), BF),
          "b": jnp.zeros((c,), BF)}
    fl = 2 * B * hw * hw * 9 * c * c
    report(f"conv3x3_{hw}x{hw}x{c}", timeit(jax.jit(L.conv2d), cp, xx), fl)

# ---- full resnet / tblock at level 0
cfgu = configs.UNET_SD15
ms_key = jax.random.PRNGKey(1)
res_p = unet_mod._resnet_init(ms_key, 320, 320, 1280, BF)
temb = jax.random.normal(key, (B, 1280), BF)
report("resnet_lvl0", timeit(jax.jit(
    lambda p, x, t: unet_mod._resnet(p, x, t, 32)), res_p, h0, temb),
    2 * 2 * B * 64 * 64 * 9 * 320 * 320)
tb_p = unet_mod._tblock_init(ms_key, 320, 768, BF)
ctx = jax.random.normal(key, (B, 77, 768), BF)
report("tblock_lvl0", timeit(jax.jit(
    lambda p, x, c: unet_mod._tblock(p, x.reshape(B, 4096, 320), c, 8)),
    tb_p, h0, ctx))

# ---- VAE decoder stages (512^2 output, batch 8)
vcfg = configs.VAE_SD
vkey = jax.random.PRNGKey(2)
vp = vae_mod.init(vkey, vcfg, BF)
z = jax.random.normal(key, (8, 64, 64, 4), BF)
report("vae_decode_b8", timeit(jax.jit(
    functools.partial(vae_mod.decode, cfg=vcfg)), vp, z=z, n=5))

# vae sub-stages
def mid_only(p, zz):
    d = p["decoder"]
    h = L.conv2d(p["post_quant_conv"], zz)
    h = L.conv2d(d["conv_in"], h)
    h = vae_mod._resnet(d["mid"]["res1"], h, vcfg.norm_groups)
    h = vae_mod._attn(d["mid"]["attn"], h, vcfg.norm_groups)
    return vae_mod._resnet(d["mid"]["res2"], h, vcfg.norm_groups)

report("vae_mid_b8", timeit(jax.jit(mid_only), vp, z, n=5))

# single vae attn at 64x64x512 single-head
h512 = jax.random.normal(key, (8, 64, 64, 512), BF)
report("vae_attn_64x64x512", timeit(jax.jit(
    lambda p, x: vae_mod._attn(p, x, 32)), vp["decoder"]["mid"]["attn"],
    h512, n=5))

# vae resnets at each up level
chs = [512, 512, 256, 128]
sizes = [64, 128, 256, 512]
for lvl in range(4):
    hh = jax.random.normal(key, (8, sizes[lvl], sizes[lvl], chs[lvl]), BF)
    rp = vp["decoder"]["up"][lvl]["resnets"][1]
    fl = 2 * 2 * 8 * sizes[lvl] ** 2 * 9 * chs[lvl] ** 2
    report(f"vae_res_up{lvl}_{sizes[lvl]}x{chs[lvl]}", timeit(jax.jit(
        lambda p, x: vae_mod._resnet(p, x, 32)), rp, hh, n=5), fl)

# final conv + norm at 512
h128 = jax.random.normal(key, (8, 512, 512, 128), BF)
report("vae_gn_512x512x128", timeit(jax.jit(
    lambda p, x: L.silu(L.group_norm(p, x, 32))),
    vp["decoder"]["norm_out"], h128, n=5))
