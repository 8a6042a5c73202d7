"""VAE decode stage timing at the bench shape (8 x 512^2)."""
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
from gyre_tpu.models import vae as vae_mod, configs

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


vcfg = configs.VAE_SD
vp = vae_mod.init(jax.random.PRNGKey(2), vcfg, BF)
z = jax.random.normal(key, (8, 64, 64, 4), BF)

report("vae_decode_b8", timeit(jax.jit(
    lambda p, zz: vae_mod.decode(p, vcfg, zz)), vp, z, n=5))


def mid_only(p, zz):
    d = p["decoder"]
    h = L.conv2d(p["post_quant_conv"], zz)
    h = L.conv2d(d["conv_in"], h)
    h = vae_mod._resnet(d["mid"]["res1"], h, vcfg.norm_groups)
    h = vae_mod._attn(d["mid"]["attn"], h, vcfg.norm_groups)
    return vae_mod._resnet(d["mid"]["res2"], h, vcfg.norm_groups)


report("vae_mid_b8", timeit(jax.jit(mid_only), vp, z, n=5))

h512 = jax.random.normal(key, (8, 64, 64, 512), BF)
report("vae_attn_64x64x512", timeit(jax.jit(
    lambda p, x: vae_mod._attn(p, x, 32)), vp["decoder"]["mid"]["attn"],
    h512, n=5))

chs = [512, 512, 256, 128]
sizes = [64, 128, 256, 512]
for lvl in range(4):
    hh = jax.random.normal(key, (8, sizes[lvl], sizes[lvl], chs[lvl]), BF)
    rp = vp["decoder"]["up"][lvl]["resnets"][1]
    fl = 2 * 2 * 8 * sizes[lvl] ** 2 * 9 * chs[lvl] ** 2
    report(f"vae_res_up{lvl}_{sizes[lvl]}x{chs[lvl]}", timeit(jax.jit(
        lambda p, x: vae_mod._resnet(p, x, 32)), rp, hh, n=5), fl)

h128 = jax.random.normal(key, (8, 512, 512, 128), BF)
report("vae_gn_silu_512x512x128", timeit(jax.jit(
    lambda p, x: L.silu(L.group_norm(p, x, 32))),
    vp["decoder"]["norm_out"], h128, n=5))
cp = {"w": jax.random.normal(key, (3, 3, 128, 128), BF) * 0.02,
      "b": jnp.zeros((128,), BF)}
report("conv3x3_512x512x128", timeit(jax.jit(L.conv2d), cp, h128, n=5),
       2 * 8 * 512 * 512 * 9 * 128 * 128)
up = jax.random.normal(key, (8, 256, 256, 256), BF)
report("upsample2x_256->512", timeit(jax.jit(L.upsample_nearest_2x), up,
                                     n=5))
