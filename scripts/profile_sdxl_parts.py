"""Where do SDXL-1024's end-to-end seconds go?

bench.py round 4 measured 13.14 s for a 20-step 1024^2 image while the
UNet step alone measures 146 ms (time_unet.py) => ~2.9 s of denoise.
This script times each pipeline component at the serving shape to place
the remaining ~10 s. One JSON line per part.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gyre_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline.unified import UnifiedPipeline


def timeit(label, fn, n=3):
    fn()  # warm / compile
    fn()  # second warm: axon pays a per-program warm-up on the first
    #       post-compile execution (measured 13.1 s "warm" vs 4.3 s
    #       truly warm on the full pipeline); time steady-state only
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    if hasattr(out, "block_until_ready"):
        np.asarray(jnp.sum(jnp.asarray(out, jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({"part": label, "s": round(dt, 3)}), flush=True)
    return dt


ms = random_modelset(configs.SDXL, seed=0, dtype=jnp.bfloat16,
                     engine_id="sdxl-prof")
pipe = UnifiedPipeline(ms, compute_dtype=jnp.bfloat16)

kw = dict(prompt="a photograph of an astronaut riding a horse",
          negative_prompt="blurry", height=1024, width=1024, steps=20,
          sampler="k_dpmpp_2m", guidance_scale=7.5,
          output_dtype="uint8", chunk_steps=10,
          stop_event=threading.Event())

# full pipeline (the bench number)
timeit("full 20-step pipeline", lambda: np.asarray(pipe(seeds=[0], **kw)))

# text encode (two towers, pooled for text_time conditioning)
from gyre_tpu.pipeline import prompts as prompts_mod

wp = prompts_mod.WeightedPrompt.parse(kw["prompt"])
timeit("text encode (both towers, engine clip_layer)", lambda: np.asarray(
    jnp.sum(pipe.encode_prompt(wp).astype(jnp.float32))))

# VAE decode at 1024^2
z = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128, 4), jnp.bfloat16)
timeit("vae decode 1024^2", lambda: pipe.vae_decode(z))

# denoise chunks only: step through begin() with a stopwatch per chunk
def chunks_only():
    gen = pipe.begin(seeds=[0], **kw)
    marks = [time.perf_counter()]
    while True:
        try:
            next(gen)
            marks.append(time.perf_counter())
        except StopIteration as e:
            out = np.asarray(e.value)
            marks.append(time.perf_counter())
            break
    return marks


marks = chunks_only()  # compile-warm already from full call
marks = chunks_only()
marks = chunks_only()
deltas = [round(b - a, 3) for a, b in zip(marks, marks[1:])]
print(json.dumps({"part": "begin() chunk walls (setup, chunk1, chunk2, "
                          "finalize+transfer)", "s": deltas}), flush=True)
