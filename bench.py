"""Benchmark: SD1.5 512x512, 20-step DPM++ 2M, CFG on — the driver's
north-star metric (BASELINE.json: images/sec/chip + p50 latency).

Weights are random-init (no model downloads in this environment) — identical
architecture, shapes, and dtype to the real SD1.5, so throughput/latency are
the true serving numbers.

Three phases, each in its own process so the (single-tenant) TPU is never
held by two at once:

  1. pipeline  — batch-1 p50 latency + batch-8 pipeline throughput
                 (compiled-program level, the driver's historical metric).
  2. serving   — boot the REAL server (server.py subprocess), fire
                 concurrent gRPC clients, report coalesced serving
                 throughput, client-side p50/p95 and the dispatcher's
                 merged-batch stats. This also seeds the persistent XLA
                 cache with the serving (chunked) programs.
  3. warm boot — boot the server again against the now-warm disk cache
                 and measure first-image latency (warm_first_image_s):
                 the cold-start story a production deployment sees after
                 its first boot.

vs_baseline compares against A100 diffusers fp16 (the reference's typical
deployment): SD1.5 512^2 runs ~20 it/s there -> ~1.0 s for 20 steps + VAE,
i.e. ~1.0 images/sec (BASELINE.md north-star latency anchor).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

A100_BASELINE_IMG_PER_SEC = 1.0
CACHE_PATH = "/tmp/gyre-bench-cache"
GRPC_PORT, HTTP_PORT = 50961, 50962
N_CLIENTS, ROUNDS = 8, 2


def _peak_hbm_gb():
    """Allocator peak where exposed; on platforms that hide allocator
    stats (the tunneled axon TPU) device_memory_stats falls back to
    client-tracked live buffers — weights + persistent arrays, excluding
    XLA temp workspace."""
    try:
        from gyre_tpu.utils.monitor import device_memory_stats

        stats = device_memory_stats()
        peak = max((s.get("peak_bytes_in_use") or 0) for s in stats)
        if not peak:
            peak = max((s.get("bytes_in_use") or 0) for s in stats)
        return round(peak / 1e9, 2)
    except Exception:  # noqa: BLE001
        return 0.0


def phase_pipeline():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_PATH, "xla-pipeline"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import threading

    import jax.numpy as jnp
    import numpy as np

    from gyre_tpu.models import configs
    from gyre_tpu.models.modelset import random_modelset
    from gyre_tpu.pipeline.unified import UnifiedPipeline

    ms = random_modelset(configs.SD15, seed=0, dtype=jnp.bfloat16,
                         engine_id="sd15-bench")
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.bfloat16)

    kw = dict(prompt="a photograph of an astronaut riding a horse",
              negative_prompt="blurry", height=512, width=512, steps=20,
              sampler="k_dpmpp_2m", guidance_scale=7.5,
              # serving path exactly: device-side uint8 quantize + chunked
              # dispatch (the servicer always passes a stop_event +
              # chunk_steps=10, services/generate.py)
              output_dtype="uint8", chunk_steps=10,
              stop_event=threading.Event())

    t0 = time.perf_counter()
    np.asarray(pipe(seeds=[0], **kw))
    compile_s = time.perf_counter() - t0

    latencies = []
    for i in range(4):
        t0 = time.perf_counter()
        np.asarray(pipe(seeds=[i + 1], **kw))
        latencies.append(time.perf_counter() - t0)
    p50 = sorted(latencies)[len(latencies) // 2]

    # throughput shape: batch 8 (the coalescing dispatcher's merged
    # batch). Dispatch all runs, then sync: device programs queue and
    # execute back-to-back while finished batches transfer out — the same
    # overlap the serving dispatcher gets with queued requests.
    bseeds = list(range(8))
    np.asarray(pipe(seeds=bseeds, **kw))  # compile
    t0 = time.perf_counter()
    runs = 3
    outs = [pipe(seeds=[s + i for s in bseeds], **kw)
            for i in range(runs)]
    for o in outs:
        np.asarray(o)
    batch_time = (time.perf_counter() - t0) / runs
    throughput = len(bseeds) / batch_time

    # real activation peak: XLA memory analysis of the batch-8 CFG unet
    # step (the allocator fallback on axon only sees live buffers —
    # VERDICT weak #7)
    temp_gb = 0.0
    try:
        from gyre_tpu.models import unet as unet_mod

        ucfg = ms.config.unet
        b16 = 16  # 8 images x parallel CFG
        shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            ms.unet_params)
        compiled = jax.jit(
            lambda p, x, t, c: unet_mod.apply(p, ucfg, x, t, c)).lower(
            shapes,
            jax.ShapeDtypeStruct((b16, 64, 64, ucfg.in_channels),
                                 jnp.bfloat16),
            jax.ShapeDtypeStruct((b16,), jnp.float32),
            jax.ShapeDtypeStruct((b16, 77, ucfg.cross_attention_dim),
                                 jnp.bfloat16)).compile()
        mem = compiled.memory_analysis()
        temp_gb = round((getattr(mem, "temp_size_in_bytes", 0) or 0) / 1e9,
                        2)
    except Exception:  # noqa: BLE001
        pass
    weights_gb = round(sum(
        a.size * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves(
            (ms.unet_params, ms.vae_params, ms.text_params))) / 1e9, 2)

    print(json.dumps({
        "value": round(throughput, 4),
        "p50_latency_s": round(p50, 4),
        "batch1_latency_s": round(min(latencies), 4),
        "compile_s": round(compile_s, 2),
        "peak_hbm_gb": round(max(_peak_hbm_gb(), weights_gb + temp_gb), 2),
        "hbm_weights_gb": weights_gb,
        "hbm_unet_temp_gb": temp_gb,
        "device": str(jax.devices()[0]),
    }))


# ----------------------------------------------------------------- serving


def _boot_server(tag: str, prewarm: str = "off"):
    """Boot server.py and wait for the default engine to report ready
    (weights resident). Returns (proc, ready_seconds)."""
    cfg = os.path.join(CACHE_PATH, "engines.yaml")
    os.makedirs(CACHE_PATH, exist_ok=True)
    with open(cfg, "w") as f:
        f.write("- id: bench-sd15\n  name: bench\n  task: generate\n"
                "  default: true\n  model: preset/sd15\n")
    log = open(os.path.join(CACHE_PATH, f"server-{tag}.log"), "w")
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "server.py", "--enginecfg", cfg,
         "--grpc_port", str(GRPC_PORT), "--http_port", str(HTTP_PORT),
         "--batch_max", "8", "--nsfw_behaviour", "ignore",
         "--gather_ms", "100",  # burst workload: merge the full client set
         "--prewarm", prewarm, "--cache_path", CACHE_PATH],
        stdout=log, stderr=log, cwd=os.path.dirname(os.path.abspath(__file__)))
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server exited rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                    f"http://localhost:{HTTP_PORT}/status", timeout=3) as r:
                st = json.load(r)
            if any(e.get("ready") for e in st.get("engines", [])):
                return proc, time.monotonic() - t0
        except Exception:  # noqa: BLE001
            pass
        time.sleep(2.0)
    proc.terminate()
    raise RuntimeError("server never became ready")


def _status():
    with urllib.request.urlopen(
            f"http://localhost:{HTTP_PORT}/status", timeout=10) as r:
        return json.load(r)


def _one_request(seed: int, timeout_s: float = 2400.0) -> float:
    import grpc

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gyre_tpu.generated import generation_pb2 as pb

    chan = grpc.insecure_channel(f"localhost:{GRPC_PORT}")
    gen = chan.unary_stream(
        "/gooseai.GenerationService/Generate",
        request_serializer=pb.Request.SerializeToString,
        response_deserializer=pb.Answer.FromString)
    req = pb.Request(engine_id="bench-sd15")
    p = req.prompt.add()
    p.text = "a photograph of an astronaut riding a horse"
    n = req.prompt.add()
    n.text = "blurry"
    n.parameters.weight = -1.0
    img = req.image
    img.height = img.width = 512
    img.steps = 20
    img.samples = 1
    img.seed.append(seed)
    img.transform.diffusion = pb.SAMPLER_K_DPMPP_2M
    sp = img.parameters.add()
    sp.sampler.cfg_scale = 7.5
    t0 = time.perf_counter()
    got = 0
    for ans in gen(req, timeout=timeout_s):
        got += sum(1 for a in ans.artifacts if a.binary)
    dt = time.perf_counter() - t0
    chan.close()
    if not got:
        raise RuntimeError("no artifact")
    return dt


def phase_serving():
    proc, ready_s = _boot_server("serve")
    out = {"serve_boot_ready_s": round(ready_s, 2)}
    try:
        # absorb the serving-program compiles (also seeds the disk cache)
        cold_first = _one_request(0)
        out["cold_first_image_s"] = round(cold_first, 2)

        lat: list[float] = []
        errs: list[str] = []

        def client(cid: int, rounds: int):
            try:
                for r in range(rounds):
                    lat.append(_one_request(1000 + cid * 10 + r))
            except Exception as e:  # noqa: BLE001
                errs.append(str(e))

        def burst(rounds: int, n_clients: int = N_CLIENTS) -> float:
            t0 = time.perf_counter()
            threads = [threading.Thread(target=client, args=(c, rounds))
                       for c in range(n_clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return time.perf_counter() - t0

        # warm-up burst (unmeasured): compiles the merged-batch bucket
        # programs so the measured rounds are steady-state serving, not
        # XLA compile time
        burst(1)
        lat.clear()
        errs.clear()
        wall = burst(ROUNDS)
        if errs:
            out["serve_errors"] = errs[:3]
        if lat:
            lat.sort()
            out["serve_throughput_img_s"] = round(len(lat) / wall, 4)
            out["serve_p50_s"] = round(lat[len(lat) // 2], 3)
            out["serve_p95_s"] = round(lat[int(len(lat) * 0.95) - 1], 3)
            out["serve_clients"] = N_CLIENTS
        st = _status().get("dispatcher", {})
        out["serve_max_merged_requests"] = st.get("max_merged_requests", 0)
        out["serve_batches"] = st.get("batches", 0)
        out["serve_padded_rows"] = st.get("padded_rows", 0)

        # saturated serving: 2x batch_max concurrent clients keeps TWO
        # merged batches in flight — while batch A's results transfer
        # and PNG-encode, batch B computes (the dispatcher interleaves
        # active batches at chunk granularity). Closed-loop 8-client
        # serving inherently idles the device during each round's
        # transfer+encode+turnaround tail; a production deployment with
        # a request backlog sees THIS number.
        lat.clear()
        errs.clear()
        wall = burst(ROUNDS, n_clients=2 * N_CLIENTS)
        if lat and not errs:
            lat.sort()
            out["serve_saturated_img_s"] = round(len(lat) / wall, 4)
            out["serve_saturated_clients"] = 2 * N_CLIENTS
            out["serve_saturated_p50_s"] = round(lat[len(lat) // 2], 3)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    print(json.dumps(out))


def phase_sdxl():
    """Secondary metric (VERDICT r3 #2): SDXL-1024 20-step CFG end-to-end
    latency — the flagship BASELINE config-5 shape, exercising the flash
    attention path (largest self-attention T=4096, d=64 heads — the
    d>=64 dispatch rule). Random weights, true architecture/shapes/
    dtype."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_PATH, "xla-sdxl"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gyre_tpu.models import configs
    from gyre_tpu.models.modelset import random_modelset
    from gyre_tpu.pipeline.unified import UnifiedPipeline

    ms = random_modelset(configs.SDXL, seed=0, dtype=jnp.bfloat16,
                         engine_id="sdxl-bench")
    pipe = UnifiedPipeline(ms, compute_dtype=jnp.bfloat16)
    kw = dict(prompt="a photograph of an astronaut riding a horse",
              negative_prompt="blurry", height=1024, width=1024, steps=20,
              sampler="k_dpmpp_2m", guidance_scale=7.5,
              output_dtype="uint8", chunk_steps=10,
              stop_event=threading.Event())
    t0 = time.perf_counter()
    np.asarray(pipe(seeds=[0], **kw))
    compile_s = time.perf_counter() - t0
    # unmeasured warm run: on the axon remote client the first executions
    # after compile pay a per-program warm-up (round-4 bench measured
    # 13.1 s "warm" right after compile vs 4.3 s truly warm —
    # scripts/profile_sdxl_parts.py); all phases measure steady-state
    np.asarray(pipe(seeds=[9], **kw))
    lat = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(pipe(seeds=[i + 1], **kw))
        lat.append(time.perf_counter() - t0)
    print(json.dumps({
        "sdxl_1024_20step_s": round(sorted(lat)[len(lat) // 2], 2),
        "sdxl_compile_s": round(compile_s, 1),
    }))


def phase_warmboot():
    """Production warm-boot story: boot with --prewarm on against the
    disk cache phase 2 seeded. Prewarm pre-EXECUTES the serving program,
    absorbing the terminal-side first-execution cost the disk cache
    cannot (remote-compile platform: local compile is a staged cache hit
    but the terminal codegens at first execution — measured round 5,
    PERFORMANCE.md "Cold start"). Reported separately:
      warm_boot_ready_s     engines loaded, weights resident
      warm_prewarm_s        boot-time program pre-execution
      warm_first_image_s    first request AFTER prewarm — what every
                            request sees for the deployment's lifetime
      warm_boot_to_image_s  process start -> first image, end to end
    """
    t_boot = time.monotonic()
    proc, ready_s = _boot_server("warm", prewarm="on")
    out = {"warm_boot_ready_s": round(ready_s, 2)}
    try:
        deadline = time.monotonic() + 1800
        prewarm: dict = {}
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(f"server exited rc={proc.returncode}")
            prewarm = _status().get("prewarm", {})
            if prewarm.get("state") in ("done", "failed"):
                break
            time.sleep(5.0)
        out["warm_prewarm_s"] = prewarm.get("seconds", 0.0)
        if prewarm.get("state") != "done":
            out["warm_prewarm_error"] = str(prewarm)[:200]
        warm = _one_request(7)
        out["warm_first_image_s"] = round(warm, 2)
        out["warm_boot_to_image_s"] = round(time.monotonic() - t_boot, 2)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    print(json.dumps(out))


def _preflight() -> tuple[bool, str]:
    """Fast device check with retry + diagnosis: a wedged tunnel/device
    hangs every phase for its full timeout, and (the round-4 failure) a
    leftover process holding the single-tenant chip starves initialization
    indefinitely. Detect both in minutes, kill stale holders between
    attempts, and say WHICH failure it was in the error JSON."""
    repo = os.path.dirname(os.path.abspath(__file__))

    def holders():
        try:
            sys.path.insert(0, os.path.join(repo, "scripts"))
            from free_device import find_holders
            return find_holders()
        except Exception:  # noqa: BLE001
            return []

    last_err = ""
    for attempt in range(3):
        try:
            # 420s: the first device op in a fresh process measured
            # 11-257s on the tunneled platform depending on terminal
            # warmth/contention (round-5 probes) — 240s was a coin flip
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.ones((4, 4)).sum()))"],
                capture_output=True, timeout=420, check=True, cwd=repo)
            return True, ""
        except subprocess.TimeoutExpired:
            last_err = "device preflight timed out (420s)"
        except subprocess.CalledProcessError as e:
            last_err = ("device preflight crashed: "
                        + (e.stderr or b"").decode("utf-8", "replace")[-200:])
        held = holders()
        if held:
            # single-tenant chip held by a stale process (the exact
            # round-4 failure): kill it by exact PID and retry
            last_err += ("; device held by stale process(es): "
                         + ", ".join(f"pid {h['pid']} age {h['age_s']:.0f}s"
                                     f" [{h['cmd'][:80]}]" for h in held))
            subprocess.run(
                [sys.executable, os.path.join(repo, "scripts",
                                              "free_device.py"), "--kill"],
                capture_output=True, timeout=60)
        if attempt < 2:
            time.sleep(30 * (attempt + 1))  # tunnel recovery backoff
    held = holders()
    verdict = ("chip held by another process"
               if held else "device/tunnel unresponsive (no holder found)")
    return False, f"{verdict}: {last_err}"[:400]


def _run_phase(name: str, timeout: int) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", name],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"phase {name} produced no JSON (rc={r.returncode}): "
        f"{(r.stderr or '')[-500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default=None)
    args = ap.parse_args()
    if args.phase == "pipeline":
        return phase_pipeline()
    if args.phase == "serving":
        return phase_serving()
    if args.phase == "warmboot":
        return phase_warmboot()
    if args.phase == "sdxl":
        return phase_sdxl()

    result = {
        "metric": "images/sec/chip (SD1.5 512^2, 20-step DPM++2M, CFG)",
        "unit": "images/sec",
    }
    ok, diag = _preflight()
    if not ok:
        result.update(value=0.0, vs_baseline=0.0, error=diag)
        print(json.dumps(result))
        return
    try:
        pipeline = _run_phase("pipeline", 3000)
        result.update(pipeline)
        result["vs_baseline"] = round(
            result["value"] / A100_BASELINE_IMG_PER_SEC, 4)
    except Exception as e:  # noqa: BLE001
        result.update(value=0.0, vs_baseline=0.0,
                      error=f"pipeline phase: {e}"[:300])
        print(json.dumps(result))
        return
    try:
        result.update(_run_phase("serving", 4500))
    except Exception as e:  # noqa: BLE001
        result["serve_error"] = str(e)[:300]
    try:
        result.update(_run_phase("warmboot", 2400))
    except Exception as e:  # noqa: BLE001
        result["warmboot_error"] = str(e)[:300]
    try:
        result.update(_run_phase("sdxl", 2400))
    except Exception as e:  # noqa: BLE001
        result["sdxl_error"] = str(e)[:300]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
