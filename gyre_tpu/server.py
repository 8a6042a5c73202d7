"""Server bootstrap: CLI flags + SD_* env fallbacks, gRPC + HTTP servers,
engine loading (the reference's gyre/server.py:567-1220 surface, TPU-sized).
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys
import threading
import time
from concurrent import futures

logger = logging.getLogger("gyre_tpu")


def environ_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def environ_list(name: str) -> list[str]:
    v = os.environ.get(name, "")
    return [s for s in (x.strip() for x in v.split(",")) if s]


def parse_args(argv=None):
    p = argparse.ArgumentParser("gyre-tpu server")
    net = p.add_argument_group("networking")
    net.add_argument("--grpc_port", type=int,
                     default=int(os.environ.get("SD_GRPC_PORT", 50051)))
    net.add_argument("--http_port", type=int,
                     default=int(os.environ.get("SD_HTTP_PORT", 5000)))
    net.add_argument("--listen_to_all", action="store_true",
                     default=environ_bool("SD_LISTEN_TO_ALL"))
    net.add_argument("--access_token", type=str,
                     default=os.environ.get("SD_ACCESS_TOKEN") or None)
    net.add_argument("--proxy", action="append", dest="proxies",
                     default=environ_list("SD_PROXY") or None,
                     help="name=url reverse proxy mappings (/p/<name>/...)")
    net.add_argument("--http_file_root", type=str,
                     default=os.environ.get("SD_HTTP_FILE_ROOT", ""),
                     help="serve static files from this directory at /")
    net.add_argument("--localtunnel", action="store_true",
                     default=environ_bool("SD_LOCALTUNNEL"),
                     help="expose the HTTP port through localtunnel.me "
                          "(requires npx; forces an access token)")
    net.add_argument("--reload", action="store_true",
                     default=environ_bool("SD_RELOAD"),
                     help="restart the server when source or config "
                          "files change (reference hupper auto-reload)")

    gen = p.add_argument_group("generation")
    gen.add_argument("--enginecfg", type=str,
                     default=os.environ.get("SD_ENGINECFG",
                                            "config/engines.yaml"))
    gen.add_argument("--engine_id", action="append", dest="engine_ids",
                     default=environ_list("SD_ENGINE_ID") or None,
                     help="only enable these engine ids")
    gen.add_argument("--batch_max", type=str,
                     default=os.environ.get("SD_BATCH_MAX", "4"),
                     help="max merged batch per dispatch, or 'auto' to "
                          "measure from XLA memory analysis at startup "
                          "(the reference's BatchMode autodetect, "
                          "gyre/manager.py:202-282)")
    gen.add_argument("--interleave", type=int,
                     default=int(os.environ.get("SD_INTERLEAVE", "2")),
                     help="max concurrently-active batches the dispatcher "
                          "round-robins at chunk granularity (prevents a "
                          "long request head-of-line-blocking short ones; "
                          "1 = serial)")
    gen.add_argument("--watchdog", type=float,
                     default=float(os.environ.get("SD_WATCHDOG", "900")),
                     help="seconds a single device op may stay in flight "
                          "before the dispatcher declares the device "
                          "wedged (fails queued work with UNAVAILABLE, "
                          "reports in /status); 0 disables")
    gen.add_argument("--gather_ms", type=float,
                     default=float(os.environ.get("SD_GATHER_MS", "10")),
                     help="coalescer gather window after the first queued "
                          "request; raise for bursty many-client traffic "
                          "(bigger merged batches), lower for single-"
                          "client p50")
    gen.add_argument("--grpc_workers", type=int,
                     default=int(os.environ.get("SD_GRPC_WORKERS", 16)),
                     help="gRPC thread pool size; must exceed batch_max "
                          "or the coalescer can never fill a batch from "
                          "concurrent clients")
    gen.add_argument("--nsfw_behaviour", type=str,
                     choices=["block", "flag", "ignore"],
                     default=os.environ.get("SD_NSFW_BEHAVIOUR", "flag"))
    gen.add_argument("--save_safetensors", type=str, default=None,
                     metavar="ENGINE_ID:PATH",
                     help="export an engine's weights as a diffusers-layout "
                          "safetensors directory and exit")

    tpu = p.add_argument_group("tpu")
    tpu.add_argument("--platform", type=str,
                     default=os.environ.get("SD_PLATFORM") or None,
                     help="force a JAX platform (e.g. 'cpu', 'tpu'). "
                          "Wins over JAX_PLATFORMS even when a "
                          "sitecustomize force-registers a backend — "
                          "applied via jax.config before device init. "
                          "Useful for CPU smoke deployments and dev "
                          "boxes without an accelerator")
    tpu.add_argument("--tp", type=int,
                     default=int(os.environ.get("SD_TP", 1)),
                     help="tensor-parallel width of the device mesh")
    tpu.add_argument("--dtype", type=str, default="bfloat16",
                     choices=["bfloat16", "float32"])
    tpu.add_argument("--hbm_optimisation_level", "-V", type=int,
                     default=int(os.environ.get(
                         "SD_HBM_OPTIMISATION_LEVEL",
                         os.environ.get("SD_VRAM_OPTIMISATION_LEVEL", 3))),
                     help="trade quality for HBM (0 = none, 5 = max); "
                          "sets the hbm{N} (and reference-compatible "
                          "vram{N}) config include flags, e.g. the "
                          "limit_hbm.yaml overlay at level >= 4")
    tpu.add_argument("--prewarm", type=str, default=os.environ.get(
        "SD_PREWARM", "auto"), choices=["auto", "on", "off", "full"],
        help="compile the default engine's serving program in the "
             "background after startup (auto = TPU only). 'full' also "
             "warms the max-batch coalescer bucket, so a boot is "
             "compile-free under burst traffic (any step count <= 150 "
             "shares the warmed programs)")

    res = p.add_argument_group("resources")
    res.add_argument("--cache_path", type=str,
                     default=os.environ.get("SD_CACHE_PATH", "/tmp/gyre-cache"))
    res.add_argument("--cache_ram", type=int,
                     default=int(os.environ.get("SD_CACHE_RAM", 500)),
                     help="memory cache budget, MB")
    res.add_argument("--local_resource", action="append",
                     dest="local_resources",
                     default=environ_list("SD_LOCAL_RESOURCE") or None,
                     help="prefix=path local resource mappings")
    res.add_argument("--allow_network_resources", action="store_true",
                     default=environ_bool("SD_ALLOW_NETWORK_RESOURCES"))
    res.add_argument("--weight_root", action="append", dest="weight_roots",
                     default=environ_list("SD_WEIGHT_ROOT") or None,
                     help="local directories searched for model weights")
    res.add_argument("--refresh_models", action="append",
                     dest="refresh_models",
                     default=environ_list("SD_REFRESH_MODELS") or None,
                     help="model refs to force re-download at startup")

    dbg = p.add_argument_group("debug")
    dbg.add_argument("--vram_debug", action="store_true",
                     default=environ_bool("SD_VRAM_DEBUG"))
    dbg.add_argument("--debug_recording", action="store_true",
                     default=environ_bool("SD_DEBUG_RECORDING"))
    dbg.add_argument("--log_level", type=str,
                     default=os.environ.get("SD_LOG_LEVEL", "INFO"))
    return p.parse_args(argv)


def resolve_enginecfg(path: str) -> str:
    """Resolve --enginecfg conveniences (reference gyre/server.py:980-1030):
    an http(s) URL downloads a zip (or bare yaml) into a temp dir; a
    directory means `<dir>/engines.yaml`. When the target is an
    `engines.yaml` outside the packaged config tree, sync shipped dist
    configs into its directory first (engines_yaml.check_and_update)."""
    import tempfile
    import zipfile

    from .manager import engines_yaml

    if path.startswith(("http://", "https://")):
        logger.warning("loading config from a URL; make sure you trust it")
        import urllib.request
        tmp = tempfile.mkdtemp(prefix="gyre-cfg-")
        blob = os.path.join(tmp, "config.bin")
        with urllib.request.urlopen(path, timeout=60) as resp, \
                open(blob, "wb") as fh:
            fh.write(resp.read())
        if zipfile.is_zipfile(blob):
            with zipfile.ZipFile(blob) as zh:
                zh.extractall(tmp)
            path = os.path.join(tmp, "engines.yaml")
            if not os.path.exists(path):
                raise RuntimeError(f"zip config did not contain engines.yaml")
        else:
            path = os.path.join(tmp, "engines.yaml")
            os.rename(blob, path)
        return path

    if os.path.isdir(path):
        path = os.path.join(path, "engines.yaml")

    if os.path.basename(path) == "engines.yaml":
        dist_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config")
        user_dir = os.path.dirname(os.path.abspath(path)) or "."
        if os.path.isdir(dist_dir) and \
                os.path.realpath(user_dir) != os.path.realpath(dist_dir):
            try:
                changed = engines_yaml.check_and_update(dist_dir, user_dir)
                if changed:
                    logger.info("dist config update: %s", ", ".join(changed))
            except Exception as e:  # noqa: BLE001
                logger.warning("dist config update failed: %s", e)
    return path


def configure_jax_caches(cache_path: str):
    """Persistent XLA compilation cache, split per platform (cross-profile
    executable deserialization is unreliable — see tests/conftest.py)."""
    try:
        import jax

        platform = jax.default_backend()
        cache_dir = os.path.join(cache_path or "/tmp/gyre-cache",
                                 f"xla-cache-{platform}")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        logger.warning("compilation cache setup failed: %s", e)


def build_manager(args):
    import jax.numpy as jnp

    from .manager import engines_yaml
    from .manager.manager import EngineManager

    args.enginecfg = resolve_enginecfg(args.enginecfg)
    if os.path.exists(args.enginecfg):
        # memory-optimisation include flags: hbm{N} is the TPU-native
        # name, vram{N} kept as an alias so configs written against the
        # reference's `!include(vram4)` keep working
        # (reference gyre/server.py:1081-1089)
        level = int(getattr(args, "hbm_optimisation_level", 3) or 0)
        flags = {}
        for i in range(2, 6):
            flags[f"hbm{i}"] = level >= i
            flags[f"vram{i}"] = level >= i
        entries = engines_yaml.load(args.enginecfg, flags)
    else:
        logger.warning("engine config %s not found; using default engine",
                       args.enginecfg)
        entries = [{"id": "stable-diffusion-v1-5", "name": "SD 1.5",
                    "model": "preset/sd15", "default": True}]
    if args.engine_ids:
        for e in entries:
            if e.get("id") not in args.engine_ids:
                e["enabled"] = False

    mesh = None
    try:
        import jax

        from .parallel import mesh as pmesh

        if len(jax.devices()) > 1 or args.tp > 1:
            mesh = pmesh.make_mesh(tp=args.tp)
    except Exception as e:  # noqa: BLE001
        logger.warning("mesh init failed (%s); single device", e)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from .manager.weights import WeightResolver

    resolver = WeightResolver(
        local_dirs=args.weight_roots or ["./weights"],
        download_cache=os.path.join(args.cache_path or "/tmp/gyre-cache",
                                    "weights"),
        allow_network=args.allow_network_resources)
    for ref in args.refresh_models or []:
        try:
            resolver.resolve(ref, refresh=True)
        except Exception as e:  # noqa: BLE001
            logger.warning("refresh of %s failed: %s", ref, e)
    batch_max = 4 if str(args.batch_max) == "auto" \
        else int(args.batch_max)
    return EngineManager(entries, mesh=mesh, compute_dtype=dtype,
                         batch_max=batch_max,
                         weight_resolver=resolver,
                         interleave=int(args.interleave),
                         gather_ms=float(args.gather_ms),
                         watchdog_s=float(args.watchdog))


class TokenAuthInterceptor:
    """Bearer-token check for gRPC (reference GrpcServerTokenChecker,
    gyre/server.py:123-140)."""

    def __init__(self, token: str):
        import grpc

        self.token = token
        self._abort = grpc.unary_unary_rpc_method_handler(
            lambda req, ctx: ctx.abort(grpc.StatusCode.UNAUTHENTICATED,
                                       "invalid token"))

    def intercept_service(self, continuation, handler_call_details):
        meta = dict(handler_call_details.invocation_metadata)
        auth = meta.get("authorization", "")
        key = auth[7:] if auth.startswith("Bearer ") else auth
        if key == self.token:
            return continuation(handler_call_details)
        return self._abort


class SourceWatcher:
    """--reload: restart on source/config changes (the reference uses
    hupper's monitored subprocess, gyre/server.py:880-885; here a polling
    watcher re-execs the process — one process, TPU stays cleanly
    released on exec)."""

    def __init__(self, interval: float = 10.0, extra_paths=()):
        self.interval = interval
        self.extra_paths = [p for p in extra_paths if p]
        self._mtimes: dict[str, float] = {}

    def _scan(self) -> dict[str, float]:
        import glob

        root = os.path.dirname(os.path.abspath(__file__))
        paths = glob.glob(os.path.join(root, "**", "*.py"), recursive=True)
        for extra in self.extra_paths:
            if os.path.isdir(extra):
                paths += glob.glob(os.path.join(extra, "**", "*.yaml"),
                                   recursive=True)
            elif os.path.exists(extra):
                paths.append(extra)
        out = {}
        for p in paths:
            try:
                out[p] = os.stat(p).st_mtime
            except OSError:
                pass
        return out

    def changed(self) -> list[str]:
        now = self._scan()
        if not self._mtimes:
            self._mtimes = now
            return []
        diff = [p for p, t in now.items()
                if self._mtimes.get(p) not in (None, t)]
        self._mtimes = now
        return diff

    def start(self):
        import sys

        def watch():
            self.changed()  # baseline
            while True:
                time.sleep(self.interval)
                diff = self.changed()
                if diff:
                    logger.info("source changed (%s); restarting",
                                os.path.basename(diff[0]))
                    os.execv(sys.executable,
                             [sys.executable] + sys.argv)

        threading.Thread(target=watch, daemon=True,
                         name="source-watcher").start()
        return self


def start_localtunnel(port: int, access_token: str):
    """--localtunnel: `npx localtunnel` subprocess, parsing the public URL
    from its output (reference LocaltunnelServer,
    gyre/server.py:262-325). Returns the Popen handle or None."""
    import re
    import shutil
    import subprocess

    npx = shutil.which("npx")
    if npx is None:
        logger.warning("localtunnel requested but npx is not installed")
        return None
    proc = subprocess.Popen(
        [npx, "--yes", "localtunnel", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    def reader():
        for line in proc.stdout:  # type: ignore[union-attr]
            m = re.search(r"url is: https://(\S+)", line)
            if m:
                logger.info(
                    "localtunnel up — server '%s', port 443, key '%s'",
                    m.group(1), access_token)
            else:
                logger.info("localtunnel: %s", line.rstrip())

    threading.Thread(target=reader, daemon=True,
                     name="localtunnel").start()
    return proc


def main(argv=None):
    # SIGUSR1 -> all-thread stack dump on stderr (hang diagnosis in
    # production; default SIGUSR1 would kill the process)
    try:
        import faulthandler
        import signal as _signal

        faulthandler.register(_signal.SIGUSR1, all_threads=True)
    except Exception:  # noqa: BLE001  (not main thread / platform)
        pass
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.localtunnel and not args.access_token:
        import secrets

        args.access_token = secrets.token_urlsafe(16)
    if args.reload:
        SourceWatcher(extra_paths=[args.enginecfg]).start()

    import grpc

    from .services import registration
    from .services.dashboard import DashboardServiceServicer
    from .services.engines import EnginesServiceServicer
    from .services.generate import GenerationServiceServicer
    from .utils.cache import DiskCache, DualCache, MemoryLRUCache
    from .utils.debug_recorder import DebugNullRecorder, DebugRecorder
    from .utils.logview import configure_logging
    from .utils.monitor import ResourceMonitor
    from .utils.resources import ResourceProvider

    cache = DualCache(
        MemoryLRUCache(max_bytes=args.cache_ram * 1024 * 1024,
                       default_ttl=3600.0),
        DiskCache(args.cache_path) if args.cache_path else None)
    log_store = configure_logging(
        getattr(logging, args.log_level.upper(), logging.INFO),
        image_cache=cache)

    local_roots = {}
    for item in args.local_resources or []:
        prefix, _, path = item.partition("=")
        local_roots[prefix] = path
    resources = ResourceProvider(cache, local_roots=local_roots,
                                 allow_network=args.allow_network_resources)

    recorder = (DebugRecorder(os.path.join(args.cache_path, "debug"))
                if args.debug_recording else DebugNullRecorder())
    monitor = ResourceMonitor().start()
    configure_jax_caches(args.cache_path)

    t0 = time.time()
    manager = build_manager(args)
    manager.resources = resources

    if args.nsfw_behaviour == "block" and manager.safety_checker() is None:
        # fail closed: blocking on random-weight flags would be noise
        logger.error("nsfw_behaviour=block requires trained safety-checker "
                     "weights; add a 'safety_checker:' model reference to "
                     "engines.yaml (e.g. CompVis/stable-diffusion-safety-"
                     "checker) or use --nsfw_behaviour flag/ignore")
        sys.exit(2)

    if args.save_safetensors:
        from .models.load import save_modelset

        engine_id, _, path = args.save_safetensors.partition(":")
        ms = manager.modelset(engine_id)
        save_modelset(ms, path or f"./{engine_id}-export")
        logger.info("exported %s -> %s", engine_id, path)
        return

    generation = GenerationServiceServicer(manager,
                                           nsfw_behaviour=args.nsfw_behaviour,
                                           batch_max=manager.batch_max,
                                           debug_recorder=recorder,
                                           resource_cache=cache)
    engines = EnginesServiceServicer(manager)
    dashboard = DashboardServiceServicer()

    interceptors = []
    if args.access_token:
        interceptors.append(TokenAuthInterceptor(args.access_token))
    grpc_server = grpc.server(
        futures.ThreadPoolExecutor(max_workers=max(args.grpc_workers,
                                                   manager.batch_max + 2)),
        interceptors=interceptors,
        options=[("grpc.max_send_message_length", 256 * 1024 * 1024),
                 ("grpc.max_receive_message_length", 256 * 1024 * 1024)])
    registration.add_all(grpc_server, generation=generation, engines=engines,
                         dashboard=dashboard)
    host = "[::]" if args.listen_to_all else "localhost"
    grpc_server.add_insecure_port(f"{host}:{args.grpc_port}")
    grpc_server.start()
    logger.info("gRPC listening on %s:%d", host, args.grpc_port)

    from .http.router import make_http_server, start_http_server

    http_host = "" if args.listen_to_all else "localhost"
    http_server = make_http_server(
        http_host, args.http_port, manager=manager, generation=generation,
        engines=engines,
        access_keys=[args.access_token] if args.access_token else None,
        image_cache=cache, log_store=log_store,
        proxies=dict(p.split("=", 1) for p in (args.proxies or [])),
        file_root=args.http_file_root or None)
    start_http_server(http_server)
    logger.info("HTTP listening on %s:%d", http_host or "*", args.http_port)
    if args.localtunnel:
        start_localtunnel(args.http_port, args.access_token)

    manager.load_engines()
    monitor.log("engines loaded")
    logger.info("engines ready in %.1fs: %s", time.time() - t0,
                ", ".join(manager.engine_ids))

    if str(args.batch_max) == "auto":
        # measured batch limit from XLA memory analysis (the reference's
        # BatchMode autodetect probe, gyre/manager.py:230-282)
        try:
            eid = manager.default_engine_id()
            measured = manager.suggest_max_batch(eid)
            manager.batch_max = measured
            manager.dispatcher.max_batch = max(measured, 1)
            generation.batch_max = measured
            logger.info("batch_max auto: measured %d for %s", measured, eid)
        except Exception as e:  # noqa: BLE001
            logger.warning("batch_max auto probe failed (%s); keeping %d",
                           e, manager.batch_max)

    prewarm = args.prewarm
    if prewarm == "auto":
        try:
            import jax

            prewarm = "on" if jax.default_backend() == "tpu" else "off"
        except Exception:  # noqa: BLE001
            prewarm = "off"
    if prewarm in ("on", "full"):
        full = prewarm == "full"

        def _prewarm():
            try:
                manager.prewarm(buckets=full)
            except Exception as e:  # noqa: BLE001
                manager.prewarm_state = {"state": "failed",
                                         "error": str(e)[:200]}
                logger.warning("prewarm failed: %s", e)

        threading.Thread(target=_prewarm, daemon=True,
                         name="prewarm").start()

    stop = threading.Event()

    def shutdown(*_):
        logger.info("shutting down")
        stop.set()

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGINT, shutdown)
        signal.signal(signal.SIGTERM, shutdown)
    stop.wait()
    http_server.shutdown()
    grpc_server.stop(grace=2).wait()


if __name__ == "__main__":
    main()
