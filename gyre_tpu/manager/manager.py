"""EngineManager: model-set construction, engine registry, mesh scheduling.

The TPU-native re-design of the reference's EngineManager
(gyre/manager.py:597-2139). Key differences by design:

  * The per-GPU DeviceQueueSlot pool (reference :640-651, :2081-2139)
    becomes ONE dispatcher per jax Mesh: weights live on the mesh
    permanently (sharded by parallel/mesh.py), requests are serialized
    through a lock today and coalesced into shared compiled steps by the
    scheduler (scheduler.py) — no activate/deactivate device shuffling,
    because sharded HBM residency replaces swapping.
  * Model loading is functional: a ModelSet is built once per engine from
    safetensors / presets / random-init; LoRA/TI/mixes are weight-tree
    transforms, not runtime hooks.
"""

from __future__ import annotations

import logging
import os
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp

from ..models import configs
from ..models.modelset import ModelSet, random_modelset
from ..pipeline.unified import UnifiedPipeline
from . import engines_yaml

logger = logging.getLogger(__name__)

TASK_GROUPS = {
    "generate": "GENERATE",
    "upscaler": "UPSCALE",
    "upscale": "UPSCALE",
    "util": "UTILITY",
    "utility": "UTILITY",
    "hinter": "HINTER",
    "depth": "HINTER",
}


@dataclass
class EngineSpec:
    id: str
    name: str = ""
    description: str = ""
    enabled: bool = True
    visible: bool = True
    default: bool = False
    task: str = "generate"
    model: str | dict | None = None     # preset name / weights path / dict
    options: dict = field(default_factory=dict)
    params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineSpec":
        return cls(
            id=d.get("id", ""),
            name=d.get("name", d.get("id", "")),
            description=d.get("description", ""),
            enabled=bool(d.get("enabled", True)),
            visible=bool(d.get("visible", True)),
            default=bool(d.get("default", False)),
            task=str(d.get("task", d.get("class", "generate"))).lower(),
            model=d.get("model"),
            options=d.get("options") or {},
            params={k: v for k, v in d.items()
                    if k not in ("id", "name", "description", "enabled",
                                 "visible", "default", "task", "model",
                                 "options")},
        )


class EngineNotFoundError(KeyError):
    pass


class EngineManager:
    """Loads engines, owns the mesh executor, hands out pipelines."""

    def __init__(self, engine_specs: list[dict] | list[EngineSpec],
                 mesh=None, compute_dtype=jnp.bfloat16, batch_max: int = 4,
                 weight_resolver=None, interleave: int = 2,
                 gather_ms: float = 10.0, watchdog_s: float = 900.0):
        entries = [s for s in engine_specs if isinstance(s, dict)]
        hintset_entries = [e for e in entries if "hintset_id" in e]
        # model_id entries: the shared model registry "@ref"s resolve
        # through (reference @model_id memoization, gyre/manager.py:
        # 1602-1648 and config/models/*.yaml)
        self.model_entries: dict[str, dict] = {
            e["model_id"]: e for e in entries
            if isinstance(e.get("model_id"), str)}
        self.specs: list[EngineSpec] = [
            s if isinstance(s, EngineSpec) else EngineSpec.from_dict(s)
            for s in engine_specs
            if isinstance(s, EngineSpec) or
            (isinstance(s, dict) and s.get("id"))
        ]
        from ..models import configs as model_configs

        from .hints import HintsetManager

        self.hintsets = HintsetManager(
            hintset_entries, model_configs.SD15.unet,
            compute_dtype=compute_dtype,
            model_loader=self.load_model_entry)
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.batch_max = batch_max
        if weight_resolver is not None:
            self._weight_resolver = weight_resolver
        self._modelsets: dict[str, ModelSet] = {}
        self._pipelines: dict[str, UnifiedPipeline] = {}
        self._adapted: dict = {}
        # per-engine weight provenance for /status: "real" (checkpoint
        # loaded), "random" (random-init fallback — LOUD so no engine
        # silently serves untrained weights), "pending" (lazy, not yet
        # resolved). VERDICT r3 #4.
        self._weights_kind: dict[str, str] = {}
        # guards lazy model/pipeline construction only. Requests are NOT
        # serialized here: the CoalescingDispatcher's single thread is the
        # only serialization point for device work, so concurrent gRPC
        # requests reach its gather window and merge into shared batches
        # (the reference instead blocks whole requests on a device queue,
        # gyre/manager.py:2081-2139).
        self._load_lock = threading.RLock()
        self._loaded = False
        from .scheduler import CoalescingDispatcher

        # max merged rows == batch_max, exactly as the flag documents:
        # it is also the shape prewarm compiles and the pad-to-bucket
        # fallback target, so merges never exceed a warmed program
        # (an earlier 2x here made first merges pad to an unwarmed
        # double-size program — a minutes-scale compile stall)
        self.dispatcher = CoalescingDispatcher(max_batch=max(batch_max, 1),
                                               interleave=interleave,
                                               gather_ms=gather_ms,
                                               watchdog_s=watchdog_s)
        # /status surface: off -> running -> done|failed. Deployments (and
        # bench.py's warmboot phase) wait for "done" before treating the
        # server as steady-state: prewarm pre-EXECUTES each serving
        # program, absorbing the terminal-side first-execution cost that
        # the XLA disk cache cannot (remote-compile platforms codegen at
        # first execution; PERFORMANCE.md "Cold start").
        self.prewarm_state: dict = {"state": "off"}

    # ------------------------------------------------------------ loading

    def load_engines(self):
        """Build every enabled engine's ModelSet (reference loadPipelines,
        gyre/manager.py:1821-1854)."""
        for spec in self.specs:
            if not spec.enabled or spec.task not in ("generate",):
                continue
            if spec.id in self._modelsets:
                continue
            self.modelset(spec.id)  # includes engine fallback handling
            logger.info("engine %s loaded (%.1f MB params)", spec.id,
                        self._modelsets[spec.id].param_bytes() / 1e6)
        self._loaded = True

    loadPipelines = load_engines  # reference-compatible alias

    def _build_modelset(self, spec: EngineSpec) -> ModelSet:
        model = spec.model
        if isinstance(model, dict) and model.get("mix"):
            # model mixing: merge other engines' weights (reference
            # gyre/manager.py:1296-1443)
            from .mixing import mix_modelsets

            parts = []
            src_ids = []
            for entry in model["mix"]:
                if isinstance(entry, str):
                    entry = {"source": entry, "weight": 1.0}
                src = entry["source"]
                sub = None
                if isinstance(src, str):
                    src_ids.append(src.lstrip("@"))
                    sub = self.modelset(src_ids[-1])
                parts.append((sub, float(entry.get("weight", 1.0))))
            self._weights_kind[spec.id] = "real" if src_ids and all(
                self._weights_kind.get(i) == "real" for i in src_ids) \
                else "random"
            return mix_modelsets(parts,
                                 model.get("algorithm", "weighted_sum"),
                                 engine_id=spec.id)
        if isinstance(model, dict):
            path = model.get("path")
            preset = model.get("preset", "sd15")
            seed = int(model.get("seed", 0))
        elif isinstance(model, str) and model.startswith("preset/"):
            path, preset, seed = None, model.split("/", 1)[1], 0
        elif isinstance(model, str) and model:
            path, preset, seed = model, "sd15", 0
        else:
            path, preset, seed = None, "sd15", 0

        cfg = configs.PRESETS.get(preset)
        if cfg is None:
            raise ValueError(f"engine {spec.id}: unknown preset {preset!r}")

        if path:
            from ..models.load import load_modelset
            from .weights import WeightResolver

            if not hasattr(self, "_weight_resolver"):
                self._weight_resolver = WeightResolver()
            sub = pats = None
            if isinstance(model, dict):
                sub = model.get("subfolder")
                pats = model.get("allow_patterns")
            resolved = self._weight_resolver.resolve(
                path, subfolder=sub, allow_patterns=pats)
            ms = load_modelset(resolved, cfg, dtype=self.compute_dtype,
                               engine_id=spec.id)
            self._weights_kind[spec.id] = "real"
        else:
            ms = random_modelset(cfg, seed=seed, dtype=self.compute_dtype,
                                 engine_id=spec.id)
            self._weights_kind[spec.id] = "random"

        # '@engine-id' submodel references: share another engine's parts
        # (reference @model_id references with memoization,
        # gyre/manager.py:1602-1648) — shared trees also share HBM.
        if isinstance(model, dict):
            for part in ("vae", "text_encoder", "unet", "tokenizer"):
                ref = model.get(part)
                if not (isinstance(ref, str) and ref.startswith("@")):
                    continue
                src = self.modelset(ref[1:])
                if part == "vae":
                    ms.vae_params = src.vae_params
                elif part == "unet":
                    ms.unet_params = src.unet_params
                elif part == "text_encoder":
                    ms.text_params = src.text_params
                elif part == "tokenizer":
                    ms.tokenizer = src.tokenizer
        if self.mesh is not None:
            from ..parallel import mesh as pmesh

            ms = pmesh.shard_modelset(ms, self.mesh)
        return ms

    # ------------------------------------------------------------- access

    @property
    def engine_ids(self) -> list[str]:
        return [s.id for s in self.specs if s.enabled]

    def spec(self, engine_id: str) -> EngineSpec:
        for s in self.specs:
            if s.id == engine_id:
                return s
        raise EngineNotFoundError(engine_id)

    def default_engine_id(self) -> str | None:
        for s in self.specs:
            if s.enabled and s.default:
                return s.id
        return self.engine_ids[0] if self.engine_ids else None

    def modelset(self, engine_id: str) -> ModelSet:
        if engine_id not in self._modelsets:
            with self._load_lock:
                if engine_id in self._modelsets:
                    return self._modelsets[engine_id]
                spec = self.spec(engine_id)
                if not spec.enabled:
                    raise EngineNotFoundError(engine_id)
                try:
                    self._modelsets[engine_id] = self._build_modelset(spec)
                except Exception as e:  # noqa: BLE001
                    # engine `fallback:` spec (reference gyre/manager.py:
                    # 1662-1668): failed loads fall back to another engine
                    fb = spec.params.get("fallback")
                    if not fb:
                        raise
                    logger.warning("engine %s failed to load (%s); falling "
                                   "back to %s", engine_id, e, fb)
                    self._modelsets[engine_id] = self.modelset(fb)
        return self._modelsets[engine_id]

    def pipeline(self, engine_id: str) -> UnifiedPipeline:
        if engine_id not in self._pipelines:
            with self._load_lock:
                if engine_id in self._pipelines:
                    return self._pipelines[engine_id]
                spec = self.spec(engine_id)
                graft_ms = None
                graft_id = spec.params.get("graft") or \
                    (spec.options or {}).get("graft")
                if graft_id:
                    graft_ms = self.modelset(graft_id)
                pipe = UnifiedPipeline(
                    self.modelset(engine_id),
                    compute_dtype=self.compute_dtype, graft_ms=graft_ms)
                # `clip:` engine/model key -> real CLIP towers for
                # guidance & style hints (reference template key `clip:
                # "@clip-common"`, gyre/config/templates/
                # stable-diffusion-v1.yaml:26); loaded lazily on first
                # guidance/style request
                clip_ref = spec.params.get("clip") or \
                    spec.params.get("clip_model")
                if clip_ref is None and isinstance(spec.model, dict):
                    clip_ref = spec.model.get("clip")
                if clip_ref:
                    pipe.clip_source = (
                        lambda ref=clip_ref: self.clip_model(ref))
                self._pipelines[engine_id] = pipe
        return self._pipelines[engine_id]

    def adapted_pipeline(self, engine_id: str, loras=None, tis=None):
        """Pipeline view with LoRA/TI weight transforms folded in.

        loras: [(state_dict, scale, cache_key)], tis: [(state_dict,
        cache_key)]. Adapted weight trees are LRU-cached; compiled programs
        are shared with the base pipeline (params are traced args).
        """
        base = self.pipeline(engine_id)
        if not loras and not tis:
            return base
        def _skey(s):  # scalar or per-model dict ('*'/'unet'/'text_encoder')
            if isinstance(s, dict):
                return tuple(sorted((k, round(v, 4)) for k, v in s.items()))
            return round(s, 4)

        key = (engine_id,
               tuple((ck, _skey(s)) for _, s, ck in (loras or [])),
               tuple(ck for _, ck in (tis or [])))
        cached = self._adapted.get(key)
        if cached is not None:
            return cached
        # LoRA/TI folding is device work (W + scale*up@down matmuls): run
        # it on the dispatcher's device thread, not the calling gRPC
        # handler thread. Deliberately NOT under _load_lock — dispatcher
        # jobs may take that lock (task-pipeline builds), so holding it
        # across this wait could deadlock; a racing duplicate build is
        # just wasted work, serialized by the dispatcher, and the cache
        # insert is idempotent.
        return self.dispatcher.submit(
            lambda: (self._adapted.get(key) or
                     self._build_adapted(key, base, engine_id, loras,
                                         tis)),
            {}, solo=True).result()

    def _build_adapted(self, key, base, engine_id, loras, tis):

        from ..models.modelset import ModelSet
        from ..pipeline import lora as lora_mod

        ms = base.ms
        unet_p, text_p = ms.unet_params, list(ms.text_params)
        tokenizer = ms.tokenizer
        for state, scale, _ in loras or []:
            unet_p, text_p, n = lora_mod.apply_lora(unet_p, text_p, state,
                                                    scale)
            logger.info("lora applied to %s: %d modules (scale %s)",
                        engine_id, n, scale)
        if tis:
            embeddings = {}
            for state, _ in tis:
                embeddings.update(lora_mod.extract_ti_embeddings(state))
            tmp = ModelSet(config=ms.config, unet_params=unet_p,
                           vae_params=ms.vae_params, text_params=text_p,
                           tokenizer=tokenizer, schedule=ms.schedule,
                           id=ms.id)
            text_p, tokenizer = lora_mod.apply_textual_inversions(
                tmp, embeddings)
        new_ms = ModelSet(config=ms.config, unet_params=unet_p,
                          vae_params=ms.vae_params, text_params=text_p,
                          tokenizer=tokenizer, schedule=ms.schedule,
                          id=f"{ms.id}+adapters")
        view = base.derive(new_ms)
        if len(self._adapted) > 8:  # bounded weight-tree cache
            self._adapted.pop(next(iter(self._adapted)))
        self._adapted[key] = view
        return view

    @contextmanager
    def with_engine(self, engine_id: str | None = None,
                    task: str = "generate", loras=None, tis=None):
        """Borrow an engine for one request (reference gyre/manager.py:2081).

        On TPU this is NOT a device claim and NOT a serialization scope:
        weights are already resident on the mesh, and device work is
        serialized (and cross-request batched) by the dispatcher thread.
        Concurrent callers each get their pipeline immediately."""
        if not engine_id:
            engine_id = self.default_engine_id()
        yield self.adapted_pipeline(engine_id, loras, tis)

    def task_pipeline(self, task: str, engine_id: str | None = None):
        """Non-generate task engines (upscalers now; hinters as they land).
        Returns a callable pipeline or None (reference borrows engines by
        task, gyre/manager.py with_engine(task=...))."""
        task = {"upscale": "upscaler"}.get(task, task)
        candidates = [s for s in self.specs
                      if s.enabled and s.task == task and
                      (engine_id is None or s.id == engine_id)]
        if not candidates:
            return None
        spec = candidates[0]
        key = ("task", spec.id)
        if key not in self._adapted:
            with self._load_lock:
                return self._build_task_pipeline(spec, key)
        return self._adapted[key]

    def spec_state_dict(self, spec) -> dict | None:
        """Resolve an engine spec's `model:` to a loaded state dict:
        '@model-id' registry refs, HF repos, local paths. None when the
        spec has no weight reference or it is unavailable (task models
        then random-init so the graph stays runnable)."""
        model = spec.model
        if not isinstance(model, str) or not model or \
                model.startswith("preset/"):
            self._weights_kind[spec.id] = "random"
            return None
        try:
            state = self.load_model_entry(model)[0]
            self._weights_kind[spec.id] = "real"
            return state
        except Exception as e:  # noqa: BLE001
            logger.warning("engine %s: weights %s unavailable (%s); "
                           "random-init", spec.id, model, e)
            self._weights_kind[spec.id] = "random"
            return None

    def _build_task_pipeline(self, spec, key):
        if key not in self._adapted:
            if spec.task == "upscaler" and \
                    spec.params.get("kind") in ("sd-x2", "latent-x2", "x2"):
                # 2x latent diffusion upscaler (reference
                # config/engines/upscaler.yaml latent-upscaler-x2 via
                # StableDiffusionLatentUpscalePipeline)
                from ..pipeline.diffusion_upscaler import LatentUpscalerX2

                up_spec = EngineSpec(
                    id=spec.id, model=spec.model or "preset/upscaler-x2",
                    task="generate")
                ms = self._build_modelset(up_spec)
                up = LatentUpscalerX2(ms, compute_dtype=self.compute_dtype)
                steps = int(spec.params.get("steps", 30))
                self._adapted[key] = lambda img, _u=up: _u(img, steps=steps)
            elif spec.task == "upscaler" and \
                    spec.params.get("kind") in ("sd-x4", "diffusion",
                                                "latent"):
                # text-guided latent diffusion upscaler engine (reference
                # diffusers_upscaler_wrapper.py): full modelset, built the
                # same way generate engines are
                from ..pipeline.diffusion_upscaler import DiffusionUpscaler

                up_spec = EngineSpec(
                    id=spec.id, model=spec.model or "preset/upscaler-x4",
                    task="generate")
                ms = self._build_modelset(up_spec)
                up = DiffusionUpscaler(ms, compute_dtype=self.compute_dtype)
                steps = int(spec.params.get("steps", 20))
                noise_level = int(spec.params.get("noise_level", 20))
                self._adapted[key] = lambda img, _u=up: _u(
                    img, steps=steps, noise_level=noise_level)
            elif spec.task == "upscaler":
                state = self.spec_state_dict(spec)
                if spec.params.get("kind") == "hat":
                    import jax as _jax

                    from ..models import hat
                    from ..pipeline.upscaler import UpscalerPipeline

                    if state is not None:
                        h_params, h_cfg = hat.load_hat(state, jnp.float32)
                    else:
                        h_cfg = hat.HAT_TEST
                        h_params = hat.init(_jax.random.PRNGKey(0), h_cfg,
                                            dtype=jnp.float32)
                    self._adapted[key] = UpscalerPipeline(
                        h_params,
                        apply_fn=lambda p, x, s, c=h_cfg:
                        hat.apply(p, x, c, scale=s),
                        scale=h_cfg.scale,
                        tile=int(spec.params.get("tile", 64)),
                        overlap=h_cfg.window // 2,
                        compute_dtype=jnp.float32)
                elif spec.params.get("kind") == "swinir":
                    import jax as _jax

                    from ..models import swinir
                    from ..pipeline.upscaler import UpscalerPipeline

                    if state is not None:
                        sw_params, sw_cfg = swinir.load_swinir(state,
                                                               jnp.float32)
                    else:
                        sw_cfg = swinir.SWINIR_TEST
                        sw_params = swinir.init(_jax.random.PRNGKey(0),
                                                sw_cfg, dtype=jnp.float32)
                    self._adapted[key] = UpscalerPipeline(
                        sw_params,
                        apply_fn=lambda p, x, s, c=sw_cfg:
                        swinir.apply(p, x, c, scale=s),
                        scale=sw_cfg.scale,
                        tile=int(spec.params.get("tile", 64)),
                        overlap=sw_cfg.window // 2,
                        compute_dtype=jnp.float32)
                else:
                    from ..pipeline.upscaler import build_esrgan_pipeline

                    self._adapted[key] = build_esrgan_pipeline(
                        state_dict=state,
                        num_blocks=int(spec.params.get("blocks", 23)),
                        tile=int(spec.params.get("tile", 128)),
                        compute_dtype=self.compute_dtype)
            elif spec.task in ("face_restore", "codeformer"):
                import jax as _jax

                from ..models import codeformer

                state = self.spec_state_dict(spec)
                if state is not None:
                    cf_params, cf_cfg = codeformer.load_codeformer(
                        state, jnp.float32)
                else:
                    cf_cfg = codeformer.CODEFORMER_TEST
                    cf_params = codeformer.init(_jax.random.PRNGKey(0),
                                                cf_cfg, dtype=jnp.float32)
                fidelity = float(spec.params.get("fidelity", 0.5))
                fn = _jax.jit(lambda pr, x: codeformer.restore(
                    pr, x, fidelity=fidelity, cfg=cf_cfg))

                def run_restore(img, _fn=fn, _p=cf_params, _c=cf_cfg):
                    img = jnp.asarray(img, jnp.float32)
                    b, h, w, _ = img.shape
                    s = _c.img_size
                    if (h, w) != (s, s):  # restore at native size
                        import jax

                        small = jax.image.resize(img, (b, s, s, 3),
                                                 "bilinear")
                        out = _fn(_p, small)
                        return jax.image.resize(out, (b, h, w, 3),
                                                "bilinear")
                    return _fn(_p, img)

                self._adapted[key] = run_restore
            elif spec.task in ("depth", "hinter", "edge", "segmentation",
                               "background_removal", "pose", "normal"):
                self._adapted[key] = self._build_hinter(spec)
            else:
                return None
        return self._adapted[key]

    def _build_hinter(self, spec: EngineSpec):
        """Depth / edge hinter pipelines (reference task pipelines,
        gyre/pipeline/depth/ + hinters/)."""
        import jax as _jax

        from ..models import hinters

        kind = spec.params.get("kind") or spec.task
        seed = int(spec.params.get("seed", 0))
        if kind in ("zoe", "zoedepth"):
            # metric depth: ZoeDepth attractor-bins head over the DPT
            # trunk (reference zoe_model_wrapper.py / zoe_depth_pipeline)
            from ..models import dpt
            from ..models import zoedepth as zoe

            state = self.spec_state_dict(spec)
            trunk_cfg, zcfg = dpt.DPT_TEST, zoe.ZOE_TEST
            trunk = head = None
            if state is not None:
                try:
                    head, zcfg = zoe.load_zoe_head(state)
                except Exception as e:  # noqa: BLE001
                    logger.warning("zoe head load failed (%s); "
                                   "random-init", e)
                core = {k.split("core.core.", 1)[1]: v
                        for k, v in state.items() if "core.core." in k}
                if core:
                    try:
                        trunk, trunk_cfg = dpt.load_dpt(core)
                    except Exception as e:  # noqa: BLE001
                        logger.warning(
                            "zoe trunk is not a DPT/MiDaS layout this "
                            "build can load (%s); trunk random-init "
                            "(BEiT backbones unsupported)", e)
            if head is None:
                import dataclasses as _dc

                zcfg = _dc.replace(zoe.ZOE_TEST,
                                   btlnck_features=trunk_cfg.fusion,
                                   num_out_features=trunk_cfg.fusion)
                head = zoe.init(_jax.random.PRNGKey(seed), zcfg,
                                dtype=jnp.float32)
            if trunk is None:
                trunk = dpt.init(_jax.random.PRNGKey(seed + 1), trunk_cfg,
                                 dtype=jnp.float32)
            zsize = int(spec.params.get(
                "size", trunk_cfg.grid * trunk_cfg.patch))
            zfn = _jax.jit(lambda t, h, x: zoe.estimate_depth_hint(
                t, h, x, trunk_cfg, zcfg, size=zsize))

            def run_zoe(img):
                d = zfn(trunk, head, jnp.asarray(img, jnp.float32))
                return jnp.tile(d, (1, 1, 1, 3))

            return run_zoe
        if kind in ("depth", "midas", "dpt"):
            from ..models import dpt

            state = self.spec_state_dict(spec)
            if state is not None:
                params, cfg = dpt.load_dpt(state)
                size = int(spec.params.get("size", cfg.grid * cfg.patch))
            else:
                cfg = dpt.DPT_TEST
                params = dpt.init(_jax.random.PRNGKey(seed), cfg,
                                  dtype=jnp.float32)
                size = cfg.grid * cfg.patch
            fn = _jax.jit(lambda p, x: dpt.estimate_depth(p, x, cfg, size))

            def run(img):
                d = fn(params, jnp.asarray(img, jnp.float32))
                return jnp.tile(d, (1, 1, 1, 3))

            return run
        if kind in ("segmentation", "seg", "uniformer"):
            # UniFormer + UPerHead (reference mmseg_pipeline.py over the
            # vendored UniFormer backbone), ADE-palette render
            from ..models import uniformer as uni

            state = self.spec_state_dict(spec)
            if state is not None:
                uparams, ucfg2 = uni.load_uniformer(state)
            else:
                ucfg2 = uni.UNIFORMER_TEST
                uparams = uni.init(_jax.random.PRNGKey(seed), ucfg2,
                                   dtype=jnp.float32)
            fn = _jax.jit(lambda p, x: uni.apply(p, x, ucfg2))
            return lambda img: fn(uparams, jnp.asarray(img, jnp.float32))
        if kind in ("normal", "bae", "baenormal"):
            # BAE surface-normal estimation (reference
            # baenormal_pipeline.py over the vendored NNET)
            from ..models import baenormal as bae

            state = self.spec_state_dict(spec)
            if state is not None:
                params, bcfg = bae.load_baenormal(state)
            else:
                bcfg = bae.EFFNET_TEST
                params = bae.init(_jax.random.PRNGKey(seed), bcfg,
                                  dtype=jnp.float32)
            fn = _jax.jit(lambda p, x: bae.apply(p, x, bcfg))
            return lambda img: fn(params, jnp.asarray(img, jnp.float32))
        if kind in ("background_removal", "bg", "inspyrenet"):
            # InSPyReNet saliency pyramid (reference
            # inspyrenet_pipeline.py over the vendored SwinB model);
            # checkpoint-loadable, else random-init at test scale
            from ..models import inspyrenet as isp

            state = self.spec_state_dict(spec)
            if state is not None:
                params, icfg = isp.load_inspyrenet(state)
            else:
                icfg = isp.SWIN_TEST
                params = isp.init(_jax.random.PRNGKey(seed), icfg,
                                  dtype=jnp.float32)
            fn = _jax.jit(lambda p, x: isp.apply(p, x, icfg))

            # inference cap (reference MAX_RES=1280), engine-overridable
            # (tests exercise the scaled/guided path at toy sizes)
            MAX_RES = int(spec.params.get("max_res", 1280))
            MAX_RES = -(-MAX_RES // 32) * 32  # keep a multiple of 32

            def run(img):
                # geometry per the reference inspyrenet_pipeline.py:41-95:
                # pad top/left to square, cap inference at 1280^2, resize
                # the mask back, guided-filter refinement when the input
                # exceeds 2x the inference size, then shrink the mask
                img = jnp.asarray(img, jnp.float32)
                rgb = img[..., :3]
                b, h, w, _ = rgb.shape
                if max(h, w) > MAX_RES:
                    maxdim = max(h, w)
                    scaled = True
                    use_gf = MAX_RES / maxdim < 0.5
                else:
                    maxdim = max(-(-h // 32) * 32, -(-w // 32) * 32)
                    scaled = False
                    use_gf = False
                ph, pw = maxdim - h, maxdim - w
                mode = "reflect" if ph < h and pw < w else "edge"
                sample = jnp.pad(rgb, ((0, 0), (ph, 0), (pw, 0), (0, 0)),
                                 mode=mode)
                if scaled:  # square maxdim -> exactly 1280 (mult of 32)
                    sample = _jax.image.resize(
                        sample, (b, MAX_RES, MAX_RES, 3), "bilinear")
                pred = fn(params, sample)
                if scaled:
                    pred = _jax.image.resize(
                        pred, (b, maxdim, maxdim, 1), "bilinear")
                pred = pred[:, ph:, pw:, :]
                if use_gf:
                    from ..ops import images as I

                    gp = jnp.clip(I.guided_filter(rgb, pred, radius=32,
                                                  eps=1e-6), 0.0, 1.0)
                    pred = jnp.maximum(gp, pred)
                pred = jnp.clip((pred - 0.2) / 0.8, 0.0, 1.0)
                return jnp.concatenate([rgb, pred], axis=-1)

            return run
        if kind in ("pose", "openpose", "keypose"):
            from ..models import pose as pose_mod

            state = self.spec_state_dict(spec)
            body = state is not None
            if body:
                # published openpose body checkpoint
                # (@body-pose-network, config/models/hinters.yaml)
                params = pose_mod.load_body(state, dtype=jnp.float32)
            else:
                params = pose_mod.init(_jax.random.PRNGKey(seed),
                                       dtype=jnp.float32)
            # top-down refinement by default (the reference's pose stack
            # is top-down mmdet+mmpose); `refine: none` keeps the single
            # bottom-up pass
            if str(spec.params.get("refine", "topdown")) != "none":
                return pose_mod.make_topdown(params, body=body)
            est = pose_mod.estimate_and_render_body if body \
                else pose_mod.estimate_and_render_multi
            fn = _jax.jit(est, static_argnames=("style",))

            def run(img, style: str = "openpose"):
                return fn(params, jnp.asarray(img, jnp.float32),
                          style=style)

            return run
        if kind in ("mlsd", "lines"):
            # MobileV2_MLSD_Large (reference vendors the torch model,
            # gyre/pipeline/hinters/models/mbv2_mlsd_large.py, serving
            # mlsd_large_512_fp32.pth)
            from ..models import mlsd as mlsd_mod

            state = self.spec_state_dict(spec)
            if state is not None:
                params = mlsd_mod.load_mlsd(state, dtype=jnp.float32)
            else:
                params = mlsd_mod.init(_jax.random.PRNGKey(seed),
                                       dtype=jnp.float32)
            fn = _jax.jit(mlsd_mod.apply)
            return lambda img: fn(params, jnp.asarray(img, jnp.float32))
        if kind == "dexined":
            # dense-inception edge detector (reference
            # dexined_pipeline.py via kornia.filters.DexiNed)
            state = self.spec_state_dict(spec)
            params = None
            if state is not None:
                try:
                    params = hinters.load_dexined_params(state)
                except KeyError as e:
                    logger.warning("dexined checkpoint naming mismatch "
                                   "(%s); random-init", e)
            if params is None:
                params = hinters.dexined_init(_jax.random.PRNGKey(seed),
                                              dtype=jnp.float32)
            fn = _jax.jit(hinters.dexined_apply)

            def run(img):
                e = fn(params, jnp.asarray(img, jnp.float32))
                return jnp.tile(e, (1, 1, 1, 3))

            return run
        if kind in ("drawings", "informative_drawings", "lineart"):
            # line-art hinter (reference informative_drawing_pipeline.py +
            # vendored hinters/models/informative_drawings.py)
            state = self.spec_state_dict(spec)
            if state is not None:
                params = hinters.load_drawings_params(state)
            else:
                params = hinters.drawings_init(_jax.random.PRNGKey(seed),
                                               dtype=jnp.float32)
            fn = _jax.jit(hinters.drawings_apply)

            def run(img):
                e = fn(params, jnp.asarray(img, jnp.float32))
                return jnp.tile(e, (1, 1, 1, 3))

            return run
        if kind in ("edge", "hinter", "hed", "soft_edge"):
            state = self.spec_state_dict(spec)
            if state is not None:
                params = hinters.load_hed_params(state)
            else:
                params = hinters.hed_init(_jax.random.PRNGKey(seed),
                                          dtype=jnp.float32)
            fn = _jax.jit(hinters.hed_apply)

            def run(img):
                e = fn(params, jnp.asarray(img, jnp.float32))
                return jnp.tile(e, (1, 1, 1, 3))

            return run
        return None

    def prewarm(self, engine_id: str | None = None, *, height: int = 512,
                width: int = 512, steps: int = 50, buckets: bool = False):
        """Compile the default engine's serving StaticSpec ahead of the
        first request (VERDICT: 128 s first-image cold starts). Runs one
        1-sample generate at the default sampler/shape; with the
        persistent compilation cache configured this also seeds the
        on-disk cache for future processes. Sigma-ramp padding makes the
        warmed programs serve ANY step count <= 150 at this shape.
        buckets=True additionally warms the dispatcher's max-batch
        coalescer bucket, so burst traffic after boot is compile-free
        (--prewarm full)."""
        import time as _time

        import numpy as _np

        import threading as _threading

        eid = engine_id or self.default_engine_id()
        if eid is None:
            return
        spec = self.spec(eid)
        sampler = (spec.options or {}).get("sampler", "k_dpmpp_2m")
        t0 = _time.time()
        self.prewarm_state = {"state": "running", "engine": eid}
        pipe = self.pipeline(eid)
        # match the SERVING configuration exactly: the servicer always
        # passes a stop_event, which turns on chunked dispatch (one
        # shared segment program + init/decode) — warming the unchunked
        # variant would compile a program requests never run. Route
        # through the dispatcher so the single device-owner thread does
        # the compile (prewarm runs on a background thread; direct pipe()
        # calls here would race request dispatches on the device).
        ev = _threading.Event()
        kwargs = dict(prompt="prewarm", height=height, width=width,
                      steps=steps, sampler=sampler, seeds=[0],
                      guidance_scale=7.5, stop_event=ev, chunk_steps=10,
                      output_dtype="uint8")
        _np.asarray(self.dispatcher.submit(pipe, kwargs, ev).result())
        sizes = [1]
        if buckets and self.dispatcher.max_batch > 1:
            bkw = dict(kwargs,
                       seeds=list(range(self.dispatcher.max_batch)))
            _np.asarray(self.dispatcher.submit(pipe, bkw, ev).result())
            sizes.append(self.dispatcher.max_batch)
        # extra serving shapes the engine declares (engines.yaml
        # `options: {prewarm_sizes: [[768, 768], ...]}`) — each is a
        # separate compiled program shape
        extra = (spec.options or {}).get("prewarm_sizes") or []
        for hw in extra:
            try:
                h, w = int(hw[0]), int(hw[1])
            except Exception:  # noqa: BLE001
                logger.warning("bad prewarm_sizes entry %r", hw)
                continue
            if (h, w) == (height, width):
                continue
            skw = dict(kwargs, height=h, width=w)
            _np.asarray(self.dispatcher.submit(pipe, skw, ev).result())
        self.prewarm_state = {"state": "done", "engine": eid,
                              "seconds": round(_time.time() - t0, 1),
                              "sizes": sizes}
        logger.info("prewarm %s (%dx%d steps=%d %s batch=%s extra=%s) "
                    "in %.1fs", eid, width, height, steps, sampler, sizes,
                    extra, _time.time() - t0)

    def safety_checker(self):
        """Trained NSFW checker from config, or None. Sources, in order: a
        spec with task 'safety', or a 'safety_checker:' key on any engine
        spec (reference swaps the checker per modelset,
        gyre/manager.py:1283-1288)."""
        if hasattr(self, "_safety_checker"):
            return self._safety_checker
        from ..pipeline.safety import SafetyChecker

        ref = None
        for s in self.specs:
            if s.task in ("safety", "safety_checker") and s.enabled:
                ref = s.model
                break
            sc = s.params.get("safety_checker")
            if sc and s.enabled:
                ref = sc
                break
        checker = None
        if isinstance(ref, str) and ref:
            try:
                from .weights import WeightResolver

                if not hasattr(self, "_weight_resolver"):
                    self._weight_resolver = WeightResolver()
                path = self._weight_resolver.resolve(ref)
                if os.path.isdir(path):
                    for cand in ("model.safetensors",
                                 os.path.join("safety_checker",
                                              "model.safetensors")):
                        p = os.path.join(path, cand)
                        if os.path.exists(p):
                            path = p
                            break
                checker = SafetyChecker.load(path)
                logger.info("safety checker loaded from %s", ref)
            except Exception as e:  # noqa: BLE001
                logger.warning("safety checker %s failed to load: %s", ref,
                               e)
        self._safety_checker = checker
        return checker

    def load_model_entry(self, ref: str):
        """'@model-id' registry reference or direct path/repo -> (state
        dict, config entry, resolved path). The entry's model/subfolder/
        allow_patterns keys drive weight resolution (reference
        model-config loading, gyre/manager.py:1602-1698)."""
        from ..models.load import read_state_dict

        from .weights import WeightResolver

        entry: dict = {}
        src = ref
        seen: set[str] = set()
        # follow '@a' -> '@b' alias chains (reference clip-common ->
        # @laion-clip-h, gyre/config/models/clip.yaml); later entries in
        # the chain keep the first entry's subfolder/patterns when unset
        while isinstance(src, str) and src.startswith("@"):
            mid = src[1:]
            if mid in seen:
                raise ValueError(f"model_id reference cycle at {mid!r}")
            seen.add(mid)
            if mid not in self.model_entries:
                raise KeyError(f"unknown model_id {mid!r}")
            nxt = self.model_entries[mid]
            entry = {**nxt, **{k: v for k, v in entry.items()
                               if k in ("subfolder", "allow_patterns")}}
            src = nxt.get("model") or nxt.get("source")
            if not isinstance(src, str):
                raise ValueError(f"model_id {mid!r} has no model reference")
        if not hasattr(self, "_weight_resolver"):
            self._weight_resolver = WeightResolver()
        path = self._weight_resolver.resolve(
            src, subfolder=entry.get("subfolder"),
            allow_patterns=entry.get("allow_patterns"))
        return read_state_dict(path), entry, path

    def clip_model(self, ref: str):
        """Full CLIPModel (text+vision towers with joint-space
        projections) for guidance / style hints, memoized per ref — the
        reference's `clip` model type (gyre/manager.py:1540-1560,
        config/models/clip.yaml). Returns (text_params, text_cfg,
        vision_params, vision_cfg)."""
        if not hasattr(self, "_clip_models"):
            self._clip_models = {}
        if ref in self._clip_models:
            return self._clip_models[ref]
        with self._load_lock:
            if ref in self._clip_models:
                return self._clip_models[ref]
            from ..models.load import load_clip_model_params

            state, entry, path = self.load_model_entry(ref)
            act = entry.get("activation")
            t_heads = v_heads = None
            if os.path.isdir(path):
                # transformers config.json records hidden_act (openai
                # quick_gelu vs laion-OpenCLIP gelu) and head counts —
                # neither derivable from the weights
                cfg_file = os.path.join(path, "config.json")
                if os.path.exists(cfg_file):
                    import json

                    with open(cfg_file) as f:
                        cj = json.load(f)
                    tc = cj.get("text_config") or {}
                    vc = cj.get("vision_config") or {}
                    act = act or tc.get("hidden_act") or cj.get("hidden_act")
                    t_heads = tc.get("num_attention_heads")
                    v_heads = vc.get("num_attention_heads")
            loaded = load_clip_model_params(
                state, dtype=self.compute_dtype, activation=act,
                text_heads=t_heads, vision_heads=v_heads)
            self._clip_models[ref] = loaded
            logger.info("clip model %s loaded (text %dL/%dd, vision %dL/%dd"
                        " -> joint %dd)", ref, loaded[1].num_layers,
                        loaded[1].hidden_size, loaded[3].num_layers,
                        loaded[3].hidden_size, loaded[3].projection_dim)
            return loaded

    def hint_model(self, hint_type: str, engine_id: str | None = None):
        """Conditioning model for a hint type, matched to the engine's
        unet architecture and the engine's configured hintset (reference
        `hintset:` engine key)."""
        eid = engine_id or self.default_engine_id()
        ms = self._modelsets.get(eid)
        cfg = ms.config.unet if ms else None
        hintset = None
        try:
            hintset = self.spec(eid).params.get("hintset") if eid else None
        except EngineNotFoundError:
            pass
        return self.hintsets.for_type(hint_type, cfg, hintset=hintset)

    def suggest_max_batch(self, engine_id: str, height: int = 512,
                          width: int = 512) -> int:
        """HBM-budget batch estimate (the reference's BatchMode
        points/autodetect analogue, gyre/manager.py:202-282: instead of
        CUDA probe runs, estimate from device memory stats and the
        engine's activation footprint)."""
        from ..utils.monitor import device_memory_stats

        stats = device_memory_stats()
        limit = max((s.get("bytes_limit") or 0) for s in stats) or \
            16 * 1024 ** 3
        used = max((s.get("bytes_in_use") or 0) for s in stats)
        free = max(limit - used, 1 << 30)
        per_image = self._probe_bytes_per_image(engine_id, height, width)
        return max(1, min(int(free / per_image), 64))

    def _probe_bytes_per_image(self, engine_id: str, height: int,
                               width: int) -> float:
        """Measured activation footprint: AOT-compile the engine's CFG
        unet step at a small batch and read XLA's memory_analysis — the
        TPU-native replacement for the reference's binary-search CUDA
        probe runs (gyre/manager.py:230-282), with no device execution.
        Results cache per (engine, resolution); the persistent XLA cache
        makes repeat probes cheap. Falls back to a config-scaled estimate
        when the backend hides the analysis."""
        key = ("batch_probe", engine_id, height, width)
        if key in self._adapted:
            return self._adapted[key]
        import jax

        from ..models import unet as unet_mod

        pipe = self.pipeline(engine_id)
        ucfg = pipe.ms.config.unet
        cdt = self.compute_dtype
        per = None
        try:
            b = 4  # 2 images x CFG
            shapes = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                pipe.ms.unet_params)
            x = jax.ShapeDtypeStruct(
                (b, height // 8, width // 8, ucfg.in_channels), cdt)
            t = jax.ShapeDtypeStruct((b,), jnp.float32)
            ctx = jax.ShapeDtypeStruct(
                (b, 77, ucfg.cross_attention_dim), cdt)
            compiled = jax.jit(
                lambda p, x, t, c: unet_mod.apply(p, ucfg, x, t, c)
            ).lower(shapes, x, t, ctx).compile()
            mem = compiled.memory_analysis()
            temp = getattr(mem, "temp_size_in_bytes", None)
            if temp:
                # CFG doubles the rows: 2 unet rows per image, plus the
                # sampler's carried latents (small) and a safety margin
                per = 2 * (temp / b) * 1.25
        except Exception as e:  # noqa: BLE001
            logger.info("batch probe unavailable (%s); using estimate", e)
        if not per:
            # config-scaled analytic estimate: ~12 live level-0-sized
            # activation maps per CFG row in bf16/f32
            c0 = ucfg.block_out_channels[0]
            bytes_el = 2 if cdt == jnp.bfloat16 else 4
            per = 2 * 12 * (height // 8) * (width // 8) * c0 * bytes_el * 4
        self._adapted[key] = per
        return per

    def engine_ready(self, spec) -> bool:
        """Generate engines: ready only once their weights are resident
        (the boot window must NOT report ready — health checks gate
        traffic on this). Task engines (hinters/upscalers) load lazily
        on first use: ready after startup."""
        return spec.id in self._modelsets or \
            (self._loaded and spec.task not in ("generate",))

    def status(self) -> list[dict]:
        return [
            {"id": s.id, "name": s.name, "task": s.task,
             "ready": self.engine_ready(s),
             "enabled": s.enabled, "default": s.default,
             "visible": s.visible,
             # "real" = checkpoint loaded, "random" = random-init
             # fallback (loud), "pending" = lazy engine not yet built
             "weights": self._weights_kind.get(s.id, "pending")}
            for s in self.specs
        ]


def manager_from_yaml(path: str, flags: dict | None = None,
                      **kwargs) -> EngineManager:
    entries = engines_yaml.load(path, flags or {})
    return EngineManager(entries, **kwargs)
