"""GenerationService: the main gRPC surface.

Re-implements the reference servicer's behavior
(gyre/services/generate.py:935-1371): parameter extraction from the proto,
per-request seeds with batch splitting, streaming Answer artifacts with PNG
metadata, ChainGenerate stage routing, and the Async trio with deadline GC
and cancellation.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
import uuid as uuidlib
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..generated import generation_pb2 as pb
from ..ops import images as I
from ..pipeline.samplers import PROTO_SAMPLERS
from .exception_to_grpc import CacheKeyError, exception_to_grpc

logger = logging.getLogger(__name__)

MAX_SEED = 2 ** 32 - 1


# -------------------------------------------------------------- extraction


@dataclass
class ExtractedParams:
    """Everything the pipeline needs, pulled from a generation Request
    (the reference's ParameterExtractor field set,
    gyre/services/generate.py:393-932, 1016-1019)."""

    engine_id: str = ""
    request_id: str = ""
    prompt: str = ""
    negative_prompt: str = ""
    height: int = 512
    width: int = 512
    steps: int = 50
    samples: int = 1
    seeds: list = field(default_factory=list)
    sampler: str = "k_dpmpp_2m"
    guidance_scale: float = 7.5
    eta: float | None = None
    churn: float = 0.0
    churn_tmin: float = 0.0
    churn_tmax: float = 0.0
    sigma_min: float | None = None
    sigma_max: float | None = None
    karras_rho: float | None = None
    noise_type: str = "normal"
    warmup_lms: bool = False
    ddim_cutoff: float = 0.0
    strength: float = 1.0
    init_image: np.ndarray | None = None
    mask_image: np.ndarray | None = None
    depth_map: np.ndarray | None = None
    masked_area_init: str = "shaped"
    hires_fix: bool | None = None
    hires_oos_fraction: float = 0.25
    clip_guidance_scale: float = 0.0
    clip_guidance_options: dict | None = None
    cfg_sequential: bool = False
    tome_ratio: float = 0.0
    tiling: bool | str = False
    clip_layer: int = 0
    echo_artifacts: list = field(default_factory=list)
    lora_artifacts: list = field(default_factory=list)
    ti_artifacts: list = field(default_factory=list)
    hint_images: list = field(default_factory=list)


def extract_params(request: pb.Request, adjuster=None) -> ExtractedParams:
    """adjuster(img, adjustments) applies ImageAdjustment chains (wired to
    services/adjustments.py by the servicer; None skips them)."""
    p = ExtractedParams(engine_id=request.engine_id,
                        request_id=request.request_id)

    def adjust(img, art, post=False):
        chain = art.postAdjustments if post else art.adjustments
        if adjuster is not None and len(chain):
            return np.asarray(adjuster(img, chain))
        return img

    def artifact_image(art, stage=pb.ARTIFACT_AFTER_ADJUSTMENTS, depth=0):
        """Artifact -> decoded image, resolving in-request
        ArtifactReference chains (uuid/id) at the referenced stage and
        applying this artifact's own adjustment chain on top — the
        reference's _image_from_artifact(_reference)
        (gyre/services/generate.py:476-516). Powers the client's
        mask-from-init-alpha and hint-from-init idioms, which send a
        `ref` artifact whose adjustments derive the mask/hint."""
        if depth > 8:
            raise ValueError("artifact reference chain too deep (cycle?)")
        if art.WhichOneof("data") == "ref":
            want = art.ref.WhichOneof("reference")
            img = None
            for other in request.prompt:
                if other.WhichOneof("prompt") != "artifact":
                    continue
                o = other.artifact
                if (want == "uuid" and o.uuid == art.ref.uuid) or \
                        (want == "id" and o.id == art.ref.id):
                    img = artifact_image(o, art.ref.stage, depth + 1)
                    break
            if img is None:
                raise ValueError(
                    f"artifact reference {art.ref.uuid or art.ref.id!r} "
                    "matches no artifact in this request")
        else:
            img = I.decode_png(art.binary)
        if stage != pb.ARTIFACT_BEFORE_ADJUSTMENTS:
            img = adjust(img, art)
        if stage == pb.ARTIFACT_AFTER_POSTADJUSTMENTS:
            img = adjust(img, art, post=True)
        return img

    pos, neg = [], []
    for prompt in request.prompt:
        which = prompt.WhichOneof("prompt")
        weight = 1.0
        if prompt.HasField("parameters") and prompt.parameters.HasField("weight"):
            weight = prompt.parameters.weight
        if which == "text":
            text = prompt.text
            if weight < 0:
                neg.append((text, -weight))
            else:
                pos.append((text, weight))
            if prompt.HasField("parameters") and \
                    prompt.parameters.HasField("clip_layer"):
                p.clip_layer = -int(prompt.parameters.clip_layer)
        elif which == "artifact":
            art = prompt.artifact
            if art.type == pb.ARTIFACT_IMAGE:
                img = artifact_image(art)
                if prompt.HasField("parameters") and \
                        prompt.parameters.init:
                    p.init_image = img[..., :3]
                    if img.shape[-1] == 4:  # mask in alpha
                        alpha = img[..., 3:]
                        if (alpha < 0.999).any():
                            p.mask_image = 1.0 - alpha
                else:
                    p.init_image = img[..., :3]
                if prompt.echo_back:
                    p.echo_artifacts.append(art)
            elif art.type == pb.ARTIFACT_MASK:
                mask = artifact_image(art, pb.ARTIFACT_AFTER_POSTADJUSTMENTS)
                p.mask_image = mask[..., :1]
            elif art.type == pb.ARTIFACT_DEPTH:
                depth = artifact_image(art)
                p.depth_map = depth[..., :1]
            elif art.type == pb.ARTIFACT_LORA:
                # per-model weights: '*' from the scalar weight field,
                # named_weights entries override it (reference
                # gyre/services/generate.py:835-847)
                weights = {}
                if prompt.HasField("parameters"):
                    if prompt.parameters.HasField("weight"):
                        weights["*"] = prompt.parameters.weight
                    for nw in prompt.parameters.named_weights:
                        weights[nw.name] = nw.weight
                p.lora_artifacts.append((art, weights or weight))
            elif art.type == pb.ARTIFACT_TOKEN_EMBEDDING:
                # token_overrides rename embedding tokens: named overrides
                # match original_token, free overrides consume tokens in
                # order (reference gyre/services/generate.py:857-880)
                overrides = []
                if prompt.HasField("parameters"):
                    overrides = [
                        (ov.original_token if ov.HasField("original_token")
                         else None, ov.token)
                        for ov in prompt.parameters.token_overrides]
                p.ti_artifacts.append((art, tuple(overrides)))
            elif art.type == pb.ARTIFACT_HINT_IMAGE:
                # priority -> soft_injection / cfg_only, reference
                # gyre/services/generate.py:812-819 + the
                # unified_pipeline.py:2028-2029 mapping
                priority = "balanced"
                if prompt.HasField("parameters") and \
                        prompt.parameters.HasField("hint_priority"):
                    priority = {
                        pb.HINT_BALANCED: "balanced",
                        pb.HINT_PRIORITISE_HINT: "hint",
                        pb.HINT_PRIORITISE_PROMPT: "prompt",
                    }[prompt.parameters.hint_priority]
                p.hint_images.append((art.hint_image_type,
                                      artifact_image(art), weight,
                                      priority))

    def join(frags):
        return " ".join(t if w == 1.0 else f"({t}:{w:g})" for t, w in frags)

    p.prompt = join(pos)
    p.negative_prompt = join(neg)

    img = request.image
    if img.height:
        p.height = img.height
    if img.width:
        p.width = img.width
    if img.steps:
        p.steps = img.steps
    if img.samples:
        p.samples = img.samples
    p.seeds = list(img.seed)

    if img.HasField("transform") and img.transform.WhichOneof("type") == "diffusion":
        p.sampler = PROTO_SAMPLERS[img.transform.diffusion]

    for sp in img.parameters:
        if sp.HasField("sampler"):
            s = sp.sampler
            if s.HasField("cfg_scale"):
                p.guidance_scale = s.cfg_scale
            if s.HasField("eta"):
                p.eta = s.eta
            if s.HasField("churn"):
                p.churn = s.churn.churn
                if s.churn.HasField("churn_tmin"):
                    p.churn_tmin = s.churn.churn_tmin
                if s.churn.HasField("churn_tmax"):
                    p.churn_tmax = s.churn.churn_tmax
            if s.HasField("sigma"):
                if s.sigma.HasField("sigma_min"):
                    p.sigma_min = s.sigma.sigma_min
                if s.sigma.HasField("sigma_max"):
                    p.sigma_max = s.sigma.sigma_max
                if s.sigma.HasField("karras_rho"):
                    p.karras_rho = s.sigma.karras_rho
            if s.HasField("noise_type"):
                p.noise_type = ("brownian" if s.noise_type ==
                                pb.SAMPLER_NOISE_BROWNIAN else "normal")
        if sp.HasField("schedule"):
            if sp.schedule.HasField("start"):
                p.strength = sp.schedule.start
        if sp.HasField("guidance"):
            g = sp.guidance
            if g.guidance_preset != pb.GUIDANCE_PRESET_NONE:
                p.clip_guidance_scale = 0.5
                for inst in g.instances:
                    if inst.HasField("guidance_strength"):
                        p.clip_guidance_scale = inst.guidance_strength

    if img.HasField("masked_area_init"):
        p.masked_area_init = {
            pb.MASKED_AREA_INIT_ZERO: "zero",
            pb.MASKED_AREA_INIT_RANDOM: "random",
            pb.MASKED_AREA_INIT_ORIGINAL: "original",
        }.get(img.masked_area_init, "shaped")

    if img.HasField("hires"):
        p.hires_fix = img.hires.enable
        if img.hires.HasField("oos_fraction"):
            p.hires_oos_fraction = img.hires.oos_fraction

    if img.tiling:
        p.tiling = True
    elif img.tiling_x or img.tiling_y:
        p.tiling = ("x" if img.tiling_x else "") + ("y" if img.tiling_y else "")

    return p


def fill_seeds(p: ExtractedParams) -> list[int]:
    """Extend provided seeds to `samples` (reference batched_seeds fill,
    gyre/services/generate.py:959-990)."""
    seeds = [s & MAX_SEED for s in p.seeds if s]
    if not seeds:
        seeds = [np.random.randint(0, MAX_SEED)]
    while len(seeds) < p.samples:
        seeds.append((seeds[-1] + 1) & MAX_SEED)
    return seeds[:p.samples]


# ---------------------------------------------------------------- servicer


def negotiate_mime(accept: str) -> str:
    """Request.accept (HTTP-style media-range list with optional q
    values) -> the answer mime type. The reference content-negotiates
    each artifact against ["image/png", "image/webp"] via
    accept_types.get_best_match (gyre/services/generate.py:64-73);
    png is served when nothing matches."""
    if not accept:
        return "image/png"
    best, best_q = "image/png", 0.0
    for part in accept.split(","):
        fields = part.strip().split(";")
        media = fields[0].strip().lower()
        q = 1.0
        for f in fields[1:]:
            k, _, v = f.partition("=")
            if k.strip() == "q":
                try:
                    q = float(v)
                except ValueError:
                    q = 0.0
        for cand in ("image/png", "image/webp"):
            if media in (cand, "image/*", "*/*") and q > best_q:
                best, best_q = cand, q
    return best


def image_to_artifact(img: np.ndarray, *, index: int, seed: int,
                      metadata: dict | None = None,
                      mime: str = "image/png",
                      finish_reason=pb.NULL) -> pb.Artifact:
    data = I.encode_png(img, metadata) if mime == "image/png" else \
        I.encode_webp(img)
    return pb.Artifact(
        id=index, type=pb.ARTIFACT_IMAGE, mime=mime, index=index,
        seed=seed, uuid=str(uuidlib.uuid4()), binary=data, size=len(data),
        finish_reason=finish_reason)


def _proto_tensor_to_np(t) -> np.ndarray:
    from ..generated import tensors_pb2 as tpb

    dtype_map = {tpb.DT_FLOAT32: np.float32, tpb.DT_FLOAT16: np.float16,
                 tpb.DT_FLOAT64: np.float64, tpb.DT_INT32: np.int32,
                 tpb.DT_INT64: np.int64, tpb.DT_UINT8: np.uint8}
    if t.dtype == tpb.DT_BFLOAT16:
        raw = np.frombuffer(t.data, dtype=np.uint16).astype(np.uint32) << 16
        arr = raw.view(np.float32)
    else:
        arr = np.frombuffer(t.data, dtype=dtype_map.get(t.dtype, np.float32))
    return arr.reshape(list(t.shape))


def _proto_safetensors_to_dict(st) -> dict:
    return {e.key: _proto_tensor_to_np(e.tensor) for e in st.tensors}


def _artifact_safetensors(art) -> dict | None:
    """Artifact carrying model weights -> state dict. Supports raw
    safetensors bytes in `binary`, the proto Safetensors message, and the
    lora/token_embedding wrapper messages."""
    which = art.WhichOneof("data")
    if which == "safetensors":
        return _proto_safetensors_to_dict(art.safetensors)
    if which == "lora":
        return _proto_safetensors_to_dict(art.lora.lora)
    if which == "token_embedding":
        return {art.token_embedding.text:
                _proto_tensor_to_np(art.token_embedding.tensor)}
    if which == "binary" and art.binary:
        try:
            return _safetensors_from_bytes(art.binary)
        except Exception:  # noqa: BLE001
            logger.warning("could not parse weight artifact")
    return None


def _safetensors_from_bytes(data: bytes) -> dict:
    import tempfile

    from safetensors import safe_open

    out = {}
    with tempfile.NamedTemporaryFile(suffix=".safetensors") as fh:
        fh.write(data)
        fh.flush()
        with safe_open(fh.name, framework="numpy") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


class AsyncContext:
    """Background-generation bookkeeping (reference AsyncContext,
    gyre/services/generate.py:88-144)."""

    DEADLINE = 600.0

    def __init__(self):
        self.queue: queue.Queue = queue.Queue()
        self.stop_event = threading.Event()
        self.done = False
        self.deadline = None
        self.progress = ""  # human-readable status (AsyncStatus.message)

    def finish(self):
        self.done = True
        self.deadline = time.monotonic() + self.DEADLINE


class GenerationServiceServicer:
    def __init__(self, manager, nsfw_behaviour: str = "flag",
                 batch_max: int = 4, debug_recorder=None,
                 resource_cache=None):
        self.manager = manager
        self.nsfw_behaviour = nsfw_behaviour
        self.batch_max = batch_max
        self.debug_recorder = debug_recorder
        self.resource_cache = resource_cache
        self._async: dict[str, AsyncContext] = {}
        self._async_lock = threading.Lock()
        self._safety = None

    def _artifact_state(self, art) -> dict | None:
        """Weight-artifact bytes -> state dict, speaking the reference's
        artifact-cache protocol (gyre/services/generate.py:52-85 + X2
        'generation:' keyspace): an upload carrying
        cache_control.cache_id is stored with its max_age TTL, and a
        later request whose data IS a cache_id fetches it — a miss
        raises CacheKeyError so the client sees FAILED_PRECONDITION with
        the key and knows to re-upload."""
        which = art.WhichOneof("data")
        if which == "cache_id":
            if self.resource_cache is None:
                raise CacheKeyError(art.cache_id)
            state = self.resource_cache.get("generation:" + art.cache_id)
            if state is None:
                raise CacheKeyError(art.cache_id)
            return state
        if which == "url":
            # whitelist-gated fetch through the resource provider
            # (reference X3: file:<prefix>/ mapped paths, civitai/HF
            # URLs when egress is allowed; reference client sends
            # `--lora https://...` this way)
            provider = getattr(self.manager, "resources", None)
            if provider is None:
                raise ValueError(
                    "url artifacts need a resource provider (server "
                    "--local_resources / --allow_network_resources)")
            rtype = ("lora" if art.type == pb.ARTIFACT_LORA
                     else "embedding")
            state = _safetensors_from_bytes(
                provider.fetch(art.url, rtype=rtype, fmt="safetensors"))
        else:
            state = _artifact_safetensors(art)
        if (state and self.resource_cache is not None and
                art.HasField("cache_control") and
                art.cache_control.cache_id):
            self.resource_cache.set(
                "generation:" + art.cache_control.cache_id, state,
                ttl=float(art.cache_control.max_age or 3600))
        return state

    def _safety_check(self, images) -> np.ndarray:
        """bool[B] nsfw flags (reference flags but never blacks out,
        gyre/pipeline/safety_checkers.py). Fail-closed contract: 'block'
        REQUIRES trained checker weights; 'flag' without them flags
        nothing (random-weight flags would be noise)."""
        if self.nsfw_behaviour == "ignore":
            return np.zeros((images.shape[0],), bool)
        if self._safety is None:
            checker = None
            if hasattr(self.manager, "safety_checker"):
                checker = self.manager.safety_checker()
            if checker is None:
                from ..pipeline.safety import SafetyChecker

                checker = SafetyChecker.random()
            self._safety = checker
        if not self._safety.trained:
            if self.nsfw_behaviour == "block":
                raise RuntimeError(
                    "nsfw_behaviour=block requires trained safety-checker "
                    "weights; add a 'safety_checker:' model to engines.yaml"
                    " or run with --nsfw_behaviour flag/ignore")
            if not getattr(self, "_warned_untrained", False):
                self._warned_untrained = True
                logger.warning("no trained safety checker configured; "
                               "nsfw flagging disabled")
            return np.zeros((images.shape[0],), bool)
        # device work must flow through the dispatcher's single device
        # thread (gRPC threads never touch the TPU — same rule as the
        # generate path)
        return self.manager.dispatcher.submit(
            lambda images: self._safety.check(images),
            {"images": images}, solo=True).result()

    # ------------------------------------------------------------ Generate

    def _run_request(self, request: pb.Request, stop_event=None):
        """Yield (image, seed, index, metadata, nsfw) for one request."""
        from . import adjustments as adj_mod

        def adjuster(img, chain):
            # adjustment chains can invoke device models (depth/edge/seg
            # hinters) — run them on the dispatcher's device thread.
            # No chain-level engine filter: passing the GENERATE engine id
            # here would exclude every configured task engine (they have
            # different ids), silently degrading model-backed adjustments
            # to their tensor fallbacks; each ImageAdjustment.engine_id
            # still selects a specific converter engine when set.
            return self.manager.dispatcher.submit(
                lambda: adj_mod.apply_image_adjustment(
                    img, chain, self.manager, None),
                {}, solo=True).result()

        from ..utils.timing import STATS

        with STATS.timer("extract"):
            p = extract_params(request, adjuster=adjuster)

        # engine option defaults (reference set_options / pipeline_meta,
        # gyre/pipeline/unified_pipeline.py:1538-1629): request-level values
        # win; unset fields fall back to the engine's options
        try:
            spec0 = self.manager.spec(
                p.engine_id or self.manager.default_engine_id())
            opts = spec0.options or {}
        except KeyError:
            opts = {}
        if not request.image.HasField("transform"):
            p.sampler = opts.get("sampler", p.sampler)
        if p.karras_rho is None and "karras_rho" in opts:
            p.karras_rho = float(opts["karras_rho"])
        if not p.churn and "churn" in opts:
            p.churn = float(opts["churn"])
        if p.hires_fix is None and "hires_fix" in opts:
            p.hires_fix = bool(opts["hires_fix"])
        p.warmup_lms = bool(opts.get("warmup_lms", False))
        p.ddim_cutoff = float(opts.get("ddim_cutoff", 0.0))
        if p.clip_guidance_scale == 0 and "clip_guidance_scale" in opts:
            p.clip_guidance_scale = float(opts["clip_guidance_scale"])
        if "clip" in opts and isinstance(opts["clip"], dict):
            # engine-level ClipGuidanceConfig fields (reference set_options
            # clip params, gyre/pipeline/unified_pipeline.py:1538-1629):
            # guidance_base, vae/approx_cutouts, no_cutouts,
            # gradient_length/threshold/maxloss
            copts = dict(opts["clip"])
            if (p.clip_guidance_scale == 0 and
                    copts.get("guidance_scale")):
                p.clip_guidance_scale = float(copts["guidance_scale"])
            copts.pop("guidance_scale", None)
            p.clip_guidance_options = copts
        p.cfg_sequential = bool(opts.get("cfg_sequential", False))
        p.tome_ratio = float(opts.get("tome_ratio", 0.0))

        # image-transform engines (upscalers, face restore): transform the
        # init image, no diffusion (reference task-pipeline engines)
        if p.engine_id:
            try:
                spec = self.manager.spec(p.engine_id)
            except KeyError:
                spec = None
            if spec is not None and spec.task in (
                    "upscaler", "upscale", "face_restore", "codeformer",
                    "depth", "hinter", "edge", "segmentation", "pose",
                    "background_removal"):
                if p.init_image is None:
                    raise ValueError(f"{spec.task} request needs an init "
                                     "image")
                task = "upscaler" if spec.task in ("upscaler", "upscale") \
                    else spec.task
                fn = self.manager.task_pipeline(task, p.engine_id)
                # device work through the dispatcher thread, like generate
                init = p.init_image
                out = np.asarray(self.manager.dispatcher.submit(
                    lambda: fn(init), {}, solo=True).result())
                yield out[0], (p.seeds[0] if p.seeds else 0), 0, {
                    "engine": p.engine_id, "op": task}, False
                return

        seeds = fill_seeds(p)

        meta = {
            "prompt": p.prompt, "negative_prompt": p.negative_prompt,
            "engine": p.engine_id or self.manager.default_engine_id(),
            "sampler": p.sampler, "steps": p.steps,
            "cfg_scale": p.guidance_scale,
            "height": p.height, "width": p.width,
        }

        loras = []
        for art, weight in p.lora_artifacts:
            state = self._artifact_state(art)
            if state:
                loras.append((state, weight, art.uuid or art.cache_id or
                              str(hash(art.binary[:256]))))
        tis = []
        for art, overrides in p.ti_artifacts:
            state = self._artifact_state(art)
            if not state:
                continue
            cache_key = art.uuid or art.cache_id or \
                str(hash(art.binary[:256]))
            if overrides:
                # rename tokens before folding: named overrides match
                # original_token, free ones consume remaining tokens in
                # order (reference gyre/services/generate.py:857-880)
                from ..pipeline.lora import extract_ti_embeddings

                named = {orig: tok for orig, tok in overrides
                         if orig is not None}
                free = [tok for orig, tok in overrides if orig is None]
                renamed = {}
                for key, tensor in extract_ti_embeddings(state).items():
                    if key in named:
                        renamed[named[key]] = tensor
                    elif free:
                        renamed[free.pop(0)] = tensor
                    else:
                        renamed[key] = tensor
                state = renamed
                cache_key = (cache_key, tuple(overrides))
            tis.append((state, cache_key))

        hints = []
        for hint_type, img, weight, priority in p.hint_images:
            model = self.manager.hint_model(hint_type,
                                            p.engine_id or None)
            if model is None:
                continue
            # conditioning images resized to the request resolution
            if img.shape[1:3] != (p.height, p.width):
                img = np.asarray(I.rescale(
                    jnp.asarray(img), p.height, p.width, fit="cover"))
            hints.append({"params": model["params"], "kind": model["kind"],
                          "image": img[..., :3], "scale": weight,
                          "soft_injection": priority != "balanced",
                          "cfg_only": priority == "hint"})

        from concurrent.futures import CancelledError

        with self.manager.with_engine(p.engine_id or None, loras=loras,
                                      tis=tis) as pipe:
            index = 0
            for i in range(0, len(seeds), self.batch_max):
                if stop_event is not None and stop_event.is_set():
                    return
                batch = seeds[i:i + self.batch_max]
                kwargs = dict(
                    prompt=p.prompt, negative_prompt=p.negative_prompt,
                    height=p.height, width=p.width, steps=p.steps,
                    sampler=p.sampler, seeds=batch,
                    guidance_scale=p.guidance_scale,
                    init_image=p.init_image if p.init_image is None else
                    np.broadcast_to(p.init_image,
                                    (len(batch),) + p.init_image.shape[1:]),
                    mask_image=p.mask_image if p.mask_image is None else
                    np.broadcast_to(p.mask_image,
                                    (len(batch),) + p.mask_image.shape[1:]),
                    strength=p.strength, eta=p.eta, churn=p.churn,
                    churn_tmin=p.churn_tmin, churn_tmax=p.churn_tmax,
                    karras_rho=p.karras_rho, sigma_min=p.sigma_min,
                    sigma_max=p.sigma_max,
                    masked_area_init=p.masked_area_init, tiling=p.tiling,
                    hints=hints,
                    depth_map=p.depth_map if p.depth_map is None else
                    np.broadcast_to(p.depth_map,
                                    (len(batch),) + p.depth_map.shape[1:]),
                    hires_fix=p.hires_fix,
                    hires_oos_fraction=p.hires_oos_fraction,
                    clip_guidance_scale=p.clip_guidance_scale,
                    clip_guidance_options=p.clip_guidance_options,
                    clip_layer=p.clip_layer,
                    noise_type=p.noise_type,
                    warmup_lms=p.warmup_lms,
                    ddim_cutoff=p.ddim_cutoff,
                    cfg_sequential=p.cfg_sequential,
                    tome_ratio=p.tome_ratio,
                    # quantize on device: PNG needs uint8 anyway and the
                    # device->host transfer is 4x smaller than f32
                    output_dtype="uint8",
                    stop_event=stop_event,
                    chunk_steps=10 if stop_event is not None else 0,
                )
                # ALL device work flows through the dispatcher: its single
                # thread serializes the TPU, and compatible concurrent
                # requests merge into one compiled batch during the gather
                # window (chunked dispatch + cancellation survive merging
                # via the dispatcher's CombinedEvent).
                try:
                    t0 = time.perf_counter()
                    imgs = self.manager.dispatcher.submit(
                        pipe, kwargs, stop_event).result()
                    dt = time.perf_counter() - t0
                    STATS.record("generate", dt)
                    if p.steps:
                        STATS.record("per_step", dt / p.steps)
                except CancelledError:
                    return
                if imgs is None:  # cancelled mid-request
                    return
                imgs = np.asarray(imgs)
                imgs_f = (imgs.astype(np.float32) / 255.0
                          if imgs.dtype == np.uint8 else imgs)
                flags = self._safety_check(imgs_f)
                for j, seed in enumerate(batch):
                    md = dict(meta, seed=seed, index=index)
                    md = {k: str(v) for k, v in md.items()}
                    img_j = imgs[j]
                    if flags[j] and self.nsfw_behaviour == "block":
                        img_j = np.zeros_like(img_j)
                    yield img_j, seed, index, md, bool(flags[j])
                    index += 1
            # echo artifacts
            for art in p.echo_artifacts:
                yield art, None, index, None, False
                index += 1

    @exception_to_grpc()
    def Generate(self, request: pb.Request, context):
        stop_event = threading.Event()
        if context is not None and hasattr(context, "add_callback"):
            context.add_callback(stop_event.set)
        if self.debug_recorder is not None:
            with self.debug_recorder.record("generate") as store:
                store.store("engine", request.engine_id)
                store.store("request_id", request.request_id)
                store.store("prompts", [p.text for p in request.prompt
                                        if p.WhichOneof("prompt") == "text"])
        recv = int(time.time())
        for item, seed, index, md, nsfw in self._run_request(request,
                                                             stop_event):
            if isinstance(item, pb.Artifact):
                artifact = item
            else:
                from ..utils.timing import STATS

                with STATS.timer("encode"):
                    artifact = image_to_artifact(
                        item, index=index, seed=seed, metadata=md,
                        mime=negotiate_mime(request.accept),
                        finish_reason=pb.FILTER if nsfw else pb.NULL)
            yield pb.Answer(
                answer_id=f"{request.request_id}-{index}",
                request_id=request.request_id,
                received=recv, created=int(time.time()),
                artifacts=[artifact])

    # ------------------------------------------------------- ChainGenerate

    @exception_to_grpc()
    def ChainGenerate(self, request: pb.ChainRequest, context):
        """Staged generation graph with RETURN/PASS routing (reference
        gyre/services/generate.py:1202-1267)."""
        results: dict[str, list[pb.Artifact]] = {}
        for stage in request.stage:
            req = pb.Request()
            req.CopyFrom(stage.request)
            req.request_id = req.request_id or request.request_id
            # PASS: inject prior stage artifacts as init image prompts
            incoming = results.pop(stage.id, [])
            for art in incoming:
                prompt = req.prompt.add()
                prompt.artifact.CopyFrom(art)
                prompt.parameters.init = True
            produced = []
            for answer in self.Generate(req, context):
                produced.extend(answer.artifacts)
            returned = []
            routed = False
            for on_status in stage.on_status:
                act = list(on_status.action)
                if pb.STAGE_ACTION_RETURN in act:
                    returned = produced
                for target in ([on_status.target]
                               if on_status.HasField("target") else []):
                    results.setdefault(target, []).extend(produced)
                    routed = True
            if not stage.on_status and not routed:
                returned = produced
            if returned:
                yield pb.Answer(request_id=request.request_id,
                                answer_id=f"{request.request_id}-{stage.id}",
                                artifacts=returned)

    # --------------------------------------------------------------- Async

    @exception_to_grpc()
    def AsyncGenerate(self, request: pb.Request, context):
        ctx = AsyncContext()
        handle = str(uuidlib.uuid4())
        with self._async_lock:
            self._gc_async()
            self._async[handle] = ctx

        def run():
            try:
                n = 0
                for answer in self.Generate(request, None):
                    if ctx.stop_event.is_set():
                        break
                    ctx.queue.put(answer)
                    n += 1
                    ctx.progress = f"{n} artifact(s) ready"
            except Exception as e:  # noqa: BLE001
                logger.error("async generate failed: %s", e)
                ctx.progress = f"error: {e}"
            finally:
                ctx.finish()

        threading.Thread(target=run, daemon=True).start()
        return pb.AsyncHandle(request_id=request.request_id,
                              async_handle=handle)

    @exception_to_grpc()
    def AsyncResult(self, handle: pb.AsyncHandle, context):
        ctx = self._async.get(handle.async_handle)
        if ctx is None:
            raise KeyError(f"unknown async handle {handle.async_handle}")
        answers = []
        try:
            answers.append(ctx.queue.get(timeout=0.5))
            while True:
                answers.append(ctx.queue.get_nowait())
        except queue.Empty:
            pass
        complete = ctx.done and ctx.queue.empty()
        if complete:
            with self._async_lock:
                self._async.pop(handle.async_handle, None)
        out = pb.AsyncAnswer(answer=answers, complete=complete)
        if ctx.progress:
            out.status.message = ctx.progress
        return out

    @exception_to_grpc()
    def AsyncCancel(self, handle: pb.AsyncHandle, context):
        ctx = self._async.pop(handle.async_handle, None)
        if ctx is not None:
            ctx.stop_event.set()
        return pb.AsyncCancelAnswer()

    def _gc_async(self):
        now = time.monotonic()
        for k in list(self._async):
            ctx = self._async[k]
            if ctx.done and ctx.deadline and now > ctx.deadline:
                del self._async[k]
