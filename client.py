#!/usr/bin/env python
"""gyre-tpu CLI client: a full-featured Stability-API gRPC client
(the reference ships client.py with the same surface: samplers, negative
prompts, init/mask images, LoRA/TI artifact upload, hint images, async
generation with ctrl-C cancel).

Examples:
  python client.py "a cat" -o out.png
  python client.py "a cat" -n "blurry" -W 768 -H 512 -s k_euler_ancestral
  python client.py "a cat" -i init.png --strength 0.6
  python client.py "a cat" -i init.png -m mask.png
  python client.py "a cat" --lora style.safetensors:0.8
  python client.py "a cat" --lora style.safetensors:0.8:0.5   # unet:text
  python client.py "a cat" --ti embed.safetensors:mytoken
  python client.py "a cat" --hint depth:depth.png:0.9:prompt
  python client.py "a cat" --async
"""

from __future__ import annotations

import argparse
import signal
import sys
import time
import uuid

import grpc

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.pipeline.samplers import PROTO_SAMPLERS

SAMPLER_BY_NAME = {v: k for k, v in PROTO_SAMPLERS.items()}


def _floatlike(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _add_hint_converter(p, hint_type: str, converter, remove_bg: bool):
    """Append the ImageAdjustment chain that converts a plain image into
    `hint_type` server-side — the reference client's converter table
    (/root/reference/client.py:204-299). `converter` is True (default
    engine) or a specific converter engine id."""
    adj = p.artifact.adjustments
    if remove_bg:
        adj.add().background_removal.mode = pb.SOLID
    first = len(adj)
    if "depth" in hint_type:
        adj.add().depth.SetInParent()
    elif "canny" in hint_type:
        a = adj.add().canny_edge
        a.low_threshold, a.high_threshold = 100, 200
    elif "hed" in hint_type or "softedge" in hint_type or \
            "lineart" in hint_type:
        adj.add().edge_detection.SetInParent()
    elif "sketch" in hint_type or "scribble" in hint_type:
        adj.add().edge_detection.SetInParent()
        adj.add().blur.sigma = 3
        adj.add().quantize.threshold.append(0.15)
    elif "segment" in hint_type:
        adj.add().segmentation.SetInParent()
    elif "keypose" in hint_type:
        adj.add().keypose.SetInParent()
    elif "openpose" in hint_type:
        adj.add().openpose.SetInParent()
    elif "normal" in hint_type:
        adj.add().normal.SetInParent()
    elif "color" in hint_type:
        adj.add().palletize.colours = 8
    elif "shuffle" in hint_type:
        adj.add().autoscale.mode = pb.RESCALE_COVER
        adj.add().shuffle.SetInParent()
    else:
        raise SystemExit(f"can't convert an image to hint type {hint_type}")
    if isinstance(converter, str) and len(adj) == first + 1:
        adj[first].engine_id = converter
    if remove_bg:
        bg = adj.add().background_removal
        bg.mode = pb.ALPHA
        bg.reapply = True


def _parse_hint_spec(spec: str, with_path: bool):
    """[nobg:]type[:converter_id][:path][:weight][:priority] -> dict.
    Reference parse_hint (/root/reference/client.py:1275-1316)."""
    parts = spec.split(":")
    remove_bg = False
    if parts and parts[0] == "nobg":
        parts.pop(0)
        remove_bg = True
    priority = None
    if parts and parts[-1] in ("balanced", "prompt", "hint"):
        priority = {"balanced": pb.HINT_BALANCED,
                    "prompt": pb.HINT_PRIORITISE_PROMPT,
                    "hint": pb.HINT_PRIORITISE_HINT}[parts.pop()]
    weight = float(parts.pop()) if len(parts) > 1 and _floatlike(parts[-1]) \
        else 1.0
    hint_type = parts.pop(0)
    path = None
    if with_path:
        if not parts:
            raise SystemExit(f"no path in hint spec {spec!r}")
        path = parts.pop()
    converter = parts.pop(0) if parts else True
    return {"hint_type": hint_type, "path": path, "weight": weight,
            "priority": priority, "converter": converter,
            "remove_bg": remove_bg}


def build_request(args) -> pb.Request:
    req = pb.Request(engine_id=args.engine,
                     request_id=args.request_id or str(uuid.uuid4()))
    prompt = req.prompt.add()
    prompt.text = args.prompt
    if args.clip_layer:
        prompt.parameters.clip_layer = args.clip_layer
    if args.negative:
        neg = req.prompt.add()
        neg.text = args.negative
        neg.parameters.weight = -1.0

    if args.accept_webp:
        req.accept = "image/webp, image/png"

    init_uuid = None
    if args.init:
        p = req.prompt.add()
        p.parameters.init = True
        p.artifact.type = pb.ARTIFACT_IMAGE
        p.artifact.mime = "image/png"
        init_uuid = str(uuid.uuid4())
        p.artifact.uuid = init_uuid
        with open(args.init, "rb") as fh:
            p.artifact.binary = fh.read()
    if args.mask:
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_MASK
        p.artifact.mime = "image/png"
        with open(args.mask, "rb") as fh:
            p.artifact.binary = fh.read()
    elif args.mask_from_image_alpha:
        # mask = init's alpha, inverted and feathered server-side via an
        # artifact reference + adjustment chain (reference client
        # /root/reference/client.py:727-752)
        if init_uuid is None:
            raise SystemExit("--mask_from_image_alpha needs --init")
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_MASK
        p.artifact.ref.uuid = init_uuid
        p.artifact.ref.stage = pb.ARTIFACT_BEFORE_ADJUSTMENTS
        p.artifact.adjustments.add().channels.MergeFrom(
            pb.ImageAdjustment_Channels(
                r=pb.CHANNEL_A, g=pb.CHANNEL_A, b=pb.CHANNEL_A,
                a=pb.CHANNEL_DISCARD))
        p.artifact.adjustments.add().invert.SetInParent()
        p.artifact.adjustments.add().blur.MergeFrom(
            pb.ImageAdjustment_Gaussian(sigma=32, direction=pb.DIRECTION_UP))
    for spec in args.lora or []:
        # path[:weight] or path:unet_w:text_w — two weights become
        # named_weights, matching the reference client
        # (/root/reference/client.py:359-371)
        parts = spec.split(":")
        path_parts = []
        while parts and not _floatlike(parts[0]):
            path_parts.append(parts.pop(0))
        path = ":".join(path_parts)
        weights = [float(w) for w in parts]
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_LORA
        p.artifact.uuid = path
        if path.startswith(("http://", "https://", "file:")):
            p.artifact.url = path   # server-side whitelist-gated fetch
        else:
            with open(path, "rb") as fh:
                p.artifact.binary = fh.read()
        if len(weights) == 1:
            p.parameters.weight = weights[0]
        elif len(weights) >= 2:
            p.parameters.named_weights.add(name="unet", weight=weights[0])
            p.parameters.named_weights.add(name="text_encoder",
                                           weight=weights[1])
    for spec in args.ti or []:
        # path[:token...] — extra fields rename the embedding's tokens
        # (reference client ti_to_prompts, /root/reference/client.py:407-427)
        parts = spec.split(":")
        if parts[0] in ("https", "http", "file"):
            path, tokens = parts[0] + ":" + parts[1], parts[2:]
        else:
            path, tokens = parts[0], parts[1:]
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_TOKEN_EMBEDDING
        if path.startswith(("http://", "https://", "file:")):
            p.artifact.url = path
        else:
            with open(path, "rb") as fh:
                p.artifact.binary = fh.read()
        for token in tokens:
            p.parameters.token_overrides.add(token=token)
    for spec in args.hint or []:
        # kind:path[:weight][:priority] — priority in {balanced, prompt,
        # hint} maps to HintPriority (reference client parse_hint,
        # /root/reference/client.py:1286-1306)
        parts = spec.split(":")
        priority = None
        if parts[-1] in ("balanced", "prompt", "hint"):
            priority = {"balanced": pb.HINT_BALANCED,
                        "prompt": pb.HINT_PRIORITISE_PROMPT,
                        "hint": pb.HINT_PRIORITISE_HINT}[parts.pop()]
        weight = float(parts.pop()) if _floatlike(parts[-1]) else 1.0
        kind, path = parts[0], ":".join(parts[1:])
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_HINT_IMAGE
        p.artifact.hint_image_type = kind
        with open(path, "rb") as fh:
            p.artifact.binary = fh.read()
        p.parameters.weight = weight
        if priority is not None:
            p.parameters.hint_priority = priority
    for spec in args.hint_from_image or []:
        # [nobg:]type[:converter_id]:path[:weight][:priority] — upload an
        # ordinary image; the server converts it via an adjustment chain
        info = _parse_hint_spec(spec, with_path=True)
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_HINT_IMAGE
        p.artifact.hint_image_type = info["hint_type"]
        with open(info["path"], "rb") as fh:
            p.artifact.binary = fh.read()
        _add_hint_converter(p, info["hint_type"], info["converter"],
                            info["remove_bg"])
        p.parameters.weight = info["weight"]
        if info["priority"] is not None:
            p.parameters.hint_priority = info["priority"]
    for spec in args.hint_from_init or []:
        # [nobg:]type[:converter_id][:weight][:priority] — reference the
        # init image rather than re-uploading it
        if init_uuid is None:
            raise SystemExit("--hint_from_init needs --init")
        info = _parse_hint_spec(spec, with_path=False)
        p = req.prompt.add()
        p.artifact.type = pb.ARTIFACT_HINT_IMAGE
        p.artifact.hint_image_type = info["hint_type"]
        p.artifact.ref.uuid = init_uuid
        p.artifact.ref.stage = pb.ARTIFACT_BEFORE_ADJUSTMENTS
        _add_hint_converter(p, info["hint_type"], info["converter"],
                            info["remove_bg"])
        p.parameters.weight = info["weight"]
        if info["priority"] is not None:
            p.parameters.hint_priority = info["priority"]

    img = req.image
    img.height = args.height
    img.width = args.width
    img.steps = args.steps
    img.samples = args.samples
    if args.seed:
        img.seed.extend(args.seed)
    img.transform.diffusion = SAMPLER_BY_NAME.get(args.sampler,
                                                  pb.SAMPLER_K_DPMPP_2M)
    sp = img.parameters.add()
    sp.sampler.cfg_scale = args.cfg
    if args.eta is not None:
        sp.sampler.eta = args.eta
    if args.churn:
        sp.sampler.churn.churn = args.churn
        if args.churn_tmin is not None:
            sp.sampler.churn.churn_tmin = args.churn_tmin
        if args.churn_tmax is not None:
            sp.sampler.churn.churn_tmax = args.churn_tmax
    if args.karras_rho:
        sp.sampler.sigma.karras_rho = args.karras_rho
    if args.sigma_min is not None:
        sp.sampler.sigma.sigma_min = args.sigma_min
    if args.sigma_max is not None:
        sp.sampler.sigma.sigma_max = args.sigma_max
    if args.noise_type:
        sp.sampler.noise_type = {
            "normal": pb.SAMPLER_NOISE_NORMAL,
            "brownian": pb.SAMPLER_NOISE_BROWNIAN}[args.noise_type]
    if args.strength is not None:
        sp.schedule.start = args.strength
    if args.guidance:
        gp = img.parameters.add()
        gp.guidance.guidance_preset = pb.GUIDANCE_PRESET_SIMPLE
        gp.guidance.instances.add().guidance_strength = args.guidance
    if args.hires:
        img.hires.enable = True
        if args.hires_oos_fraction is not None:
            img.hires.oos_fraction = args.hires_oos_fraction
    if args.tiling:
        img.tiling = True
    return req


class GrpcWebChannel:
    """Minimal gRPC-WEB client channel (unary-unary / unary-stream over
    HTTP POST) — the reference ships a vendored sonora WebChannel for
    this (gyre/sonora/client.py); this speaks the same public protocol
    against the server's /http router. Streams are buffered (like the
    reference's requests-based client), so mid-stream cancel is gRPC-only.
    """

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _post(self, path, request, metadata, timeout):
        import urllib.request

        from gyre_tpu.http.grpc_web import (TRAILER_FLAG,
                                            unwrap_message_stream,
                                            wrap_message)

        req = urllib.request.Request(
            self.base + path, data=wrap_message(request.SerializeToString()),
            method="POST")
        req.add_header("Content-Type", "application/grpc-web+proto")
        for k, v in metadata or []:
            req.add_header(k, v)
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
        msgs, status, message = [], 0, ""
        for flags, data in unwrap_message_stream(body):
            if flags & TRAILER_FLAG:
                for line in data.decode("utf-8", "replace").splitlines():
                    key, _, val = line.partition(":")
                    if key.strip() == "grpc-status":
                        status = int(val)
                    elif key.strip() == "grpc-message":
                        message = val.strip()
            else:
                msgs.append(data)
        if status:
            raise RuntimeError(f"grpc-web error {status}: {message}")
        return msgs

    def unary_unary(self, path, request_serializer=None,
                    response_deserializer=None):
        def call(request, timeout=None, metadata=None):
            msgs = self._post(path, request, metadata, timeout)
            return response_deserializer(msgs[0])
        return call

    def unary_stream(self, path, request_serializer=None,
                     response_deserializer=None):
        def call(request, timeout=None, metadata=None):
            for m in self._post(path, request, metadata, timeout):
                yield response_deserializer(m)
        return call


def save_answers(answers, outfile: str) -> int:
    count = 0
    for answer in answers:
        for art in answer.artifacts:
            if art.type != pb.ARTIFACT_IMAGE:
                continue
            name = outfile if count == 0 else \
                outfile.replace(".png", f"-{count}.png")
            if art.mime == "image/webp" and name.endswith(".png"):
                name = name[:-4] + ".webp"
            with open(name, "wb") as fh:
                fh.write(art.binary)
            flag = " [FLAGGED]" if art.finish_reason == pb.FILTER else ""
            print(f"saved {name} (seed {art.seed}){flag}")
            count += 1
    return count


def main(argv=None):
    p = argparse.ArgumentParser("gyre-tpu client")
    p.add_argument("prompt")
    p.add_argument("-n", "--negative", default="")
    p.add_argument("-o", "--out", default="generation.png")
    p.add_argument("--host", default="localhost:50051")
    p.add_argument("--key", default="", help="API key (bearer token)")
    p.add_argument("-e", "--engine", default="")
    p.add_argument("-W", "--width", type=int, default=512)
    p.add_argument("-H", "--height", type=int, default=512)
    p.add_argument("-s", "--sampler", default="k_dpmpp_2m",
                   choices=sorted(SAMPLER_BY_NAME))
    p.add_argument("-S", "--seed", type=int, action="append")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("-c", "--cfg", type=float, default=7.5)
    p.add_argument("--eta", type=float, default=None)
    p.add_argument("--churn", type=float, default=0.0)
    p.add_argument("--karras_rho", type=float, default=0.0)
    p.add_argument("-i", "--init", default=None)
    p.add_argument("-m", "--mask", default=None)
    p.add_argument("--mask_from_image_alpha", action="store_true",
                   help="derive the mask from the init image's alpha")
    p.add_argument("--strength", type=float, default=None)
    p.add_argument("--guidance", type=float, default=0.0,
                   help="CLIP guidance strength (0..1)")
    p.add_argument("--clip_layer", type=int, default=0,
                   help="clip skip: 1 = final layer, 2 = penultimate, ...")
    p.add_argument("--noise_type", choices=["normal", "brownian"],
                   default=None)
    p.add_argument("--sigma_min", type=float, default=None)
    p.add_argument("--sigma_max", type=float, default=None)
    p.add_argument("--churn_tmin", type=float, default=None)
    p.add_argument("--churn_tmax", type=float, default=None)
    p.add_argument("--hires_oos_fraction", type=float, default=None)
    p.add_argument("--accept_webp", action="store_true",
                   help="ask the server for WebP answers")
    p.add_argument("--lora", action="append",
                   help="file[:weight] or file:unet_w:text_w")
    p.add_argument("--ti", action="append",
                   help="file[:token...] (tokens rename the embedding)")
    p.add_argument("--hint", action="append",
                   help="type:file[:weight][:balanced|prompt|hint], "
                        "e.g. depth:depth.png:0.8:prompt")
    p.add_argument("--hint_from_image", action="append",
                   help="[nobg:]type[:converter_id]:file[:weight]"
                        "[:priority] — server converts the image to the "
                        "hint type")
    p.add_argument("--hint_from_init", action="append",
                   help="[nobg:]type[:converter_id][:weight][:priority] — "
                        "derive the hint from the init image")
    p.add_argument("--hires", action="store_true")
    p.add_argument("--tiling", action="store_true")
    p.add_argument("--async", dest="use_async", action="store_true")
    p.add_argument("--list-engines", action="store_true")
    p.add_argument("--list-upscalers", action="store_true")
    p.add_argument("--grpc_web", action="store_true",
                   help="connect over gRPC-WEB via the HTTP port "
                        "(pass --host host:http_port)")
    p.add_argument("--request-id", dest="request_id", default="")
    args = p.parse_args(argv)

    if args.grpc_web:
        channel = GrpcWebChannel(f"http://{args.host}")
    else:
        channel = grpc.insecure_channel(
            args.host, options=[("grpc.max_receive_message_length",
                                 256 * 1024 * 1024)])
    metadata = [("authorization", f"Bearer {args.key}")] if args.key else []

    if args.list_engines or args.list_upscalers:
        from gyre_tpu.generated import engines_pb2 as epb

        call = channel.unary_unary(
            "/gooseai.EnginesService/ListEngines",
            request_serializer=epb.ListEnginesRequest.SerializeToString,
            response_deserializer=epb.Engines.FromString)
        lreq = epb.ListEnginesRequest(
            task_group=epb.UPSCALE if args.list_upscalers else epb.GENERATE)
        for e in call(lreq, metadata=metadata).engine:
            print(f"{e.id:40s} {e.name} ({'ready' if e.ready else 'down'})")
        return 0

    req = build_request(args)
    t0 = time.time()

    if args.use_async:
        start = channel.unary_unary(
            "/gooseai.GenerationService/AsyncGenerate",
            request_serializer=pb.Request.SerializeToString,
            response_deserializer=pb.AsyncHandle.FromString)
        poll = channel.unary_unary(
            "/gooseai.GenerationService/AsyncResult",
            request_serializer=pb.AsyncHandle.SerializeToString,
            response_deserializer=pb.AsyncAnswer.FromString)
        cancel = channel.unary_unary(
            "/gooseai.GenerationService/AsyncCancel",
            request_serializer=pb.AsyncHandle.SerializeToString,
            response_deserializer=pb.AsyncCancelAnswer.FromString)
        handle = start(req, metadata=metadata)

        def on_int(*_):
            print("\ncancelling...")
            cancel(handle, metadata=metadata)
            sys.exit(130)

        signal.signal(signal.SIGINT, on_int)
        answers = []
        while True:
            res = poll(handle, metadata=metadata)
            answers.extend(res.answer)
            if res.complete:
                break
            time.sleep(0.5)
    else:
        call = channel.unary_stream(
            "/gooseai.GenerationService/Generate",
            request_serializer=pb.Request.SerializeToString,
            response_deserializer=pb.Answer.FromString)
        answers = call(req, metadata=metadata)

    n = save_answers(answers, args.out)
    print(f"{n} image(s) in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
