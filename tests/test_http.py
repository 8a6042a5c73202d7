"""HTTP surface tests: REST v1, JSON gateway, gRPC-WEB framing, status —
over a real socket against the stdlib server."""

import base64
import json
import socket
import urllib.request

import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.http import grpc_web
from gyre_tpu.http.router import make_http_server, start_http_server
from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.ops import images as I
from gyre_tpu.services.engines import EnginesServiceServicer
from gyre_tpu.services.generate import GenerationServiceServicer


@pytest.fixture(scope="module", autouse=True)
def small_limits():
    from gyre_tpu.http import stability_rest

    saved = dict(stability_rest.LIMITS)
    stability_rest.LIMITS["height"] = (64, 2048)
    stability_rest.LIMITS["width"] = (64, 2048)
    yield
    stability_rest.LIMITS.update(saved)


@pytest.fixture(scope="module")
def base_url():
    import jax.numpy as jnp

    manager = EngineManager(
        [{"id": "test-engine", "model": "preset/test", "default": True,
          "name": "Test"},
         {"id": "tiny-upscaler", "task": "upscaler", "name": "Upscale",
          "blocks": 2, "tile": 32}],
        compute_dtype=jnp.float32, batch_max=2)
    manager.load_engines()
    generation = GenerationServiceServicer(manager, batch_max=2)
    engines = EnginesServiceServicer(manager)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    server = make_http_server("localhost", port, manager=manager,
                              generation=generation, engines=engines)
    start_http_server(server)
    yield f"http://localhost:{port}"
    server.shutdown()


def _post(url, body, headers=None):
    if isinstance(body, (dict, list)):
        body = json.dumps(body).encode()
        headers = {"Content-Type": "application/json", **(headers or {})}
    req = urllib.request.Request(url, data=body, headers=headers or {},
                                 method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def test_server_json(base_url):
    status, body = _get(base_url + "/server.json")
    doc = json.loads(body)
    assert status == 200 and "stability-rest-v1" in doc["api"]


def test_status(base_url):
    status, body = _get(base_url + "/status")
    doc = json.loads(body)
    assert doc["engines"][0]["id"] == "test-engine"
    # weight provenance is always reported (real|random|pending) so a
    # random-init fallback is never silent
    assert doc["engines"][0]["weights"] in ("real", "random", "pending")
    # device-watchdog state is always visible once the dispatcher ran
    if doc.get("dispatcher"):
        wd = doc["dispatcher"]["watchdog"]
        assert wd["wedged"] is False and wd["threshold_s"] > 0


def test_rest_engines_list(base_url):
    status, body = _get(base_url + "/v1/engines/list")
    doc = json.loads(body)
    assert status == 200 and doc[0]["id"] == "test-engine"


def test_rest_text_to_image_json(base_url):
    status, headers, body = _post(
        base_url + "/v1/generation/test-engine/text-to-image",
        {"text_prompts": [{"text": "a cat"}], "height": 64, "width": 64,
         "steps": 2, "seed": 7})
    assert status == 200, body
    doc = json.loads(body)
    art = doc["artifacts"][0]
    assert art["seed"] == 7
    img = I.decode_png(base64.b64decode(art["base64"]))
    assert img.shape == (1, 64, 64, 3)


def test_rest_text_to_image_png_accept(base_url):
    status, headers, body = _post(
        base_url + "/v1/generation/test-engine/text-to-image",
        json.dumps({"text_prompts": [{"text": "x"}], "height": 64,
                    "width": 64, "steps": 2}).encode(),
        {"Content-Type": "application/json", "Accept": "image/png"})
    assert status == 200
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_rest_image_to_image(base_url):
    init = np.full((1, 64, 64, 3), 0.5, np.float32)
    b64 = base64.b64encode(I.encode_png(init)).decode()
    status, headers, body = _post(
        base_url + "/v1/generation/test-engine/image-to-image",
        {"text_prompts": [{"text": "a cat"}], "height": 64, "width": 64,
         "steps": 2, "init_image": b64, "image_strength": 0.5})
    assert status == 200, body


def test_rest_multipart_masking(base_url):
    """multipart/form-data masking request with nested form fields
    (text_prompts[0][text]) and file parts."""
    import uuid

    boundary = uuid.uuid4().hex
    init = np.full((1, 64, 64, 3), 0.5, np.float32)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, :32] = 1.0

    def part(name, value, filename=None, ctype=None):
        head = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            head += f'; filename="{filename}"'
        head = head.encode()
        if ctype:
            head += f"\r\nContent-Type: {ctype}".encode()
        body = value if isinstance(value, bytes) else str(value).encode()
        return b"--" + boundary.encode() + b"\r\n" + head + \
            b"\r\n\r\n" + body + b"\r\n"

    payload = b"".join([
        part("text_prompts[0][text]", "a multipart test"),
        part("text_prompts[0][weight]", "1.0"),
        part("height", "64"), part("width", "64"), part("steps", "2"),
        part("seed", "3"),
        part("mask_source", "MASK_IMAGE_WHITE"),
        part("init_image", I.encode_png(init), "init.png", "image/png"),
        part("mask_image", I.encode_png(mask), "mask.png", "image/png"),
    ]) + b"--" + boundary.encode() + b"--\r\n"

    status, headers, body = _post(
        base_url + "/v1/generation/test-engine/masking", payload,
        {"Content-Type": f"multipart/form-data; boundary={boundary}"})
    assert status == 200, body
    doc = json.loads(body)
    img = I.decode_png(base64.b64decode(doc["artifacts"][0]["base64"]))
    # kept bottom area stays the init color
    np.testing.assert_allclose(img[0, 56:], 0.5, atol=0.02)


def test_rest_validation_error(base_url):
    status, headers, body = _post(
        base_url + "/v1/generation/test-engine/text-to-image",
        {"text_prompts": [{"text": "x"}], "steps": 999,
         "height": 64, "width": 64})
    assert status == 400
    assert json.loads(body)["name"] == "invalid_steps"


def test_grpc_gateway_list_engines(base_url):
    status, headers, body = _post(
        base_url + "/grpcgateway/EnginesService/ListEngines", {})
    doc = json.loads(body)
    assert status == 200 and doc["engine"][0]["id"] == "test-engine"


def test_grpc_web_text_mode(base_url):
    """application/grpc-web-text: base64 framing both directions."""
    req = pb.Request(engine_id="test-engine")
    req.prompt.add().text = "text mode"
    req.image.height = 64
    req.image.width = 64
    req.image.steps = 2
    req.image.seed.append(4)
    payload = base64.b64encode(
        grpc_web.wrap_message(req.SerializeToString()))
    status, headers, body = _post(
        base_url + "/gooseai.GenerationService/Generate", payload,
        {"Content-Type": "application/grpc-web-text+proto"})
    assert status == 200
    decoded = base64.b64decode(body)
    frames = list(grpc_web.unwrap_message_stream(decoded))
    data = [d for f, d in frames if not f & grpc_web.TRAILER_FLAG]
    assert data and pb.Answer.FromString(
        data[0]).artifacts[0].type == pb.ARTIFACT_IMAGE


def test_reverse_proxy():
    """Configured /p/<name>/ routes forward to the upstream."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Upstream(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"upstream": true, "path": "' + \
                self.path.encode() + b'"}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    up = HTTPServer(("localhost", 0), Upstream)
    threading.Thread(target=up.serve_forever, daemon=True).start()
    up_port = up.server_address[1]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    server = make_http_server(
        "localhost", port, manager=None, generation=None, engines=None,
        proxies={"ui": f"http://localhost:{up_port}"})
    start_http_server(server)
    try:
        status, body = _get(f"http://localhost:{port}/p/ui/some/page")
        doc = json.loads(body)
        assert doc["upstream"] and doc["path"] == "/some/page"
    finally:
        server.shutdown()
        up.shutdown()


def test_grpc_web_channel_client(base_url):
    """The WebChannel client (sonora-equivalent) against the live server."""
    from gyre_tpu.http.grpc_web_client import GrpcWebError, WebChannel

    chan = WebChannel(base_url)
    generate = chan.unary_stream(
        "/gooseai.GenerationService/Generate",
        pb.Request.SerializeToString, pb.Answer.FromString)
    req = pb.Request(engine_id="test-engine")
    req.prompt.add().text = "web channel"
    req.image.height = 64
    req.image.width = 64
    req.image.steps = 2
    req.image.seed.append(9)
    answers = list(generate(req))
    assert answers[0].artifacts[0].type == pb.ARTIFACT_IMAGE

    # error propagation: unknown engine -> grpc-status != 0
    bad = pb.Request(engine_id="nope")
    bad.prompt.add().text = "x"
    bad.image.height = 64
    bad.image.width = 64
    bad.image.steps = 2
    with pytest.raises(GrpcWebError):
        list(generate(bad))


def test_grpc_web_generate(base_url):
    req = pb.Request(engine_id="test-engine")
    p = req.prompt.add()
    p.text = "a cat"
    req.image.height = 64
    req.image.width = 64
    req.image.steps = 2
    req.image.seed.append(1)
    payload = grpc_web.wrap_message(req.SerializeToString())
    status, headers, body = _post(
        base_url + "/gooseai.GenerationService/Generate", payload,
        {"Content-Type": "application/grpc-web+proto"})
    assert status == 200
    frames = list(grpc_web.unwrap_message_stream(body))
    data_frames = [d for f, d in frames if not f & grpc_web.TRAILER_FLAG]
    trailer_frames = [d for f, d in frames if f & grpc_web.TRAILER_FLAG]
    assert len(data_frames) == 1 and trailer_frames
    answer = pb.Answer.FromString(data_frames[0])
    assert answer.artifacts[0].type == pb.ARTIFACT_IMAGE
    assert b"grpc-status: 0" in trailer_frames[0]


def test_rest_upscale(base_url):
    """POST /v1/generation/<engine>/image-to-image/upscale (reference
    StabilityRESTAPI_UpscaleController)."""
    init = np.full((1, 32, 32, 3), 0.25, np.float32)
    b64 = base64.b64encode(I.encode_png(init)).decode()
    status, headers, body = _post(
        base_url + "/v1/generation/tiny-upscaler/image-to-image/upscale",
        {"image": b64})
    assert status == 200, body
    doc = json.loads(body)
    img = I.decode_png(base64.b64decode(doc["artifacts"][0]["base64"]))
    assert img.shape[1] > 32 and img.shape[2] > 32  # upscaled


def test_rest_upscale_wrong_task(base_url):
    init = np.full((1, 32, 32, 3), 0.25, np.float32)
    b64 = base64.b64encode(I.encode_png(init)).decode()
    status, _, body = _post(
        base_url + "/v1/generation/test-engine/image-to-image/upscale",
        {"image": b64})
    assert status == 400 and b"upscaler" in body


def test_rest_generate_on_upscaler_task(base_url):
    status, _, body = _post(
        base_url + "/v1/generation/tiny-upscaler/text-to-image",
        {"text_prompts": [{"text": "x"}], "height": 64, "width": 64})
    assert status == 400 and b"generate" in body


def test_rest_unknown_engine_404(base_url):
    status, _, body = _post(
        base_url + "/v1/generation/no-such/text-to-image",
        {"text_prompts": [{"text": "x"}]})
    assert status == 404


def test_openapi_document(base_url):
    status, body = _get(base_url + "/openapi.json")
    doc = json.loads(body)
    assert status == 200 and doc["openapi"].startswith("3.")
    assert "/v1/generation/{engine_id}/image-to-image/upscale" in doc["paths"]


def test_three_level_auth():
    """Level 0 = server.json open; level 1 = status accepts basic auth
    (401+WWW-Authenticate otherwise); level 2 = API bearer-only (403)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    server = make_http_server(
        "localhost", port, manager=None, generation=None, engines=None,
        access_keys=["sekrit"])
    start_http_server(server)
    url = f"http://localhost:{port}"
    try:
        status, _ = _get(url + "/server.json")  # level 0: open
        assert status == 200

        try:  # level 1 without auth: 401 + basic challenge
            _get(url + "/status")
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
            assert "Basic" in e.headers.get("WWW-Authenticate", "")

        basic = base64.b64encode(b"sekrit:sekrit").decode()
        status, _, body = _post(  # level 2 rejects basic: 403
            url + "/grpcgateway/EnginesService/ListEngines", {},
            {"Authorization": f"Basic {basic}"})
        assert status == 403

        try:  # level 1 accepts the same basic credentials
            req = urllib.request.Request(
                url + "/status", headers={"Authorization": f"Basic {basic}"})
            urllib.request.urlopen(req)
            raise AssertionError("expected 500 (no manager), not auth error")
        except urllib.error.HTTPError as e:
            assert e.code != 401 and e.code != 403
    finally:
        server.shutdown()


def test_static_file_root(tmp_path):
    """--http_file_root serving with traversal protection (reference
    static.File overlap, gyre/server.py:359-369)."""
    (tmp_path / "index.html").write_text("<h1>gyre</h1>")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "app.js").write_text("console.log(1)")
    (tmp_path / "secret.txt").write_text("x")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    server = make_http_server(
        "localhost", port, manager=None, generation=None, engines=None,
        file_root=str(tmp_path))
    start_http_server(server)
    url = f"http://localhost:{port}"
    try:
        status, body = _get(url + "/")
        assert status == 200 and b"gyre" in body
        status, body = _get(url + "/sub/app.js")
        assert status == 200 and b"console" in body
        try:
            _get(url + "/../etc/passwd")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


@pytest.mark.smoke
def test_gateway_generate_ndjson_streaming(base_url):
    """Accept: application/x-ndjson streams one Answer per line as
    produced (chunked), instead of buffering the whole array."""
    import json as _json
    import urllib.request

    base = base_url
    body = _json.dumps({
        "engineId": "test-engine",
        "prompt": [{"text": "a streamed render"}],
        "image": {"height": 64, "width": 64, "steps": 2, "seed": [7],
                  "samples": 2},
    }).encode()
    req = urllib.request.Request(
        base + "/grpcgateway/GenerationService/Generate", data=body,
        headers={"Content-Type": "application/json",
                 "Accept": "application/x-ndjson"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert "ndjson" in resp.headers.get("Content-Type", "")
        lines = [ln for ln in resp.read().splitlines() if ln.strip()]
    answers = [_json.loads(ln) for ln in lines]
    assert len(answers) == 2
    for a in answers:
        assert a["artifacts"][0]["type"] == "ARTIFACT_IMAGE"
