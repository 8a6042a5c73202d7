"""Full server boot test: gRPC + HTTP up, engines loaded, request served
over a real gRPC channel (the reference's server-level integration)."""

import os
import socket
import threading
import time
import urllib.request

import grpc
import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb


pytestmark = pytest.mark.smoke


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _client_mod():
    """Import the repo-root client.py by explicit path. A bare
    ``import client`` depends on sys.path[0] being the repo root, which
    an earlier test in a full serial run can break (chdir / sys.path
    edits) — the order-dependent ModuleNotFoundError flake."""
    import importlib.util
    import sys

    if "client" in sys.modules and hasattr(sys.modules["client"], "main"):
        return sys.modules["client"]
    path = os.path.join(os.path.dirname(__file__), "..", "client.py")
    spec = importlib.util.spec_from_file_location("client", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["client"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def server_ports(tmp_path_factory):
    from gyre_tpu import server as server_mod
    from gyre_tpu.http import stability_rest

    stability_rest.LIMITS["height"] = (64, 2048)
    stability_rest.LIMITS["width"] = (64, 2048)

    grpc_port, http_port = _free_port(), _free_port()
    cfg = os.path.join(os.path.dirname(__file__), "fixtures",
                       "engines.test.yaml")
    cache = str(tmp_path_factory.mktemp("cache"))
    argv = ["--grpc_port", str(grpc_port), "--http_port", str(http_port),
            "--enginecfg", cfg, "--dtype", "float32",
            "--cache_path", cache, "--batch_max", "2"]
    t = threading.Thread(target=server_mod.main, args=(argv,), daemon=True)
    t.start()
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://localhost:{http_port}/status", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception:  # noqa: BLE001
            time.sleep(0.5)
    else:
        pytest.fail("server did not come up")
    yield grpc_port, http_port


def test_grpc_generate_roundtrip(server_ports):
    grpc_port, _ = server_ports
    channel = grpc.insecure_channel(f"localhost:{grpc_port}")
    req = pb.Request(engine_id="test-engine", request_id="it-1")
    p = req.prompt.add()
    p.text = "integration test"
    req.image.height = 64
    req.image.width = 64
    req.image.steps = 2
    req.image.seed.append(11)
    call = channel.unary_stream(
        "/gooseai.GenerationService/Generate",
        request_serializer=pb.Request.SerializeToString,
        response_deserializer=pb.Answer.FromString)
    answers = list(call(req, timeout=180))
    assert len(answers) == 1
    art = answers[0].artifacts[0]
    assert art.type == pb.ARTIFACT_IMAGE and art.seed == 11
    assert art.binary[:4] == b"\x89PNG"


def test_grpc_list_engines(server_ports):
    from gyre_tpu.generated import engines_pb2 as epb

    grpc_port, _ = server_ports
    channel = grpc.insecure_channel(f"localhost:{grpc_port}")
    call = channel.unary_unary(
        "/gooseai.EnginesService/ListEngines",
        request_serializer=epb.ListEnginesRequest.SerializeToString,
        response_deserializer=epb.Engines.FromString)
    out = call(epb.ListEnginesRequest(), timeout=30)
    assert [e.id for e in out.engine] == ["test-engine"]


def test_cli_client_end_to_end(server_ports, tmp_path):
    """The shipped client.py drives the live server."""
    client_mod = _client_mod()

    grpc_port, _ = server_ports
    out = tmp_path / "gen.png"
    # same StaticSpec as the roundtrip test above (dims/steps/sampler) so
    # this hits the jit cache — keeps the smoke tier under a minute
    rc = client_mod.main([
        "a client test", "--host", f"localhost:{grpc_port}",
        "-W", "64", "-H", "64", "--steps", "2", "-S", "5",
        "-o", str(out)])
    assert rc == 0
    assert out.read_bytes()[:4] == b"\x89PNG"


def test_cli_client_list_engines(server_ports, capsys):
    client_mod = _client_mod()

    grpc_port, _ = server_ports
    rc = client_mod.main(["x", "--host", f"localhost:{grpc_port}",
                          "--list-engines"])
    assert rc == 0
    assert "test-engine" in capsys.readouterr().out


def test_cli_client_grpc_web_transport(server_ports, tmp_path):
    """client.py --grpc_web speaks the gRPC-WEB protocol against the
    HTTP router (reference drives this through its vendored sonora
    WebChannel, gyre/sonora/client.py)."""
    client_mod = _client_mod()

    _, http_port = server_ports
    out = tmp_path / "web.png"
    rc = client_mod.main([
        "a web test", "--grpc_web", "--host", f"localhost:{http_port}",
        "-W", "64", "-H", "64", "--steps", "2", "-S", "5",
        "-o", str(out)])
    assert rc == 0
    assert out.read_bytes()[:4] == b"\x89PNG"
    # list-engines over grpc-web too
    rc = client_mod.main(["x", "--grpc_web", "--host",
                          f"localhost:{http_port}", "--list-engines"])
    assert rc == 0


def test_client_request_param_syntax(tmp_path):
    """client.py's reference-parity artifact syntax: LoRA per-model
    weights (file:unet_w:text_w -> named_weights), TI token overrides
    (file:token...), hint weight + priority (kind:file[:w][:priority]) —
    the reference client's parse rules (/root/reference/client.py:359-371,
    407-413, 1286-1306)."""
    import argparse

    client_mod = _client_mod()
    pb = client_mod.pb
    f = tmp_path / "a.safetensors"
    f.write_bytes(b"00")
    ns = argparse.Namespace(
        engine="e", request_id="", prompt="cat", negative="",
        init=None, mask=None,
        lora=[f"{f}:0.8:0.5", f"{f}:0.7"],
        ti=[f"{f}:tok1:tok2"],
        hint=[f"depth:{f}:0.9:prompt", f"canny:{f}"],
        height=512, width=512, steps=5, samples=1, seed=[1],
        sampler="k_dpmpp_2m", cfg=7.5, eta=None, churn=0.0,
        karras_rho=0.0, strength=None, hires=False, tiling=False,
        mask_from_image_alpha=False, guidance=0.0, clip_layer=0,
        noise_type=None, sigma_min=None, sigma_max=None,
        churn_tmin=None, churn_tmax=None, hires_oos_fraction=None,
        accept_webp=False, hint_from_image=None, hint_from_init=None)
    req = client_mod.build_request(ns)

    loras = [p for p in req.prompt if p.artifact.type == pb.ARTIFACT_LORA]
    named = [(w.name, round(w.weight, 4))
             for w in loras[0].parameters.named_weights]
    assert named == [("unet", 0.8), ("text_encoder", 0.5)]
    assert abs(loras[1].parameters.weight - 0.7) < 1e-6
    assert not loras[1].parameters.named_weights

    ti = [p for p in req.prompt
          if p.artifact.type == pb.ARTIFACT_TOKEN_EMBEDDING][0]
    assert [o.token for o in ti.parameters.token_overrides] == \
        ["tok1", "tok2"]

    hints = [p for p in req.prompt
             if p.artifact.type == pb.ARTIFACT_HINT_IMAGE]
    assert hints[0].parameters.hint_priority == pb.HINT_PRIORITISE_PROMPT
    assert abs(hints[0].parameters.weight - 0.9) < 1e-6
    assert hints[0].artifact.hint_image_type == "depth"
    assert hints[1].parameters.hint_priority == pb.HINT_BALANCED
    assert hints[1].parameters.weight == 1.0


def test_http_surface(server_ports):
    import json

    _, http_port = server_ports
    with urllib.request.urlopen(
            f"http://localhost:{http_port}/server.json") as r:
        assert "stability-rest-v1" in json.loads(r.read())["api"]
    with urllib.request.urlopen(f"http://localhost:{http_port}/log") as r:
        log = json.loads(r.read())["log"]
    assert any("engines ready" in e["message"] for e in log)


def test_source_watcher_detects_changes(tmp_path):
    from gyre_tpu.server import SourceWatcher

    cfg = tmp_path / "engines.yaml"
    cfg.write_text("- id: a\n")
    w = SourceWatcher(extra_paths=[str(tmp_path)])
    assert w.changed() == []          # baseline scan
    assert w.changed() == []          # no changes
    import os
    import time as _t

    _t.sleep(0.01)
    cfg.write_text("- id: b\n")
    os.utime(cfg, (os.stat(cfg).st_atime, _t.time() + 5))
    diff = w.changed()
    assert any(str(cfg) == d for d in diff)


def test_localtunnel_flag_forces_token(monkeypatch):
    from gyre_tpu import server as srv

    args = srv.parse_args(["--localtunnel"])
    assert args.localtunnel
    # main() generates a token when --localtunnel given without one; the
    # generation logic is 3 lines — exercise it directly
    import secrets

    if args.localtunnel and not args.access_token:
        args.access_token = secrets.token_urlsafe(16)
    assert args.access_token


def test_localtunnel_missing_npx(monkeypatch):
    import shutil

    from gyre_tpu.server import start_localtunnel

    monkeypatch.setattr(shutil, "which", lambda _: None)
    assert start_localtunnel(5000, "tok") is None
