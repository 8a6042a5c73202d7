"""Cross-cutting utils tests: caches, resources, safe unpickle, logging,
monitor, debug recorder."""

import gzip
import json
import logging
import os
import time

import numpy as np
import pytest

from gyre_tpu.utils.cache import (DiskCache, DualCache, KeyspacedCache,
                                  MemoryLRUCache)
from gyre_tpu.utils.debug_recorder import DebugRecorder
from gyre_tpu.utils.logview import StoreHandler, VisualRecord
from gyre_tpu.utils.monitor import ResourceMonitor, host_rss_bytes
from gyre_tpu.utils.resources import (ResourceError, ResourceProvider,
                                      WhitelistRule)
from gyre_tpu.utils.safe_unpickle import load_torch_checkpoint


def test_memory_lru_eviction_and_ttl():
    c = MemoryLRUCache(max_bytes=3000)
    c.set("a", b"x" * 1000)
    c.set("b", b"x" * 1000)
    c.set("c", b"x" * 1000)
    c.set("d", b"x" * 1000)  # evicts oldest
    assert c.get("a") is None and c.get("d") is not None
    c.set("t", b"y", ttl=0.01)
    time.sleep(0.05)
    assert c.get("t") is None


def test_disk_and_dual_cache(tmp_path):
    disk = DiskCache(str(tmp_path), max_bytes=10_000)
    dual = DualCache(MemoryLRUCache(max_bytes=100), disk)
    dual.set("key1", b"hello" * 100)
    # evicted from tiny mem cache but recoverable from disk
    dual.set("key2", b"world" * 100)
    assert dual.get("key1") == b"hello" * 100
    ks = KeyspacedCache(dual, "gen:")
    ks.set("x", b"1")
    assert ks.get("x") == b"1"
    assert dual.get("gen:x") == b"1"


def test_resource_provider_whitelist(tmp_path):
    f = tmp_path / "model.safetensors"
    f.write_bytes(b"data")
    rp = ResourceProvider(cache=None,
                          local_roots={"models": str(tmp_path)})
    assert rp.fetch("file:models/model.safetensors") == b"data"
    with pytest.raises(ResourceError):
        rp.fetch("file:other/model.safetensors")
    with pytest.raises(ResourceError):
        rp.fetch("https://evil.example.com/x", fmt="safetensors")
    with pytest.raises(ResourceError):  # path escape
        rp.fetch("file:models/../../etc/passwd")


def test_safe_unpickle_torch_checkpoint(tmp_path):
    import torch

    state = {"layer.weight": torch.arange(6, dtype=torch.float32)
             .reshape(2, 3),
             "nested": {"alpha": torch.tensor(4.0)}}
    path = tmp_path / "ckpt.pt"
    torch.save(state, str(path))
    out = load_torch_checkpoint(path.read_bytes())
    np.testing.assert_allclose(
        out["layer.weight"],
        np.arange(6, dtype=np.float32).reshape(2, 3))
    np.testing.assert_allclose(out["nested"]["alpha"], 4.0)


def test_safe_unpickle_blocks_code(tmp_path):
    import pickle

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    # wrap in a torch-like zip so loader reaches the unpickler
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(Evil()))
    with pytest.raises(Exception):
        load_torch_checkpoint(buf.getvalue())


def test_visual_record_and_store():
    cache = MemoryLRUCache()
    VisualRecord.cache = cache
    img = np.zeros((1, 8, 8, 3), np.float32)
    rec = VisualRecord("stage latents", img)
    assert rec.keys and "/log/" in str(rec)
    assert cache.get(rec.keys[0])[:4] == b"\x89PNG"

    store = StoreHandler(capacity=5)
    store.setFormatter(logging.Formatter("%(message)s"))
    lg = logging.getLogger("test_store")
    lg.addHandler(store)
    lg.setLevel(logging.INFO)
    for i in range(8):
        lg.info("msg %d", i)
    tail = store.tail()
    assert len(tail) == 5 and tail[-1]["message"] == "msg 7"


def test_monitor():
    m = ResourceMonitor()
    assert host_rss_bytes() > 0
    m.sample()
    rep = m.report()
    assert rep["peak_rss_mb"] > 0


def test_debug_recorder(tmp_path):
    rec = DebugRecorder(str(tmp_path), window_s=600)
    with rec.record("generate") as store:
        store.store("request", {"prompt": "a cat"})
        store.store("unjsonable", object())
    files = os.listdir(tmp_path)
    assert len(files) == 1
    with gzip.open(tmp_path / files[0], "rt") as fh:
        data = json.load(fh)
    assert data["request"]["prompt"] == "a cat"


def test_measured_batch_probe():
    """suggest_max_batch uses XLA memory_analysis of the compiled unet
    step when available (reference autodetect probe analogue)."""
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "probe", "model": "preset/test", "default": True}],
        compute_dtype=jnp.float32, batch_max=8)
    m.load_engines()
    per = m._probe_bytes_per_image("probe", 64, 64)
    assert per > 0
    b = m.suggest_max_batch("probe", 64, 64)
    assert 1 <= b <= 64
    # cached on repeat
    assert m._probe_bytes_per_image("probe", 64, 64) == per


def test_request_stats_summary():
    from gyre_tpu.utils.timing import RequestStats

    st = RequestStats()
    for v in (0.01, 0.02, 0.03):
        st.record("generate", v)
    with st.timer("extract"):
        pass
    s = st.summary()
    assert s["generate"]["count"] == 3
    assert s["generate"]["p50_ms"] == 20.0
    assert "extract" in s


def test_latent_debug_tags(monkeypatch, caplog):
    import logging

    import jax.numpy as jnp

    from gyre_tpu.utils import latent_debug

    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    monkeypatch.setenv("SD_DEBUG_LATENTS", "")
    latent_debug.log_latents("init", lat)  # disabled: no record
    monkeypatch.setenv("SD_DEBUG_LATENTS", "init,final")
    with caplog.at_level(logging.INFO, logger="gyre_tpu.latents"):
        latent_debug.log_latents("init", lat)
        latent_debug.log_latents("chunk:10", lat)  # not enabled
        latent_debug.log_latents("final", lat)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("latents:init" in m for m in msgs)
    assert any("latents:final" in m for m in msgs)
    assert not any("chunk" in m for m in msgs)
