"""Host-RAM + device-HBM monitor (reference gyre/ram_monitor.py:20-203:
a sampling thread printing RSS/VRAM at lifecycle points; here HBM comes
from jax device memory stats instead of pynvml/ctypes-into-libcuda)."""

from __future__ import annotations

import logging
import threading
import time

logger = logging.getLogger(__name__)


def host_rss_bytes() -> int:
    try:
        with open("/proc/self/statm") as fh:
            pages = int(fh.read().split()[1])
        return pages * 4096
    except OSError:
        return 0


def _live_buffer_bytes() -> dict:
    """Client-tracked HBM per device from live jax arrays — the fallback
    when the PJRT allocator hides memory_stats() (the tunneled 'axon'
    platform returns None). Excludes XLA temp workspace; programs add
    their own temp via compiled.memory_analysis() at the call sites that
    care (bench.py)."""
    import jax

    per: dict = {}
    try:
        for a in jax.live_arrays():
            for shard in getattr(a, "addressable_shards", []) or []:
                dev = str(shard.device)
                per[dev] = per.get(dev, 0) + shard.data.nbytes / \
                    max(1, len(a.sharding.device_set))
    except Exception:  # noqa: BLE001
        pass
    return per


def device_memory_stats() -> list[dict]:
    """Per-device HBM usage from the PJRT allocator, with a live-buffer
    fallback where the allocator stats are unavailable."""
    import jax

    live = None
    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # noqa: BLE001
            stats = {}
        if not stats:
            if live is None:
                live = _live_buffer_bytes()
            stats = {"bytes_in_use": int(live.get(str(d), 0))}
        out.append({
            "device": str(d),
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        })
    return out


class ResourceMonitor:
    """Background sampler tracking peak host RSS + device HBM."""

    def __init__(self, interval: float = 0.5):
        self.interval = interval
        self.peak_rss = 0
        self.peak_hbm = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self):
        while not self._stop.wait(self.interval):
            self.sample()

    def sample(self):
        self.peak_rss = max(self.peak_rss, host_rss_bytes())
        for dev in device_memory_stats():
            self.peak_hbm = max(self.peak_hbm,
                                dev.get("peak_bytes_in_use", 0) or
                                dev.get("bytes_in_use", 0))

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def report(self) -> dict:
        self.sample()
        return {"peak_rss_mb": round(self.peak_rss / 1e6, 1),
                "peak_hbm_mb": round(self.peak_hbm / 1e6, 1)}

    def log(self, tag: str = ""):
        logger.info("%s %s", tag, self.report())
