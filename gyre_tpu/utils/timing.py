"""Request phase timing: the observability surface the reference lacks
(SURVEY §5: "none beyond timing prints" — reference gyre/server.py:1203-
1209, tests/test_harness.py:155-168). Phases recorded by the servicer
(extract / queue / compute / per-step / encode) aggregate into a ring
buffer summarised on /status."""

from __future__ import annotations

import threading
import time
from collections import defaultdict, deque


class RequestStats:
    """Thread-safe per-phase duration ring (seconds)."""

    def __init__(self, maxlen: int = 512):
        self._lock = threading.Lock()
        self._rings: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=maxlen))

    def record(self, phase: str, seconds: float):
        with self._lock:
            self._rings[phase].append(seconds)

    def timer(self, phase: str):
        return _Timer(self, phase)

    def summary(self) -> dict:
        out = {}
        with self._lock:
            for phase, ring in self._rings.items():
                if not ring:
                    continue
                vals = sorted(ring)
                n = len(vals)
                out[phase] = {
                    "count": n,
                    "p50_ms": round(vals[n // 2] * 1e3, 1),
                    "p95_ms": round(vals[min(n - 1,
                                             int(n * 0.95))] * 1e3, 1),
                    "last_ms": round(ring[-1] * 1e3, 1),
                }
        return out


class _Timer:
    def __init__(self, stats: RequestStats, phase: str):
        self.stats = stats
        self.phase = phase

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.stats.record(self.phase, time.perf_counter() - self.t0)
        return False


STATS = RequestStats()


def profiler_start(log_dir: str) -> str | None:
    """Start a jax-profiler trace (xprof). Returns an error string or
    None; runs in a worker thread because some tunneled platforms hang
    the profiler start."""
    import jax

    box: dict = {}

    def run():
        try:
            jax.profiler.start_trace(log_dir)
        except Exception as e:  # noqa: BLE001
            box["err"] = str(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=10)
    if t.is_alive():
        return "profiler start timed out (platform may not support it)"
    return box.get("err")


def profiler_stop() -> str | None:
    import jax

    try:
        jax.profiler.stop_trace()
        return None
    except Exception as e:  # noqa: BLE001
        return str(e)
