"""Request-coalescing dispatcher: the north-star serving optimization.

The reference scales out by parking whole requests on per-GPU queue slots
(gyre/manager.py:2081-2139) — one request per device, no batching across
clients. On TPU the denoise step is a persistently-compiled XLA program
whose throughput grows with batch, so concurrent compatible requests are
merged into ONE batch:

  * gRPC threads submit jobs and block on futures; a single dispatcher
    thread owns all device work (no thread ever races the TPU). EVERY
    generation request — coalescible or not — flows through here; there
    is no outer lock anywhere in the serving path.
  * Jobs coalesce when their compiled-program signature matches (size,
    steps, sampler, schedule knobs, mode txt2img, engine) — prompts,
    seeds and cfg scales merge per-sample (contexts are per-row tensors
    and guidance is a [B] vector in the compiled step).
  * A short gather window (default 10 ms) after the first job picks up
    burst traffic without hurting p50.
  * Merged batches keep chunked dispatch: cancellation applies when ALL
    participating clients cancel (a shared batch can't die for one
    client), and each job's future still resolves to its own rows.
  * Merged batches are PADDED onto a bucket shape already dispatched
    for that coalesce key (pow-of-two candidates, falling back to
    max_batch when none fits): every compiled program shape is drawn
    from a tiny learned set, so a 3-request merge reuses the batch-8
    executable instead of stalling the whole queue minutes on a
    one-off batch-3/4 compile. Per-image step time is nearly flat in
    batch, so pad rows cost a fraction of one batch while saving whole
    compiles. Pad rows are sliced off before futures resolve.
  * Incompatible concurrent requests INTERLEAVE at chunk granularity:
    pipelines expose `begin()` (a generator yielding between compiled
    chunk dispatches, pipeline/unified.py), and the dispatcher
    round-robins up to `interleave` active batches. A 50-step 1024
    solo request no longer head-of-line-blocks a queued 512 request
    for its whole duration — the single-chip answer to the QoS the
    reference's per-GPU device pool gave for free. Batches waiting for
    a slot keep absorbing compatible arrivals up to max_batch.
"""

from __future__ import annotations

import contextlib
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)


class DeviceWedgedError(RuntimeError):
    """The device watchdog tripped: a single device operation has been in
    flight longer than the threshold. A wedged accelerator (or a wedged
    remote-device tunnel — the exact failure that silently consumed a
    whole benchmarking session, PERFORMANCE.md round-3 caveat) hangs the
    dispatcher thread inside one XLA call; nothing recovers it from user
    space. The watchdog turns that into fast, visible failure: queued and
    future requests get UNAVAILABLE instead of hanging to their own RPC
    deadlines, and /status reports the wedge."""


def _resolve(future: Future, value):
    """set_result tolerating a future the watchdog already failed (the
    op completed after the trip — clients were told UNAVAILABLE; the
    late result is dropped rather than crashing the dispatcher)."""
    try:
        future.set_result(value)
    except Exception:  # noqa: BLE001 — InvalidStateError
        pass


class CombinedEvent:
    """is_set() only when every underlying client cancelled. Jobs without
    a stop_event never cancel, so any such participant pins the batch."""

    def __init__(self, events):
        self.events = list(events)

    def is_set(self) -> bool:
        return bool(self.events) and all(
            e is not None and e.is_set() for e in self.events)


@dataclass
class Job:
    pipe: object
    kwargs: dict
    future: Future = field(default_factory=Future)
    stop_event: object = None
    solo: bool = False           # never coalesce (e.g. safety checks)
    enqueue_ts: float = 0.0      # submit() time, for queue-wait timing

    def rows(self) -> int:
        return len(self.kwargs.get("seeds") or [1])

    def coalesce_key(self):
        if self.solo:
            return None
        kw = self.kwargs
        if kw.get("init_image") is not None or \
                kw.get("mask_image") is not None or kw.get("hints") or \
                kw.get("depth_map") is not None or \
                kw.get("hires_fix") or kw.get("clip_guidance_scale") or \
                kw.get("sampler") == "dpm_adaptive":
            # dpm_adaptive's PI error estimate couples the whole batch
            # (step sizes would depend on co-batched requests) — solo
            return None
        return (id(self.pipe), kw.get("height"), kw.get("width"),
                kw.get("steps"), kw.get("sampler"), kw.get("eta"),
                kw.get("churn"), kw.get("churn_tmin"),
                kw.get("churn_tmax"), kw.get("warmup_lms"),
                kw.get("ddim_cutoff"), kw.get("sigma_min"),
                kw.get("sigma_max"), kw.get("karras_rho"),
                kw.get("noise_type"), kw.get("clip_layer"),
                kw.get("tiling"),
                bool(np.all(np.asarray(kw.get("guidance_scale", 7.5)) > 1)))


@dataclass
class _Batch:
    """A pending-or-active unit of device work: one or more coalesced
    jobs, executed either through a chunk generator (interleavable) or
    as a single blocking call."""

    jobs: list
    key: object
    deadline: float = 0.0        # gather window end (pending only)
    first_ts: float = 0.0        # arrival of the first job (cap anchor)
    gen: object = None           # chunk stepper once started
    counts: list = field(default_factory=list)
    padded: int = 0              # pad rows appended for shape bucketing

    def rows(self) -> int:
        return sum(j.rows() for j in self.jobs)


class CoalescingDispatcher:
    def __init__(self, max_batch: int = 8, gather_ms: float = 10.0,
                 interleave: int = 2, bucket: bool = True,
                 watchdog_s: float = 900.0):
        self.max_batch = max_batch
        self.gather_ms = gather_ms
        self.interleave = max(1, int(interleave))
        self.bucket = bucket
        # watchdog: a device op (one chunk dispatch / result transfer)
        # in flight longer than this marks the device wedged. Generous
        # by default — a cold XLA serving-program compile on the remote
        # platform is minutes — and 0 disables. A real wedge hangs for
        # hours (round-3 incident), so 15 min separates the two cleanly.
        self.watchdog_s = float(watchdog_s)
        self.wedged = False
        self.wedged_op = ""
        self.unwedged_count = 0      # false trips recovered from
        # (desc, started) snapshot — written/cleared together so readers
        # never see a desc from one op and a start time from another
        self._op: tuple[str, float] | None = None
        self._ops_completed = 0
        self._q: queue.Queue[Job] = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._watch_thread = threading.Thread(target=self._watch,
                                              daemon=True)
        self._stop = threading.Event()
        self._started = False
        self._pending: list[_Batch] = []
        self._active: list[_Batch] = []
        # the batch currently inside a blocking _start/_finish call: it
        # is in neither _pending nor _active, but the watchdog must be
        # able to fail it (it is exactly the one a wedge traps)
        self._executing: _Batch | None = None
        # observability: batch sizes actually dispatched (requests, rows)
        self.dispatched: list[tuple[int, int]] = []
        self.coalesced_requests = 0
        self.interleaved_chunks = 0
        self.padded_rows = 0
        # batch shapes already dispatched per coalesce key: padding
        # targets ONLY these (else max_batch) so a merge never stalls
        # on a never-seen shape's XLA compile
        self._seen_buckets: set[tuple] = set()

    def start(self):
        if not self._started:
            self._started = True
            self._thread.start()
            if self.watchdog_s > 0:
                self._watch_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._q.put(None)

    def submit(self, pipe, kwargs, stop_event=None, solo: bool = False) \
            -> Future:
        self.start()
        job = Job(pipe, kwargs, stop_event=stop_event, solo=solo,
                  enqueue_ts=time.monotonic())
        if self.wedged:
            job.future.set_exception(DeviceWedgedError(
                f"device watchdog tripped: {self.wedged_op} exceeded "
                f"{self.watchdog_s:.0f}s; refusing new work"))
            return job.future
        if threading.current_thread() is self._thread:
            # re-entrant submit from a dispatcher-executed job: run
            # inline (we ARE the device thread) — queueing + waiting on
            # ourselves would self-deadlock
            try:
                job.future.set_result(pipe(**kwargs))
            except Exception as e:  # noqa: BLE001
                job.future.set_exception(e)
            return job.future
        self._q.put(job)
        return job.future

    # ------------------------------------------------------------ watchdog

    @contextlib.contextmanager
    def _device_op(self, desc: str):
        """Marks a section of dispatcher-thread code that blocks on the
        device (chunk dispatch, result transfer, blocking pipeline call).
        The watchdog thread reads _op to detect a hang."""
        self._op = (desc, time.monotonic())
        try:
            yield
        finally:
            self._op = None
            self._ops_completed += 1
            if self.wedged:
                # the op the watchdog tripped on actually completed: the
                # device is alive, the trip was a false positive (e.g. a
                # legitimately long first compile). Clients already got
                # UNAVAILABLE for the queued work — recover and accept
                # new work instead of staying dead until restart.
                self.wedged = False
                self.unwedged_count += 1
                logger.warning(
                    "device watchdog recovery: %s completed after the "
                    "trip — un-wedging, accepting work again",
                    self.wedged_op)

    def _threshold(self) -> float:
        """First device op gets 3x headroom: a cold XLA serving-program
        compile (minutes on the remote platform) is the one legitimate
        op that can approach the threshold; a real wedge hangs for
        hours either way."""
        return self.watchdog_s * (3.0 if self._ops_completed == 0 else 1.0)

    def watchdog_state(self) -> dict:
        op = self._op
        desc, started = op if op is not None else ("", None)
        in_flight = max(0.0, time.monotonic() - started) if started else 0.0
        return {
            "wedged": self.wedged,
            "wedged_op": self.wedged_op,
            "unwedged_count": self.unwedged_count,
            "threshold_s": self.watchdog_s,
            "op_in_flight_s": round(in_flight, 1),
            "op": desc,
        }

    def _watch(self):
        interval = min(max(self.watchdog_s / 10.0, 1.0), 10.0)
        while not self._stop.is_set():
            time.sleep(interval)
            if self.wedged:
                # dispatcher thread is stuck inside the wedged op, so
                # nothing drains the queue: a submit() racing the trip
                # (wedged checked False, then put) would otherwise hang
                # to its full RPC deadline — exactly the failure the
                # watchdog exists to prevent. Fail those here.
                self._drain_and_fail()
                continue
            op = self._op
            if op is None:
                continue
            desc, started = op
            threshold = self._threshold()
            overdue = time.monotonic() - started - threshold
            if overdue > 0:
                self._trip(f"{desc} (in flight "
                           f"{threshold + overdue:.0f}s)")

    def _drain_and_fail(self):
        exc = DeviceWedgedError(
            f"device watchdog tripped: {self.wedged_op}")
        while True:
            try:
                job = self._q.get(block=False)
            except queue.Empty:
                return
            if job is not None:
                try:
                    job.future.set_exception(exc)
                except Exception:  # noqa: BLE001
                    pass

    def _trip(self, op: str):
        """The dispatcher thread is stuck inside an XLA call we cannot
        interrupt. Fail everything waiting so clients see UNAVAILABLE now
        instead of hanging to their RPC deadlines. Not terminal: if the
        tripped op later completes (false positive — e.g. an unusually
        long compile), _device_op's finally un-wedges and the server
        accepts work again. The pending/active lists normally belong to
        the dispatcher thread — it is wedged, so touching them here is
        safe; set_exception guards against the (unlikely) unwedge race."""
        self.wedged = True
        self.wedged_op = op
        logger.error("DEVICE WATCHDOG TRIPPED: %s — failing queued work, "
                     "refusing new work; /status reports wedged", op)
        exc = DeviceWedgedError(f"device watchdog tripped: {op}")
        while True:
            try:
                job = self._q.get(block=False)
            except queue.Empty:
                break
            if job is not None:
                try:
                    job.future.set_exception(exc)
                except Exception:  # noqa: BLE001 — already resolved
                    pass
        execing = [self._executing] if self._executing is not None else []
        for b in list(self._pending) + list(self._active) + execing:
            for j in b.jobs:
                try:
                    j.future.set_exception(exc)
                except Exception:  # noqa: BLE001
                    pass

    # ------------------------------------------------------------ internal

    def _run(self):
        while not self._stop.is_set():
            busy = bool(self._active) or bool(self._pending)
            self._drain(block=not busy)
            self._admit()
            self._advance()

    def _drain(self, block: bool):
        """Move queued jobs into pending batches (coalescing on arrival).
        Blocks only when there is nothing to do."""
        try:
            job = self._q.get(block=block, timeout=0.25 if block else None) \
                if block else self._q.get(block=False)
        except queue.Empty:
            return
        while True:
            if job is not None:
                self._enqueue(job)
            try:
                job = self._q.get(block=False)
            except queue.Empty:
                return

    def _enqueue(self, job: Job):
        key = job.coalesce_key()
        now = time.monotonic()
        if key is not None:
            for b in self._pending:
                if b.key == key and b.rows() + job.rows() <= self.max_batch:
                    b.jobs.append(job)
                    # rolling (debounced) gather: each arrival extends
                    # the window by gather_ms — a burst whose arrivals
                    # stagger slightly wider than one window still merges
                    # into a full batch. Capped at 5x so a trickle can't
                    # hold a batch open indefinitely. A padded partial
                    # merge costs a FULL batch's device time anyway, so
                    # waiting a few more ms for the stragglers is
                    # strictly better than dispatching at partial rows.
                    b.deadline = min(now + self.gather_ms / 1000.0,
                                     b.first_ts + 5 * self.gather_ms
                                     / 1000.0)
                    return
        self._pending.append(_Batch(
            jobs=[job], key=key, first_ts=now,
            deadline=now + self.gather_ms / 1000.0))

    def _admit(self):
        """Start pending batches while interleave slots are free. A
        coalescible batch rides out its gather window before starting so
        burst traffic merges instead of splitting into undersized
        batches: when the device is idle the window is a blocking wait
        on the queue (exactly the pre-interleave behavior); when other
        batches are active the chunk cadence provides the wait and the
        batch keeps absorbing compatible arrivals until a cycle finds it
        ready."""
        while self._pending and len(self._active) < self.interleave:
            b = self._pending[0]
            if (b.key is not None and not self._active and
                    b.rows() < self.max_batch):
                timeout = b.deadline - time.monotonic()
                if timeout > 0:
                    try:
                        nxt = self._q.get(timeout=timeout)
                    except queue.Empty:
                        nxt = None
                    if nxt is not None:
                        self._enqueue(nxt)
                    continue
            ready = None
            for b in self._pending:
                if (b.key is None or b.rows() >= self.max_batch or
                        time.monotonic() >= b.deadline):
                    ready = b
                    break
            if ready is None:
                return
            self._pending.remove(ready)
            self._start(ready)

    def _start(self, b: _Batch):
        from ..utils.timing import STATS

        now = time.monotonic()
        for j in b.jobs:
            if j.enqueue_ts:
                # submit() -> batch start: gather window + head-of-line
                # wait behind other batches (serving-overhead profile,
                # scripts/profile_serving.py)
                STATS.record("dispatch_queue_wait", now - j.enqueue_ts)
        live = [j for j in b.jobs
                if not (j.stop_event is not None and j.stop_event.is_set())]
        for j in b.jobs:
            if j not in live:
                j.future.cancel()
        if not live:
            return
        b.jobs = live
        b.counts = [j.rows() for j in live]
        self._executing = b

        pipe = live[0].pipe
        if len(live) == 1:
            merged = dict(live[0].kwargs)
        else:
            # merge: per-sample prompts, seeds, guidance
            merged = dict(live[0].kwargs)
            prompts_m, negs, seeds, gs = [], [], [], []
            for j in live:
                kw = j.kwargs
                s = list(kw.get("seeds") or [0])
                seeds.extend(s)
                prompts_m.extend([kw.get("prompt", "")] * len(s))
                negs.extend([kw.get("negative_prompt", "")] * len(s))
                g = np.asarray(kw.get("guidance_scale", 7.5),
                               np.float32).reshape(-1)
                gs.extend(list(np.broadcast_to(g, (len(s),))))
            merged.update(prompt=prompts_m, negative_prompt=negs,
                          seeds=seeds, guidance_scale=gs)
            # shared batches cancel only when every client cancelled
            if any("stop_event" in j.kwargs for j in live):
                merged["stop_event"] = CombinedEvent(
                    [j.kwargs.get("stop_event") for j in live])
            logger.info("coalesced %d requests into batch %d", len(live),
                        len(seeds))

        if b.key is not None:
            b.padded = self._pad_to_bucket(merged, b.rows(), b.key)
            self.padded_rows += b.padded

        begin = getattr(pipe, "begin", None)
        if begin is not None:
            try:
                with STATS.timer("dispatch_begin"), \
                        self._device_op("pipeline begin"):
                    b.gen = begin(**merged)
            except Exception as e:  # noqa: BLE001
                self._executing = None
                self._fail(b, e)
                return
            self._active.append(b)
            self._executing = None
            return
        # no stepper (task pipelines / plain callables): run blocking
        self._finish(b, lambda: pipe(**merged))

    def _pad_to_bucket(self, merged: dict, rows: int, key=None) -> int:
        """Pad the merged per-row kwargs up to a bucket shape by
        repeating the final row. The target is the smallest power-of-two
        bucket >= rows that this key has ALREADY dispatched (its program
        is compiled); with no compiled candidate it pads straight to
        max_batch — the one shape worth a fresh minutes-scale compile,
        since it serves every future merge. Returns the number of pad
        rows added (0 when bucketing is off or rows exceed max_batch)."""
        if not self.bucket or rows <= 0:
            return 0
        target = 1
        while target < rows:
            target *= 2
        target = min(target, self.max_batch)
        # solo requests always run exact batch-1 (the light-traffic
        # latency shape — compiled once, served forever); merges only
        # run a shape that is compiled (seen) or is max_batch
        if rows > 1 and target < self.max_batch and \
                (key, target) not in self._seen_buckets:
            candidates = [t for t in (2, 4, 8, 16, 32, 64, 128)
                          if rows <= t <= self.max_batch and
                          (key, t) in self._seen_buckets]
            target = candidates[0] if candidates else self.max_batch
        self._seen_buckets.add((key, target))
        if target <= rows:
            return 0
        pad = target - rows

        seeds = list(merged.get("seeds") or [0])
        merged["seeds"] = seeds + [seeds[-1]] * pad
        # per-row lists/vectors must stay row-aligned with seeds
        for k in ("prompt", "negative_prompt"):
            v = merged.get(k)
            if isinstance(v, (list, tuple)) and len(v) == rows:
                merged[k] = list(v) + [v[-1]] * pad
        g = merged.get("guidance_scale")
        if g is not None:
            gv = np.asarray(g, np.float32).reshape(-1)
            gv = np.broadcast_to(gv, (rows,))
            merged["guidance_scale"] = list(gv) + [float(gv[-1])] * pad
        return pad

    def _advance(self):
        """Advance every active batch by one compiled chunk (round-robin
        at chunk granularity)."""
        for b in list(self._active):
            try:
                from ..utils.timing import STATS

                with STATS.timer("dispatch_chunk"), \
                        self._device_op("chunk dispatch"):
                    next(b.gen)
                self.interleaved_chunks += len(self._active) > 1
            except StopIteration as e:
                self._active.remove(b)
                self._finish(b, lambda _v=e.value: _v)
            except Exception as e:  # noqa: BLE001
                self._active.remove(b)
                self._fail(b, e)

    def _finish(self, b: _Batch, result_fn):
        self._executing = b
        try:
            self._finish_inner(b, result_fn)
        finally:
            self._executing = None

    def _finish_inner(self, b: _Batch, result_fn):
        from ..utils.timing import STATS

        try:
            with STATS.timer("dispatch_finalize"), \
                    self._device_op("batch execute + transfer"):
                result = result_fn()
                # materialize HERE: device work (including the d2h
                # transfer) must stay on this thread. Handing a lazy jax
                # array to a gRPC thread makes that thread sync with the
                # device, and the experimental axon remote client wedges
                # under cross-thread sync (first-request hang). Non-array
                # results (e.g. adapted pipeline objects from solo jobs)
                # pass through untouched.
                if result is not None and hasattr(result, "shape"):
                    result = np.asarray(result)
        except Exception as e:  # noqa: BLE001
            self._fail(b, e)
            return
        if b.padded and result is not None:
            result = result[:sum(b.counts)]
        self.dispatched.append((len(b.jobs), b.rows()))
        if len(b.jobs) > 1:
            self.coalesced_requests += len(b.jobs)
        if result is None or len(b.jobs) == 1:
            for j in b.jobs:
                _resolve(j.future, result)
            return
        off = 0
        for j, n in zip(b.jobs, b.counts):
            _resolve(j.future, result[off:off + n])
            off += n

    def _fail(self, b: _Batch, exc: Exception):
        if len(b.jobs) == 1:
            try:
                b.jobs[0].future.set_exception(exc)
            except Exception:  # noqa: BLE001 — watchdog beat us to it
                pass
            return
        logger.exception("coalesced batch failed; falling back to solo",
                         exc_info=exc)
        for j in b.jobs:
            try:
                with self._device_op("solo fallback"):
                    solo = j.pipe(**j.kwargs)
                    if solo is not None:
                        solo = np.asarray(solo)
                _resolve(j.future, solo)
            except Exception as e2:  # noqa: BLE001
                try:
                    j.future.set_exception(e2)
                except Exception:  # noqa: BLE001
                    pass
