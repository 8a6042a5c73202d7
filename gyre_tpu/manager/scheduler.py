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
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)


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

    def coalesce_key(self):
        kw = self.kwargs
        if kw.get("init_image") is not None or \
                kw.get("mask_image") is not None or kw.get("hints") or \
                kw.get("depth_map") is not None or \
                kw.get("hires_fix") or kw.get("clip_guidance_scale"):
            return None  # solo
        return (id(self.pipe), kw.get("height"), kw.get("width"),
                kw.get("steps"), kw.get("sampler"), kw.get("eta"),
                kw.get("churn"), kw.get("churn_tmin"),
                kw.get("churn_tmax"), kw.get("warmup_lms"),
                kw.get("ddim_cutoff"), kw.get("sigma_min"),
                kw.get("sigma_max"), kw.get("karras_rho"),
                kw.get("noise_type"), kw.get("clip_layer"),
                kw.get("tiling"),
                bool(np.all(np.asarray(kw.get("guidance_scale", 7.5)) > 1)))


class CoalescingDispatcher:
    def __init__(self, max_batch: int = 8, gather_ms: float = 10.0):
        self.max_batch = max_batch
        self.gather_ms = gather_ms
        self._q: queue.Queue[Job] = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._stop = threading.Event()
        self._started = False
        # observability: batch sizes actually dispatched (requests, rows)
        self.dispatched: list[tuple[int, int]] = []
        self.coalesced_requests = 0

    def start(self):
        if not self._started:
            self._started = True
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._q.put(None)

    def submit(self, pipe, kwargs, stop_event=None) -> Future:
        self.start()
        job = Job(pipe, kwargs, stop_event=stop_event)
        self._q.put(job)
        return job.future

    # ------------------------------------------------------------ internal

    def _run(self):
        while not self._stop.is_set():
            job = self._q.get()
            if job is None:
                continue
            batch = [job]
            key = job.coalesce_key()
            if key is not None:
                deadline = time.monotonic() + self.gather_ms / 1000.0
                n = len(job.kwargs.get("seeds") or [1])
                overflow = []
                while n < self.max_batch:
                    timeout = deadline - time.monotonic()
                    if timeout <= 0:
                        break
                    try:
                        nxt = self._q.get(timeout=timeout)
                    except queue.Empty:
                        break
                    if nxt is None:
                        break
                    if nxt.coalesce_key() == key:
                        batch.append(nxt)
                        n += len(nxt.kwargs.get("seeds") or [1])
                    else:
                        overflow.append(nxt)
                for item in overflow:
                    self._q.put(item)
            self._execute(batch)

    def _execute(self, jobs: list[Job]):
        live = [j for j in jobs
                if not (j.stop_event is not None and j.stop_event.is_set())]
        for j in jobs:
            if j not in live:
                j.future.cancel()
        if not live:
            return
        if len(live) == 1:
            job = live[0]
            try:
                result = job.pipe(**job.kwargs)
                # materialize HERE: device work (including the d2h
                # transfer) must stay on this thread. Handing a lazy jax
                # array to a gRPC thread makes that thread sync with the
                # device, and the experimental axon remote client wedges
                # under cross-thread sync (first-request hang).
                if result is not None:
                    result = np.asarray(result)
                self.dispatched.append(
                    (1, len(job.kwargs.get("seeds") or [1])))
                job.future.set_result(result)
            except Exception as e:  # noqa: BLE001
                job.future.set_exception(e)
            return

        # merge: per-sample prompts, seeds, guidance
        pipe = live[0].pipe
        merged = dict(live[0].kwargs)
        prompts_m, negs, seeds, gs = [], [], [], []
        counts = []
        for j in live:
            kw = j.kwargs
            s = list(kw.get("seeds") or [0])
            counts.append(len(s))
            seeds.extend(s)
            prompts_m.extend([kw.get("prompt", "")] * len(s))
            negs.extend([kw.get("negative_prompt", "")] * len(s))
            g = np.asarray(kw.get("guidance_scale", 7.5),
                           np.float32).reshape(-1)
            gs.extend(list(np.broadcast_to(g, (len(s),))))
        merged.update(prompt=prompts_m, negative_prompt=negs, seeds=seeds,
                      guidance_scale=gs)
        # shared batches cancel only when every client cancelled
        if any("stop_event" in j.kwargs for j in live):
            merged["stop_event"] = CombinedEvent(
                [j.kwargs.get("stop_event") for j in live])
        logger.info("coalesced %d requests into batch %d", len(live),
                    len(seeds))
        try:
            images = pipe(**merged)
            self.dispatched.append((len(live), len(seeds)))
            self.coalesced_requests += len(live)
            if images is None:  # all clients cancelled mid-batch
                for j in live:
                    j.future.set_result(None)
                return
            images = np.asarray(images)
            off = 0
            for j, n in zip(live, counts):
                j.future.set_result(images[off:off + n])
                off += n
        except Exception:  # noqa: BLE001
            logger.exception("coalesced batch failed; falling back to solo")
            for j in live:
                try:
                    solo = j.pipe(**j.kwargs)
                    if solo is not None:
                        solo = np.asarray(solo)
                    j.future.set_result(solo)
                except Exception as e2:  # noqa: BLE001
                    j.future.set_exception(e2)
