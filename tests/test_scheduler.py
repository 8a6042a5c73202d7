"""Request-coalescing dispatcher tests: merged batches must be
sample-for-sample identical to solo runs (batch independence makes
coalescing lossless)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.manager.scheduler import CoalescingDispatcher, Job
from gyre_tpu.models import configs
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline.unified import UnifiedPipeline


@pytest.fixture(scope="module")
def pipe():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    return UnifiedPipeline(ms, compute_dtype=jnp.float32)


KW = dict(height=64, width=64, steps=2, sampler="k_euler")


def test_coalesce_key_rules(pipe):
    a = Job(pipe, dict(KW, prompt="x", seeds=[1], guidance_scale=7.5))
    b = Job(pipe, dict(KW, prompt="y", seeds=[2], guidance_scale=9.0))
    assert a.coalesce_key() == b.coalesce_key() is not None
    c = Job(pipe, dict(KW, prompt="x", seeds=[1], steps=3))
    assert c.coalesce_key() != a.coalesce_key()
    d = Job(pipe, dict(KW, prompt="x", seeds=[1],
                       init_image=np.zeros((1, 64, 64, 3), np.float32)))
    assert d.coalesce_key() is None


def test_concurrent_requests_coalesce_and_match_solo(pipe):
    dispatcher = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    reqs = [dict(KW, prompt=f"prompt {i}", seeds=[100 + i],
                 guidance_scale=5.0 + i) for i in range(3)]
    solo = [np.asarray(pipe(**r)) for r in reqs]

    futures = [dispatcher.submit(pipe, r) for r in reqs]
    merged = [np.asarray(f.result(timeout=300)) for f in futures]
    dispatcher.stop()
    for s, m in zip(solo, merged):
        assert m.shape == s.shape
        # merged batch runs at a different batch shape; float-tolerance
        np.testing.assert_allclose(m, s, atol=0.03)


def test_begin_steps_chunks_and_matches_call(pipe):
    kw = dict(KW, prompt="stepper", seeds=[7], steps=4, chunk_steps=2,
              stop_event=threading.Event())
    gen = pipe.begin(**kw)
    yields = []
    while True:
        try:
            yields.append(next(gen))
        except StopIteration as e:
            result = e.value
            break
    assert yields == [(2, 4), (4, 4)]
    solo = np.asarray(pipe(**kw))
    np.testing.assert_allclose(np.asarray(result), solo, atol=1e-5)


def test_interleave_short_request_not_blocked_by_long(pipe):
    """A queued short request must complete before an in-flight long one
    finishes (chunk-granular round-robin, interleave=2)."""
    dispatcher = CoalescingDispatcher(max_batch=8, gather_ms=5.0,
                                      interleave=2)
    order = []
    # 24 chunks: the margin must dwarf one-cycle admission jitter — with
    # the shared chunk program, per-chunk dispatch is ~ms-scale on the
    # tiny test model and a 6-chunk "long" request races the short one
    long_kw = dict(KW, prompt="long", seeds=[1], steps=48, chunk_steps=2,
                   stop_event=threading.Event())
    short_kw = dict(KW, prompt="short", seeds=[2], steps=2, chunk_steps=1,
                    stop_event=threading.Event())
    # warm the compiled programs so chunk cadence, not compile time,
    # decides ordering
    pipe(**long_kw)
    pipe(**short_kw)

    f_long = dispatcher.submit(pipe, dict(long_kw))
    time.sleep(0.05)  # long batch is active before short arrives
    f_short = dispatcher.submit(pipe, dict(short_kw))
    f_long.add_done_callback(lambda f: order.append("long"))
    f_short.add_done_callback(lambda f: order.append("short"))
    short = np.asarray(f_short.result(timeout=300))
    f_long.result(timeout=300)
    dispatcher.stop()
    assert order[0] == "short"
    assert dispatcher.interleaved_chunks > 0
    np.testing.assert_allclose(short, np.asarray(pipe(**short_kw)),
                               atol=1e-5)


class _FakePipe:
    """Records the batch it was called with; returns row-indexed output.
    No `begin` attr -> dispatcher's blocking path."""

    def __init__(self):
        self.calls = []

    def __call__(self, **kw):
        seeds = kw.get("seeds") or [0]
        self.calls.append(dict(kw))
        return np.asarray(seeds, np.float32).reshape(-1, 1)


def test_bucket_pads_merged_batch_to_compiled_shape():
    """A 3-row merge with no previously-dispatched bucket must pad to
    max_batch (the one shape worth compiling — never a one-off batch-4)
    and still resolve each future to its own unpadded rows."""
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    reqs = [dict(prompt=f"p{i}", seeds=[10 + i], guidance_scale=5.0)
            for i in range(3)]
    futs = [d.submit(pipe, r) for r in reqs]
    outs = [f.result(timeout=30) for f in futs]
    d.stop()
    assert len(pipe.calls) == 1
    assert len(pipe.calls[0]["seeds"]) == 8  # 3 rows padded to max_batch
    assert pipe.calls[0]["seeds"][-1] == 12  # pad repeats the last row
    assert len(pipe.calls[0]["prompt"]) == 8
    assert d.padded_rows == 5
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, [[10 + i]])


def test_bucket_reuses_seen_smaller_shape():
    """Once a batch-4 shape has been dispatched for a key, a 3-row merge
    pads to 4 (the smallest compiled candidate), not max_batch."""
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    # seed the seen set the way a compiled program would have been made
    key = Job(pipe, dict(prompt="x", seeds=[1],
                         guidance_scale=5.0)).coalesce_key()
    d._seen_buckets.add((key, 4))
    reqs = [dict(prompt=f"p{i}", seeds=[10 + i], guidance_scale=5.0)
            for i in range(3)]
    futs = [d.submit(pipe, r) for r in reqs]
    [f.result(timeout=30) for f in futs]
    d.stop()
    assert len(pipe.calls[0]["seeds"]) == 4
    assert d.padded_rows == 1


def test_reentrant_submit_runs_inline():
    """A dispatcher-executed job that submits again (e.g. an adjustment
    chain borrowing a task pipeline) must run inline instead of
    self-deadlocking on the single device thread."""
    d = CoalescingDispatcher(max_batch=4, gather_ms=5.0)

    def inner():
        return np.asarray([42.0])

    def outer():
        return d.submit(inner, {}, solo=True).result(timeout=5)

    out = d.submit(outer, {}, solo=True).result(timeout=30)
    d.stop()
    np.testing.assert_array_equal(out, [42.0])


def test_solo_jobs_never_coalesce():
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    futs = [d.submit(pipe, dict(prompt="p", seeds=[i],
                                guidance_scale=5.0), solo=True)
            for i in range(3)]
    [f.result(timeout=30) for f in futs]
    d.stop()
    assert len(pipe.calls) == 3
    assert all(len(c["seeds"]) == 1 for c in pipe.calls)


def test_rolling_gather_merges_staggered_burst():
    """Arrivals staggered slightly wider than one gather window must
    still merge into one batch: each arrival extends the (capped)
    deadline."""
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=8, gather_ms=150.0)
    futs = []
    for i in range(4):
        futs.append(d.submit(pipe, dict(prompt=f"p{i}", seeds=[i],
                                        guidance_scale=5.0)))
        time.sleep(0.12)   # 120 ms < 150 ms window, rolls the deadline
    [f.result(timeout=30) for f in futs]
    d.stop()
    assert len(pipe.calls) == 1
    assert len(pipe.calls[0]["seeds"]) == 8  # 4 merged, padded to max


def test_bucket_solo_stays_exact():
    """A solo coalescible request must run exact batch-1 (light-traffic
    latency shape), never padded to max_batch."""
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=8, gather_ms=5.0)
    f = d.submit(pipe, dict(prompt="a", seeds=[3], guidance_scale=7.5))
    out = f.result(timeout=30)
    d.stop()
    assert len(pipe.calls[-1]["seeds"]) == 1
    assert d.padded_rows == 0
    np.testing.assert_array_equal(out, [[3]])


def test_bucket_no_pad_on_exact_bucket_or_overflow():
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=5.0)
    # solo 1-row: already on a bucket; kwargs must not be mutated
    f1 = d.submit(pipe, dict(prompt="a", guidance_scale=7.5))
    f1.result(timeout=30)
    assert "seeds" not in pipe.calls[-1] or not pipe.calls[-1]["seeds"]
    # 5 rows > max_batch: bucketing must not truncate or pad
    f2 = d.submit(pipe, dict(prompt="b", seeds=list(range(5))))
    out = f2.result(timeout=30)
    d.stop()
    assert len(pipe.calls[-1]["seeds"]) == 5
    assert out.shape == (5, 1)
    assert d.padded_rows == 0


def test_per_sample_guidance_matches_scalar(pipe):
    a = np.asarray(pipe(prompt=["a cat", "a cat"], seeds=[1, 2],
                        guidance_scale=[7.5, 7.5], **KW))
    b = np.asarray(pipe(prompt="a cat", seeds=[1, 2], guidance_scale=7.5,
                        **KW))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mixed_prompts_per_row(pipe):
    out = np.asarray(pipe(prompt=["a cat", "a dog"], seeds=[1, 1],
                          guidance_scale=[7.5, 7.5], **KW))
    # same seed, different prompt -> different images
    assert np.abs(out[0] - out[1]).max() > 1e-4


class _HangingPipe:
    """Simulates a wedged device: the first call blocks until released.
    No `begin` attr -> dispatcher's blocking path, which is where a
    wedged XLA call traps the dispatcher thread."""

    def __init__(self):
        self.release = threading.Event()
        self.entered = threading.Event()

    def __call__(self, **kw):
        self.entered.set()
        self.release.wait(timeout=60)
        seeds = kw.get("seeds") or [0]
        return np.asarray(seeds, np.float32).reshape(-1, 1)


def test_watchdog_trips_on_hung_device_op():
    """A device op exceeding watchdog_s must mark the dispatcher wedged,
    fail the hung job and queued jobs with DeviceWedgedError, and refuse
    new submissions fast — round 3 lost a whole benchmarking session to
    exactly this hang presenting as silent client timeouts."""
    from gyre_tpu.manager.scheduler import DeviceWedgedError

    pipe = _HangingPipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=1.0, watchdog_s=0.3)
    hung = d.submit(pipe, dict(prompt="a", seeds=[1]), solo=True)
    assert pipe.entered.wait(timeout=10)
    queued = d.submit(pipe, dict(prompt="b", seeds=[2]), solo=True)
    with pytest.raises(DeviceWedgedError):
        hung.result(timeout=30)
    with pytest.raises(DeviceWedgedError):
        queued.result(timeout=30)
    assert d.wedged
    st = d.watchdog_state()
    assert st["wedged"] and st["threshold_s"] == 0.3
    # new work is refused immediately, not queued behind the wedge
    t0 = time.monotonic()
    late = d.submit(pipe, dict(prompt="c", seeds=[3]))
    with pytest.raises(DeviceWedgedError):
        late.result(timeout=5)
    assert time.monotonic() - t0 < 2.0
    # the op completing after the trip must not crash the dispatcher
    pipe.release.set()
    d.stop()


def test_watchdog_quiet_on_healthy_ops():
    pipe = _FakePipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=1.0, watchdog_s=5.0)
    out = d.submit(pipe, dict(prompt="a", seeds=[1])).result(timeout=30)
    time.sleep(1.2)  # > watch interval; no op in flight
    assert not d.wedged
    assert out.shape == (1, 1)
    st = d.watchdog_state()
    assert st == {"wedged": False, "wedged_op": "", "unwedged_count": 0,
                  "threshold_s": 5.0, "op_in_flight_s": 0.0, "op": ""}
    d.stop()


def test_watchdog_unwedges_when_tripped_op_completes():
    """A false trip must not be terminal (ADVICE r4): when the in-flight
    op eventually completes — a legitimately long first compile, not a
    dead chip — the dispatcher un-wedges and serves new work again
    instead of refusing everything until restart."""
    from gyre_tpu.manager.scheduler import DeviceWedgedError

    pipe = _HangingPipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=1.0, watchdog_s=0.2)
    hung = d.submit(pipe, dict(prompt="a", seeds=[1]), solo=True)
    assert pipe.entered.wait(timeout=10)
    with pytest.raises(DeviceWedgedError):
        hung.result(timeout=30)
    assert d.wedged
    pipe.release.set()  # the op completes after the trip
    deadline = time.monotonic() + 10
    while d.wedged and time.monotonic() < deadline:
        time.sleep(0.05)
    assert not d.wedged and d.unwedged_count == 1
    # recovered: new work is accepted and completes (release is set, so
    # the pipe returns immediately now)
    out = d.submit(pipe, dict(prompt="b", seeds=[2]), solo=True) \
        .result(timeout=30)
    assert out.shape == (1, 1)
    assert d.watchdog_state()["unwedged_count"] == 1
    d.stop()


def test_watchdog_drains_queue_while_wedged():
    """A submit racing the trip (wedged checked False, then put) must not
    hang to its RPC deadline: the watchdog thread drains and fails queued
    jobs while the dispatcher is stuck (ADVICE r4 submit race)."""
    from gyre_tpu.manager.scheduler import DeviceWedgedError

    pipe = _HangingPipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=1.0, watchdog_s=0.2)
    hung = d.submit(pipe, dict(prompt="a", seeds=[1]), solo=True)
    assert pipe.entered.wait(timeout=10)
    with pytest.raises(DeviceWedgedError):
        hung.result(timeout=30)
    # simulate the race: bypass submit()'s wedged check entirely
    from gyre_tpu.manager.scheduler import Job

    raced = Job(pipe, dict(prompt="b", seeds=[2]))
    d._q.put(raced)
    with pytest.raises(DeviceWedgedError):
        raced.future.result(timeout=10)
    pipe.release.set()
    d.stop()


def test_watchdog_first_op_gets_scaled_threshold():
    """The first device op (the cold serving-program compile — minutes on
    the remote platform) gets 3x headroom before tripping."""
    pipe = _HangingPipe()
    d = CoalescingDispatcher(max_batch=4, gather_ms=1.0, watchdog_s=0.5)
    fut = d.submit(pipe, dict(prompt="a", seeds=[1]), solo=True)
    assert pipe.entered.wait(timeout=10)
    # the ~1s watch tick sees the op past 1x (0.5s) but inside 3x (1.5s)
    time.sleep(1.25)
    assert not d.wedged
    pipe.release.set()
    assert fut.result(timeout=30).shape == (1, 1)
    d.stop()
