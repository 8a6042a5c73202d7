#!/usr/bin/env python
"""Find (and optionally kill) leftover processes that may be holding the
single-tenant TPU chip.

The round-4 bench recorded 0.0 img/s because a verify server launched
hours earlier was still resident when the driver's preflight tried to
acquire the device (VERDICT r4, missing #1). This script makes the
"is anything holding the chip?" question answerable in one command, and
the cleanup a kill-by-exact-PID (never pkill-by-pattern, which can match
the caller's own command line).

Usage:
    python scripts/free_device.py          # list candidate holders
    python scripts/free_device.py --kill   # terminate them (TERM, then KILL)

A process is a candidate holder when its cmdline looks like a gyre
server / bench phase / jax-importing python run, and it is neither this
process nor one of its ancestors.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

# cmdline substrings that mark a process as a potential device holder
MARKERS = ("server.py", "bench.py", "gyre_tpu", "__graft_entry__")


def _ancestors() -> set[int]:
    pids, pid = set(), os.getpid()
    while pid > 1:
        pids.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    return pids


def find_holders() -> list[dict]:
    skip = _ancestors()
    holders = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        if pid in skip:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(
                    "utf-8", "replace").strip()
            started = os.stat(f"/proc/{pid}").st_mtime
        except OSError:
            continue
        if "python" not in cmd:
            continue
        if not any(m in cmd for m in MARKERS):
            continue
        # CPU-pinned processes cannot hold the TPU: skip anything
        # explicitly launched with --platform cpu or JAX_PLATFORMS=cpu
        # (tests and the multichip dryrun run this way by design)
        if "--platform cpu" in cmd or "JAX_PLATFORMS=cpu" in cmd:
            continue
        try:
            with open(f"/proc/{pid}/environ", "rb") as f:
                env = f.read().decode("utf-8", "replace")
            if "JAX_PLATFORMS=cpu" in env:
                continue
        except OSError:
            pass
        holders.append({
            "pid": pid,
            "cmd": cmd[:200],
            "age_s": round(time.time() - started, 0),
        })
    return holders


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kill", action="store_true",
                    help="terminate the holders (TERM, escalate to KILL)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    holders = find_holders()
    if args.json:
        print(json.dumps(holders))
    else:
        if not holders:
            print("no candidate device holders found")
        for h in holders:
            print(f"pid {h['pid']:>7}  age {h['age_s']:>7.0f}s  {h['cmd']}")

    if args.kill and holders:
        for h in holders:
            try:
                os.kill(h["pid"], signal.SIGTERM)
            except OSError:
                pass
        deadline = time.time() + 10
        while time.time() < deadline and any(
                os.path.exists(f"/proc/{h['pid']}") for h in holders):
            time.sleep(0.5)
        for h in holders:
            if os.path.exists(f"/proc/{h['pid']}"):
                try:
                    os.kill(h["pid"], signal.SIGKILL)
                    print(f"pid {h['pid']} needed SIGKILL")
                except OSError:
                    pass
            else:
                print(f"pid {h['pid']} terminated")
    return 0 if not (holders and not args.kill) else 1


if __name__ == "__main__":
    sys.exit(main())
