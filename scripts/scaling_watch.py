#!/usr/bin/env python
"""Collect clean scaling samples whenever the host is healthy.

The single-VM memory subsystem on this box intermittently degrades to
<0.1 GB/s single-thread streaming bandwidth (see BASELINE.md
"Host-health gauge"); scaling-efficiency samples taken in such a
window measure the host, not the code.  This watcher loops: probe the
bandwidth, and whenever it clears the gate run one `bench.py
--scaling` pair and append the JSON result to the log.  Stops after
`TARGET` clean pairs per (lo, hi) shape.

Usage: python scripts/scaling_watch.py [logfile]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_watch.jsonl"
GATE = float(os.environ.get("RAY_GRAFT_MEMBW_GATE", "1.0"))
TARGET = int(os.environ.get("SCALING_WATCH_TARGET", "5"))
PROBE_SLEEP = int(os.environ.get("SCALING_WATCH_SLEEP", "180"))
# (lo, hi) shapes to sample; 4->16 first (both legs fit under the
# bandwidth ceiling), then 8->32.
SHAPES = [(4, 16), (8, 32)]


def probe() -> float:
    import numpy as np
    n = 400 * 1024 * 1024 // 8
    a = np.empty(n, dtype=np.float64)
    t0 = time.perf_counter()
    a[:] = 1.0
    float(a.sum())
    dt = time.perf_counter() - t0
    return round((2 * n * 8 / dt) / 1e9, 2)


def count_done() -> dict:
    done = {s: 0 for s in SHAPES}
    if os.path.exists(LOG):
        with open(LOG) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                s = (r.get("lo"), r.get("hi"))
                if s in done:
                    done[s] += 1
    return done


def main() -> None:
    pause_file = os.environ.get("SCALING_WATCH_PAUSE", "/tmp/scaling_pause")
    while True:
        done = count_done()
        shape = next((s for s in SHAPES if done[s] < TARGET), None)
        if shape is None:
            print(f"# all shapes have {TARGET} samples — done", flush=True)
            return
        if os.path.exists(pause_file):
            print("# paused (pause file present)", flush=True)
            time.sleep(60)
            continue
        bw = probe()
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts}] probe {bw} GB/s (need >= {GATE}); "
              f"done={done}", flush=True)
        if bw < GATE:
            time.sleep(PROBE_SLEEP)
            continue
        lo, hi = shape
        env = dict(os.environ,
                   RAY_GRAFT_SCALE_LO=str(lo), RAY_GRAFT_SCALE_HI=str(hi))
        print(f"[{ts}] running scaling pair {lo}->{hi}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, "bench.py", "--scaling"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=1800)
        except subprocess.TimeoutExpired:
            print("# scaling pair timed out; re-probing", flush=True)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            r = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(f"# pair failed (rc={out.returncode}):\n"
                  f"{out.stderr[-2000:]}", flush=True)
            time.sleep(PROBE_SLEEP)
            continue
        r["lo"], r["hi"] = lo, hi
        r["probe_before"] = bw
        with open(LOG, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(f"[{time.strftime('%H:%M:%S')}] eff={r.get('value')} "
              f"({lo}->{hi})", flush=True)


if __name__ == "__main__":
    main()
