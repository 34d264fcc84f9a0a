"""Task-slot oversubscription A/B for the extract stage.

Round-5 audit fact (r5_4m_window_notes.md): at local[32] the Python
workers run at ~64% duty cycle with ~6 cores idle — each task thread
alternates between feeding its worker (JVM scan + Arrow serialize) and
waiting on it, and the two phases don't overlap enough to fill the box.
The classic fix for a blocking pipeline is more slots than cores: a task
thread stalled on its Python worker costs no CPU, so local[40]/local[48]
on a 32-core box can fill the idle gap with other tasks' compute.

Protocol: interleaved best-of-3 per slot count (32 / 40 / 48) over the
1M-event body_paras=50 stream (the scaling profile's stream), with a
DRAM-streaming control probe before and after to tag window quality.
This is a deploy-guidance experiment, NOT a scaling-protocol run: it
never touches the .bench attempt caches (the pre-registered N vs 4N
protocol pins slots == cores).

Run:  python BENCH/experiments/oversub_extract.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SLOTS = [32, 40, 48]
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oversub_extract_results.jsonl")

ENV = {
    **os.environ,
    "SPARK_GRAFT_BENCH_EVENTS": os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"),
    "SPARK_GRAFT_BENCH_BODY_PARAS": os.environ.get("SPARK_GRAFT_BENCH_BODY_PARAS", "50"),
}


def probe() -> float:
    import bench

    s8 = bench._mem_stream_control(8, per_proc=400)
    s32 = bench._mem_stream_control(32, per_proc=400)
    return round((s32 / s8) / 4, 3) if s8 > 0 else 0.0


def one_run(slots: int) -> float:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--extract-stage-only", "--cpus", str(slots)],
        env=ENV,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in p.stdout.strip().splitlines()[::-1]:
        if line.startswith("EXTRACT_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(f"no EXTRACT_SECONDS in output (rc={p.returncode}): {p.stdout[-500:]} {p.stderr[-500:]}")


def main() -> None:
    t0 = time.monotonic()
    log = lambda m: print(f"[{time.monotonic() - t0:6.0f}s] {m}", flush=True)
    pre = probe()
    log(f"pre-probe stream control 8->32: {pre}")
    times: dict[int, list[float]] = {s: [] for s in SLOTS}
    for r in range(REPS):
        for s in SLOTS:
            t = one_run(s)
            times[s].append(t)
            log(f"rep {r} slots={s}: {t:.1f}s")
    post = probe()
    log(f"post-probe stream control 8->32: {post}")
    rec = {
        "events": int(ENV["SPARK_GRAFT_BENCH_EVENTS"]),
        "body_paras": int(ENV["SPARK_GRAFT_BENCH_BODY_PARAS"]),
        "physical_cores": 32,
        "times_sec": {str(s): times[s] for s in SLOTS},
        "best_sec": {str(s): min(times[s]) for s in SLOTS},
        "probe_stream_control_pre": pre,
        "probe_stream_control_post": post,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec["best_sec"]))


if __name__ == "__main__":
    main()
