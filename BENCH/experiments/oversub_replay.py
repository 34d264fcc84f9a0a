"""Does extract-stage slot oversubscription transfer to the FULL replay?

Companion to oversub_extract.py (which measured 48 slots on 32 physical
cores cutting the standalone extract stage ~2x: the task threads'
JVM-feed and Python-kernel phases serialize per task, so slots==cores
leaves ~1/3 of the box idle). This runs the complete merge-apply replay
(scan -> LWW merge -> extract winners -> bucketed write -> commit)
interleaved at 32 / 48 slots over the 1M-event scaling stream.

Deploy-guidance experiment only — never touches the .bench attempt
caches (the pre-registered scaling protocol pins slots == cores).

Run:  python BENCH/experiments/oversub_replay.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SLOTS = [32, 48]
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oversub_replay_results.jsonl")

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
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only", "--cpus", str(slots),
         "--extract", os.environ.get("OVERSUB_EXTRACT", "winners")],
        env=ENV,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in p.stdout.strip().splitlines()[::-1]:
        if line.startswith("REPLAY_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(f"no REPLAY_SECONDS (rc={p.returncode}): {p.stdout[-500:]} {p.stderr[-500:]}")


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
        "extract_mode": os.environ.get("OVERSUB_EXTRACT", "winners"),
        "probe_stream_control_pre": pre,
        "probe_stream_control_post": post,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec["best_sec"]))


if __name__ == "__main__":
    main()
