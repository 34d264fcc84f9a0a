"""JVM->Python-worker buffer-size A/B for the extract stage at slots==cores.

The oversubscription A/B (oversub_extract.py) showed the map-only
extract stage leaves ~1/3 of the box idle at slots==cores because each
task thread serializes its JVM-feed phase with its Python-kernel phase.
Oversubscription fills the stall but cannot be used inside the fused
replay (it thrashes the shuffle/write path). The finer-grained lever is
`spark.sql.execution.python.udf.buffer.size`: a deeper buffered stream
between the JVM writer thread and the worker socket lets the JVM run
ahead, overlapping the next batch's scan+Arrow-serialize with the
worker's current compute — pipeline depth without extra tasks.

Protocol: interleaved reps of the standalone extract stage at 32 slots
with buffer sizes [default(64k), 2MB, 16MB], via SPARK_GRAFT_EXTRA_CONF
(session.py passthrough). Stream-control probes tag window quality.
Deploy-guidance experiment; scaling caches untouched.

Run:  python BENCH/experiments/pybuffer_extract.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

BUFFERS = ["default", str(2 * 1024 * 1024), str(16 * 1024 * 1024)]
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pybuffer_extract_results.jsonl")

BASE_ENV = {
    **os.environ,
    "SPARK_GRAFT_BENCH_EVENTS": os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"),
    "SPARK_GRAFT_BENCH_BODY_PARAS": os.environ.get("SPARK_GRAFT_BENCH_BODY_PARAS", "50"),
}


def probe() -> float:
    import bench

    s8 = bench._mem_stream_control(8, per_proc=400)
    s32 = bench._mem_stream_control(32, per_proc=400)
    return round((s32 / s8) / 4, 3) if s8 > 0 else 0.0


def one_run(buffer: str) -> float:
    env = dict(BASE_ENV)
    if buffer != "default":
        env["SPARK_GRAFT_EXTRA_CONF"] = f"spark.sql.execution.python.udf.buffer.size={buffer}"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--extract-stage-only", "--cpus", "32"],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in p.stdout.strip().splitlines()[::-1]:
        if line.startswith("EXTRACT_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(f"no EXTRACT_SECONDS (rc={p.returncode}): {p.stdout[-500:]} {p.stderr[-500:]}")


def main() -> None:
    t0 = time.monotonic()
    log = lambda m: print(f"[{time.monotonic() - t0:6.0f}s] {m}", flush=True)
    pre = probe()
    log(f"pre-probe stream control 8->32: {pre}")
    times: dict[str, list[float]] = {b: [] for b in BUFFERS}
    for r in range(REPS):
        for b in BUFFERS:
            t = one_run(b)
            times[b].append(t)
            log(f"rep {r} buffer={b}: {t:.1f}s")
    post = probe()
    log(f"post-probe stream control 8->32: {post}")
    rec = {
        "events": int(BASE_ENV["SPARK_GRAFT_BENCH_EVENTS"]),
        "body_paras": int(BASE_ENV["SPARK_GRAFT_BENCH_BODY_PARAS"]),
        "slots": 32,
        "times_sec": times,
        "best_sec": {b: min(v) for b, v in times.items()},
        "probe_stream_control_pre": pre,
        "probe_stream_control_post": post,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec["best_sec"]))


if __name__ == "__main__":
    main()
