"""Does the python.udf.buffer.size win transfer to the FUSED replay?

pybuffer_extract.py measured ~2.2x on the standalone extract stage at
slots==cores (the JVM writer can run batches ahead of the worker
instead of stalling on a 64 KB pipe). Unlike slot oversubscription,
a deeper per-runner buffer adds no extra concurrent tasks — so it
should help (or at least not hurt) the shuffle/write/commit-bound
replay. This measures the full merge-apply replay, interleaved
[default, 16MB] at 32 slots, in both extract modes.

Run:  OVERSUB_EXTRACT=eager python BENCH/experiments/pybuffer_replay.py
      OVERSUB_EXTRACT=winners python BENCH/experiments/pybuffer_replay.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

BUFFERS = os.environ.get("PYBUF_SIZES", "default," + str(16 * 1024 * 1024)).split(",")
REPS = 3
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pybuffer_replay_results.jsonl")

BASE_ENV = {
    **os.environ,
    "SPARK_GRAFT_BENCH_EVENTS": os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"),
    "SPARK_GRAFT_BENCH_BODY_PARAS": os.environ.get("SPARK_GRAFT_BENCH_BODY_PARAS", "50"),
}
MODE = os.environ.get("OVERSUB_EXTRACT", "eager")


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
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only", "--cpus", "32",
         "--extract", MODE],
        env=env,
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
    # optional probe gate: wait (up to PYBUF_GATE_DEADLINE_S) for a
    # window whose stream control clears PYBUF_GATE before measuring —
    # decision BEFORE measurement, same discipline as hunt_quiet_4m
    gate = float(os.environ.get("PYBUF_GATE", "0"))
    deadline = time.monotonic() + float(os.environ.get("PYBUF_GATE_DEADLINE_S", "1800"))
    pre = probe()
    log(f"pre-probe stream control 8->32: {pre} (mode={MODE}, gate={gate})")
    while gate and not (gate <= pre <= 1.2) and time.monotonic() < deadline:
        time.sleep(120)
        pre = probe()
        log(f"re-probe stream control 8->32: {pre}")
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
        "extract_mode": MODE,
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
