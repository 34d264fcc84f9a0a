"""Does the deep JVM->worker pipe lift the 4M-event replay's 32-core leg?

The 4M 8->32 shortfall decomposes into (a) DRAM rolloff of the kernel
itself (~0.73 ceiling) and (b) Spark's feed-path stall (workers at 64%
duty; JVM feed share doubles at 32 cores). pybuffer_extract.py showed
a 2 MB python.udf.buffer removes (b) on the standalone extract stage.
The fused eager replay's map stage (scan -> extract UDF -> shuffle
write) has the same shape, so the buffer should lift the 32-core leg
more than the 8-core leg (which runs at 88% duty already) — raising
the pair efficiency itself. This measures both legs, interleaved
[default, 2MB] per level per rep, at the 4M backlog.

NOT a protocol run: nothing here touches the .bench caches; it informs
whether the deep pipe should become the engine default before any
future protocol append.

Run:  python BENCH/experiments/pybuffer_4m.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

BUFFERS = ["default", str(2 * 1024 * 1024)]
LEVELS = [8, 32]
REPS = 2
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pybuffer_4m_results.jsonl")

BASE_ENV = {
    **os.environ,
    "SPARK_GRAFT_BENCH_EVENTS": "4000000",
    "SPARK_GRAFT_BENCH_BODY_PARAS": "50",
}


def probe() -> float:
    import bench

    s8 = bench._mem_stream_control(8, per_proc=400)
    s32 = bench._mem_stream_control(32, per_proc=400)
    return round((s32 / s8) / 4, 3) if s8 > 0 else 0.0


def one_run(level: int, buffer: str) -> float:
    env = dict(BASE_ENV)
    if buffer != "default":
        env["SPARK_GRAFT_EXTRA_CONF"] = f"spark.sql.execution.python.udf.buffer.size={buffer}"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only", "--cpus", str(level),
         "--extract", "eager"],
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
    pre = probe()
    log(f"pre-probe stream control 8->32: {pre}")
    times: dict[str, list[float]] = {f"{lv}:{b}": [] for lv in LEVELS for b in BUFFERS}
    for r in range(REPS):
        for lv in LEVELS:
            for b in BUFFERS:
                t = one_run(lv, b)
                times[f"{lv}:{b}"].append(t)
                log(f"rep {r} level={lv} buffer={b}: {t:.1f}s")
    post = probe()
    log(f"post-probe stream control 8->32: {post}")
    rec = {
        "events": 4000000,
        "body_paras": 50,
        "extract_mode": "eager",
        "times_sec": times,
        "best_sec": {k: min(v) for k, v in times.items()},
        "probe_stream_control_pre": pre,
        "probe_stream_control_post": post,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(json.dumps(rec["best_sec"]))


if __name__ == "__main__":
    main()
