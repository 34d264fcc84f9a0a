#!/usr/bin/env python
"""Round-4 experiment: why does the extract stage run SLOWER at local[32]
than local[8] (BENCH_r03: 49-69s @8 vs 65-96s @32) while a pure-CPU spin
control in the same window scaled 0.812?

Hypotheses tested (extract stage is a pure BATCH job — parquet scan →
Arrow pandas_udf → noop sink — so maxFilesPerTrigger, a STREAMING source
knob, cannot be its cause; it is tested separately on the full replay):
  A. per-Arrow-batch overhead × worker count (batch 512 vs 4096)
  B. task granularity: 16MB splits over 8×58MB files ≈ 32 tasks = one
     scheduling wave at 32 cores, stragglers dominate (4MB → ~128 tasks)
  C. JVM scan/serde threads + Python workers oversubscribe the box at 32
     (local[16] on the same 32-vCPU host should then beat local[32])

Protocol: each condition is one fresh `bench.py --extract-stage-only`
subprocess; a CPU spin control runs interleaved before each; conditions
are round-robin-interleaved across repeats so host drift hits all arms.
Appends one JSON line per measurement to extract_inversion_results.jsonl.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "extract_inversion_results.jsonl")
ENVBASE = {
    **os.environ,
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    "SPARK_GRAFT_BENCH_EVENTS": "1000000",
    "SPARK_GRAFT_BENCH_BODY_PARAS": "50",
}

CONDITIONS = [
    # label, cpus, extra env
    ("base_8", 8, {}),
    ("base_32", 32, {}),
    ("arrow4096_32", 32, {"SPARK_GRAFT_ARROW_BATCH": "4096"}),
    ("mpb4m_32", 32, {"SPARK_GRAFT_BENCH_MAX_PARTITION_BYTES": str(4 * 1024 * 1024)}),
    ("base_16", 16, {}),
]


def run_one(label, cpus, extra):
    ctrl = bench._cpu_spin_control(cpus, secs=2.0)
    env = {**ENVBASE, **extra}
    t0 = time.monotonic()
    p = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--extract-stage-only", "--cpus", str(cpus)],
        capture_output=True, text=True, env=env,
    )
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("EXTRACT_SECONDS")]
    secs = float(line[0].split()[1]) if line else None
    rec = {
        "label": label, "cpus": cpus, "extract_sec": secs,
        "spin_iters_per_sec": round(ctrl, 1), "wall": round(time.monotonic() - t0, 1),
        "ts": time.strftime("%H:%M:%S"),
    }
    if secs is None:
        rec["stderr_tail"] = (p.stdout + p.stderr)[-500:]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(repeats):
        for label, cpus, extra in CONDITIONS:
            run_one(f"{label}", cpus, extra)


if __name__ == "__main__":
    main()
