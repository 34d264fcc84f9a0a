#!/usr/bin/env python
"""Where do the cycles go in the 4M-event extract stage at local[N]?

The first control-certified 4M 8->32 pair measured 0.330 vs the Amdahl
fit's 0.80 prediction, and the event log of a 202s 32-core extract run
showed tasks at full concurrency but JVM CPU = only 25% of task run
time — the tasks were BLOCKED, not starved of cores. Three candidate
sinks the adjacent-window mem control cannot distinguish:

  1. hypervisor steal (shared VM tenant load DURING the leg),
  2. Python-worker CPU (the regex kernel itself, GIL-free across
     processes, but maybe slower per body at 32 procs),
  3. iowait / memory stalls.

This harness runs the standalone extract stage once at a given core
count while sampling /proc/stat (user/sys/idle/iowait/steal) and the
per-process CPU jiffies of the JVM and every pyspark worker every 2s.
Output: one JSON line with wall seconds plus the integrated CPU shares
— enough to attribute the wall time to kernel/user/steal/python/jvm.

Usage: python extract_cpu_audit.py <cores> [events]
"""

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

HZ = os.sysconf("SC_CLK_TCK")
NCPU = os.cpu_count()


def read_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    return dict(zip(["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"], vals))


def proc_jiffies(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # utime + stime
    except OSError:
        return 0


def find_pids():
    jvm, py = [], []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
        except OSError:
            continue
        if "java" in cmd and "extract_audit" in cmd:
            jvm.append(int(pid))
        elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            py.append(int(pid))
    return jvm, py


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop_flag = False
        self.samples = []

    def run(self):
        prev_stat = read_stat()
        prev_procs: dict[int, int] = {}
        while not self.stop_flag:
            time.sleep(2)
            cur = read_stat()
            delta = {k: cur[k] - prev_stat[k] for k in cur}
            prev_stat = cur
            jvm, py = find_pids()
            jvm_j = py_j = 0
            nxt = {}
            for pid in jvm + py:
                j = proc_jiffies(pid)
                nxt[pid] = j
                d = j - prev_procs.get(pid, j)
                if pid in jvm:
                    jvm_j += d
                else:
                    py_j += d
            prev_procs = nxt
            total = sum(delta.values()) or 1
            self.samples.append(
                {
                    "host": {k: round(v / total * NCPU, 2) for k, v in delta.items()},
                    "jvm_cores": round(jvm_j / HZ / 2, 2),
                    "py_cores": round(py_j / HZ / 2, 2),
                    "n_py_procs": len(py),
                }
            )


def main():
    cores = int(sys.argv[1])
    events = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    os.environ["SPARK_GRAFT_BENCH_EVENTS"] = str(events)
    os.environ["SPARK_GRAFT_BENCH_BODY_PARAS"] = "50"

    from pyspark.sql import functions as F

    from pipeline_spark.datagen import SPARK_DDL
    from pipeline_spark.extraction import extract_text_udf
    from pipeline_spark.session import get_spark

    stream = os.path.join(REPO, ".bench", f"stream_sf0.1_{events}_p50")
    spark = get_spark(
        f"extract_audit_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    (
        spark.range(0, cores * 4, 1, numPartitions=cores * 4)
        .select(extract_text_udf(F.encode(F.lit("<p>warm</p>"), "UTF-8")))
        .write.format("noop").mode("overwrite").save()
    )
    df = spark.read.schema(SPARK_DDL).option("recursiveFileLookup", "true").parquet(stream)
    sampler = Sampler()
    sampler.start()
    t0 = time.monotonic()
    df.select(extract_text_udf("html").alias("t")).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    sampler.stop_flag = True
    sampler.join(timeout=5)
    spark.stop()

    ss = sampler.samples
    n = len(ss) or 1
    agg = {
        k: round(sum(s["host"][k] for s in ss) / n, 2)
        for k in ("user", "system", "idle", "iowait", "steal")
    }
    out = {
        "cores": cores,
        "events": events,
        "wall_sec": round(wall, 2),
        "bodies_per_sec": round(events / wall, 1),
        "host_cores_avg": agg,
        "jvm_cores_avg": round(sum(s["jvm_cores"] for s in ss) / n, 2),
        "py_cores_avg": round(sum(s["py_cores"] for s in ss) / n, 2),
        "py_procs_max": max((s["n_py_procs"] for s in ss), default=0),
        "samples": ss,
    }
    line = {k: v for k, v in out.items() if k != "samples"}
    print("AUDIT " + json.dumps(line))
    with open(f"/tmp/extract_audit_{cores}_{events}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
