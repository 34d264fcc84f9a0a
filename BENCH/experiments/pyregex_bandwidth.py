#!/usr/bin/env python
"""Direct probe: does the Python-side extraction kernel itself stop
scaling past ~8 processes on this box (memory-bandwidth ceiling),
independent of Spark? Runs extract_text_py over the same 7.5 KB bench
bodies in a multiprocessing pool at k=2/8/16/32, measures bodies/sec,
interleaved with the pure-CPU spin control (which touches no memory).
If regex throughput plateaus while spin keeps scaling, the extract
stage's flat 8->32 wall time is memory traffic, not CPU or Spark."""
import json
import os
import sys
import time
import multiprocessing as mp

sys.path.insert(0, "/root/repo")
import bench
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.datagen import StreamSpec, generate_epoch

BODIES = None


def _init(bodies):
    global BODIES
    BODIES = bodies


def _work(args):
    lo, hi = args
    n = 0
    for i in range(lo, hi):
        n += len(extract_text_py(BODIES[i % len(BODIES)]))
    return n


def main():
    spec = StreamSpec(n_events=4000, n_urls=200, n_epochs=1, body_paras=50)
    pdf = generate_epoch(spec, 0)
    bodies = [b for b in pdf["html"].tolist() if b is not None][:2000]
    total = 40_000  # bodies per measurement (~37x the distinct set)
    out = []
    for k in [2, 8, 16, 32]:
        spin = bench._cpu_spin_control(k, secs=2.0)
        chunks = [(i * total // k, (i + 1) * total // k) for i in range(k)]
        with mp.Pool(k, initializer=_init, initargs=(bodies,)) as p:
            t0 = time.monotonic()
            p.map(_work, chunks)
            secs = time.monotonic() - t0
        rec = {"procs": k, "bodies_per_sec": round(total / secs, 1),
               "secs": round(secs, 2), "spin_iters_per_sec": round(spin, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "pyregex_bandwidth.jsonl"), "a") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
