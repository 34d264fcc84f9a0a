#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT part of the driver contract — bench.py stays the frozen measurement.
Modes:

* ``--plans [--tag before|after]`` — write ``plans/r06/<q>_<tag>.txt``
  with ``.explain("formatted")`` for every headline query.
* ``--queries [names...]`` — per-query noop-sink timing in ONE session
  (mirrors bench.py's run_queries shape): first run (cold plan+codegen)
  plus ``--repeats N`` warm re-runs, reported separately so plan-build
  cost and data-path cost are visible individually.
* ``--phases <name>`` — split one query into build (Python DataFrame
  construction) / analysis (schema resolution) / execution time.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume_by_nation",
    "counters_rollup",
    "cdc_lww_state",
    "topk_per_group",
    "sessionize",
    "minhash_lsh_pairs",
    "embedding_topk_bruteforce",
    "text_quality",
    "score_dispatch_verdicts",
]


def _spark(cpus: int):
    from pipeline_spark.session import get_spark

    return get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--phases", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pipeline_spark.plans import query_map

    qmap = query_map()
    spark = _spark(cpus)

    if args.plans:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in HEADLINE_QUERIES:
            df = qmap[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}_{args.tag}.txt")
        spark.stop()
        return

    if args.phases:
        name = args.phases
        t0 = time.monotonic()
        df = qmap[name](spark, sf_dir)
        t1 = time.monotonic()
        df.schema  # force analysis
        t2 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic()
        df2 = qmap[name](spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.monotonic()
        print(
            json.dumps(
                {
                    "query": name,
                    "build_s": round(t1 - t0, 3),
                    "analyze_s": round(t2 - t1, 3),
                    "exec_cold_s": round(t3 - t2, 3),
                    "rebuild_exec_warm_s": round(t4 - t3, 3),
                }
            )
        )
        spark.stop()
        return

    names = args.queries if args.queries else HEADLINE_QUERIES
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.monotonic()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.monotonic() - t0, 3)
        warms = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(round(time.monotonic() - t0, 3))
        out[name] = {"first": cold, "rerun": warms}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
