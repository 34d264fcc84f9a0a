#!/usr/bin/env python
"""Round-4 cold-profile of minhash_lsh_pairs (driver-bench conditions:
fresh session, first run of the plan; sf0.1 documents, doc_id<100).

Measures, per condition, in a FRESH subprocess each time:
  t_plan  — analysis + optimization + physical planning (executedPlan),
  t_exec  — first execution (noop sink) after planning,
  t_warm  — second execution of the same DataFrame (warm floor).
Conditions: checkpoint="none" (double-evaluated signature plan, current
default) vs "lazy" (localCheckpoint the bucket relation) vs "pairs_agg"
(prototype: per-bucket collect_list + pair explode — single evaluation,
no self-join). Appends JSON lines to minhash_cold_results.jsonl.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "minhash_cold_results.jsonl")

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]
from pipeline_spark.session import get_spark
from pyspark.sql import functions as F
from pipeline_spark.operators import dedup as D

spark = get_spark("mh_cold", master="local[32]", shuffle_partitions=32)
sf = "/root/testdata/sf0.1"
t0 = time.monotonic()
d = spark.read.parquet(f"{sf}/documents.parquet").filter(F.col("doc_id") < 100)
if mode == "pairs_agg":
    sigs = D.minhash_signatures(d, 32, "text", "doc_id", 1, hash_basis="xxhash64")
    band_arr = F.array(*[
        F.xxhash64(*[F.col(f"mh{b*4+r}") for r in range(4)]).cast("string")
        for b in range(8)
    ])
    buckets = sigs.select(F.col("doc_id"), F.posexplode(band_arr).alias("band", "bsig"))
    grouped = buckets.groupBy("band", "bsig").agg(F.collect_list("doc_id").alias("ids")).filter(F.size("ids") > 1)
    pairs = grouped.select(
        F.explode(
            F.filter(
                F.flatten(F.transform(
                    F.col("ids"),
                    lambda a: F.transform(F.col("ids"), lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))),
                )),
                lambda s: s["id_a"] < s["id_b"],
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    cand = pairs
    # full pipeline verify step, same as minhash_dedup_pairs
    sh = D.shingles(d, "text", "doc_id", 1)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sh_b = sh.withColumnRenamed("doc_id", "_jb").withColumnRenamed("shingle", "s_b")
    inter = (cand.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("shingle", "s_a"), "id_a")
        .join(sh_b, (F.col("id_b") == F.col("_jb")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    df = (inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= 0.6).select("id_a", "id_b", "jaccard"))
else:
    df = D.minhash_dedup_pairs(d, threshold=0.6, bands=8, rows=4, n=1, checkpoint=mode)
t_build = time.monotonic() - t0

t0 = time.monotonic()
df._jdf.queryExecution().executedPlan()
t_plan = time.monotonic() - t0

t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
t_exec = time.monotonic() - t0

t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
t_warm = time.monotonic() - t0
n = df.count()
print("RESULT " + json.dumps({"mode": mode, "t_build": round(t_build,3), "t_plan": round(t_plan,3),
    "t_exec": round(t_exec,3), "t_warm": round(t_warm,3), "rows": n}))
'''


def run(mode):
    p = subprocess.run([sys.executable, "-c", CHILD, mode], capture_output=True, text=True)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
    rec = json.loads(line[0][7:]) if line else {"mode": mode, "error": (p.stdout + p.stderr)[-800:]}
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for r in range(reps):
        for m in ["none", "lazy", "pairs_agg"]:
            run(m)
