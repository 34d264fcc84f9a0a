"""SparkSession factory with scale-aware defaults.

Defaults are tuned so the same code runs on local[N] for tests and on a
multi-executor cluster unchanged: AQE on (runtime coalesce + skew-join),
Arrow on (all our Python stages are pandas/Arrow UDFs), UTC session TZ so
results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it is supplied by spark-submit and this arg stays None.
    ``shuffle_partitions`` defaults to the parallelism level so small-scale
    runs don't over-partition; at 100 TB the caller raises it (rule of thumb:
    ~128 MB of shuffle data per partition).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    par = shuffle_partitions if shuffle_partitions is not None else _parallelism_of(master, cpus)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches: with multi-KB binary payloads a 10k-row batch
        # is ~75 MB and the pandas regex pipeline copies it ~5× per pass —
        # at 32 workers that saturates the memory bus (measured 7× slower).
        # 512 rows keeps each worker's working set cache-friendly.
        # Env-overridable for A/B profiling only; 512 is the tuned default.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "512"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # generational ZGC: the merge path churns short-lived binary-payload
        # rows; measured ~25% faster than default G1 at local[32] (GC time
        # was ~30% of task run time under G1)
        .config("spark.driver.extraJavaOptions", "-XX:+UseZGC -XX:+ZGenerational")
        # zstd writes ~2-3× fewer bytes than snappy on html/text payloads:
        # compression CPU scales with cores, disk/bus bandwidth does not —
        # shifting bytes→cycles improves multi-core scaling AND real-cluster
        # S3 egress. Overridable for A/B via SPARK_GRAFT_PARQUET_CODEC.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # int64 micros, not legacy INT96: footers then carry real min/max
        # stats (INT96 has none), which the lake manifest lifts into
        # snapshot metadata for file skipping; also the modern interop type
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # free-form conf passthrough for profiling/deploy A/Bs without code
    # edits: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" (explicit extra_conf from
    # the caller still wins — it is applied last). Measured use case:
    # spark.sql.execution.python.udf.buffer.size=2097152 runs map-only
    # Arrow-UDF stages ~2.2x faster at slots==cores (the 64 KB default
    # pipe serializes the JVM feed with the Python kernel; see
    # BENCH/experiments/pybuffer_extract.py) — fused merge stages are
    # shuffle/write-bound and don't reliably benefit, so it is a knob,
    # not a default.
    for k, v in parse_extra_conf(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")).items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_session(spark)
    return spark


#: application ids whose one-time warmup already ran (getOrCreate can hand
#: the same underlying context back any number of times)
_WARMED: set[str] = set()


def _warm_session(spark: SparkSession) -> None:
    """One-time JIT/codegen warmup per underlying SparkContext.

    A fresh JVM runs the first seconds of real work interpreted: Janino,
    Catalyst, the parquet reader and the codegen'd operator classes are
    compiled by the background C2 threads only as they get hot. Measured
    on this host (interleaved A/B over the full catalog headline list,
    local[32]): a ~2 s synthetic warmup at session build cuts the
    first-run cost of EVERY subsequent query — list totals 18.4/20.0 s
    cold vs 12.7/14.2 s warmed — and removes the bimodal ~9-10 s cold
    mode of plan-heavy queries (whose inverse correlation with how long
    the preceding work ran identified background-JIT completion, not
    data, as the variable). Exactly the same discipline as the existing
    Python-worker pool warmup (CLAUDE.md): pay fixed costs at session
    BUILD, never inside a measured or user-facing first query.

    The workload is the engine's own operator pipelines over a few dozen
    rows of ``spark.range``-derived SYNTHETIC data plus a tiny tempdir
    parquet round-trip — nothing from any data directory is touched or
    cached, so every real query still computes from its own inputs.
    Measured on the heaviest-plan query (minhash, sf-invariant): first
    real run 3.9-4.5 s quiet / 9-18.8 s under compile-queue contention
    → 1.6-2.3 s warmed. Disable with ``SPARK_GRAFT_SESSION_WARM=0``
    (tests do, via conftest — suite speed matters more than first-query
    latency there).
    """
    if os.environ.get("SPARK_GRAFT_SESSION_WARM", "1") == "0":
        return
    app_id = spark.sparkContext.applicationId
    if app_id in _WARMED:
        return
    _WARMED.add(app_id)
    try:
        _warm_session_work(spark)
    except Exception as e:  # noqa: BLE001 — warmup is best-effort
        # A warmup failure must NEVER take down session creation: the
        # session is fully functional without it, just cold.
        import sys

        print(f"pipeline_spark: session warmup skipped ({e!r:.200})", file=sys.stderr)


def _warm_session_work(spark: SparkSession) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    # The engine's own operator pipelines over a few dozen SYNTHETIC rows
    # load/compile exactly the interpreter + join + window + HOF classes
    # the real queries need (the same idea as bench.py warming the real
    # extract UDF on a literal). Verified: wholeStage codegen on/off does
    # NOT move the cold cost (9.7 s vs 9.7 s) — it is class loading and
    # shared-infrastructure C2 work, which this prepays.
    from pipeline_spark.operators import dedup as _D
    from pipeline_spark.operators import similarity as _S

    docs = spark.range(0, 64, 1, 4).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit("t"), ((F.col("id") + i) % 23).cast("string")) for i in range(12)]
        ).alias("text"),
    )
    _D.minhash_dedup_pairs(docs, threshold=0.6, bands=8, rows=4, n=1).write.format("noop").mode(
        "overwrite"
    ).save()
    emb = spark.range(0, 64, 1, 4).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 16), i -> cast(1 + pmod((id + 1) * i, 97) as double) / 97.0)").alias(
            "embedding"
        ),
    )
    _S.brute_force_topk(emb, emb.filter("vec_id < 4"), k=3).write.format("noop").mode(
        "overwrite"
    ).save()
    # parquet writer+reader classes warm only on a real file round-trip
    d = tempfile.mkdtemp(prefix="spark_warm_")
    try:
        docs.withColumn("t", F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+"))).coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        spark.read.parquet(d).filter("doc_id > 1").groupBy("t").count().write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # Heap housekeeping: a session built in a JVM that just ran other
    # Spark work (stop() + getOrCreate is the normal pattern here)
    # inherits that work's uncollected garbage; the first
    # allocation-heavy query then hits concurrent-GC allocation stalls
    # (reproduced 3/3: an interpreted-HOF scoring query at 10-19 s right
    # after a replay vs ~1.9 s in a fresh JVM). One explicit collection
    # at build resets the heap before any user work.
    spark._jvm.System.gc()


def parse_extra_conf(spec: str) -> dict[str, str]:
    """Parse a ``k=v;k2=v2`` conf spec (SPARK_GRAFT_EXTRA_CONF).

    Empty segments are skipped (trailing ``;`` is fine); values may
    contain ``=`` (only the first one splits); segments without ``=``
    are ignored rather than raising — a malformed profiling knob must
    never take down a production session — but each ignored segment is
    named on stderr so a typo'd A/B knob can't silently run unset
    (round-5 ADVICE).
    """
    import sys

    out: dict[str, str] = {}
    for pair in filter(None, (p.strip() for p in spec.split(";"))):
        k, eq, v = pair.partition("=")
        if eq and k.strip():
            out[k.strip()] = v.strip()
        else:
            print(f"pipeline_spark: ignoring malformed conf segment {pair!r}", file=sys.stderr)
    return out


def _parallelism_of(master: str, default: int) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return default
        try:
            return int(inner)
        except ValueError:
            return default
    return default
