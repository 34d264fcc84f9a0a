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
    return spark


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
