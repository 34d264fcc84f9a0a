"""CDC replay: change-stream files → LWW MERGE into the lake table.

The streaming analog of the reference's batch replay + watermark-file
protocol (``af/fastpath/fastpath/reprocessor.py`` +
``af/analysis/analysis/clickhouse_feeder.py:148-179``), Spark-native:

* file source with ``maxFilesPerTrigger`` (backpressure — the 5000-deep
  queue analog of ``localhttpfeeder.py:38-39``);
* extraction + LWW + merge per micro-batch in ``foreachBatch``;
* **exactly-once** = Structured Streaming checkpoint (offset log, so a
  restarted query re-delivers the same files under the same batch_id)
  × the table's fence property (so a re-delivered batch_id is a no-op).
  Either mechanism alone leaves a hole (checkpoint advances before sink
  commit / sink commit without offset record); together they are the
  classic idempotent-sink pattern.

Batch mode (``availableNow=True``) and continuous tailing share this one
code path — the warmup/live unification of the reference detector
(``detector.py:255,587``) for free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyspark.sql import functions as F

from pipeline_spark.datagen import SPARK_DDL
from pipeline_spark.extraction import extract_text_udf
from pipeline_spark.lake import LakeTable
from pipeline_spark.operators.lww import AUTO_BROADCAST_MAX_WINNERS


def _batch_source_files(checkpoint: str, batch_id: int) -> list | None:
    """The micro-batch's input files, from the file-stream source's
    checkpoint log (``<ckpt>/sources/0/<batchId>`` — one JSON line per
    file; ``batch_df.inputFiles()`` is empty inside foreachBatch, the
    micro-batch plan is not a file relation). Every ``compactInterval``-th
    batch (default 10) is instead written as ``<batchId>.compact`` holding
    ALL entries so far, each tagged with its ``batchId`` — filter to this
    batch's, or the row-bound gate silently loses the fast path on ~10%
    of micro-batches. None when the log is unreadable (e.g. a DFS
    checkpoint path this process can't open)."""
    import json
    import os

    base = os.path.join(checkpoint, "sources", "0", str(batch_id))
    for path, compacted in ((base, False), (base + ".compact", True)):
        try:
            with open(path) as f:
                lines = f.read().splitlines()
        except OSError:
            continue
        files = []
        for ln in lines:
            if not ln.startswith("{"):
                continue  # version header ("v1")
            try:
                entry = json.loads(ln)
                if compacted and entry.get("batchId") != batch_id:
                    continue
                files.append(entry["path"])
            except (ValueError, KeyError):
                return None
        return files or None
    return None


def _footer_row_count(files: list) -> int | None:
    """Exact row count of a parquet file set from footer metadata only —
    no Spark job, no data read. Returns None when any file's footer is
    unreachable (non-local scheme, corrupt footer, not parquet), in which
    case the caller must fall back to a size-gated strategy."""
    import pyarrow.parquet as pq

    if not files:
        return None  # unknown is NOT zero: the caller must size-gate
    total = 0
    for f in files:
        if f.startswith("file:"):  # both file:///p and file:/p forms
            path = f[5:].lstrip("/")
            path = "/" + path
        elif "://" in f or f.startswith(("hdfs:", "s3:", "s3a:")):
            return None  # remote scheme: footer fetch is not free here
        else:
            path = f
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
    return total


def fill_text(df):
    """Derive ``text`` for rows that don't carry it yet (post-LWW hook:
    extraction runs only on merge *winners*, not on every change event —
    the dominant throughput lever at high update rates)."""
    need = F.col("text").isNull() & F.col("html").isNotNull()
    return df.withColumn("text", F.when(need, extract_text_udf(F.col("html"))).otherwise(F.col("text")))


def replay_stream(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint: str,
    stream_id: str = "cdc",
    max_files_per_trigger: int | None = None,
    salt_buckets: int = 0,
    schema_ddl: str = SPARK_DDL,
    extract: str = "winners",
    compact_every: int = 0,
    on_batch_committed=None,
) -> dict:
    """Replay all available change files into ``table``; returns counters.

    ``extract``:
      * ``"winners"`` (default) — derive ``text`` only for post-LWW
        surviving rows (latest-state consumers; minimal UDF work);
      * ``"eager"`` — derive ``text`` for EVERY change event before the
        merge (consumers that read every revision's text; the
        transform-stage-dominant profile);
      * ``"none"`` — no derived column (tables without an html payload).

    ``compact_every``: fold merge-on-read deltas into base every N batches
    (0 = never; run :meth:`LakeTable.compact` as separate maintenance).

    ``on_batch_committed(batch_id, lineage, table)``: called after each
    COMMITTED (non-fenced) merge — the change-propagation hook for
    downstream consumers (the reference's NOTIFY/LISTEN bus,
    detector.py:908-922, without a bus): e.g. fold ``table.changes()``
    into an incremental aggregate, publish gauges. Skipped batches don't
    fire it, so a consumer keyed on snapshot versions sees each commit
    exactly once.
    Broadcast strategy: ``maxFilesPerTrigger`` bounds FILES per
    micro-batch, not rows, so a file-count cap alone cannot justify an
    unconditional broadcast (one fat change file can carry a winner
    keyset past driver memory). Each batch's ROW count is instead
    estimated for free from the input files' parquet footers: under the
    broadcast bound → ``broadcast_winners=True`` (skips merge's
    size-gate count job, the per-batch serial-floor cost); unknown or
    over the bound → ``"auto"`` (size-gated), same as
    :func:`batch_replay`.
    """
    assert extract in ("winners", "eager", "none")
    reader = spark.readStream.schema(schema_ddl).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path)

    # W7 progress/throughput gauges (the reference's ETA estimator,
    # s3feeder.py:303-323): per-batch wall time + running events/sec,
    # fed by the merge's observe()d lineage counters.
    import time as _time

    t_start = _time.monotonic()
    counters = {"batches": 0, "batches_skipped": 0, "rows_in": 0, "elapsed_s": 0.0, "events_per_sec": 0.0}

    def apply_batch(batch_df, batch_id: int) -> None:
        if extract == "eager":
            batch_df = batch_df.withColumn("text", extract_text_udf(F.col("html")))
        # Row-bound gate for the broadcast fast path (round-5 ADVICE):
        # maxFilesPerTrigger bounds FILES, not rows — one fat change file
        # can carry a winner keyset past driver memory. The source's
        # checkpoint log names the batch's files; their parquet footers
        # give the exact row count with zero Spark jobs. Only a
        # proven-small batch skips merge's size-gate count job.
        est_rows = _footer_row_count(_batch_source_files(checkpoint, batch_id))
        lin = table.merge(
            batch_df,
            fence=(stream_id, batch_id),
            extra_lineage={"batch_id": batch_id, "stream_id": stream_id},
            salt_buckets=salt_buckets,
            post_merge=fill_text if extract == "winners" else None,
            broadcast_winners=(
                True if est_rows is not None and est_rows <= AUTO_BROADCAST_MAX_WINNERS else "auto"
            ),
        )
        if lin is None:
            counters["batches_skipped"] += 1
        else:
            counters["batches"] += 1
            counters["rows_in"] += lin["rows_in"]
            if on_batch_committed is not None:
                on_batch_committed(batch_id, lin, table)
            # compact only counts COMMITTED batches: a fence-skipped batch
            # does not advance the counter, so replays over already-applied
            # epochs never fire spurious compaction jobs
            if compact_every and counters["batches"] % compact_every == 0:
                table.compact()
        counters["elapsed_s"] = round(_time.monotonic() - t_start, 3)
        if counters["elapsed_s"] > 0:
            counters["events_per_sec"] = round(counters["rows_in"] / counters["elapsed_s"], 1)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counters


def batch_replay(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    salt_buckets: int = 0,
    schema_ddl: str = SPARK_DDL,
) -> dict | None:
    """One-shot bounded replay (no checkpoint): read everything, one merge.

    The high-throughput path for historical backfills — a single LWW
    aggregation over the whole stream then one copy-on-write commit,
    instead of per-epoch micro-batches.
    """
    df = spark.read.schema(schema_ddl).option("recursiveFileLookup", "true").parquet(source_path)
    # unbounded input → winner keyset may exceed broadcast limits: size-gate
    return table.merge(df, salt_buckets=salt_buckets, post_merge=fill_text, broadcast_winners="auto")
