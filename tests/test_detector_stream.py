"""Streaming EWMA: state carried across micro-batches must reproduce the
batch fold exactly (warmup/live unification)."""

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pipeline_spark.operators.detector import detect_changes_batch
from pipeline_spark.streaming.detector_stream import detect_changes_stream

SCHEMA_DDL = "key string, ts timestamp, value double"


def _write_batches(path):
    """Two files → two micro-batches; flip happens in the second."""
    base = datetime(2024, 1, 1)
    rows1 = [("k", base + timedelta(seconds=i), 1.0) for i in range(4)]
    rows2 = [("k", base + timedelta(seconds=4 + i), 1.0) for i in range(6)]
    for i, rows in enumerate([rows1, rows2]):
        t = pa.table(
            {
                "key": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": [r[2] for r in rows],
            }
        )
        os.makedirs(path, exist_ok=True)
        pq.write_table(t, os.path.join(path, f"b{i}.parquet"))


def test_stream_matches_batch_fold(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(src)

    stream = (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = detect_changes_stream(stream, "key")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_changes")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM ewma_changes").collect()

    # batch equivalent over the concatenated history
    df = spark.read.schema(SCHEMA_DDL).parquet(src).withColumnRenamed("key", "event_type")
    exp = detect_changes_batch(df, keys=["event_type"], ts_col="ts", value_col="value").collect()

    assert len(got) == len(exp) == 1
    assert got[0]["ts"] == exp[0]["ts"]
    assert got[0]["mean"] == pytest.approx(exp[0]["mean"])
    assert got[0]["blocked"] is True
    # the flip is at the 6th point even though it spans two micro-batches:
    # state crossed the batch boundary
    assert got[0]["ts"] == datetime(2024, 1, 1, 0, 0, 5)


def test_stream_group_larger_than_arrow_chunk(spark, tmp_path):
    """A group bigger than arrow.maxRecordsPerBatch (512) arrives as
    MULTIPLE pandas chunks in one micro-batch; rows are also written in
    shuffled order. Folding chunks independently (the old bug) produces a
    wrong mean — the fold must concat ALL chunks then sort once by time."""
    import numpy as np

    src = str(tmp_path / "bigsrc")
    os.makedirs(src, exist_ok=True)
    base = datetime(2024, 1, 1)
    n = 1500  # ≈3 Arrow chunks at maxRecordsPerBatch=512
    # values chosen so the EWMA crosses the upper threshold exactly once,
    # late in the series — order-sensitive by construction
    idx = np.arange(n)
    vals = np.where(idx < 1200, 0.0, 1.0)
    order = np.random.RandomState(7).permutation(n)  # shuffled file order
    t = pa.table(
        {
            "key": ["k"] * n,
            "ts": pa.array([base + timedelta(seconds=int(i)) for i in idx[order]], pa.timestamp("us")),
            "value": vals[order].astype(float),
        }
    )
    pq.write_table(t, os.path.join(src, "b0.parquet"))

    stream = spark.readStream.schema(SCHEMA_DDL).parquet(src)
    out = detect_changes_stream(stream, "key")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_big")
        .option("checkpointLocation", str(tmp_path / "ckpt_big"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM ewma_big ORDER BY ts").collect()

    df = spark.read.schema(SCHEMA_DDL).parquet(src).withColumnRenamed("key", "event_type")
    exp = detect_changes_batch(df, keys=["event_type"], ts_col="ts", value_col="value").collect()
    assert [(r["ts"], r["blocked"]) for r in got] == [(r["ts"], r["blocked"]) for r in sorted(exp, key=lambda r: r["ts"])]
    for g, e in zip(got, sorted(exp, key=lambda r: r["ts"])):
        assert g["mean"] == pytest.approx(e["mean"], abs=1e-12)


def test_live_tailing_rate_source(spark, tmp_path):
    """S6: the same stateful operator tails a LIVE unbounded source (rate)
    with a processing-time trigger — warmup (file replay, above) and live
    mode share one code path. Asserts the query runs, checkpoints, and
    emits the change-event schema."""
    from pyspark.sql import functions as F

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            (F.col("value") % 3).cast("string").alias("key"),
            F.col("timestamp").alias("ts"),
            # values engineered to cross the 0.10 threshold quickly
            F.when(F.col("value") % 10 < 9, 1.0).otherwise(0.0).alias("value"),
        )
    )
    out = detect_changes_stream(src, "key")
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_live")
        .option("checkpointLocation", str(tmp_path / "ckpt_live"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 30
        n = 0
        while time.monotonic() < deadline:
            n = spark.sql("SELECT count(*) FROM ewma_live").collect()[0][0]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0, "live stream produced no change events in 30s"
        row = spark.sql("SELECT * FROM ewma_live LIMIT 1").collect()[0]
        assert set(row.asDict()) == {"key", "ts", "mean", "blocked"}
    finally:
        q.stop()
