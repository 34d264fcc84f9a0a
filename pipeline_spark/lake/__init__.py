"""Snapshot-versioned lake table on parquet.

The sandbox image ships no Iceberg/Delta jars, so the engine provides its
own thin table format with the subset of semantics the CDC sink needs —
the same guarantees ClickHouse's ReplacingMergeTree + the watermark-file
protocol give the reference (``af/fastpath/fastpath/db.py:82-84``,
``af/analysis/analysis/clickhouse_feeder.py:148-179``), re-expressed as:

* **atomic snapshot commits** — version files created with ``os.link``
  (fails if the version exists → optimistic concurrency, like an Iceberg
  catalog swap);
* **bucketed copy-on-write MERGE** — key-hash buckets so a merge rewrites
  only touched buckets (partition pruning at 100 TB scale);
* **last-writer-wins** keyed on ``(key)`` ordered by version columns with
  a total-order tie-break;
* **epoch fencing** — commit properties record the last applied stream
  batch so replays/retries are idempotent (exactly-once);
* **schema evolution** — field-id–based column add / rename / type-widen,
  resolved at read time (Iceberg-style name mapping);
* **lineage** — one record per commit (source offsets → snapshot id,
  row counts, merge stats);
* **compaction** — small files per bucket rewritten into one.

On a real cluster you would swap this module for Iceberg's Spark extension
(``MERGE INTO`` + snapshot properties); the engine's public API
(:class:`LakeTable`) is deliberately shaped so that swap is mechanical.
"""

from pipeline_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
