"""pipeline_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference pipeline (ooni/pipeline): a binlog/WAL-shaped
change stream of web pages is applied to a snapshot-versioned lake table via
key-partitioned LWW MERGE upserts, with exactly-once epoch-fenced commits,
in-flight schema evolution, per-batch lineage, and a library of batch
operators (aggregations, joins, dedup, similarity search, text analysis)
expressed DataFrame-first so Catalyst/Tungsten pick the physical plan.

Layout:
  session    — SparkSession factory with scale-aware defaults
  datagen    — deterministic (seed-driven) synthetic CDC change stream
  extraction — Arrow-vectorized HTML→text extraction (the per-row invariant)
  lake/      — snapshot-versioned table format: atomic commits, MERGE, schema
               evolution, lineage, compaction
  streaming/ — Structured Streaming replay with epoch-fenced foreachBatch
  operators/ — LWW dedup, rollups, MinHash/SimHash dedup, ANN, text analysis,
               EWMA change detection, weighted sampling
  functions/ — scalar column helpers (ids, domains, hashes)
"""

__version__ = "0.1.0"
