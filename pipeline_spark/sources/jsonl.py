"""JSONL change-stream source — the non-parquet ingest path (S4/P2/P14).

The reference feeds the pipeline from container files of JSON documents
wrapped in an envelope, unwraps the envelope, coerces each record onto a
fixed schema, and folds unexpected keys aside (multi-format reader
``af/fastpath/fastpath/s3feeder.py:45-153``; envelope unwrap + fixed-schema
coercion + stray-key fold ``normalize.py:77-100,164-170,408-506``).

Spark-native form:

* ``spark.read.text`` (splittable, scales with input splits) + ONE
  ``from_json`` in PERMISSIVE mode — a malformed line yields a NULL struct
  instead of failing the job, mirroring the reference's per-record skip;
* envelope unwrap = nested-field projection (no second parse);
* binary payloads ride base64 (JSON has no bytes) and decode with the
  ``unbase64`` builtin (P12);
* timestamps parse with ``to_timestamp`` (P7);
* stray keys: the line is additionally parsed as ``map<string,string>``
  and the non-schema keys are kept in an ``extra`` map column (P14's
  "fold unknown keys, don't drop data"). Both parses are JVM expressions —
  no Python.

The resulting DataFrame is merge()-ready: a jsonl replay must produce a
final table state identical to the parquet replay of the same stream
(asserted bit-for-bit in tests/test_jsonl_source.py).
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: typed schema of one change record INSIDE the envelope; html is base64.
RECORD_DDL = (
    "op string, url string, warc_ts string, html_b64 string, lang string, epoch long, offset long"
)
RECORD_FIELDS = ["op", "url", "warc_ts", "html_b64", "lang", "epoch", "offset"]


def jsonl_change_schema() -> str:
    """DDL of the normalized output (matches the parquet stream shape)."""
    return "op string, url string, warc_ts timestamp, html binary, lang string, epoch long, offset long"


def read_jsonl_changes(
    spark: SparkSession,
    path: str,
    envelope_field: str = "content",
    keep_extra: bool = True,
) -> DataFrame:
    """Read an enveloped jsonl change stream into the normalized shape.

    Each line: ``{"format": "json", "content": {<record>}, ...}``. Lines
    that fail to parse, or whose envelope lacks ``content``, surface as
    all-null records and are discarded by the merge's validity filter
    (the reference's per-record skip-and-count, normalize.py:408-426).
    """
    return normalize_enveloped(spark.read.text(path), "value", envelope_field, keep_extra)


def normalize_enveloped(
    lines: DataFrame,
    value_col: str = "value",
    envelope_field: str = "content",
    keep_extra: bool = True,
) -> DataFrame:
    """Envelope unwrap + fixed-schema coercion + stray-key fold over a
    column of raw JSON lines (the P2/P14 normalization core, shared by the
    file reader and any in-flight stream)."""
    env_ddl = f"format string, {envelope_field} struct<{RECORD_DDL}>"
    parsed = lines.select(
        F.from_json(F.col(value_col), env_ddl, {"mode": "PERMISSIVE"}).alias("env"),
        F.col(value_col).alias("value"),
    )
    rec = F.col(f"env.{envelope_field}")
    cols = [
        rec["op"].alias("op"),
        rec["url"].alias("url"),
        F.to_timestamp(rec["warc_ts"], "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("warc_ts"),
        F.unbase64(rec["html_b64"]).alias("html"),
        rec["lang"].alias("lang"),
        rec["epoch"].alias("epoch"),
        rec["offset"].alias("offset"),
    ]
    if keep_extra:
        # stray-key fold: parse the RAW line's record as a loose map (the
        # typed parse above silently drops unknown keys) and keep the keys
        # the schema doesn't know (P14, normalize.py:164-170)
        loose = F.from_json(
            F.col("value"), f"{envelope_field} map<string,string>", {"mode": "PERMISSIVE"}
        )[envelope_field]
        known = F.array(*[F.lit(k) for k in RECORD_FIELDS])
        cols.append(
            F.map_filter(loose, lambda k, _: ~F.array_contains(known, k)).alias("extra")
        )
    return parsed.select(*cols)


def write_change_stream_jsonl(path: str, spec, extra_keys: bool = False) -> list[str]:
    """Serialize the deterministic datagen stream as enveloped jsonl files
    (one dir per epoch, mirroring the parquet layout). ``extra_keys``
    plants a stray key on some records to exercise the P14 fold."""
    from pipeline_spark.datagen import generate_epoch

    dirs = []
    for e in range(spec.n_epochs):
        d = os.path.join(path, f"ep-{e:04d}")
        os.makedirs(d, exist_ok=True)
        pdf = generate_epoch(spec, e)
        with open(os.path.join(d, "part-00000.jsonl"), "w") as f:
            for i, row in enumerate(pdf.itertuples(index=False)):
                rec = {
                    "op": row.op,
                    "url": row.url,
                    "warc_ts": None if row.warc_ts is None or str(row.warc_ts) == "NaT" else f"{row.warc_ts:%Y-%m-%d %H:%M:%S.%f}",
                    "html_b64": None if row.html is None else base64.b64encode(row.html).decode("ascii"),
                    "lang": row.lang,
                    "epoch": int(row.epoch),
                    "offset": int(row.offset),
                }
                if extra_keys and i % 7 == 0:
                    rec["debug_note"] = f"stray-{i}"
                f.write(json.dumps({"format": "json", "content": rec}) + "\n")
        dirs.append(d)
    return dirs
