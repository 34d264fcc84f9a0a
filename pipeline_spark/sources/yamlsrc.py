"""YAML blob framing + record parsing (S5 + the YAML branch of S4).

The reference splits legacy report blobs into ``---``-separated YAML
documents, tolerating broken/truncated frames (``normalize.py:524-565``,
``stream_yaml_blobs``), then normalizes each document like any other
record. Spark-native form:

* ``binaryFile`` source — one row per blob, parallel across blobs;
* framing + ``yaml.safe_load`` inside ``mapInPandas`` (YAML has no
  Catalyst expression; this is the UDTF-shaped splitter of SURVEY §2.10 —
  iterator in, many records out, Arrow-batched);
* a frame that fails to parse, or parses to a non-mapping, is SKIPPED and
  counted in ``_broken`` (the reference's skip-and-continue semantics) —
  surfaced per-blob so lineage can record discards;
* parsed records coerce onto the fixed change schema (missing keys →
  null), timestamps/base64 handled like the jsonl path, so a YAML replay
  reproduces the jsonl/parquet replay state bit-for-bit (tested).
"""

from __future__ import annotations

import base64
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

YAML_RECORD_COLS = ["op", "url", "warc_ts", "html_b64", "lang", "epoch", "offset"]


def split_yaml_frames(blob: bytes) -> list[str]:
    """Frame a byte stream into ``---``-separated YAML documents.

    Tolerant: leading junk before the first separator is dropped, a
    truncated final frame is still yielded (the parser decides if it's
    usable), and decoding errors are replaced rather than fatal."""
    text = blob.decode("utf-8", errors="replace")
    frames: list[str] = []
    cur: list[str] = []
    for line in io.StringIO(text):
        if line.rstrip("\n") == "---":
            if cur:
                frames.append("".join(cur))
                cur = []
        else:
            cur.append(line)
    if cur:
        frames.append("".join(cur))
    return [f for f in frames if f.strip()]


def read_yaml_changes(spark: SparkSession, path: str) -> DataFrame:
    """YAML blobs under ``path`` → normalized change records (+ a
    ``_broken`` count column carrying each blob's skipped-frame tally on
    its first record)."""
    import yaml

    bins = spark.read.format("binaryFile").option("pathGlobFilter", "*.yml*").load(path)
    bins = bins.select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipeline_spark.sources.lz4codec import maybe_decompress

        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows, broken = [], 0
                # .yml.lz4 legacy cans (s3feeder.py:100-110) sniff-decode
                for frame in split_yaml_frames(maybe_decompress(bytes(blob))):
                    try:
                        doc = yaml.safe_load(frame)
                    except yaml.YAMLError:
                        broken += 1
                        continue
                    if not isinstance(doc, dict):
                        broken += 1
                        continue
                    rows.append({k: doc.get(k) for k in YAML_RECORD_COLS})
                if rows:
                    out = pd.DataFrame(rows, columns=YAML_RECORD_COLS)
                    out["_broken"] = [broken] + [0] * (len(rows) - 1)
                    yield out.astype(object).where(pd.notna(out), None)

    raw = bins.mapInPandas(
        parse,
        schema="op string, url string, warc_ts string, html_b64 string, lang string, "
        "epoch long, offset long, _broken long",
    )
    return raw.select(
        F.col("op"),
        F.col("url"),
        F.to_timestamp("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("warc_ts"),
        F.unbase64(F.col("html_b64")).alias("html"),
        F.col("lang"),
        F.col("epoch"),
        F.col("offset"),
        F.col("_broken"),
    )


def write_change_stream_yaml(
    path: str, spec, broken_every: int = 0, lz4: bool = False
) -> list[str]:
    """Serialize the datagen stream as one ``---``-framed YAML blob per
    epoch; ``broken_every>0`` plants an unparsable frame every N records
    to exercise the skip-and-count path. ``lz4=True`` writes the
    ``.yml.lz4`` legacy-can shape."""
    import io as _io

    import yaml

    from pipeline_spark.datagen import generate_epoch

    out = []
    for e in range(spec.n_epochs):
        pdf = generate_epoch(spec, e)
        dest = os.path.join(path, f"ep-{e:04d}.yml" + (".lz4" if lz4 else ""))
        os.makedirs(path, exist_ok=True)
        with _io.StringIO() as f:
            for i, row in enumerate(pdf.itertuples(index=False)):
                if broken_every and i % broken_every == 0:
                    f.write("---\n{ this is : not [ valid yaml\n")
                rec = {
                    "op": row.op,
                    "url": row.url,
                    "warc_ts": None if row.warc_ts is None or str(row.warc_ts) == "NaT" else f"{row.warc_ts:%Y-%m-%d %H:%M:%S.%f}",
                    "html_b64": None if row.html is None else base64.b64encode(row.html).decode("ascii"),
                    "lang": row.lang,
                    "epoch": int(row.epoch),
                    "offset": int(row.offset),
                }
                f.write("---\n")
                yaml.safe_dump(rec, f, default_flow_style=False)
            data = f.getvalue().encode("utf-8")
        if lz4:
            from pipeline_spark.sources.lz4codec import compress_frame

            data = compress_frame(data)
        with open(dest, "wb") as fh:
            fh.write(data)
        out.append(dest)
    return out


__all__ = ["read_yaml_changes", "split_yaml_frames", "write_change_stream_yaml"]
