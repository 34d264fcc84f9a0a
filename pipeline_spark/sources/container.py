"""Container-file ingest (the rest of S4): tar / tar.gz of JSONL members.

The reference's multi-format reader demultiplexes container files — tars
of json documents — into individual records (``s3feeder.py:45-153``,
``load_multiple``). Spark has no tar codec, so the container path is:

* ``spark.read.format("binaryFile")`` — one row per container file
  (path, bytes); containers parallelize ACROSS files (a single container
  is one task's work — keep containers at a few hundred MB, the same
  operational guidance as the reference's ~60 MB cans);
* ``mapInPandas`` unpacks each container with the stdlib ``tarfile`` /
  ``gzip`` modules and yields one raw JSON line per member line —
  Arrow-batched, no driver involvement, no external codec library;
* the lines then flow through the SAME envelope normalization as plain
  jsonl (:func:`pipeline_spark.sources.jsonl.normalize_enveloped`), so a
  container replay is bit-identical to a jsonl replay of the same stream.

lz4 containers (``.tar.lz4`` / ``.jsonl.lz4`` — the reference's legacy
cans, s3feeder.py:56-110) decompress via
:mod:`pipeline_spark.sources.lz4codec` — native ``lz4.frame`` when the
cluster image ships one, a pure-Python frame decoder otherwise — sniffed
by magic bytes so mislabeled cans still read. gzip covers the
``.tar.gz`` postcan shape.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pipeline_spark.sources.jsonl import normalize_enveloped
from pipeline_spark.sources.lz4codec import maybe_decompress


def _iter_member_lines(name: str, blob: bytes) -> Iterator[str]:
    blob = maybe_decompress(blob)
    mode = "r:gz" if name.endswith((".tar.gz", ".tgz")) else "r:"
    with tarfile.open(fileobj=io.BytesIO(blob), mode=mode) as tf:
        for member in tf.getmembers():
            if not member.isfile():
                continue
            f = tf.extractfile(member)
            if f is None:
                continue
            for line in io.TextIOWrapper(f, encoding="utf-8", errors="replace"):
                line = line.rstrip("\n")
                if line:
                    yield line


def read_tar_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per JSON line inside any tar/tar.gz member under ``path``.
    Columns: (value string, src_container string, member implicit in
    order). Unpacking runs inside ``mapInPandas`` on the executors."""
    bins = spark.read.format("binaryFile").option("pathGlobFilter", "*.tar*").load(path)
    bins = bins.select("path", "content")

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                lines = list(_iter_member_lines(os.path.basename(p), bytes(blob)))
                if lines:
                    yield pd.DataFrame({"value": lines, "src_container": os.path.basename(p)})

    return bins.mapInPandas(unpack, schema="value string, src_container string")


def read_container_changes(spark: SparkSession, path: str, keep_extra: bool = False) -> DataFrame:
    """tar/tar.gz/tar.lz4 containers of enveloped JSONL → normalized
    change records (shares the S4/P2/P14 normalization with the jsonl
    reader)."""
    lines = read_tar_lines(spark, path).drop("src_container")
    return normalize_enveloped(lines, "value", keep_extra=keep_extra)


def read_lz4_lines(spark: SparkSession, path: str, glob: str = "*.jsonl.lz4") -> DataFrame:
    """One row per text line inside lz4-framed line files (the
    ``.json.lz4`` legacy-can shape, s3feeder.py:87-98). ``binaryFile`` +
    executor-side frame decode — same parallel-across-files model as the
    tar path."""
    bins = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    bins = bins.select("path", "content")

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                text = maybe_decompress(bytes(blob)).decode("utf-8", errors="replace")
                lines = [ln for ln in text.split("\n") if ln]
                if lines:
                    yield pd.DataFrame({"value": lines, "src_container": os.path.basename(p)})

    return bins.mapInPandas(unpack, schema="value string, src_container string")


def read_lz4_changes(spark: SparkSession, path: str, keep_extra: bool = False) -> DataFrame:
    """``.jsonl.lz4`` legacy cans → normalized change records."""
    lines = read_lz4_lines(spark, path).drop("src_container")
    return normalize_enveloped(lines, "value", keep_extra=keep_extra)


def write_change_stream_tar(
    path: str, spec, gz: bool = True, codec: str | None = None
) -> list[str]:
    """Package the deterministic datagen stream as one tar container per
    epoch, each holding that epoch's jsonl — the postcan shape.
    ``codec``: ``"gz"`` / ``"none"`` / ``"lz4"`` (overrides ``gz``)."""
    import tempfile

    from pipeline_spark.sources.lz4codec import compress_frame

    from pipeline_spark.sources.jsonl import write_change_stream_jsonl

    codec = codec if codec is not None else ("gz" if gz else "none")
    with tempfile.TemporaryDirectory() as tmp:
        dirs = write_change_stream_jsonl(tmp, spec)
        os.makedirs(path, exist_ok=True)
        out = []
        for d in dirs:
            ep = os.path.basename(d)
            suffix = {"gz": ".tar.gz", "none": ".tar", "lz4": ".tar.lz4"}[codec]
            dest = os.path.join(path, f"{ep}{suffix}")
            if codec == "lz4":
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for fn in sorted(os.listdir(d)):
                        tf.add(os.path.join(d, fn), arcname=f"{ep}/{fn}")
                with open(dest, "wb") as f:
                    f.write(compress_frame(buf.getvalue()))
            else:
                with tarfile.open(dest, "w:gz" if codec == "gz" else "w") as tf:
                    for fn in sorted(os.listdir(d)):
                        tf.add(os.path.join(d, fn), arcname=f"{ep}/{fn}")
            out.append(dest)
    return out


def write_change_stream_jsonl_lz4(path: str, spec) -> list[str]:
    """The ``.jsonl.lz4`` legacy-can shape: one lz4-framed jsonl file per
    epoch."""
    import tempfile

    from pipeline_spark.sources.jsonl import write_change_stream_jsonl
    from pipeline_spark.sources.lz4codec import compress_frame

    with tempfile.TemporaryDirectory() as tmp:
        dirs = write_change_stream_jsonl(tmp, spec)
        os.makedirs(path, exist_ok=True)
        out = []
        for d in dirs:
            ep = os.path.basename(d)
            raw = b"".join(
                open(os.path.join(d, fn), "rb").read() for fn in sorted(os.listdir(d))
            )
            dest = os.path.join(path, f"{ep}.jsonl.lz4")
            with open(dest, "wb") as f:
                f.write(compress_frame(raw))
            out.append(dest)
    return out
