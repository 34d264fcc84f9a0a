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

lz4 containers are not supported (no lz4 codec in this environment);
gzip covers the ``.tar.gz`` postcan shape.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pipeline_spark.sources.jsonl import normalize_enveloped


def _iter_member_lines(name: str, blob: bytes) -> Iterator[str]:
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
    """tar/tar.gz containers of enveloped JSONL → normalized change
    records (shares the S4/P2/P14 normalization with the jsonl reader)."""
    lines = read_tar_lines(spark, path).drop("src_container")
    return normalize_enveloped(lines, "value", keep_extra=keep_extra)


def write_change_stream_tar(path: str, spec, gz: bool = True) -> list[str]:
    """Package the deterministic datagen stream as one tar(.gz) container
    per epoch, each holding that epoch's jsonl — the postcan shape."""
    import tempfile

    from pipeline_spark.sources.jsonl import write_change_stream_jsonl

    with tempfile.TemporaryDirectory() as tmp:
        dirs = write_change_stream_jsonl(tmp, spec)
        os.makedirs(path, exist_ok=True)
        out = []
        for d in dirs:
            ep = os.path.basename(d)
            suffix = ".tar.gz" if gz else ".tar"
            dest = os.path.join(path, f"{ep}{suffix}")
            with tarfile.open(dest, "w:gz" if gz else "w") as tf:
                for fn in sorted(os.listdir(d)):
                    tf.add(os.path.join(d, fn), arcname=f"{ep}/{fn}")
            out.append(dest)
    return out
