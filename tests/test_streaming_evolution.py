"""Schema evolution while a streaming replay is LIVE (north-rule
"mid-replay" evolution): add/rename/widen between micro-batches of ONE
running `replay_stream` query, via the driver-side `on_batch_committed`
hook — the analog of the reference's oometa patch chain applied to a
running pipeline (af/oometa/020-new-test-names.rollback.sql:10-31).

The existing coverage (tests/test_lake_merge.py) evolves between separate
batch merges; here the query never restarts: batch 0 lands pre-evolution,
the hook evolves the table, batches 1-2 land post-evolution, and both old
and new files resolve by field id in the final read.
"""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pipeline_spark.datagen import SPARK_DDL
from pipeline_spark.lake import LakeTable
from pipeline_spark.streaming import replay_stream

TS = pd.Timestamp


def _write_epoch(path: str, rows: list[dict], with_lang2: bool, mtime: float):
    os.makedirs(path, exist_ok=True)
    cols = ["op", "url", "warc_ts", "html", "lang", "epoch", "offset"]
    fields = [
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
        ("epoch", pa.int64()),
        ("offset", pa.int64()),
    ]
    if with_lang2:
        cols.append("lang2")
        fields.append(("lang2", pa.string()))
    pdf = pd.DataFrame(rows)[cols]
    fp = os.path.join(path, "part-00000.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, schema=pa.schema(fields), preserve_index=False), fp)
    # the file source processes oldest-mtime first: pin the order explicitly
    os.utime(fp, (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_schema_evolution_between_live_microbatches(spark, tmp_path):
    src = str(tmp_path / "stream")
    t0 = time.time() - 600

    def row(url, ts, lang, off, lang2=None, html=b"<p>x</p>"):
        r = {"op": "U", "url": url, "warc_ts": TS(ts), "html": html,
             "lang": lang, "epoch": 0, "offset": off}
        if lang2 is not None:
            r["lang2"] = lang2
        return r

    # epoch 0 / 1: old-producer schema (no lang2); epoch 2: new producer
    _write_epoch(os.path.join(src, "ep-0000"), [
        row("u1", "2024-01-01 01:00:00", "en", 0, html=b"<p>a1</p>"),
        row("u2", "2024-01-01 01:00:00", "fr", 1),
        row("u3", "2024-01-01 01:00:00", "de", 2),
    ], with_lang2=False, mtime=t0)
    _write_epoch(os.path.join(src, "ep-0001"), [
        row("u2", "2024-01-01 02:00:00", "pt", 3, html=b"<p>b2</p>"),
    ], with_lang2=False, mtime=t0 + 60)
    _write_epoch(os.path.join(src, "ep-0002"), [
        {**row("u3", "2024-01-01 03:00:00", "it", 4, html=b"<p>c3</p>"), "lang2": "x"},
        {**row("u4", "2024-01-01 03:00:00", "es", 5), "lang2": "y"},
    ], with_lang2=True, mtime=t0 + 120)

    table = LakeTable.create(
        spark,
        str(tmp_path / "pages"),
        [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
         ("text", "string"), ("lang", "string"), ("fetch_status", "int")],
        key="url",
        version_col="warc_ts",
        n_buckets=4,
    )

    evolved = []

    def evolve_hook(batch_id, lineage, t):
        # driver-side, between triggers of the LIVE query
        n = len(evolved)
        evolved.append(batch_id)
        if n == 0:
            t.add_column("lang2", "string")
        elif n == 1:
            t.rename_column("lang", "language")
            t.widen_column("fetch_status", "long")

    counters = replay_stream(
        spark,
        src,
        table,
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # one epoch file per micro-batch
        # reader schema is fixed for the life of the query; old files
        # null-fill the trailing new column
        schema_ddl=SPARK_DDL + ", lang2 string",
        on_batch_committed=evolve_hook,
    )
    assert counters["batches"] == 3 and len(evolved) == 3

    got = {r["url"]: r for r in table.read().collect()}
    assert set(got) == {"u1", "u2", "u3", "u4"}

    # u1: won in batch 0 (pre-evolution file) — lang resolves to the
    # renamed column by field id; lang2 predates its add → NULL
    assert got["u1"]["language"] == "en" and got["u1"]["lang2"] is None
    # u2: won in batch 1 (post-add, pre-rename) — written under the old
    # name's field id, surfaces as `language`; lang2 null-filled
    assert got["u2"]["language"] == "pt" and got["u2"]["lang2"] is None
    assert got["u2"]["html"] == bytearray(b"<p>b2</p>") or bytes(got["u2"]["html"]) == b"<p>b2</p>"
    # u3/u4: won in batch 2 (post-rename) — the batch still carries the
    # OLD column name, which no longer exists → language null-fills,
    # while the freshly added lang2 lands with its values
    assert got["u3"]["language"] is None and got["u3"]["lang2"] == "x"
    assert got["u4"]["language"] is None and got["u4"]["lang2"] == "y"
    # widen int→long mid-stream: schema reads back long, values null-fill
    assert dict(table.read().dtypes)["fetch_status"] == "bigint"
    assert all(got[u]["fetch_status"] is None for u in got)
    # extraction ran on winners across both schema eras
    assert bytes(got["u3"]["html"]) == b"<p>c3</p>" and got["u3"]["text"] == "c3"
