"""Guards added in round 5 (ADVICE items): _DEFERRED drift fails loudly,
catalog work dirs are swept at exit, and the replay broadcast fast path is
row-bound-gated via parquet footers (no Spark job, no file-count proxy)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pipeline_spark.plans import catalog
from pipeline_spark.streaming.replay import _footer_row_count


def test_export_order_rejects_unknown_deferred(monkeypatch):
    monkeypatch.setattr(catalog, "_DEFERRED", [*catalog._DEFERRED, "no_such_query"])
    with pytest.raises(AssertionError, match="no_such_query"):
        catalog._export_order()


def test_export_order_rejects_rows_only_deferred(monkeypatch):
    rows_only = next(n for n in catalog.QUERIES if catalog.QUERIES[n][1] is None)
    monkeypatch.setattr(catalog, "_DEFERRED", [*catalog._DEFERRED, rows_only])
    with pytest.raises(AssertionError, match="without an oracle"):
        catalog._export_order()


def test_export_order_rejects_duplicate_deferred(monkeypatch):
    monkeypatch.setattr(catalog, "_DEFERRED", [*catalog._DEFERRED, catalog._DEFERRED[0]])
    with pytest.raises(AssertionError, match="duplicates"):
        catalog._export_order()


def test_workdir_registers_for_exit_cleanup():
    d = catalog._workdir("guard_test_")
    assert os.path.isdir(d)
    assert d in catalog._WORK_DIRS


def test_events_n_uses_stats_max_not_row_count(tmp_path):
    """_events_n must return max(event_id)+1 from footer column stats —
    row-count-as-max silently drops trailing events when ids have gaps."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"event_id": [0, 1, 5, 9], "x": [1, 2, 3, 4]}),
        str(d / "events.parquet"),
    )
    assert catalog._events_n(str(d)) == 10  # not 4 (the row count)


def test_footer_row_count_exact(tmp_path):
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": list(range(7))}), p1)
    pq.write_table(pa.table({"x": list(range(5))}), p2)
    assert _footer_row_count([p1, p2]) == 12
    # Spark's inputFiles() returns file: URIs in both spellings
    assert _footer_row_count([f"file://{p1}", f"file:{p2}"]) == 12


def test_footer_row_count_unknown_on_remote_or_bad_input(tmp_path):
    assert _footer_row_count(["s3a://bucket/k.parquet"]) is None
    assert _footer_row_count([]) is None  # unknown != zero
    assert _footer_row_count(None) is None
    bad = str(tmp_path / "not_parquet.parquet")
    with open(bad, "wb") as f:
        f.write(b"nope")
    assert _footer_row_count([bad]) is None


def test_batch_source_files_reads_checkpoint_log(tmp_path):
    from pipeline_spark.streaming.replay import _batch_source_files

    d = tmp_path / "ck" / "sources" / "0"
    d.mkdir(parents=True)
    (d / "3").write_text(
        'v1\n{"path":"file:///tmp/a.parquet","timestamp":1,"batchId":3}\n'
        '{"path":"file:///tmp/b.parquet","timestamp":1,"batchId":3}\n'
    )
    assert _batch_source_files(str(tmp_path / "ck"), 3) == [
        "file:///tmp/a.parquet",
        "file:///tmp/b.parquet",
    ]
    assert _batch_source_files(str(tmp_path / "ck"), 99) is None
    assert _batch_source_files("/nonexistent", 0) is None


def test_batch_source_files_reads_compacted_log(tmp_path):
    """Every compactInterval-th batch is stored as <id>.compact holding ALL
    entries so far — only this batch's (by batchId) are its input files."""
    from pipeline_spark.streaming.replay import _batch_source_files

    d = tmp_path / "ck" / "sources" / "0"
    d.mkdir(parents=True)
    (d / "9.compact").write_text(
        'v1\n{"path":"file:///tmp/old.parquet","timestamp":1,"batchId":3}\n'
        '{"path":"file:///tmp/new.parquet","timestamp":2,"batchId":9}\n'
    )
    assert _batch_source_files(str(tmp_path / "ck"), 9) == ["file:///tmp/new.parquet"]
    # a compact file whose entries all belong to other batches → None
    # (unknown), never [] (the caller treats unknown as "must size-gate")
    (d / "5.compact").write_text('v1\n{"path":"file:///tmp/x.parquet","timestamp":1,"batchId":2}\n')
    assert _batch_source_files(str(tmp_path / "ck"), 5) is None
