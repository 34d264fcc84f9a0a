"""Streaming replay: end-state equivalence, kill-and-resume with no
duplicate or lost upserts (modeled on reference
tests/test_functional.py:862-876), fence-based idempotency."""

import pandas as pd
import pytest

from pipeline_spark.datagen import StreamSpec, generate_epoch, lww_oracle, write_change_stream
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.streaming import replay_stream
from pipeline_spark.streaming.replay import batch_replay

from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal

SPEC = StreamSpec(n_events=4_000, n_urls=200, n_epochs=4)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    write_change_stream(str(d), SPEC)
    return str(d)


@pytest.fixture(scope="module")
def expected():
    return lww_oracle([generate_epoch(SPEC, e) for e in range(SPEC.n_epochs)], extract_text_py)


def make_table(spark, tmp_path, name):
    return LakeTable.create(spark, str(tmp_path / name), PAGE_SCHEMA, key="url", version_col="warc_ts", n_buckets=8)


def test_streaming_replay_matches_oracle(spark, tmp_path, stream_dir, expected):
    t = make_table(spark, tmp_path, "full")
    c = replay_stream(spark, stream_dir, t, checkpoint=str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert c["batches"] == SPEC.n_epochs  # one file per epoch
    assert_state_equal(as_pandas_state(t), expected)
    # lineage: one record per micro-batch, offsets + snapshot ids filled
    recs = [r for r in t.lineage_records() if "batch_id" in r]
    assert len(recs) == SPEC.n_epochs
    assert all(r["snapshot_id"] >= 1 and r["rows_in"] > 0 for r in recs)


def test_kill_and_resume_no_dup_no_loss(spark, tmp_path, stream_dir, expected):
    """Stop after the first micro-batch, restart from checkpoint → same
    final state; re-running a third time is a complete no-op."""
    t = make_table(spark, tmp_path, "resume")
    ckpt = str(tmp_path / "ckpt_resume")

    # phase 1: process exactly one micro-batch then "crash"
    from pipeline_spark.datagen import SPARK_DDL
    from pipeline_spark.extraction import with_extracted_text

    stream = (
        spark.readStream.schema(SPARK_DDL)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    seen = {"n": 0}

    def one_batch(df, batch_id):
        if seen["n"] >= 1:
            raise RuntimeError("simulated crash")
        t.merge(with_extracted_text(df), fence=("cdc", batch_id))
        seen["n"] += 1

    q = stream.writeStream.foreachBatch(one_batch).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    with pytest.raises(Exception):
        q.awaitTermination()
    v_after_crash = t.current_version()
    assert v_after_crash >= 1

    # phase 2: resume from the same checkpoint — picks up remaining epochs,
    # re-delivered batches are fenced out
    c = replay_stream(spark, stream_dir, t, checkpoint=ckpt, max_files_per_trigger=1)
    assert_state_equal(as_pandas_state(t), expected)

    # phase 3: full rerun over the same checkpoint → nothing new
    v_final = t.current_version()
    c2 = replay_stream(spark, stream_dir, t, checkpoint=ckpt, max_files_per_trigger=1)
    assert c2["batches"] == 0
    assert t.current_version() == v_final
    assert_state_equal(as_pandas_state(t), expected)


def test_fresh_checkpoint_replay_is_fenced_by_epoch(spark, tmp_path, stream_dir, expected):
    """Even with a *lost* checkpoint, re-delivered batch ids ≤ fence are
    skipped — the commit-property guard, not the offset log, is the last
    line of defense."""
    t = make_table(spark, tmp_path, "fenced")
    replay_stream(spark, stream_dir, t, checkpoint=str(tmp_path / "c1"), max_files_per_trigger=1)
    v1 = t.current_version()
    c = replay_stream(spark, stream_dir, t, checkpoint=str(tmp_path / "c2"), max_files_per_trigger=1)
    assert c["batches"] == 0 and c["batches_skipped"] == SPEC.n_epochs
    assert t.current_version() == v1
    assert_state_equal(as_pandas_state(t), expected)


def test_batch_replay_one_shot(spark, tmp_path, stream_dir, expected):
    t = make_table(spark, tmp_path, "oneshot")
    lin = batch_replay(spark, stream_dir, t, salt_buckets=8)
    assert lin["rows_in"] > 0
    assert_state_equal(as_pandas_state(t), expected)


def test_replay_with_inline_compaction(spark, tmp_path):
    """compact_every folds merge-on-read deltas during the replay without
    changing the final state (maintenance interleaved with ingest)."""
    from pipeline_spark.datagen import StreamSpec, generate_epoch, lww_oracle, write_change_stream
    from pipeline_spark.extraction import extract_text_py
    from pipeline_spark.streaming import replay_stream
    from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal

    spec = StreamSpec(n_events=4_000, n_urls=200, n_epochs=4)
    stream = str(tmp_path / "cstream")
    write_change_stream(stream, spec)
    t = LakeTable.create(spark, str(tmp_path / "cpages"), PAGE_SCHEMA, n_buckets=8)
    replay_stream(
        spark, stream, t, checkpoint=str(tmp_path / "cck"),
        max_files_per_trigger=1, compact_every=2,
    )
    kinds = {f["kind"] for f in t.meta()["files"]}
    assert "base" in kinds  # at least one inline compaction folded deltas
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_fence_skipped_batches_never_compact(spark, tmp_path, stream_dir, expected):
    """A replay over already-applied epochs (fresh checkpoint, every batch
    fence-skipped) must fire ZERO compaction jobs — compact_every counts
    committed batches, not deliveries."""
    t = make_table(spark, tmp_path, "nocompact")
    replay_stream(spark, stream_dir, t, checkpoint=str(tmp_path / "n1"), max_files_per_trigger=1)
    compactions_before = sum(1 for r in t.lineage_records() if r.get("action") == "compact")
    v1 = t.current_version()
    c = replay_stream(
        spark, stream_dir, t, checkpoint=str(tmp_path / "n2"),
        max_files_per_trigger=1, compact_every=1,
    )
    assert c["batches"] == 0 and c["batches_skipped"] == SPEC.n_epochs
    compactions_after = sum(1 for r in t.lineage_records() if r.get("action") == "compact")
    assert compactions_after == compactions_before
    assert t.current_version() == v1


def test_replay_row_bound_gates_winner_broadcast(spark, tmp_path, monkeypatch):
    """ADVICE r3+r5: the broadcast fast path must be justified by a ROW
    bound, not a file-count cap (maxFilesPerTrigger bounds files; one fat
    file can blow the broadcast). The bound comes free from parquet
    footers: proven-small batch → True (skips merge's count job); batch
    over the bound, or footers unreadable (remote store) → "auto"."""
    import pipeline_spark.streaming.replay as replay_mod

    src = tmp_path / "src"
    spark.range(0, 10).selectExpr("id", "id AS version").write.parquet(str(src))

    captured = []

    class FakeTable:
        def merge(self, batch_df, **kw):
            captured.append(kw["broadcast_winners"])
            return {"rows_in": batch_df.count()}

        def compact(self):
            raise AssertionError("not expected")

    # footer-proven small (10 rows, even uncapped/whole-backlog) → True
    replay_stream(
        spark, str(src), FakeTable(), str(tmp_path / "ck1"),
        schema_ddl="id bigint, version bigint",
    )
    assert captured == [True]

    # same files, bound forced below the batch's row count → "auto";
    # a maxFilesPerTrigger cap must NOT restore the unconditional True
    captured.clear()
    monkeypatch.setattr(replay_mod, "AUTO_BROADCAST_MAX_WINNERS", 5)
    replay_stream(
        spark, str(src), FakeTable(), str(tmp_path / "ck2"),
        schema_ddl="id bigint, version bigint", max_files_per_trigger=100,
    )
    assert captured and all(bw == "auto" for bw in captured)

    # unreadable footers (e.g. remote object store) → "auto"
    captured.clear()
    monkeypatch.setattr(replay_mod, "AUTO_BROADCAST_MAX_WINNERS", 4_000_000)
    monkeypatch.setattr(replay_mod, "_footer_row_count", lambda files: None)
    replay_stream(
        spark, str(src), FakeTable(), str(tmp_path / "ck3"),
        schema_ddl="id bigint, version bigint",
    )
    assert captured == ["auto"]


def test_row_bound_gate_survives_source_log_compaction(spark, tmp_path):
    """Spark rewrites every compactInterval-th source-log batch as
    <id>.compact (all entries so far, each tagged with its batchId).
    The row-bound gate must still resolve THOSE batches' files — or the
    broadcast fast path silently degrades to the size-gate count job on
    ~10% of micro-batches of any long replay (default interval 10)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import pipeline_spark.streaming.replay as replay_mod

    src = tmp_path / "csrc"
    src.mkdir()
    for i in range(4):
        pq.write_table(pa.table({"id": [i], "version": [i]}), str(src / f"{i}.parquet"))

    captured = []

    class FakeTable:
        def merge(self, batch_df, **kw):
            captured.append(kw["broadcast_winners"])
            return {"rows_in": batch_df.count()}

    ckpt = str(tmp_path / "cck")
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "2")
    try:
        replay_stream(
            spark, str(src), FakeTable(), ckpt,
            schema_ddl="id bigint, version bigint", max_files_per_trigger=1,
            extract="none",
        )
    finally:
        spark.conf.unset("spark.sql.streaming.fileSource.log.compactInterval")

    # interval 2 ⇒ batches 1 and 3 were written as .compact — prove the
    # test exercised the compacted format, then that every batch (plain
    # AND compacted) resolved its single file and kept the fast path
    assert os.path.exists(os.path.join(ckpt, "sources", "0", "1.compact"))
    for b in range(4):
        files = replay_mod._batch_source_files(ckpt, b)
        assert files is not None and len(files) == 1, f"batch {b}: {files}"
    assert captured == [True, True, True, True]


def test_eager_extraction_replay_matches_oracle(spark, tmp_path, stream_dir, expected):
    """extract="eager" (per-event extraction before the merge — the
    transform-dominant bench profile) must land the SAME final state as
    the default winners-only path: extraction is row-invariant, so WHERE
    it runs cannot change LWW outcomes or extracted bytes."""
    t = make_table(spark, tmp_path, "eager")
    c = replay_stream(
        spark, stream_dir, t, checkpoint=str(tmp_path / "ck_eager"),
        max_files_per_trigger=2, extract="eager",
    )
    assert c["batches"] == SPEC.n_epochs // 2
    assert_state_equal(as_pandas_state(t), expected)
