"""Lake-table MERGE correctness vs the pure-Python LWW oracle, plus
schema evolution, compaction, lineage, and commit atomicity."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline_spark.datagen import SPARK_DDL, StreamSpec, generate_epoch, lww_oracle
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.lake.table import CommitConflict

PAGE_SCHEMA = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


def make_table(spark, tmp_path, name="t", buckets=8):
    return LakeTable.create(spark, str(tmp_path / name), PAGE_SCHEMA, key="url", version_col="warc_ts", n_buckets=buckets)


def spark_batch(spark, pdf):
    from pipeline_spark.extraction import with_extracted_text

    df = spark.createDataFrame(pdf[["op", "url", "warc_ts", "html", "lang", "epoch", "offset"]], schema=SPARK_DDL)
    return with_extracted_text(df)


def as_pandas_state(table):
    rows = table.read().select("url", "warc_ts", "html", "text", "lang").collect()
    return (
        pd.DataFrame(
            [(r.url, r.warc_ts, bytes(r.html) if r.html is not None else None, r.text, r.lang) for r in rows],
            columns=["url", "warc_ts", "html", "text", "lang"],
        )
        .sort_values("url")
        .reset_index(drop=True)
    )


def assert_state_equal(got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    assert list(got["url"]) == list(exp["url"])
    for col in ["warc_ts", "html", "text", "lang"]:
        for i, (g, e) in enumerate(zip(got[col], exp[col])):
            if pd.isna(e) and (g is None or pd.isna(g)):
                continue
            assert g == e, f"{col} mismatch at {exp['url'][i]}: {g!r} != {e!r}"


@pytest.fixture(scope="module")
def spec():
    return StreamSpec(n_events=6_000, n_urls=250, n_epochs=3)


def test_merge_matches_oracle_incremental(spark, tmp_path, spec):
    """Epoch-by-epoch merge must converge to the same final state as the
    pure-Python apply — incl. out-of-order, duplicates, deletes, invalids."""
    t = make_table(spark, tmp_path)
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for e, pdf in enumerate(pdfs):
        lin = t.merge(spark_batch(spark, pdf), fence=("s", e))
        assert lin["rows_in"] == len(pdf)
    exp = lww_oracle(pdfs, extract_text_py)
    assert_state_equal(as_pandas_state(t), exp)


def test_merge_order_insensitive(spark, tmp_path, spec):
    """Replaying epochs in reverse order yields the identical final state."""
    t = make_table(spark, tmp_path, "rev")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for pdf in reversed(pdfs):
        t.merge(spark_batch(spark, pdf))
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_salted_merge_same_result(spark, tmp_path, spec):
    t = make_table(spark, tmp_path, "salted")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for pdf in pdfs:
        t.merge(spark_batch(spark, pdf), salt_buckets=8)
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_fence_makes_merge_idempotent(spark, tmp_path, spec):
    t = make_table(spark, tmp_path, "fence")
    pdf = generate_epoch(spec, 0)
    b = spark_batch(spark, pdf)
    assert t.merge(b, fence=("s", 0)) is not None
    v1 = t.current_version()
    assert t.merge(b, fence=("s", 0)) is None  # replayed batch → no-op
    assert t.merge(b, fence=("s", 0)) is None
    assert t.current_version() == v1
    assert_state_equal(as_pandas_state(t), lww_oracle([pdf], extract_text_py))


def test_delete_tombstones_survive_late_updates(spark, tmp_path):
    t = make_table(spark, tmp_path, "tomb")
    rows = pd.DataFrame(
        {
            "op": ["U", "D", "U"],
            "url": ["u1", "u1", "u1"],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:05", "2024-01-01 00:00:03"]),
            "html": [b"<p>a</p>", None, b"<p>late older</p>"],
            "lang": ["en", "en", "en"],
            "epoch": [0, 0, 1],
            "offset": [0, 1, 0],
        }
    )
    t.merge(spark_batch(spark, rows.iloc[:2]))
    assert as_pandas_state(t).empty  # delete won
    t.merge(spark_batch(spark, rows.iloc[2:]))  # older update arrives late
    assert as_pandas_state(t).empty  # tombstone still wins (no resurrection)


def test_lineage_records(spark, tmp_path, spec):
    t = make_table(spark, tmp_path, "lin")
    pdf = generate_epoch(spec, 0)
    t.merge(spark_batch(spark, pdf), fence=("s", 7), extra_lineage={"batch_id": 7})
    recs = t.lineage_records()
    assert len(recs) == 1
    r = recs[0]
    assert r["rows_in"] == len(pdf)
    assert r["batch_id"] == 7
    assert r["snapshot_id"] == t.current_version()
    assert r["start_offset"] == 0
    assert r["rows_discarded"] > 0  # generator injects invalid rows
    assert r["rows_written"] >= 1
    # per-partition (key-bucket) lineage: the breakdown sums to the total
    assert sum(r["bucket_rows"].values()) == r["rows_written"]
    assert len(r["bucket_rows"]) == r["buckets_touched"]


def test_schema_evolution_add_rename_widen(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "evo"),
        PAGE_SCHEMA + [("fetch_status", "int")],
        key="url",
        version_col="warc_ts",
        n_buckets=4,
    )
    base = pd.DataFrame(
        {
            "op": ["U"],
            "url": ["u1"],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:01"]),
            "html": [b"<p>v1</p>"],
            "lang": ["en"],
            "epoch": [0],
            "offset": [0],
        }
    )
    # batch WITHOUT fetch_status (old producer) → null-filled
    t.merge(spark_batch(spark, base))
    assert t.read().collect()[0]["fetch_status"] is None

    # column add mid-stream
    t.add_column("lang2", "string")
    # column rename: old files resolve by field id
    t.rename_column("lang", "language")
    # widen int → long
    t.widen_column("fetch_status", "long")

    df2 = spark_batch(spark, base.assign(url="u2", offset=1)).withColumn(
        "fetch_status", F.lit(200).cast("long")
    ).withColumn("lang2", F.lit("en-US")).withColumnRenamed("lang", "language")
    t.merge(df2)

    got = {r["url"]: r for r in t.read().collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u1"]["language"] == "en"  # pre-rename file, resolved by id
    assert got["u1"]["lang2"] is None
    assert got["u2"]["fetch_status"] == 200
    assert got["u2"]["lang2"] == "en-US"
    assert dict(t.read().dtypes)["fetch_status"] == "bigint"


def test_compaction_reduces_files_preserves_state(spark, tmp_path, spec):
    t = make_table(spark, tmp_path, "compact", buckets=4)
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for pdf in pdfs:
        t.merge(spark_batch(spark, pdf))
    before = as_pandas_state(t)
    t.compact()
    meta = t.meta()
    per_bucket: dict[int, int] = {}
    for f in meta["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(n == 1 for n in per_bucket.values())
    assert_state_equal(as_pandas_state(t), before)


def test_merge_is_o_batch_not_o_table(spark, tmp_path, spec):
    """Merge-on-read invariant: a merge never reads or rewrites existing
    files — each commit only APPENDS delta files, so write amplification is
    O(batch) however large the table grows (the round-1 COW path rewrote
    every touched bucket per batch)."""
    t = make_table(spark, tmp_path, "mor")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    t.merge(spark_batch(spark, pdfs[0]))
    files_v1 = {f["path"]: f for f in t.meta()["files"]}
    assert all(f["kind"] == "delta" for f in files_v1.values())
    t.merge(spark_batch(spark, pdfs[1]))
    files_v2 = {f["path"]: f for f in t.meta()["files"]}
    # every v1 file survives untouched; additions are all deltas
    assert set(files_v1) <= set(files_v2)
    assert all(files_v2[p] == files_v1[p] for p in files_v1)
    assert all(f["kind"] == "delta" for f in files_v2.values())
    # compaction folds deltas into base without changing the state
    before = as_pandas_state(t)
    t.compact()
    assert all(f["kind"] == "base" for f in t.meta()["files"])
    assert_state_equal(as_pandas_state(t), before)
    # and post-compaction merges stay O(batch)
    t.merge(spark_batch(spark, pdfs[2]))
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs[: spec.n_epochs], extract_text_py))


def test_merge_shuffled_winner_join_matches_oracle(spark, tmp_path, spec):
    """broadcast_winners=False (the unbounded-backfill regime: shuffled
    semi-join on the key, AQE free to re-plan) must be value-identical."""
    t = make_table(spark, tmp_path, "nobc")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for pdf in pdfs:
        t.merge(spark_batch(spark, pdf), broadcast_winners=False)
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_scan_resolution_large_delta_regime(spark, tmp_path, spec, monkeypatch):
    """Force the non-broadcast merge-on-read resolve (delta backlog above
    the size gate) — results must be identical to the broadcast regime."""
    t = make_table(spark, tmp_path, "bigdelta")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for pdf in pdfs:
        t.merge(spark_batch(spark, pdf))
    exp = as_pandas_state(t)
    monkeypatch.setattr(LakeTable, "AUTO_BROADCAST_DELTA_ROWS", 0)
    assert_state_equal(as_pandas_state(t), exp)


def test_first_wins_resolution_mode(spark, tmp_path, spec):
    """resolution='first_wins' (insert-only / ON CONFLICT DO NOTHING,
    reference reprocessor.py:77-97): the FIRST arrival per key sticks,
    later updates — even with newer warc_ts — are ignored."""
    t = LakeTable.create(
        spark, str(tmp_path / "fw"), PAGE_SCHEMA, key="url", version_col="warc_ts",
        n_buckets=8, resolution="first_wins",
    )
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    for e, pdf in enumerate(pdfs):
        t.merge(spark_batch(spark, pdf), fence=("s", e))

    # python first-wins oracle: min (epoch, offset) valid event per url
    state = {}
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            if r.url is None or pd.isna(r.warc_ts):
                continue
            k = (r.epoch, r.offset)
            if r.url not in state or k < state[r.url][0]:
                state[r.url] = (k, r.op, r.warc_ts, r.html)
    exp = {u: (ts, html) for u, (k, op, ts, html) in state.items() if op != "D"}
    got = {r["url"]: (r["warc_ts"], bytes(r["html"]) if r["html"] is not None else None)
           for r in t.read().select("url", "warc_ts", "html").collect()}
    assert got.keys() == exp.keys()
    for u in exp:
        assert got[u][0] == pd.Timestamp(exp[u][0]).to_pydatetime() and got[u][1] == exp[u][1], u
    # compaction preserves first-wins state
    before = {u: v for u, v in got.items()}
    t.compact()
    after = {r["url"]: (r["warc_ts"], bytes(r["html"]) if r["html"] is not None else None)
             for r in t.read().select("url", "warc_ts", "html").collect()}
    assert after == before


def test_commit_conflict_detected(spark, tmp_path):
    t = make_table(spark, tmp_path, "conflict")
    meta = t.meta()
    t._commit_files(meta, [], set())  # first committer wins
    with pytest.raises(CommitConflict):
        t._commit_files(meta, [], set())  # same base → conflict


def test_bucket_pruning_scan(spark, tmp_path, spec):
    """A point-lookup style scan must read only the key's bucket files."""
    t = make_table(spark, tmp_path, "prune", buckets=8)
    pdf = generate_epoch(spec, 0)
    t.merge(spark_batch(spark, pdf))
    url = lww_oracle([pdf], extract_text_py)["url"].iloc[0]  # a live (non-deleted) key
    b = t.read().sparkSession.createDataFrame([(url,)], "url string").select(
        t.bucket_expr(F.col("url")).alias("b")
    ).collect()[0]["b"]
    pruned = t.scan(buckets={b})
    assert pruned.filter(F.col("url") == url).count() == 1
    n_files_total = len(t.meta()["files"])
    n_files_bucket = len([f for f in t.meta()["files"] if f["bucket"] == b])
    assert n_files_bucket < n_files_total


def test_time_travel_and_expiry(spark, tmp_path, spec):
    t = make_table(spark, tmp_path, "tt")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    counts = []
    for pdf in pdfs:
        t.merge(spark_batch(spark, pdf))
        counts.append(t.read().count())
    v = t.current_version()
    # time travel: each snapshot's count preserved
    assert t.scan(version=v - 1).count() == counts[-2]
    assert t.scan(version=v - 2).count() == counts[-3]
    # merge-on-read never unreferences files — compaction does; then expiry
    # removes the pre-compaction snapshots and their now-orphaned deltas
    t.compact()
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots_removed"] >= 2 and stats["files_removed"] > 0
    assert t.read().count() == counts[-1]  # current state intact
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        t.meta(v - 1)


def test_changelog_incremental_read(spark, tmp_path, spec):
    """table.changes(since) must equal the oracle diff of final states:
    keys whose winning version changed between the snapshots."""
    t = make_table(spark, tmp_path, "chg")
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    t.merge(spark_batch(spark, pdfs[0]))
    v1 = t.current_version()
    for pdf in pdfs[1:]:
        t.merge(spark_batch(spark, pdf))

    delta = t.changes(v1)
    rows = delta.collect()
    got_keys = {r["url"] for r in rows}
    got_del = {r["url"] for r in rows if r["_change_type"] == "delete"}

    # oracle: winner tuple per url at v1 vs final (tombstones included)
    def winners(ps):
        s = {}
        for pdf in ps:
            for r in pdf.itertuples(index=False):
                if r.url is None or pd.isna(r.warc_ts):
                    continue
                k = (r.warc_ts, r.epoch, r.offset)
                if r.url not in s or k > s[r.url][0]:
                    s[r.url] = (k, r.op)
        return s
    w1, wf = winners(pdfs[:1]), winners(pdfs)
    exp_changed = {u for u, (k, op) in wf.items() if u not in w1 or w1[u][0] != k}
    exp_del = {u for u, (k, op) in wf.items() if u in exp_changed and op == "D"}
    assert got_keys == exp_changed
    assert got_del == exp_del
    # empty delta when nothing changed
    assert t.changes(t.current_version()).count() == 0


def test_rebucket_preserves_state_and_pruning(spark, tmp_path, spec):
    """Growing n_buckets (partition-spec evolution) keeps the state
    identical, subsequent merges route to the new layout, and point
    lookups prune against the new bucket count."""
    t = make_table(spark, tmp_path, "rb", buckets=4)
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    t.merge(spark_batch(spark, pdfs[0]))
    before = as_pandas_state(t)
    r = t.rebucket(16)
    assert r["n_buckets"] == 16 and t.meta()["n_buckets"] == 16
    assert_state_equal(as_pandas_state(t), before)
    assert max(f["bucket"] for f in t.meta()["files"]) > 3  # new layout in use

    # merges after the rebucket land in 16-bucket space and stay correct
    for pdf in pdfs[1:]:
        t.merge(spark_batch(spark, pdf))
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))

    # point lookup prunes with the new bucket expr
    url = lww_oracle(pdfs, extract_text_py)["url"].iloc[0]
    b = spark.createDataFrame([(url,)], "url string").select(
        t.bucket_expr(F.col("url")).alias("b")
    ).collect()[0]["b"]
    assert t.scan(buckets={b}).filter(F.col("url") == url).count() == 1


def test_changes_across_shrinking_rebucket(spark, tmp_path, spec):
    """changes() spanning a rebucket that SHRINKS n_buckets: bucket ids of
    the two snapshots live in different hash spaces, so pruning must be
    skipped — unchanged rows must NOT resurface as phantom upserts."""
    t = make_table(spark, tmp_path, "chgrb", buckets=16)
    pdfs = [generate_epoch(spec, e) for e in range(2)]
    t.merge(spark_batch(spark, pdfs[0]))
    v1 = t.current_version()
    t.rebucket(8)  # shrink: old buckets 8-15 vanish from the new numbering
    t.merge(spark_batch(spark, pdfs[1]))

    rows = t.changes(v1).collect()
    got_keys = {r["url"] for r in rows}
    assert len(rows) == len(got_keys)  # no duplicate emissions

    def winners(ps):
        s = {}
        for pdf in ps:
            for r in pdf.itertuples(index=False):
                if r.url is None or pd.isna(r.warc_ts):
                    continue
                k = (r.warc_ts, r.epoch, r.offset)
                if r.url not in s or k > s[r.url][0]:
                    s[r.url] = (k, r.op)
        return s

    w1, wf = winners(pdfs[:1]), winners(pdfs)
    exp_changed = {u for u, (k, op) in wf.items() if u not in w1 or w1[u][0] != k}
    assert got_keys == exp_changed  # phantom upserts would add extra keys


def test_tombstone_gc_and_no_resurrection(spark, tmp_path):
    """compact(purge_tombstones_before_epoch=E) drops old tombstones; the
    stream fence (already past E) still prevents resurrection on a late
    replay of the delete-era epochs."""
    t = make_table(spark, tmp_path, "gc", buckets=4)
    base = pd.DataFrame(
        {
            "op": ["U", "D", "U"],
            "url": ["u1", "u1", "u2"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:00:01", "2024-01-01 00:00:05", "2024-01-01 00:00:02"]
            ),
            "html": [b"<p>a</p>", None, b"<p>b</p>"],
            "lang": ["en", "en", "en"],
            "epoch": [0, 0, 0],
            "offset": [0, 1, 2],
        }
    )
    t.merge(spark_batch(spark, base), fence=("s", 0))
    hidden = t.scan(with_hidden=True).filter(F.col("_deleted")).collect()
    assert len(hidden) == 1  # tombstone present before GC

    # fence has advanced past epoch 0 → safe to purge epoch-0 tombstones
    t.compact(purge_tombstones_before_epoch=0)
    assert t.scan(with_hidden=True).filter(F.col("_deleted")).count() == 0
    assert list(as_pandas_state(t)["url"]) == ["u2"]

    # late replay of the already-applied batch: fence skips it entirely —
    # the purged tombstone cannot be outraced, u1 stays deleted
    assert t.merge(spark_batch(spark, base), fence=("s", 0)) is None
    assert list(as_pandas_state(t)["url"]) == ["u2"]


def test_tombstone_rows_carry_no_payload(spark, tmp_path):
    """Delete events must be persisted payload-free: a tombstone only needs
    (key, version, hidden cols) to win LWW — html/text/lang are nulled so
    deletes cost ~tens of bytes, not multi-KB, in shuffle and on disk."""
    t = make_table(spark, tmp_path, "slim", buckets=4)
    rows = pd.DataFrame(
        {
            "op": ["U", "D"],
            "url": ["u1", "u1"],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:05"]),
            "html": [b"<p>keep</p>", b"<p>delete payload should vanish</p>"],
            "lang": ["en", "en"],
            "epoch": [0, 0],
            "offset": [0, 1],
        }
    )
    t.merge(spark_batch(spark, rows))
    tomb = t.scan(with_hidden=True).filter(F.col("_deleted")).collect()
    assert len(tomb) == 1
    r = tomb[0]
    assert r["html"] is None and r["text"] is None and r["lang"] is None
    assert r["url"] == "u1"  # key + version survive for LWW
    assert as_pandas_state(t).empty  # delete still wins


def test_legacy_files_with_null_hidden_seq_resolve(spark, tmp_path):
    """A pre-_vc_seq file (hidden column missing → null-filled by the
    explicit read schema) must still LWW-resolve: the winner-tuple filter is
    null-safe and legacy hidden fields coalesce to sentinel 0 — a NULL
    predicate must not silently drop every row of a contested key."""
    import pyarrow.parquet as _pq
    import pyarrow as _pa

    t = make_table(spark, tmp_path, "legacy", buckets=2)
    rows = pd.DataFrame(
        {
            "op": ["U", "U"],
            "url": ["u1", "u1"],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:05"]),
            "html": [b"<p>old</p>", b"<p>new</p>"],
            "lang": ["en", "en"],
            "epoch": [0, 0],
            "offset": [0, 1],
        }
    )
    t.merge(spark_batch(spark, rows.iloc[:1]))
    t.merge(spark_batch(spark, rows.iloc[1:]))  # contested key across files
    # simulate round-1-format files: strip _vc_seq from every data file
    for f in t.meta()["files"]:
        full = os.path.join(t.path, f["path"])
        tab = _pq.read_table(full)
        tab = tab.drop_columns(["_vc_seq"])
        _pq.write_table(tab, full, coerce_timestamps="us", allow_truncated_timestamps=True)
        # drop Hadoop's checksum sidecar — the rewrite invalidated it
        crc = os.path.join(os.path.dirname(full), "." + os.path.basename(full) + ".crc")
        if os.path.exists(crc):
            os.unlink(crc)
    got = t.read().collect()
    assert len(got) == 1 and bytes(got[0]["html"]) == b"<p>new</p>"


def test_remove_orphan_files(spark, tmp_path, spec):
    """Files from a crashed/raced write (on disk, in no manifest) are
    reclaimed after the grace period; referenced files never are."""
    import os
    import time

    from pipeline_spark.datagen import generate_epoch

    t = make_table(spark, tmp_path, "orph", buckets=4)
    t.merge(spark_batch(spark, generate_epoch(spec, 0)))

    # simulate a crashed writer: data files written, commit never published
    df = spark_batch(spark, generate_epoch(spec, 1)).withColumn("_b", t.bucket_expr(F.col("url")))
    from pipeline_spark.lake.table import HIDDEN_DELETED, HIDDEN_EPOCH, HIDDEN_OFFSET, HIDDEN_SEQ

    df = (
        df.withColumn(HIDDEN_DELETED, F.lit(False))
        .withColumn(HIDDEN_EPOCH, F.col("epoch"))
        .withColumn(HIDDEN_OFFSET, F.col("offset"))
        .withColumn(HIDDEN_SEQ, F.lit(0).cast("long"))
        .drop("op", "epoch", "offset")
    )
    orphan_entries = t._write_data(df, t.meta()["schema_version"], kind="delta")
    assert orphan_entries  # files exist on disk...
    n_before = t.read().count()

    # ...but are invisible to scans and young enough to survive cleanup
    assert t.remove_orphan_files(older_than_s=3600)["orphans_removed"] == 0
    # age them past the grace period -> reclaimed
    for e in orphan_entries:
        full = os.path.join(t.path, e["path"])
        os.utime(full, (time.time() - 7200, time.time() - 7200))
    assert t.remove_orphan_files(older_than_s=3600)["orphans_removed"] == len(orphan_entries)
    for e in orphan_entries:
        assert not os.path.exists(os.path.join(t.path, e["path"]))
    # referenced data is untouched and state is unchanged
    assert t.read().count() == n_before


def test_two_writer_merge_conflict_loser_retries_exactly_once(spark, tmp_path):
    """Two writers race a merge commit (reference multi-worker
    no-duplicate assertion, af/fastpath test_functional.py:862-876): the
    loser's commit raises CommitConflict AFTER its data files are written,
    the orphans are cleaned up immediately, and a retry lands the batch —
    both batches exactly once, no stray files. The interleave is forced
    deterministically: writer B commits while writer A sits between its
    snapshot read and its publish (the only window a conflict can occur)."""
    import types

    path = str(tmp_path / "race")
    t1 = LakeTable.create(spark, path, PAGE_SCHEMA, key="url", version_col="warc_ts", n_buckets=4)
    t2 = LakeTable(spark, path)  # second writer, same table
    base_version = t1.current_version()

    def batch(prefix, off0):
        pdf = pd.DataFrame({
            "op": ["U"] * 3,
            "url": [f"{prefix}{i}" for i in range(3)],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:01"] * 3),
            "html": [b"<p>v</p>"] * 3,
            "lang": ["en"] * 3,
            "epoch": [0] * 3,
            "offset": [off0 + i for i in range(3)],
        })
        return spark_batch(spark, pdf)

    orig_write = LakeTable._write_data
    fired = []

    def write_then_lose(self, *a, **kw):
        files = orig_write(self, *a, **kw)
        if not fired:
            fired.append(True)
            t2.merge(batch("b", 100))  # writer B commits first
        return files

    t1._write_data = types.MethodType(write_then_lose, t1)

    with pytest.raises(CommitConflict):
        t1.merge(batch("a", 0))

    # loser's files were unlinked on conflict: everything on disk is
    # referenced by the current snapshot
    meta = t1.meta()
    referenced = {os.path.normpath(f["path"]) for f in meta["files"]}
    on_disk = {
        os.path.normpath(os.path.relpath(os.path.join(dp, fn), path))
        for dp, _, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet")
    }
    assert on_disk == referenced, f"orphans: {on_disk - referenced}"

    t1.merge(batch("a", 0))  # retry on a fresh snapshot

    urls = [r["url"] for r in t1.read().select("url").collect()]
    assert sorted(urls) == ["a0", "a1", "a2", "b0", "b1", "b2"]  # exactly once each
    assert t1.current_version() == base_version + 2  # one commit per batch


def test_verify_integrity_detects_damage(spark, tmp_path, spec):
    """fsck: clean table passes with a full report; a deleted data file
    and a manifest row-count lie are both detected and raised."""
    import json as _json

    from pipeline_spark.lake.table import TableCorruption

    t = make_table(spark, tmp_path, "fsck")
    t.merge(spark_batch(spark, generate_epoch(spec, 0)))
    rep = t.verify_integrity()
    assert rep["files_checked"] > 0 and not rep["missing_files"] and not rep["row_count_mismatches"]

    # damage 1: delete a referenced data file
    victim = t.meta()["files"][0]["path"]
    os.unlink(os.path.join(t.path, victim))
    with pytest.raises(TableCorruption, match="missing"):
        t.verify_integrity()

    # repair by recreating the manifest lie instead: fresh table, corrupt rows
    t2 = make_table(spark, tmp_path, "fsck2")
    t2.merge(spark_batch(spark, generate_epoch(spec, 0)))
    mp = t2._meta_path(t2.current_version())
    m = _json.load(open(mp))
    m["files"][0]["rows"] += 7
    _json.dump(m, open(mp, "w"))
    t2._meta_cache = None
    with pytest.raises(TableCorruption, match="mismatch"):
        t2.verify_integrity()
