"""Manifest column bounds + file skipping (Iceberg-style data skipping):
footer min/max lifted into the snapshot at write time, scan(range_filter=)
prunes provably-out-of-range files before Spark ever plans them —
merge-on-read-safe (delta-bearing buckets only prune whole-bucket)."""

import datetime

from pipeline_spark.datagen import StreamSpec, generate_epoch
from pipeline_spark.lake import LakeTable
from pipeline_spark.lake.table import _stat_key
from tests.test_lake_merge import PAGE_SCHEMA, spark_batch


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_stats_recorded_in_manifest(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), PAGE_SCHEMA, n_buckets=4)
    spec = StreamSpec(n_events=400, n_urls=60, n_epochs=1)
    t.merge(spark_batch(spark, generate_epoch(spec, 0)))
    files = t.meta()["files"]
    assert files
    for f in files:
        st = f.get("stats", {})
        assert "url" in st and "warc_ts" in st, f
        assert st["url"][0] <= st["url"][1]
        assert st["warc_ts"][0] <= st["warc_ts"][1]


def test_prune_by_stats_unit():
    """Pure manifest-level pruning logic (no Spark)."""
    mk = lambda b, kind, lo, hi: {
        "bucket": b,
        "kind": kind,
        "stats": {"warc_ts": [lo, hi]},
        "path": f"{b}-{kind}-{lo}",
    }
    files = [
        mk(0, "base", "2026-01-01T00:00:00.000000", "2026-01-02T00:00:00.000000"),
        mk(0, "base", "2026-02-01T00:00:00.000000", "2026-02-02T00:00:00.000000"),
        mk(1, "base", "2026-01-01T00:00:00.000000", "2026-01-02T00:00:00.000000"),
        mk(1, "delta", "2026-02-01T00:00:00.000000", "2026-02-02T00:00:00.000000"),
        mk(2, "base", "2026-01-01T00:00:00.000000", "2026-01-02T00:00:00.000000"),
        mk(2, "delta", "2026-01-03T00:00:00.000000", "2026-01-04T00:00:00.000000"),
    ]
    rf = {"warc_ts": (_ts("2026-02-01T00:00:00"), None)}
    kept = LakeTable._prune_by_stats(files, rf)
    paths = {f["path"] for f in kept}
    # bucket 0: delta-free -> per-file prune keeps only the Feb file
    assert "0-base-2026-02-01T00:00:00.000000" in paths
    assert "0-base-2026-01-01T00:00:00.000000" not in paths
    # bucket 1: has a delta overlapping the range -> ALL files kept
    assert sum(1 for p in paths if p.startswith("1-")) == 2
    # bucket 2: every file out of range -> whole bucket pruned
    assert not any(p.startswith("2-") for p in paths)


def test_range_filter_scan_matches_full_filter(spark, tmp_path):
    """Sort-order compaction makes warc_ts file bounds tight, so a
    time-slice scan both prunes files AND returns exactly the filtered
    rows. (Key-hash bucketing destroys url locality, so url range filters
    stay correct but prune via buckets, not stats — also asserted.)"""
    t = LakeTable.create(spark, str(tmp_path / "t2"), PAGE_SCHEMA, n_buckets=4)
    spec = StreamSpec(n_events=1_200, n_urls=150, n_epochs=3)
    for e in range(3):
        t.merge(spark_batch(spark, generate_epoch(spec, e)))
    t.compact(sort_by="warc_ts", rows_per_file=20)

    files = t.meta()["files"]
    assert all(f.get("kind", "base") == "base" for f in files)
    assert len(files) > 4  # rows_per_file split into several files/bucket

    full = t.read().toPandas().sort_values("url").reset_index(drop=True)
    lo = full["warc_ts"].quantile(0.3)
    hi = full["warc_ts"].quantile(0.7)
    expect = (
        full[(full["warc_ts"] >= lo) & (full["warc_ts"] <= hi)]
        .sort_values("url")
        .reset_index(drop=True)
    )

    rf = {"warc_ts": (lo.to_pydatetime(), hi.to_pydatetime())}
    got = t.scan(range_filter=rf).toPandas().sort_values("url").reset_index(drop=True)
    assert got.equals(expect)
    # the sorted layout made file skipping real: a 40% time slice plans
    # strictly fewer files than the table holds
    assert len(t._prune_by_stats(files, rf)) < len(files)

    # url point-slice stays value-correct (pruning there is the bucket's job)
    some_url = full["url"].iloc[len(full) // 2]
    got_u = t.scan(range_filter={"url": (some_url, some_url)}).toPandas()
    assert len(got_u) == 1 and got_u["url"].iloc[0] == some_url


def test_range_filter_mor_safety_stale_delta_in_range(spark, tmp_path):
    """The case naive per-file pruning gets wrong: the WINNER (base row)
    is outside the filter range while a stale delta row is inside it.
    Pruning the base file would resurface the stale row; the bucket-aware
    rule must keep the base file and return nothing."""
    import pandas as pd

    t = LakeTable.create(spark, str(tmp_path / "t3"), PAGE_SCHEMA, n_buckets=2)

    def batch(ts, epoch, offset):
        return pd.DataFrame(
            {
                "op": ["U"],
                "url": ["https://example.com/x"],
                "warc_ts": [pd.Timestamp(ts)],
                "html": [b"<p>v</p>"],
                "lang": ["en"],
                "epoch": [epoch],
                "offset": [offset],
            }
        )

    # newer version lands first and is compacted into the BASE
    t.merge(spark_batch(spark, batch("2026-06-09 12:00:00", 0, 0)))
    t.compact()
    # stale late event arrives as a DELTA (loses LWW)
    t.merge(spark_batch(spark, batch("2026-06-01 12:00:00", 1, 0)))

    kinds = {f.get("kind", "base") for f in t.meta()["files"]}
    assert kinds == {"base", "delta"}

    rf = {"warc_ts": (_ts("2026-06-01T00:00:00"), _ts("2026-06-02T00:00:00"))}
    # true state: the one row's warc_ts is Jun 9 -> outside the range
    assert t.scan(range_filter=rf).count() == 0
    # and without the filter the winner is still Jun 9
    row = t.read().collect()[0]
    assert row["warc_ts"] == _ts("2026-06-09T12:00:00")


def test_stat_key_orders_timestamps():
    a = _stat_key(_ts("2026-06-01T00:00:00.000001"))
    b = _stat_key(_ts("2026-06-01T00:00:00.000002"))
    assert a < b and len(a) == len(b)


def test_prune_by_stats_properties():
    """Invariants over random manifests: (1) kept ⊆ files; (2) a file
    holding an in-range value is NEVER pruned; (3) in a delta-bearing
    bucket pruning is all-or-nothing; (4) no-stats files are never
    pruned in delta-free buckets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    file_st = st.fixed_dictionaries(
        {
            "bucket": st.integers(0, 3),
            "kind": st.sampled_from(["base", "delta"]),
            "stats": st.one_of(
                st.just({}),
                st.tuples(st.integers(0, 100), st.integers(0, 100)).map(
                    lambda t: {"v": [min(t), max(t)]}
                ),
            ),
        }
    )

    @given(
        st.lists(file_st, max_size=24),
        st.integers(0, 100),
        st.integers(0, 100),
    )
    @settings(max_examples=300, deadline=None)
    def check(files, a, b):
        for i, f in enumerate(files):
            f["path"] = str(i)
        lo, hi = min(a, b), max(a, b)
        kept = LakeTable._prune_by_stats(files, {"v": (lo, hi)})
        kept_paths = {f["path"] for f in kept}
        assert kept_paths <= {f["path"] for f in files}
        by_bucket = {}
        for f in files:
            by_bucket.setdefault(f["bucket"], []).append(f)
        for bkt, fs in by_bucket.items():
            has_delta = any(f["kind"] != "base" for f in fs)
            in_bucket_kept = [f for f in fs if f["path"] in kept_paths]
            for f in fs:
                stats = f.get("stats", {}).get("v")
                overlaps = stats is None or not (stats[1] < lo or stats[0] > hi)
                if overlaps:
                    # an overlapping (or unknown-bounds) file is only ever
                    # dropped if its WHOLE bucket was proven out of range —
                    # impossible when it itself overlaps
                    assert f["path"] in kept_paths, (f, lo, hi)
            if has_delta:
                assert len(in_bucket_kept) in (0, len(fs))  # all-or-nothing

    check()
