"""K4 deterministic bundled export (byte-identical re-export, round trip)
and K6 atomic dimension swap (validation bounds, pointer semantics)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pipeline_spark.lake.dims import DimSwap, DimValidationError
from pipeline_spark.operators.export import export_bundles


def test_export_is_byte_identical_across_runs(spark, tmp_path, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang", "n_chars")
    m1 = export_bundles(d, str(tmp_path / "run1"), sort_cols=["doc_id"], rows_per_bundle=100)
    m2 = export_bundles(d, str(tmp_path / "run2"), sort_cols=["doc_id"], rows_per_bundle=100)
    names1 = [(b["bundle"], b["name"], b["sha256"]) for b in m1["bundles"]]
    names2 = [(b["bundle"], b["name"], b["sha256"]) for b in m2["bundles"]]
    assert names1 == names2 and m1["n_bundles"] > 1
    for b in m1["bundles"]:
        b1 = open(tmp_path / "run1" / b["name"], "rb").read()
        b2 = open(tmp_path / "run2" / b["name"], "rb").read()
        assert b1 == b2 and b1  # byte-identical bundles
    # round trip: every row comes back exactly once
    total = sum(b["rows"] for b in m1["bundles"])
    assert total == d.count()
    rows = []
    for b in m1["bundles"]:
        with open(tmp_path / "run1" / b["name"]) as f:
            rows += [json.loads(ln) for ln in f]
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in d.collect())


def test_export_manifest_written(spark, tmp_path):
    df = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    m = export_bundles(df, str(tmp_path / "exp"), sort_cols=["k"], n_bundles=4)
    on_disk = json.load(open(tmp_path / "exp" / "manifest.json"))
    assert on_disk["bundles"] == m["bundles"]
    files = {fn for fn in os.listdir(tmp_path / "exp") if fn.endswith(".jsonl")}
    assert files == {b["name"] for b in m["bundles"]} and len(files) == 4


def test_dim_swap_publish_validate_swap(spark, tmp_path):
    dim = DimSwap(spark, str(tmp_path / "dim"))
    with pytest.raises(FileNotFoundError):
        dim.current()
    r1 = dim.publish(spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS name"))
    assert r1["version"] == 1 and dim.current().count() == 100

    # valid refresh swaps atomically
    r2 = dim.publish(spark.range(0, 150).selectExpr("id", "CAST(id AS STRING) AS name"))
    assert r2["version"] == 2 and dim.current_version() == 2
    assert dim.current().count() == 150

    # wild row-count swing → rejected, current untouched
    with pytest.raises(DimValidationError):
        dim.publish(spark.range(0, 2).selectExpr("id", "CAST(id AS STRING) AS name"))
    assert dim.current_version() == 2 and dim.current().count() == 150

    # empty dim rejected by min_rows
    with pytest.raises(DimValidationError):
        dim.publish(spark.range(0, 0).selectExpr("id", "CAST(id AS STRING) AS name"))
    assert dim.current_version() == 2


def test_backup_restore_incremental(spark, tmp_path):
    """K9: base + incremental backup; restore reproduces the live state."""
    from pipeline_spark.datagen import StreamSpec, generate_epoch
    from pipeline_spark.lake.backup import backup_table, list_backups, restore_table
    from tests.test_lake_merge import as_pandas_state, assert_state_equal, make_table, spark_batch

    spec = StreamSpec(n_events=3_000, n_urls=150, n_epochs=2)
    t = make_table(spark, tmp_path, "bk")
    t.merge(spark_batch(spark, generate_epoch(spec, 0)))
    tgt = str(tmp_path / "backups")
    r1 = backup_table(t, tgt)
    assert r1["files_copied"] == r1["files_total"] > 0

    t.merge(spark_batch(spark, generate_epoch(spec, 1)))
    r2 = backup_table(t, tgt)
    # incremental: files from the first backup are not copied again
    assert 0 < r2["files_copied"] < r2["files_total"]
    assert list_backups(tgt) == [r1["version"], r2["version"]]

    restored = restore_table(spark, tgt, str(tmp_path / "restored"))
    assert_state_equal(as_pandas_state(restored), as_pandas_state(t))
    # restoring the OLDER snapshot gives the older state
    old = restore_table(spark, tgt, str(tmp_path / "restored_v1"), version=r1["version"])
    assert old.current_version() == r1["version"]


def test_dim_swap_relative_path_publish(spark, tmp_path):
    """publish() must store an ABSOLUTE symlink target: with a relative
    table path, a relative target would resolve against the link's own
    directory and point at a non-existent doubled path."""
    rel = os.path.relpath(str(tmp_path / "reldim"), os.getcwd())
    dim = DimSwap(spark, rel)
    dim.publish(spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS name"))
    assert dim.current().count() == 50  # current() resolves through realpath
