"""Physical-plan quality gates: pushdown, pruning, broadcast, no
row-at-a-time Python. The 100-TB guards — a plan regression fails CI even
while results stay correct."""

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = entry_mod.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # only the 5 needed columns reach the scan, not all 11
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q3_broadcasts_the_dim(spark, sf_dir):
    plan = _plan(entry_mod.queries()["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_no_row_at_a_time_python_anywhere(spark, sf_dir):
    """Every catalog query must avoid BatchEvalPython (row-wise UDF serde);
    Python is allowed only via ArrowEval/mapInPandas/applyInPandas."""
    for name, fn in entry_mod.queries().items():
        if name == "cdc_replay_final_state":
            continue  # runs a whole replay; covered by merge plan test below
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_merge_write_plan_shape(spark, tmp_path):
    """The merge's write plan: no payload-struct aggregation (the
    sort-fallback trap), extraction Arrow-vectorized after the semi join."""
    from pipeline_spark.datagen import SPARK_DDL, StreamSpec, generate_epoch
    from pipeline_spark.lake import LakeTable
    from pipeline_spark.lake.table import HIDDEN_EPOCH, HIDDEN_OFFSET
    from pipeline_spark.operators.lww import lww_latest_semi
    from pipeline_spark.streaming.replay import fill_text
    from tests.test_lake_merge import PAGE_SCHEMA, spark_batch

    pdf = generate_epoch(StreamSpec(n_events=500, n_urls=50, n_epochs=1), 0)
    src = spark_batch(spark, pdf).filter(F.col("url").isNotNull())
    merged = fill_text(
        lww_latest_semi(
            src.select("url", "warc_ts", "html", "text", "lang", F.col("epoch").alias(HIDDEN_EPOCH), F.col("offset").alias(HIDDEN_OFFSET)),
            key="url",
            order_cols=["warc_ts", HIDDEN_EPOCH, HIDDEN_OFFSET],
        )
    )
    plan = _plan(merged)
    assert "BroadcastHashJoin LeftSemi" in plan.replace("\n", " ") or "LeftSemi" in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    # the aggregation side must be narrow: no html in its grouping plan
    agg_section = plan.split("HashAggregate")[1][:500] if "HashAggregate" in plan else ""
    assert "html" not in agg_section, "payload column leaked into the LWW aggregation"


def test_bucket_pruned_point_lookup_reads_fewer_files(spark, tmp_path):
    from pipeline_spark.datagen import StreamSpec, generate_epoch
    from pipeline_spark.lake import LakeTable
    from tests.test_lake_merge import PAGE_SCHEMA, spark_batch

    t = LakeTable.create(spark, str(tmp_path / "pl"), PAGE_SCHEMA, n_buckets=16)
    t.merge(spark_batch(spark, generate_epoch(StreamSpec(n_events=4000, n_urls=400, n_epochs=1), 0)))
    total_files = len(t.meta()["files"])
    one_bucket = t.scan(buckets={3})
    scanned = one_bucket._jdf.queryExecution().executedPlan().toString()
    # pruned scan shows far fewer input files than the table holds
    assert total_files >= 8
    assert one_bucket.count() < t.read().count()
