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


def test_lww_semi_join_regimes_plan(spark):
    """Size-gate both winner-join regimes: broadcast_winners=True must plan
    a broadcast semi-join; False must NOT place a broadcast hint (the
    shuffled path — AQE may still convert at runtime if it measures small,
    which is exactly the desired behavior on a cluster)."""
    from pipeline_spark.operators.lww import lww_latest_semi

    df = spark.range(0, 1000).selectExpr("CAST(id % 50 AS STRING) AS k", "id AS v", "id AS o")
    # kill the stats-based auto-broadcast so the assertion isolates the HINT
    # (on real data Catalyst can't see the winner side is small statically)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bc = _plan(lww_latest_semi(df, key="k", order_cols=["v", "o"], broadcast_winners=True))
        assert "BroadcastHashJoin" in bc and "LeftSemi" in bc.replace("\n", " ")
        sh = _plan(lww_latest_semi(df, key="k", order_cols=["v", "o"], broadcast_winners=False))
        assert "BroadcastHashJoin" not in sh  # initial plan: shuffled semi-join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mor_scan_resolution_plan(spark, tmp_path):
    """Merge-on-read scan: small delta backlog → winner tuples broadcast
    (payload filtered in place, never shuffled); large backlog (gate forced
    to 0) → no broadcast hint in the initial plan."""
    from pipeline_spark.datagen import StreamSpec, generate_epoch
    from pipeline_spark.lake import LakeTable
    from tests.test_lake_merge import PAGE_SCHEMA, spark_batch

    t = LakeTable.create(spark, str(tmp_path / "morplan"), PAGE_SCHEMA, n_buckets=8)
    for e in range(2):
        t.merge(spark_batch(spark, generate_epoch(StreamSpec(n_events=2000, n_urls=200, n_epochs=2), e)))
    plan = _plan(t.read())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # the resolve aggregation must be narrow: no payload in the agg section
    agg_section = plan.split("HashAggregate")[1][:500] if "HashAggregate" in plan else ""
    assert "html" not in agg_section, "payload column leaked into the MOR resolve aggregation"
    old = LakeTable.AUTO_BROADCAST_DELTA_ROWS
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        LakeTable.AUTO_BROADCAST_DELTA_ROWS = 0
        # kill stats-based auto-broadcast: isolate that no HINT is placed
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_big = _plan(t.read())
        assert "BroadcastHashJoin" not in plan_big
    finally:
        LakeTable.AUTO_BROADCAST_DELTA_ROWS = old
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_near_dup_lsh_no_nested_loop(spark, sf_dir):
    """The scale near-dup path must candidate-generate with an EQUI-join on
    (table, bucket) — never a nested-loop / cartesian product."""
    plan = _plan(entry_mod.queries()["embedding_near_dup_lsh"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_global_is_take_ordered(spark, sf_dir):
    """Global weighted sample must plan TakeOrderedAndProject (per-partition
    local top-k), not a single-partition window sort."""
    plan = _plan(entry_mod.queries()["weighted_sample_deterministic"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


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


def test_similarity_plans_build_lazily(spark, sf_dir, monkeypatch):
    """Building the similarity query plans must not collect anything to the
    driver — no first()/collect()/toPandas() for dim inference on the hot
    path (dim is threaded as a parameter)."""
    from pyspark.sql import DataFrame

    def _banned(self, *a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("driver-side materialization during plan building")

    monkeypatch.setattr(DataFrame, "first", _banned)
    monkeypatch.setattr(DataFrame, "collect", _banned)
    monkeypatch.setattr(DataFrame, "toPandas", _banned)
    for name in ("embedding_ann_lsh", "embedding_near_dup_lsh", "embedding_topk_bruteforce"):
        df = entry_mod.queries()[name](spark, sf_dir)
        _ = df.columns  # force analysis, not execution


def test_range_filter_scan_pushes_row_predicate(spark, tmp_path):
    """scan(range_filter=) must do BOTH prunings: manifest-level file
    skipping (fewer files planned) AND parquet-level predicate pushdown
    on the surviving files (PushedFilters carries the bounds)."""
    from pipeline_spark.datagen import StreamSpec, generate_epoch
    from pipeline_spark.lake import LakeTable
    from tests.test_lake_merge import PAGE_SCHEMA, spark_batch

    t = LakeTable.create(spark, str(tmp_path / "pg"), PAGE_SCHEMA, n_buckets=4)
    spec = StreamSpec(n_events=800, n_urls=100, n_epochs=2)
    for e in range(2):
        t.merge(spark_batch(spark, generate_epoch(spec, e)))
    t.compact(sort_by="warc_ts", rows_per_file=50)

    import datetime

    lo = datetime.datetime(2024, 1, 1)
    df = t.scan(range_filter={"warc_ts": (lo, None)})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert "warc_ts" in pushed and "GreaterThanOrEqual" in pushed
    assert "BatchEvalPython" not in plan


def test_lsh_tables_single_corpus_scan(spark, sf_dir):
    """Multi-table LSH must compute every table's bucket key in ONE pass
    over the corpus (explode) — a union of per-table selects scans the
    input n_tables times, the difference between 1x and 8x input I/O at
    100 TB. Gate: the near-dup plan reads embeddings.parquet at most
    twice (the two self-join sides), and the ANN top-k plan at most
    twice (corpus side + query side)."""
    from pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    plan = _plan(S.embedding_near_dup_pairs(emb, threshold=0.3, n_planes=4, n_tables=8, dim=64))
    assert plan.count("embeddings.parquet") <= 2, plan.count("embeddings.parquet")

    qs = emb.filter(F.col("vec_id") < 10)
    plan2 = _plan(S.lsh_ann_topk(emb, qs, k=5, n_planes=4, n_tables=4, dim=64))
    assert plan2.count("embeddings.parquet") <= 2, plan2.count("embeddings.parquet")


def test_partition_layout_prune_uses_partition_filters(spark, sf_dir):
    """S2 as a directory layout: filters on cc/test must land in the
    scan's PartitionFilters (resolved against directory names at planning
    time — non-matching partitions never listed or opened), NOT as
    post-scan data filters or parquet PushedFilters."""
    df = entry_mod.queries()["partition_layout_prune"](spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters")[1][:400]
    assert "cc" in part_section and "C1" in part_section, part_section
    assert "test" in part_section, part_section
    # the partition columns are virtual — they must not appear as parquet
    # row-group predicates or in the read schema
    pushed = plan.split("PushedFilters")[1][:200] if "PushedFilters" in plan else ""
    assert "cc" not in pushed, pushed
    read_schema = plan.split("ReadSchema")[1][:300] if "ReadSchema" in plan else ""
    assert "cc" not in read_schema and "test" not in read_schema, read_schema


def test_minhash_pair_generation_equi_join_only(spark, sf_dir):
    """MinHash-LSH candidate generation must join on (band, band-sig) —
    an equi-join Catalyst can hash/sort-merge — never a nested loop."""
    from pyspark.sql import functions as F
    from pipeline_spark.operators import dedup as D

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 100)
    plan = _plan(D.minhash_dedup_pairs(d, threshold=0.6, bands=8, rows=4, n=1))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_plan_stays_narrow(spark, sf_dir):
    """r6 shape gate: shingling/signatures/sizes are per-row array
    expressions, so the full MinHash+LSH pipeline reads the corpus at
    most 4× (bucket self-join sides + two verify sides) with no
    shingle-explode groupBy — the old shape was 7 scans / 26 Exchanges
    and its sf-invariant plan+codegen cost dominated the bench query."""
    plan = _plan(entry_mod.queries()["minhash_lsh_pairs"](spark, sf_dir))
    assert plan.count("Location: InMemoryFileIndex") <= 4, plan.count("Location: InMemoryFileIndex")
    assert plan.count("Exchange hashpartitioning") <= 2, plan.count("Exchange hashpartitioning")


def test_simhash_single_udf_eval_per_side(spark, sf_dir):
    """r6 gates: (a) one posexploded band relation — the per-band
    self-join union re-ran the whole upstream once per band per side;
    (b) the expensive simhash UDF is marked non-deterministic so the
    join's inferred isnotnull filter cannot clone it (guide §4.4 —
    unmarked, the plan held 4 ArrowEvalPython nodes instead of 2)."""
    plan = _plan(entry_mod.queries()["simhash_near_dups"](spark, sf_dir))
    assert plan.count("ArrowEvalPython") <= 2, plan.count("ArrowEvalPython")
    assert plan.count("Location: InMemoryFileIndex") <= 2
