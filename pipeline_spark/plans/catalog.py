"""Query catalog — every implemented operator exposed as a named query over
the driver test tables, paired with a DuckDB oracle (SURVEY.md §2 mapping).

Conventions that make the value-hash compare deterministic:
* every computed column is aliased identically in Spark and SQL;
* double aggregates are ``round(x, N)`` on both sides;
* DuckDB integer sums are cast to BIGINT (DuckDB sums to HUGEINT);
* top-k queries order by (metric, id) so ties cannot reorder between
  engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pipeline_spark.operators import dedup as D
from pipeline_spark.operators import similarity as S
from pipeline_spark.operators import text as X
from pipeline_spark.operators.lww import dedup_first_wins, lww_latest


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_n(sf_dir: str) -> int:
    """max(event_id)+1 for the events table, from parquet footer COLUMN
    STATISTICS — zero Spark jobs, replacing the per-query
    ``agg(max).collect()`` driver hop (round-5 cleanup: no .collect() in
    catalog query bodies). Reading the stats max (not the row count)
    keeps the chunk split correct even if event_id ever has gaps; the
    row-count sum is only the fallback for a stats-less writer, where the
    dense-0..n-1 testdata contract still holds."""
    import glob
    import os

    import pyarrow.parquet as pq

    p = os.path.join(sf_dir, "events.parquet")
    files = [p] if os.path.isfile(p) else sorted(glob.glob(os.path.join(p, "*.parquet")))
    max_id, rows = None, 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get("event_id")
        if idx is None:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                max_id = None
                break
            max_id = st.max if max_id is None else max(max_id, st.max)
        else:
            continue
        break
    return rows if max_id is None else int(max_id) + 1


_WORK_DIRS: list[str] = []


def _workdir(prefix: str) -> str:
    """mkdtemp with process-exit cleanup: catalog queries return LAZY
    DataFrames that still read from the work dir when the driver collects,
    so the dir can't be removed inside the query body — register an atexit
    sweep instead (round-5 ADVICE: the streaming queries leaked the most
    data per invocation)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _WORK_DIRS:
        atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True) for p in _WORK_DIRS])
    _WORK_DIRS.append(d)
    return d


QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, oracle: str | None):
    def reg(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return reg

_K = "CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)"


def _k_col():
    return F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")


# =====================================================================
# Relational core (SURVEY §2.5 joins, §2.6 aggregations, §2.8 set ops)
# =====================================================================

@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "q3_shipping_priority",
    """
    SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3(spark, sf):
    cutoff = "1997-06-01"
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@q(
    "q5_supplier_volume_by_nation",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q5(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@q(
    "q6_filtered_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
    """,
)
def q6(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@q(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join(spark, sf):
    # O4: WHERE NOT EXISTS → left_anti (reference 006-reingestion.install.sql:24-31)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "semi_join_active_segments",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_active
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@q(
    "union_dedup_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def union_dedup(spark, sf):
    # O3: SQL UNION semantics = union + dropDuplicates (reference detector.py:111)
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.union(b).dropDuplicates()


@q(
    "coalesce_override_join",
    """
    SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
)
def coalesce_join(spark, sf):
    # J5: COALESCE(label.x, m.x, default) manual-override pattern
    e = _t(spark, sf, "events")
    c = _t(spark, sf, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@q(
    "union_heterogeneous_sources",
    """
    SELECT src, CAST(count(*) AS BIGINT) AS n, min(t) AS min_t FROM (
      SELECT 'orders' AS src, o_orderkey AS id, o_orderdate AS t FROM orders
      UNION ALL
      SELECT 'events' AS src, event_id AS id, ts AS t FROM events
    ) GROUP BY src
    """,
)
def union_hetero(spark, sf):
    # J4: UNION of differently-shaped sources after projection alignment
    o = _t(spark, sf, "orders").select(
        F.lit("orders").alias("src"), F.col("o_orderkey").alias("id"), F.col("o_orderdate").alias("t")
    )
    e = _t(spark, sf, "events").select(
        F.lit("events").alias("src"), F.col("event_id").alias("id"), F.col("ts").alias("t")
    )
    return o.unionByName(e).groupBy("src").agg(F.count(F.lit(1)).alias("n"), F.min("t").alias("min_t"))


# =====================================================================
# Aggregation family (A1-A4, rollup hierarchy, windows W4/W6)
# =====================================================================

@q(
    "counters_rollup",
    """
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def counters_rollup(spark, sf):
    # A1: conditional-sum roll-up (reference 017-ooexpl_wc_input_counts.install.sql:5-24)
    e = _t(spark, sf, "events")
    return e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@q(
    "two_level_distinct_agg",
    """
    SELECT day, CAST(sum(CASE WHEN any_high THEN 1 ELSE 0 END) AS BIGINT) AS n_users_high,
           CAST(count(*) AS BIGINT) AS n_users
    FROM (
      SELECT CAST(ts AS DATE) AS day, user_id, max(value > 90) AS any_high
      FROM events GROUP BY 1, 2
    ) GROUP BY day
    """,
)
def two_level(spark, sf):
    # A2: inner per-(day,user) bool_or, outer per-day conditional sum
    e = _t(spark, sf, "events")
    inner = e.groupBy(F.to_date("ts").alias("day"), "user_id").agg(
        F.max(F.col("value") > 90).alias("any_high")
    )
    return inner.groupBy("day").agg(
        F.sum(F.when(F.col("any_high"), 1).otherwise(0)).alias("n_users_high"),
        F.count(F.lit(1)).alias("n_users"),
    )


@q(
    "global_stats",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           min(CAST(ts AS DATE)) AS first_day, max(CAST(ts AS DATE)) AS last_day
    FROM events
    """,
)
def global_stats(spark, sf):
    # A3: global matview-style summary (reference database_upgrade_schema.py:124-192)
    e = _t(spark, sf, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )


@q(
    "rollup_hierarchy",
    """
    SELECT event_type, user_id % 10 AS user_bucket,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY ROLLUP(event_type, user_id % 10)
    """,
)
def rollup_hier(spark, sf):
    # the reference's manual counters/counters_asn_noinput/counters_noinput
    # hierarchy (database_upgrade_schema.py:85-122) in ONE rollup pass
    e = _t(spark, sf, "events").withColumn("user_bucket", F.col("user_id") % 10)
    return e.rollup("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@q(
    "topk_per_group",
    """
    SELECT event_type, event_id, value FROM events
    QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) <= 3
    """,
)
def topk(spark, sf):
    # W4: top-K recent feed analog (reference detector.py:637,683)
    e = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@q(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS running_value
    FROM events
    """,
)
def running_sum(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return e.select("event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running_value"))


@q(
    "sessionize",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events)
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id
    """,
)
def sessionize(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp_ltz").cast("long")  # NTZ→epoch (session TZ pinned UTC)
    gap = secs - F.lag(secs).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


@q(
    "late_shipment_flags",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def late_flags(spark, sf):
    # P17 analog: interval arithmetic + flagging (reference core.py:1541-1559)
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month")).agg(
        F.sum(
            F.when(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1).otherwise(0)
        ).alias("n_late"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# =====================================================================
# CDC semantics as queries (A8/A9) + scalar transforms (P-family)
# =====================================================================

@q(
    "cdc_lww_state",
    """
    SELECT user_id, ts AS last_ts, event_type AS last_type, round(value, 2) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def cdc_lww(spark, sf):
    # A9 — the engine's central LWW operator applied to the events stream
    e = _t(spark, sf, "events").select("user_id", "ts", "event_type", "value", "event_id")
    latest = lww_latest(e, key="user_id", order_cols=["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
    )


@q(
    "dedup_first_wins",
    """
    SELECT user_id, ts AS first_ts, event_type AS first_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) = 1
    """,
)
def first_wins(spark, sf):
    # A8 — seen_uids first-wins dedup (reference reprocessor.py:287-298)
    e = _t(spark, sf, "events").select("user_id", "ts", "event_type", "event_id")
    first = dedup_first_wins(e, key="user_id", order_cols=["ts", "event_id"])
    return first.select("user_id", F.col("ts").alias("first_ts"), F.col("event_type").alias("first_type"))


@q(
    "json_props_extract",
    """
    SELECT event_type,
           round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 4) AS avg_k,
           CAST(max(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props(spark, sf):
    # P1 analog: semi-structured payload field extraction
    e = _t(spark, sf, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.max(k).alias("max_k")
    )


@q(
    "domain_extract",
    """
    SELECT regexp_extract('https://' || source || '.example.com/d/' || doc_id,
                          '^[a-z]+://([^/]+)', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
)
def domain_extract(spark, sf):
    # P5: urlparse(input).netloc (reference db.py:32-42) via parse_url
    d = _t(spark, sf, "documents")
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/d/"), F.col("doc_id"))
    return d.select(F.parse_url(url, F.lit("HOST")).alias("domain")).groupBy("domain").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "exact_dedup_events_payload",
    """
    SELECT md5(props) AS payload_md5, CAST(min(event_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM events GROUP BY 1
    """,
)
def exact_dedup_q(spark, sf):
    e = _t(spark, sf, "events").withColumnRenamed("props", "text").withColumnRenamed("event_id", "doc_id")
    out = D.exact_dedup(e, text_col="text", id_col="doc_id")
    return out.select(F.col("text_md5").alias("payload_md5"), "keep_id", "dup_count")


# =====================================================================
# Text analysis / dedup / similarity (training-data pipeline operators)
# =====================================================================

_WORDS_SQL = (
    "list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), w -> w <> '')"
)

@q(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, text, {_WORDS_SQL} AS w FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w), 6) AS avg_word_len,
           round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / len(text), 6) AS punct_ratio,
           CAST(len(regexp_extract_all(text, '{X.TOKEN_RE}')) AS BIGINT) AS n_tokens
    FROM t WHERE len(w) > 0 AND len(text) > 0
    """,
)
def text_quality(spark, sf):
    d = _t(spark, sf, "documents")
    # keep-row predicate (n_words > 0 AND n_chars > 0) ⟺ "text has a
    # non-whitespace char": rlike early-exits on the first such char,
    # where the pushed-down n_words > 0 re-ran the full \S+ count per
    # row (filter pushdown inlines computed columns). NULL text drops
    # either way. Same rows, ~15% off the query at the 50k-doc profile.
    feats = X.quality_features(d.filter(F.col("text").rlike(r"\S")), "text")
    return feats.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("avg_word_len", 6).alias("avg_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


@q(
    "lang_id_heuristic",
    f"""
    SELECT {X.lang_id_sql('text')} AS lang_detected, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
)
def lang_id_q(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(X.lang_id(F.col("text")).alias("lang_detected")).groupBy("lang_detected").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "doc_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents)
    SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(w,
                tok -> CAST(len(tok) * 17 + ascii(substr(tok, 1, 1)) AS BIGINT))),
                (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM t WHERE len(w) > 0
    """,
)
def doc_fp(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", X.doc_fingerprint(F.col("text")).alias("fingerprint")).filter(
        F.col("fingerprint").isNotNull()
    )


@q(
    "word_jaccard_pairs",
    f"""
    WITH docs AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents WHERE doc_id < 100),
    sh AS (SELECT DISTINCT doc_id, unnest(w) AS s FROM docs),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6
    """,
)
def word_jaccard(spark, sf):
    # exact n-gram (n=1) Jaccard — the oracle-checkable dedup path
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_jaccard_pairs(d, threshold=0.6, n=1)


@q("minhash_lsh_pairs", None)  # xxhash64 basis (fast path) has no DuckDB twin → rows-only check
def minhash_pairs(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.minhash_dedup_pairs(d, threshold=0.6, bands=8, rows=4, n=1)


_MH_K, _MH_BANDS, _MH_ROWS = 8, 4, 2
_MH_SIG_SQL = ", ".join(
    f"min(CAST(('0x' || substr(md5(s || '#{i}'), 1, 16)) AS UBIGINT)) AS mh{i}" for i in range(_MH_K)
)
_MH_BAND_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5(CAST(mh{b * _MH_ROWS} AS VARCHAR) || '#' || "
    f"CAST(mh{b * _MH_ROWS + 1} AS VARCHAR)) AS bkey FROM sig"
    for b in range(_MH_BANDS)
)

#: shared MinHash+LSH pair-graph CTE chain (docs -> ... -> p, the
#: jaccard-verified pair set). Every oracle consuming the pair graph
#: (md5 pairs, dedup_components, dedup_survivors) references this ONE
#: definition, so the threshold / doc window / banding parameters
#: cannot silently drift between them.
_MH_PAIRS_CTES = f"""docs AS (
      SELECT doc_id, {_WORDS_SQL} AS w
      FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
    sh AS (SELECT DISTINCT doc_id, unnest(w) AS s FROM docs),
    sig AS (SELECT doc_id, {_MH_SIG_SQL} FROM sh GROUP BY doc_id),
    bk AS ({_MH_BAND_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter
      FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b AND x.s = y.s
      GROUP BY 1, 2),
    p AS (
      SELECT id_a, id_b FROM inter
      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6)"""


@q(
    "minhash_lsh_pairs_md5_oracle",
    f"""
    WITH {_MH_PAIRS_CTES}
    SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.6
    """,
)
def minhash_pairs_md5(spark, sf):
    """MinHash+LSH with a FULL value oracle: md5-basis hashing (first 8
    digest bytes big-endian == DuckDB CAST('0x'||substr(md5,1,16) AS
    UBIGINT)), so signatures, banding, candidate generation AND the exact
    Jaccard verify are all replicated independently in SQL. The xxhash64
    basis (minhash_lsh_pairs) stays the fast production path."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.minhash_dedup_pairs(
        d, threshold=0.6, bands=_MH_BANDS, rows=_MH_ROWS, n=1, hash_basis="md5"
    )


@q(
    "dedup_components",
    f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    n AS (SELECT doc_id FROM documents WHERE doc_id < 100),
    e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
    reach(v, u) AS (
      SELECT doc_id, doc_id FROM n
      UNION
      SELECT r.v, e.b FROM reach r JOIN e ON r.u = e.a)
    SELECT v AS doc_id, CAST(min(u) AS BIGINT) AS component
    FROM reach GROUP BY v
    """,
)
def dedup_components_q(spark, sf):
    """Duplicate-cluster canonicalization end-to-end under a full value
    oracle: md5-basis MinHash+LSH verified pairs (the oracled pair
    generator) → :func:`operators.dedup.connected_components` min-label
    propagation; the oracle independently recomputes the pair graph in
    SQL and resolves components with a recursive CTE (min reachable id).
    Docs with no qualifying pair label themselves (singletons)."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    pairs = D.minhash_dedup_pairs(
        d, threshold=0.6, bands=_MH_BANDS, rows=_MH_ROWS, n=1, hash_basis="md5"
    ).select("id_a", "id_b")
    comps = D.connected_components(pairs, d.select("doc_id"))
    return comps.select("doc_id", F.col("component").cast("long").alias("component"))


@q(
    "dedup_survivors",
    f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    n AS (SELECT doc_id FROM documents WHERE doc_id < 100),
    e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
    reach(v, u) AS (
      SELECT doc_id, doc_id FROM n
      UNION
      SELECT r.v, e.b FROM reach r JOIN e ON r.u = e.a),
    comp AS (SELECT v AS doc_id, CAST(min(u) AS BIGINT) AS component FROM reach GROUP BY v),
    tok AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(coalesce(text, ''), '{X.TOKEN_RE}')) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id < 100)
    SELECT component,
           doc_id AS survivor,
           n_tokens AS survivor_tokens,
           CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
    FROM comp JOIN tok USING (doc_id)
    QUALIFY row_number() OVER (PARTITION BY component ORDER BY n_tokens DESC, doc_id ASC) = 1
    """,
)
def dedup_survivors_q(spark, sf):
    """The dedup pipeline end-to-end: verified near-dup pairs → clusters
    → ONE canonical survivor per cluster, chosen by token count (ties →
    smallest id) — the "keep best copy" decision a training-data dedup
    actually ships. Oracle replays the entire chain in SQL (recursive-CTE
    components + window-function survivor election)."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    pairs = D.minhash_dedup_pairs(
        d, threshold=0.6, bands=_MH_BANDS, rows=_MH_ROWS, n=1, hash_basis="md5"
    ).select("id_a", "id_b")
    comps = D.connected_components(pairs, d.select("doc_id"))
    tok = d.select(
        "doc_id", F.coalesce(X.token_count(F.col("text")), F.lit(0)).cast("long").alias("n_tokens")
    )
    scored = comps.join(tok, "doc_id")
    w_rank = Window.partitionBy("component").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    w_cnt = Window.partitionBy("component")
    return (
        scored.withColumn("n_members", F.count(F.lit(1)).over(w_cnt).cast("long"))
        .withColumn("_rk", F.row_number().over(w_rank))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("doc_id").alias("survivor"),
            F.col("n_tokens").alias("survivor_tokens"),
            "n_members",
        )
    )


@q(
    "simhash_near_dups",
    """
    WITH t AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS toks
      FROM documents WHERE text IS NOT NULL),
    h AS (
      SELECT doc_id, list_transform(toks, tok -> md5_number_upper(tok)) AS hs, len(toks) AS n FROM t),
    s AS (
      SELECT doc_id,
        CAST(list_sum(list_transform(range(64), i ->
          CASE WHEN 2 * len(list_filter(hs, x -> (x >> i) & 1 = 1)) > n
               THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                         ELSE CAST(CAST(1 AS BIGINT) << i AS HUGEINT) END
               ELSE CAST(0 AS HUGEINT) END)) AS BIGINT) AS sim
      FROM h)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """,
)
def simhash_q(spark, sf):
    """SimHash near-dups with a FULL value oracle: the md5 feature hash is
    little-endian first-8-bytes == DuckDB's md5_number_upper, so the
    entire signature + banded ≤3-Hamming pair set is SQL-expressible.
    max_hamming=3 → 4×16-bit pigeonhole bands: the EXACT ≤d contract
    (d+1 bands cover d bit flips); wider radii need d+1 narrower bands."""
    from pipeline_spark.functions import simhash64_udf

    # asNondeterministic: the band equi-join infers an isnotnull(bkey)
    # constraint that the optimizer pushes BELOW the projection, cloning
    # the (expensive, per-token-md5) Python UDF once for the filter and
    # once for the project on each join side (guide §4.4 duplication —
    # observed as 4 ArrowEvalPython nodes). Marking it non-deterministic
    # forbids the clone: 2 evaluations, values unchanged.
    d = _t(spark, sf, "documents").select(
        "doc_id", simhash64_udf.asNondeterministic()(F.col("text")).alias("simhash")
    )
    return D.simhash_near_dup_pairs(d, max_hamming=3)


_COS_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
pairs AS (
  SELECT query_id, neighbor_id,
    list_sum(list_transform(range(len(qe)), i -> CAST(qe[i+1] AS DOUBLE) * CAST(ce[i+1] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(len(qe)), i -> CAST(qe[i+1] AS DOUBLE) * CAST(qe[i+1] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(len(ce)), i -> CAST(ce[i+1] AS DOUBLE) * CAST(ce[i+1] AS DOUBLE))))) AS cos_sim
  FROM q, c WHERE neighbor_id <> query_id)
SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs) WHERE rank <= 5
"""

@q("embedding_topk_bruteforce", _COS_SQL)
def emb_topk(spark, sf):
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.brute_force_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))


@q("embedding_ann_lsh", None)  # approximate by design → rows-only; recall tested in pytest
def emb_ann(spark, sf):
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return S.lsh_ann_topk(emb, queries, k=5, n_planes=4, n_tables=4, dim=64)


@q("embedding_ann_ivf", None)  # approximate by design → rows-only; recall tested in pytest
def emb_ann_ivf(spark, sf):
    """IVF-Flat ANN: deterministic k-means cells + n_probe nearest-cell
    equi-join (operators/similarity.py:ivf_ann_topk) — the data-adaptive
    counterpart to the LSH tables."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    cents = S.ivf_fit_centroids(emb, n_centroids=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_ann_topk(emb, queries, cents, k=5, n_probe=3)


@q(
    "embedding_near_dup",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200)
    SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(len(a.embedding)),
                   i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(len(a.embedding)),
                   i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(a.embedding[i+1] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(len(b.embedding)),
                   i -> CAST(b.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))))
           , 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.5
    """,
)
def emb_near_dup(spark, sf):
    # method="exact" on a BOUNDED id slice: the oracle-checkable verify
    # path (the LSH-bucketed scale path is embedding_near_dup_lsh below)
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    return S.embedding_near_dup_pairs(emb, threshold=0.5, method="exact")


@q("embedding_near_dup_lsh", None)  # approximate recall by design → rows-only; recall tested in pytest
def emb_near_dup_lsh(spark, sf):
    """The 100 TB near-dup path: LSH-bucket both sides (equi-join on
    (table, bucket) — linear shuffle, no nested loop), exact cosine verify
    on candidates only. Recall vs the exact path asserted in
    tests/test_operators.py."""
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    return S.embedding_near_dup_pairs(emb, threshold=0.3, method="lsh", n_planes=4, n_tables=16, dim=64)


@q(
    "weighted_sample_deterministic",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               ORDER BY power(((doc_id * 2654435761) % 4294967296) / 4294967296.0,
                              1.0 / n_chars) DESC, doc_id) AS rnk
      FROM documents WHERE n_chars > 0)
    WHERE rnk <= 20
    """,
)
def weighted_sample_q(spark, sf):
    # W6: weighted reservoir (Chao) → deterministic A-ExpJ equivalent
    from pipeline_spark.operators.sampling import weighted_sample

    d = _t(spark, sf, "documents").filter(F.col("n_chars") > 0)
    return weighted_sample(d, k=20, weight_col="n_chars", id_col="doc_id").select("doc_id", "lang")


@q(
    "multimodal_meta",
    """
    SELECT doc_id, 'application/octet-stream' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           1 + (ascii(substr(text, 1, 1)) % 64) AS width
    FROM documents WHERE len(text) > 0
    """,
)
def multimodal_q(spark, sf):
    # binary-column plumbing: encode text as the opaque payload, run the
    # mapInPandas metadata extractor, compare the deterministic fields
    from pipeline_spark.operators.multimodal import extract_media_meta

    d = _t(spark, sf, "documents").filter(F.length("text") > 0).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = extract_media_meta(d, "payload")
    return out.select("doc_id", "media_type", "byte_len", "width")


@q(
    "ewma_change_detection",
    """
    WITH s AS (
      SELECT event_type, list(value / 100.0 ORDER BY ts, event_id) AS xs,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type),
    f AS (
      SELECT event_type, n, list_reduce(
        list_prepend({'m': 0.0, 'b': false}::STRUCT(m DOUBLE, b BOOLEAN),
                     list_transform(xs, x -> {'m': x, 'b': false}::STRUCT(m DOUBLE, b BOOLEAN))),
        (acc, x) -> {'m': (1.0 - 0.02) * acc.m + 0.02 * x.m,
                     'b': CASE WHEN NOT acc.b AND (1.0 - 0.02) * acc.m + 0.02 * x.m > 0.10 THEN true
                               WHEN acc.b AND (1.0 - 0.02) * acc.m + 0.02 * x.m < 0.05 THEN false
                               ELSE acc.b END}::STRUCT(m DOUBLE, b BOOLEAN)) AS fold
      FROM s)
    SELECT event_type, round(fold.m, 9) AS mean, fold.b AS blocked, n FROM f
    """,
)
def ewma_q(spark, sf):
    """W1 with a FULL value oracle: the ordered stateful fold (EWMA +
    hysteresis) expressed in DuckDB as a struct-state list_reduce over
    list(value ORDER BY ts, event_id). Arithmetic is written identically
    on both sides ((1.0-0.02)*m + 0.02*x on IEEE doubles, same fold
    order), so the means compare bit-stably at 9 decimals."""
    from pipeline_spark.operators.detector import ewma_final_means

    e = _t(spark, sf, "events").select(
        "event_type", "ts", (F.col("value") / 100.0).alias("value"), "event_id"
    )
    out = ewma_final_means(e, keys=["event_type"], ts_col="ts", value_col="value", tiebreak_col="event_id")
    return out.select("event_type", F.round("mean", 9).alias("mean"), "blocked", "n")


_HEADER_FPS = [
    ("fp_srv_click", "server", "click"),
    ("fp_srv_error", "server", "error"),
    ("fp_k_42", "x-k", "42"),
    ("fp_absent", "server", "zz-never"),
]


@q(
    "fingerprint_header_match",
    f"""
    SELECT fp_id, CAST(count(*) AS BIGINT) AS n_matched, CAST(min(event_id) AS BIGINT) AS first_id
    FROM events, (VALUES {', '.join(f"('{i}','{n}','{v}')" for i, n, v in _HEADER_FPS)}) fp(fp_id, hname, hval)
    WHERE (hname = 'server' AND event_type = hval)
       OR (hname = 'x-k' AND CAST({_K} AS VARCHAR) = hval)
    GROUP BY fp_id
    """,
)
def fingerprint_header_q(spark, sf):
    """C18: header-equality fingerprint match (core.py:351-377) — headers
    normalize to a lowercased map (P11, nested.py), the (tiny) fingerprint
    dim broadcasts, and the match is a map lookup equality, not a scan of
    the body."""
    from pipeline_spark.operators.nested import normalize_headers

    e = _t(spark, sf, "events")
    raw_headers = F.array(
        F.struct(F.lit("Server").alias("name"), F.array(F.col("event_type")).alias("values")),
        F.struct(F.lit("X-K").alias("name"), F.array(_k_col().cast("string")).alias("values")),
    )
    hm = e.select("event_id", normalize_headers(raw_headers).alias("headers"))
    fps = spark.createDataFrame(_HEADER_FPS, "fp_id string, hname string, hval string")
    return (
        hm.crossJoin(F.broadcast(fps))
        .filter(F.element_at(F.col("headers"), F.col("hname")) == F.col("hval"))
        .groupBy("fp_id")
        .agg(F.count(F.lit(1)).alias("n_matched"), F.min("event_id").alias("first_id"))
    )


_DNS_FPS = [("fp_dns_a", "10.0.0.1"), ("fp_dns_b", "10.0.2.1"), ("fp_dns_absent", "192.0.2.99")]


@q(
    "fingerprint_dns_match",
    f"""
    SELECT fp_id, CAST(count(*) AS BIGINT) AS n_matched
    FROM events, (VALUES {', '.join(f"('{i}','{a}')" for i, a in _DNS_FPS)}) fp(fp_id, addr)
    WHERE '10.0.' || CAST(({_K}) % 4 AS VARCHAR) || '.1' = addr
       OR '10.0.' || CAST(({_K}) % 4 AS VARCHAR) || '.2' = addr
    GROUP BY fp_id
    """,
)
def fingerprint_dns_q(spark, sf):
    """C19: DNS-answer fingerprint match (core.py:379-415) — raw answer
    strings parse inside the array (P16, one transform, no explode), then
    the match is address-equality against the broadcast dim via EXISTS."""
    from pipeline_spark.operators.nested import parse_dns_answers

    e = _t(spark, sf, "events")
    k = _k_col()
    mk = lambda last: F.concat(  # noqa: E731
        F.lit("ttl "), k.cast("string"), F.lit(" type A 10.0."), (k % 4).cast("string"), F.lit(f".{last}")
    )
    answers = parse_dns_answers(F.array(mk(1), mk(2)))
    parsed = e.select("event_id", F.transform(answers, lambda a: a["address"]).alias("addrs"))
    fps = spark.createDataFrame(_DNS_FPS, "fp_id string, addr string")
    return (
        parsed.crossJoin(F.broadcast(fps))
        .filter(F.array_contains(F.col("addrs"), F.col("addr")))
        .groupBy("fp_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


@q(
    "canonical_name_map",
    """
    SELECT CASE event_type WHEN 'click' THEN 'web_click' WHEN 'view' THEN 'web_view'
           ELSE event_type END AS canonical,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def canonical_map_q(spark, sf):
    """P13: name canonicalization through a literal map (normalize.py:25-75),
    unknown names passing through."""
    from pipeline_spark.functions import canonicalize

    e = _t(spark, sf, "events")
    return e.select(
        canonicalize(F.col("event_type"), {"click": "web_click", "view": "web_view"}).alias("canonical")
    ).groupBy("canonical").agg(F.count(F.lit(1)).alias("n"))


@q(
    "zz_merge_global_lists",
    """
    WITH langs AS (SELECT DISTINCT lang FROM documents WHERE lang <> 'zz'),
    expanded AS (
      SELECT l.lang, d.doc_id FROM documents d CROSS JOIN langs l WHERE d.lang = 'zz'
      UNION
      SELECT d.lang, d.doc_id FROM documents d WHERE d.lang <> 'zz')
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM expanded GROUP BY lang
    """,
)
def zz_merge_q(spark, sf):
    """J3: ZZ-merge (reference prio.py:85-89) — 'global' (lang='zz') docs
    fan out to EVERY concrete lang via a broadcast cross join with the
    (tiny) lang dim; lang-specific docs stay as-is; union + dedup."""
    d = _t(spark, sf, "documents")
    langs = d.filter(F.col("lang") != "zz").select("lang").distinct()
    globals_ = d.filter(F.col("lang") == "zz").select("doc_id")
    specific = d.filter(F.col("lang") != "zz").select("lang", "doc_id")
    expanded = globals_.crossJoin(F.broadcast(langs)).select("lang", "doc_id").union(specific).dropDuplicates()
    return expanded.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@q("global_stats_approx", None)  # HLL sketch ≠ DuckDB's sketch → bound-checked in pytest
def global_stats_approx_q(spark, sf):
    """A3 approx variant (reference database_upgrade_schema.py:124-192 uses
    uniqHLL12): approx_count_distinct at rsd=0.02 — the 100 TB form of the
    matview stats (exact countDistinct is a full shuffle of the key)."""
    e = _t(spark, sf, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx"),
        F.approx_count_distinct("event_type", 0.02).alias("n_types_approx"),
    )


@q(
    "incremental_counters_from_changelog",
    """
    WITH latest AS (
      SELECT user_id, event_type, value FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
    FROM latest GROUP BY event_type
    """,
)
def incr_counters_q(spark, sf):
    """Incrementally-maintained matview: events replayed as a 3-chunk CDC
    stream into a lake table keyed on user_id; after each merge the
    per-event_type counters fold ONLY the changelog delta (retract + add,
    plans/incremental.py). The oracle states the end result directly —
    LWW latest state grouped — so any drift in the incremental maintenance
    breaks the hash. (Chunks split on event_id ranges so the (ts, epoch,
    offset) merge order equals the oracle's (ts, event_id) order.)"""
    import os

    from pipeline_spark.lake import LakeTable
    from pipeline_spark.plans.incremental import incremental_refresh

    e = _t(spark, sf, "events")
    n = _events_n(sf)
    work = _workdir("incr_counters_")
    t = LakeTable.create(
        spark,
        os.path.join(work, "state"),
        [("uid", "string"), ("ts", "timestamp"), ("event_type", "string"), ("value", "double")],
        key="uid",
        version_col="ts",
        n_buckets=8,
    )
    measures = lambda df: {"n": F.lit(1), "sum_value_raw": F.col("value")}  # noqa: E731
    state, since = None, 0
    for c in range(3):
        lo, hi = c * n // 3, (c + 1) * n // 3
        batch = e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).select(
            F.lit("U").alias("op"),
            F.col("user_id").cast("string").alias("uid"),
            F.col("ts"),
            F.col("event_type"),
            F.col("value"),
            F.lit(c).cast("long").alias("epoch"),
            F.col("event_id").alias("offset"),
        )
        t.merge(batch, fence=("incr", c))
        state = incremental_refresh(t, state, ["event_type"], measures, since_version=since).localCheckpoint(
            eager=True
        )
        since = t.current_version()
    return state.select(
        "event_type", F.col("n").cast("long").alias("n"), F.round("sum_value_raw", 2).alias("sum_value")
    )


@q("cdc_replay_final_state", None)  # full engine path → checked in pytest vs oracle
def cdc_replay_q(spark, sf):
    """Flagship: generate a deterministic CDC stream sized to the SF, replay
    it through the lake-table MERGE path, return the final live state."""
    import os

    from pipeline_spark.datagen import StreamSpec, write_change_stream
    from pipeline_spark.lake import LakeTable
    from pipeline_spark.streaming.replay import batch_replay

    n = 20_000 if "0.1" not in sf.rstrip("/")[-5:] else 100_000
    spec = StreamSpec(n_events=n, n_urls=max(200, n // 40), n_epochs=4)
    work = _workdir("cdc_replay_")
    stream = os.path.join(work, "stream")
    write_change_stream(stream, spec)
    t = LakeTable.create(
        spark,
        os.path.join(work, "pages"),
        [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"), ("text", "string"), ("lang", "string")],
        key="url",
        version_col="warc_ts",
        n_buckets=16,
    )
    batch_replay(spark, stream, t, salt_buckets=8)
    return t.read().select("url", "warc_ts", F.md5(F.col("text")).alias("text_md5"), "lang")


@q(
    "lake_time_slice",
    """
    SELECT event_id, ts, event_type, round(value, 2) AS value_r
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def lake_time_slice_q(spark, sf):
    """Full lake path for a time-slice read: merge the events stream into
    a LakeTable (event_id-keyed), sort-order-compact on the time column,
    then ``scan(range_filter=...)`` — manifest-stats file skipping plans
    only the files whose footer bounds overlap the slice (Iceberg-style
    data skipping); the value gate is merge + sorted-compaction + pruned
    scan returning exactly the SQL-filtered rows."""
    import datetime
    import os

    from pipeline_spark.lake import LakeTable

    e = _t(spark, sf, "events").select(
        F.lit("U").alias("op"),
        "event_id",
        "ts",
        "event_type",
        "value",
        F.lit(0).cast("long").alias("epoch"),
        F.col("event_id").alias("offset"),
    )
    work = _workdir("lake_slice_")
    t = LakeTable.create(
        spark,
        os.path.join(work, "t"),
        [("event_id", "long"), ("ts", "timestamp"), ("event_type", "string"), ("value", "double")],
        key="event_id",
        version_col="ts",
        n_buckets=8,
    )
    t.merge(e)
    t.compact(sort_by="ts", rows_per_file=2_000)
    lo = datetime.datetime(2024, 1, 10)
    hi = datetime.datetime(2024, 1, 20)
    return t.scan(range_filter={"ts": (lo, hi)}).select(
        "event_id", "ts", "event_type", F.round("value", 2).alias("value_r")
    )


@q(
    "cdc_stream_replay_state",
    """
    SELECT user_id AS uid, ts, event_type, round(value, 2) AS value_r
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def cdc_stream_replay_q(spark, sf):
    """The ENTIRE streaming engine path under a full value oracle: the
    events table is written out as 3 epoch-file chunks, replayed through
    the real ``replay_stream`` (Structured Streaming file source,
    micro-batch fences, merge-on-read commits), and the final
    LWW-resolved scan must equal plain SQL latest-per-key over the raw
    table. Unlike ``cdc_lww_state`` (the LWW expression alone) and
    ``cdc_replay_final_state`` (rows-only, self-generated stream), this
    row drives checkpointing, fencing, delta commits AND the MOR read
    path against an independent oracle. Chunks split on event_id ranges,
    so the engine's (ts, epoch, offset) order equals the oracle's
    (ts, event_id) order."""
    import os

    from pipeline_spark.lake import LakeTable
    from pipeline_spark.streaming import replay_stream

    e = _t(spark, sf, "events")
    n = _events_n(sf)
    work = _workdir("cdc_stream_replay_")
    stream = os.path.join(work, "stream")
    for c in range(3):
        lo, hi = c * n // 3, (c + 1) * n // 3
        (
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .select(
                F.lit("U").alias("op"),
                F.col("user_id").cast("string").alias("uid"),
                F.col("ts"),
                F.col("event_type"),
                F.col("value"),
                F.lit(c).cast("long").alias("epoch"),
                F.col("event_id").alias("offset"),
            )
            .coalesce(1)
            .write.parquet(os.path.join(stream, f"ep-{c:04d}"))
        )
    t = LakeTable.create(
        spark,
        os.path.join(work, "state"),
        [("uid", "string"), ("ts", "timestamp"), ("event_type", "string"), ("value", "double")],
        key="uid",
        version_col="ts",
        n_buckets=8,
    )
    replay_stream(
        spark,
        stream,
        t,
        checkpoint=os.path.join(work, "ckpt"),
        stream_id="cdc_oracle",
        max_files_per_trigger=1,
        schema_ddl="op string, uid string, ts timestamp, event_type string, value double, epoch long, offset long",
        extract="none",
    )
    return t.read().select("uid", "ts", "event_type", F.round("value", 2).alias("value_r"))


@q(
    "lineage_log",
    """
    WITH n AS (SELECT max(event_id) + 1 AS n FROM events),
         c AS (SELECT * FROM (VALUES (0), (1), (2)) t(c)),
         b AS (SELECT c.c AS c, (c.c * n.n) // 3 AS lo, ((c.c + 1) * n.n) // 3 AS hi
               FROM c, n)
    SELECT b.c + 1 AS snapshot_id,
           CAST(b.c AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS rows_in,
           CAST(0 AS BIGINT) AS rows_discarded,
           CAST(0 AS BIGINT) AS rows_delete_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS rows_written,
           CAST(min(event_id) AS BIGINT) AS start_offset,
           CAST(max(event_id) AS BIGINT) AS end_offset
    FROM events e JOIN b ON e.event_id >= b.lo AND e.event_id < b.hi
    GROUP BY b.c
    ORDER BY snapshot_id
    """,
)
def lineage_log_q(spark, sf):
    """Per-commit lineage exposed as a queryable table (the reference's
    jsonl lookup/lineage table, reprocessor.py:81-97): replay events as a
    3-batch CDC stream keyed on user_id, then surface
    :meth:`LakeTable.lineage_records` — one row per commit with the
    observe()d merge counters. The oracle restates every counter from the
    raw events table (rows_in = chunk size, rows_written = in-batch LWW
    winner count = distinct keys, offsets = chunk min/max event_id), so
    drift in the observe metrics, fence sequencing, validity filter, or
    winner dedup all break the hash. Lineage is bounded metadata (one
    record per commit), so driver-side materialization is O(commits),
    not O(data)."""
    import os

    from pipeline_spark.lake import LakeTable

    e = _t(spark, sf, "events")
    n = _events_n(sf)
    work = _workdir("lineage_log_")
    t = LakeTable.create(
        spark,
        os.path.join(work, "state"),
        [("uid", "string"), ("ts", "timestamp"), ("event_type", "string"), ("value", "double")],
        key="uid",
        version_col="ts",
        n_buckets=8,
    )
    for c in range(3):
        lo, hi = c * n // 3, (c + 1) * n // 3
        batch = e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).select(
            F.lit("U").alias("op"),
            F.col("user_id").cast("string").alias("uid"),
            F.col("ts"),
            F.col("event_type"),
            F.col("value"),
            F.lit(c).cast("long").alias("epoch"),
            F.col("event_id").alias("offset"),
        )
        t.merge(batch, fence=("lineage", c), extra_lineage={"batch_id": c})
    rows = [
        (
            int(r["snapshot_id"]),
            int(r["batch_id"]),
            int(r["rows_in"]),
            int(r["rows_discarded"]),
            int(r["rows_delete_events"]),
            int(r["rows_written"]),
            int(r["start_offset"]),
            int(r["end_offset"]),
        )
        for r in t.lineage_records()
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id int, batch_id bigint, rows_in bigint, rows_discarded bigint, "
        "rows_delete_events bigint, rows_written bigint, start_offset bigint, end_offset bigint",
    ).orderBy("snapshot_id")


@q(
    "partition_layout_prune",
    """
    SELECT 'C' || CAST(user_id % 4 AS VARCHAR) AS cc,
           event_type AS test,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(value) AS DOUBLE), 2) AS sum_value,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events
    WHERE user_id % 4 = 1 AND event_type IN ('click', 'error')
    GROUP BY 1, 2
    """,
)
def partition_layout_prune_q(spark, sf):
    """S2 as a real DIRECTORY layout, not just bucket/manifest pruning:
    the events table is written once as ``cc=XX/test=YY/``-partitioned
    parquet — the country/test-name S3 key layout the reference prunes
    before download (s3feeder.py:174-220) — then read back with equality
    filters on BOTH partition columns. Catalyst resolves those filters
    against directory names at planning time (PartitionFilters in the
    scan, gated in test_plans.py), so non-matching partitions are never
    listed, opened, or scanned — the 100 TB behavior where a 2-country
    query reads 2/250ths of the lake. The oracle recomputes the same
    aggregate from the raw table with the partition keys re-derived
    inline."""
    import os

    work = _workdir("part_layout_")
    lake = os.path.join(work, "events_cc_test")
    (
        _t(spark, sf, "events")
        .withColumn("cc", F.concat(F.lit("C"), (F.col("user_id") % 4).cast("string")))
        .withColumnRenamed("event_type", "test")
        .write.partitionBy("cc", "test")
        .parquet(lake)
    )
    r = spark.read.parquet(lake)
    return (
        r.filter((F.col("cc") == "C1") & F.col("test").isin("click", "error"))
        .groupBy("cc", "test")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("event_id").cast("bigint").alias("max_event_id"),
        )
    )


# =====================================================================
# public accessors
# =====================================================================

#: Oracled queries deliberately registered AFTER the driver's correctness
#: window (the driver oracle-checks the first 50 exported queries only).
#: Each remains green in tests/test_queries_oracle.py at both SFs; all are
#: redundant with an in-window query of the same operator family, freeing
#: window slots for queries with no other driver evidence (the concrete
#: scorer parameterizations, lineage_log).
_DEFERRED = [
    "q6_filtered_revenue",        # agg-over-filter: q1_pricing_summary
    "semi_join_active_segments",  # semi/anti family: anti_join_customers_without_orders
    "union_dedup_users",          # set ops: union_heterogeneous_sources + dedup_first_wins
    "window_running_sum",         # window family: sessionize, topk_per_group
    "word_jaccard_pairs",         # dedup family: minhash_lsh_pairs_md5_oracle, simhash
    "lang_id_heuristic",          # text family: text_quality, doc_fingerprint
    "embedding_near_dup",         # similarity family: embedding_topk_bruteforce
    "canonical_name_map",         # P13: unit-tested (test_functions.py::test_canonicalize_*)
    "doc_fingerprint",            # text family: text_quality in-window; rolling-hash pytest
    "dedup_survivors",            # dedup family: dedup_components in-window end-to-end
    "score_stun_torsf_failure",   # C8 concrete; 14 scorer rows already in-window
    "score_riseupvpn_flags",      # C8 concrete; ditto
    "score_openvpn_success",      # C8 concrete; ditto
    "q5_supplier_volume_by_nation",  # J1 star joins: q3_shipping_priority in-window; broadcast plan gate
]


def _export_order() -> list[str]:
    """Export order for the driver contract: oracled queries first (the
    driver hard-gates exactly the first 50), then the deferred oracled
    queries, then the rows-only (no-oracle-by-design) queries last, each
    group in registration order. Keeps the driver's correctness window
    100% value-hash-checked instead of spending slots on rows-only checks."""
    # a misspelled or rows-only _DEFERRED entry would silently change the
    # driver's 50-query window composition — fail loudly instead
    unknown = [n for n in _DEFERRED if n not in QUERIES]
    assert not unknown, f"_DEFERRED names not in QUERIES: {unknown}"
    unoracled = [n for n in _DEFERRED if QUERIES[n][1] is None]
    assert not unoracled, f"_DEFERRED entries without an oracle: {unoracled}"
    assert len(set(_DEFERRED)) == len(_DEFERRED), "_DEFERRED has duplicates"
    names = list(QUERIES)
    oracled = [n for n in names if QUERIES[n][1] is not None and n not in _DEFERRED]
    rows_only = [n for n in names if QUERIES[n][1] is None]
    return oracled + list(_DEFERRED) + rows_only


def _session_guard(fn):
    """Pin the runtime confs the oracle compare depends on, whatever
    session the driver hands us (UTC timestamps, Arrow path, small Arrow
    batches for binary payloads). All are runtime-settable."""

    def wrapped(spark, sf_dir):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        return fn(spark, sf_dir)

    return wrapped


def query_map():
    return {name: _session_guard(QUERIES[name][0]) for name in _export_order()}


def oracle_sql_map():
    return {
        name: QUERIES[name][1].strip()
        for name in _export_order()
        if QUERIES[name][1] is not None
    }


# =====================================================================
# Fingerprint containment join (J2/C17) + nested-array ops (A5/A6)
# =====================================================================

_FINGERPRINTS = [
    ("fp_scan", "scan"),
    ("fp_merge", "merge"),
    ("fp_window", "window"),
    ("fp_absent", "zzqx-never-present"),
]

@q(
    "fingerprint_body_match",
    f"""
    SELECT fp_id,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents, (VALUES {', '.join(f"('{i}','{p}')" for i, p in _FINGERPRINTS)}) fp(fp_id, pattern)
    WHERE instr(lower(text), pattern) > 0
    GROUP BY fp_id
    """,
)
def fingerprint_match(spark, sf):
    """The reference's flagship matching operator (core.py:317-348):
    substring-containment theta-join of bodies against a small fingerprint
    dim — broadcast nested-loop, the only sane strategy for contains()."""
    d = _t(spark, sf, "documents")
    fps = spark.createDataFrame(_FINGERPRINTS, "fp_id string, pattern string")
    return (
        d.crossJoin(F.broadcast(fps))
        .filter(F.instr(F.lower(F.col("text")), F.col("pattern")) > 0)
        .groupBy("fp_id")
        .agg(F.count(F.lit(1)).alias("n_matched"), F.min("doc_id").alias("first_doc"))
    )


@q(
    "nested_array_tally",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           round(max(value), 2) AS max_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def nested_tally(spark, sf):
    """A5/A6: tallies INSIDE a nested array (size/filter/array_max) —
    the array is built with collect_list so the nested operators are the
    thing under test; the oracle states the equivalent flat aggregation."""
    from pipeline_spark.operators.nested import endpoint_tally, nested_max

    e = _t(spark, sf, "events")
    arr = e.groupBy("user_id").agg(
        F.collect_list(F.struct(F.col("event_type"), F.col("value"))).alias("evs")
    )
    return arr.select(
        "user_id",
        endpoint_tally(F.col("evs"), lambda x: x["value"] > 50).cast("long").alias("n_high"),
        F.round(nested_max(F.col("evs"), "value"), 2).alias("max_value"),
        F.size("evs").cast("long").alias("n_events"),
    )


@q(
    "jsonl_envelope_normalize",
    """
    SELECT 'U' AS op,
           'https://u/' || CAST(user_id AS VARCHAR) AS url,
           ts AS warc_ts,
           hex(encode(props)) AS html_hex,
           event_type AS lang,
           CAST(user_id % 3 AS BIGINT) AS epoch,
           CAST(event_id AS BIGINT) AS "offset",
           CAST(1 AS BIGINT) AS n_extra
    FROM events
    """,
)
def jsonl_normalize_q(spark, sf):
    """S4/P2/P12/P14 round trip: events → enveloped JSON lines →
    permissive parse, envelope unwrap, base64 payload decode, timestamp
    parse, stray-key fold (reference normalize.py:77-100,164-170,408-506).
    The oracle states the expected output directly — any loss in the
    serialize→normalize round trip breaks the hash."""
    from pipeline_spark.sources import normalize_enveloped

    e = _t(spark, sf, "events")
    rec = F.struct(
        F.lit("U").alias("op"),
        F.concat(F.lit("https://u/"), F.col("user_id").cast("string")).alias("url"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("warc_ts"),
        F.base64(F.encode(F.col("props"), "UTF-8")).alias("html_b64"),
        F.col("event_type").alias("lang"),
        (F.col("user_id") % 3).alias("epoch"),
        F.col("event_id").alias("offset"),
        F.col("props").alias("stray_props"),  # unknown key → must fold into extra
    )
    lines = e.select(F.to_json(F.struct(F.lit("json").alias("format"), rec.alias("content"))).alias("value"))
    out = normalize_enveloped(lines, "value")
    # hex, not raw binary: the driver's pandas canonicalizer can't hash
    # bytearray cells (CORRECTNESS_r02 TypeError) — and a hex string is
    # just as strong a byte-identity check on both sides.
    return out.select(
        "op", "url", "warc_ts",
        F.hex("html").alias("html_hex"),
        "lang", "epoch", "offset",
        F.size("extra").cast("long").alias("n_extra"),
    )


# =====================================================================
# Scoring / enrichment stage (C-family: dispatcher + C3/C10/C13/C20)
# =====================================================================


_FAILURE_TABLE = {
    "timeout": (0.8, 1.0),
    "connection_refused": (0.9, 1.0),
    "dns_nxdomain": (1.0, 1.0),
}



def _failure_col():
    k = _k_col()
    return (
        F.when(k % 4 == 0, F.lit("timeout"))
        .when(k % 4 == 1, F.lit("connection_refused"))
        .when(k % 4 == 2, F.lit("dns_nxdomain"))
        .otherwise(F.lit("weird_edge"))
    )


_FAILURE_SQL = f"""CASE ({_K}) % 4 WHEN 0 THEN 'timeout' WHEN 1 THEN 'connection_refused'
                   WHEN 2 THEN 'dns_nxdomain' ELSE 'weird_edge' END"""


@q(
    "score_failure_case_table",
    f"""
    WITH t AS (SELECT event_id, {_FAILURE_SQL} AS failure FROM events WHERE event_type = 'error')
    SELECT event_id,
           round(CAST(CASE failure WHEN 'timeout' THEN 0.8 WHEN 'connection_refused' THEN 0.9
                 WHEN 'dns_nxdomain' THEN 1.0 ELSE 0.5 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN failure IN ('timeout','connection_refused','dns_nxdomain') THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS accuracy,
           CASE WHEN failure IN ('timeout','connection_refused','dns_nxdomain') THEN failure
                ELSE 'unknown_failure:' || failure END AS msg
    FROM t
    """,
)
def score_failure_q(spark, sf):
    """C10: failure-string case table (core.py:1101-1151) + C22 unknown-
    failure labelling (core.py:1136-1140) — one codegen'd CASE chain."""
    from pipeline_spark.operators.scoring import failure_case_table_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "error")
    s = failure_case_table_scorer(_failure_col(), _FAILURE_TABLE)
    return e.select(
        "event_id",
        F.round(s["blocking"], 6).alias("blocking"),
        F.round(s["accuracy"], 6).alias("accuracy"),
        s["msg"].alias("msg"),
    )


@q(
    "score_header_set_compare",
    f"""
    WITH t AS (SELECT event_id, ({_K}) % 4 AS m FROM events WHERE event_type IN ('click', 'view'))
    SELECT event_id,
           round(CAST(CASE m WHEN 0 THEN 0.5 WHEN 1 THEN 1.0/3 WHEN 2 THEN 0.5/3 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           CASE m WHEN 3 THEN 'match' ELSE 'missing=' || CAST(3 - m AS VARCHAR) || ' extra=0' END AS msg
    FROM t
    """,
)
def score_set_compare_q(spark, sf):
    """C3: two-way array_except header comparison (core.py:660-729). The
    observed set is derived deterministically from the payload (first k%4
    of the expected list) so missing/extra counts are oracle-checkable."""
    from pipeline_spark.operators.scoring import set_compare_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type").isin("click", "view"))
    got = F.slice(F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")), 1, (_k_col() % 4).cast("int"))
    s = set_compare_scorer(["a", "b", "c"], got)
    return e.select("event_id", F.round(s["blocking"], 6).alias("blocking"), s["msg"].alias("msg"))


@q(
    "score_tally_ratio",
    f"""
    WITH t AS (SELECT event_id, 1 + ({_K}) % 5 AS m FROM events WHERE event_type = 'purchase')
    SELECT event_id,
           round(CAST(greatest(m - 2, 0) AS DOUBLE) / m, 6) AS blocking,
           'failed ' || CAST(greatest(m - 2, 0) AS VARCHAR) || '/' || CAST(m AS VARCHAR) AS msg
    FROM t
    """,
)
def score_tally_q(spark, sf):
    """C13: per-target sub-result tally ratio (core.py:1233-1284) via
    higher-order filter/size — no explode, no shuffle."""
    from pipeline_spark.operators.scoring import tally_ratio_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "purchase")
    results = F.sequence(F.lit(1), (F.lit(1) + _k_col() % 5).cast("int"))
    s = tally_ratio_scorer(results, lambda x: x > 2)
    return e.select("event_id", F.round(s["blocking"], 6).alias("blocking"), s["msg"].alias("msg"))


@q(
    "score_dispatch_verdicts",
    f"""
    WITH t AS (
      SELECT event_type, {_K} AS k, ({_K}) % 4 AS m4, 1 + ({_K}) % 5 AS m5,
             {_FAILURE_SQL} AS failure
      FROM events),
    s AS (
      SELECT event_type, k,
        CASE event_type
          WHEN 'error' THEN CASE failure WHEN 'timeout' THEN 0.8 WHEN 'connection_refused' THEN 0.9
                            WHEN 'dns_nxdomain' THEN 1.0 ELSE 0.5 END
          WHEN 'purchase' THEN CAST(greatest(m5 - 2, 0) AS DOUBLE) / m5
          WHEN 'click' THEN CASE m4 WHEN 0 THEN 0.5 WHEN 1 THEN 1.0/3 WHEN 2 THEN 0.5/3 ELSE 0.0 END
          WHEN 'view' THEN CASE m4 WHEN 0 THEN 0.5 WHEN 1 THEN 1.0/3 WHEN 2 THEN 0.5/3 ELSE 0.0 END
          ELSE 0.0 END AS blocking,
        CASE event_type
          WHEN 'error' THEN CASE WHEN failure IN ('timeout','connection_refused','dns_nxdomain') THEN 1.0 ELSE 0.0 END
          WHEN 'purchase' THEN 1.0 WHEN 'click' THEN 1.0 WHEN 'view' THEN 1.0
          ELSE 0.0 END AS accuracy
      FROM t)
    SELECT event_type,
           CASE WHEN k = 77 THEN 'confirmed'
                WHEN accuracy >= 0 AND blocking >= 0.5 THEN 'anomaly'
                WHEN accuracy < 0 THEN 'failed' ELSE 'ok' END AS verdict,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2
    """,
)
def score_dispatch_q(spark, sf):
    """The full C-family dispatcher (core.py:1452-1514) + C20 confirmed
    determination (core.py:1517-1539): every event routed to its scorer by
    event_type in ONE chained CASE, verdicts tallied per type."""
    from pipeline_spark.operators import scoring as SC

    # project the payload field ONCE: each CASE branch referencing the raw
    # regexp would otherwise re-run the extraction per branch per row
    e = _t(spark, sf, "events").withColumn("_k", _k_col())
    k = F.col("_k")
    failure = (
        F.when(k % 4 == 0, F.lit("timeout"))
        .when(k % 4 == 1, F.lit("connection_refused"))
        .when(k % 4 == 2, F.lit("dns_nxdomain"))
        .otherwise(F.lit("weird_edge"))
    )
    got = F.slice(F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")), 1, (k % 4).cast("int"))
    results = F.sequence(F.lit(1), (F.lit(1) + k % 5).cast("int"))
    scorers = {
        "error": lambda df: SC.failure_case_table_scorer(failure, _FAILURE_TABLE),
        "purchase": lambda df: SC.tally_ratio_scorer(results, lambda x: x > 2),
        # one shared branch for the two identically-scored types (one IN
        # predicate, not two duplicate CASE arms)
        ("click", "view"): lambda df: SC.set_compare_scorer(["a", "b", "c"], got),
    }
    # field-pruned dispatch: the verdict only reads blocking/accuracy, so
    # the scorers' msg string work is deleted at optimization time
    # (round-5 fix for the r2->r4 drift: ~5x smaller plan, ~2x faster)
    scored = SC.score_fields(e, "event_type", scorers, fields=("blocking", "accuracy"))
    verdict = SC.confirmed_determination(
        F.struct(F.col("scores_blocking").alias("blocking"), F.col("scores_accuracy").alias("accuracy")),
        fingerprint_hit=(k == 77),
    )
    return scored.select("event_type", verdict.alias("verdict")).groupBy("event_type", "verdict").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "score_flag_counts",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k, value FROM events WHERE event_type = 'signup')
    SELECT event_id,
           round(least(1.0, CAST(CASE WHEN k % 2 <> 0 THEN 0.5 ELSE 0 END
                             + CASE WHEN value <= 10 THEN 0.5 ELSE 0 END
                             + CASE WHEN k % 7 = 0 THEN 0.5 ELSE 0 END AS DOUBLE)), 6) AS blocking
    FROM t
    """,
)
def score_flag_counts_q(spark, sf):
    """C1 shape: flag-count scorer (core.py:499-559) — false consistency
    flags and true anomaly flags each add 0.5 blocking, capped at 1."""
    from pipeline_spark.operators.scoring import flag_count_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "signup").withColumn("_k", _k_col())
    s = flag_count_scorer(
        consistency_flags=[F.col("_k") % 2 == 0, F.col("value") > 10],
        anomaly_flags=[F.col("_k") % 7 == 0],
    )
    return e.select("event_id", F.round(s["blocking"], 6).alias("blocking"))


@q(
    "score_combined_ratios",
    f"""
    WITH t AS (SELECT event_id, 1 + ({_K}) % 4 AS m1,
                      1 + CAST(floor(value) AS INT) % 3 AS m2
               FROM events WHERE event_type = 'click')
    SELECT event_id,
           round((CAST(greatest(m1 - 2, 0) AS DOUBLE) / m1
                + CAST(greatest(m2 - 1, 0) AS DOUBLE) / m2) / 2, 6) AS blocking
    FROM t
    """,
)
def score_combined_ratios_q(spark, sf):
    """C2/C5 shape: multi-part ratio scorer (core.py:581-657,797-905) —
    blocking = mean of per-part failed/total ratios over two nested
    sub-result arrays, all higher-order functions, no explode."""
    from pipeline_spark.operators.scoring import combined_ratio_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "click").withColumn("_k", _k_col())
    p1 = F.sequence(F.lit(1), (F.lit(1) + F.col("_k") % 4).cast("int"))
    p2 = F.sequence(F.lit(1), (F.lit(1) + F.floor(F.col("value")).cast("int") % 3).cast("int"))
    s = combined_ratio_scorer([(p1, lambda x: x > 2), (p2, lambda x: x > 1)])
    return e.select("event_id", F.round(s["blocking"], 6).alias("blocking"))


@q(
    "score_web_flagship",
    f"""
    WITH t AS (SELECT event_type, event_id, props, value, {_K} AS k FROM events),
    s AS (
      SELECT event_type,
             CASE WHEN instr(props, '7') > 0 THEN true ELSE false END AS fp_hit,
             least(1.0, CAST(value AS DOUBLE) / 200) AS blocking,
             CASE WHEN k % 11 = 0 THEN -1.0 ELSE 1.0 END AS accuracy
      FROM t)
    SELECT event_type,
           CASE WHEN fp_hit THEN 'confirmed'
                WHEN accuracy >= 0 AND blocking >= 0.5 THEN 'anomaly'
                WHEN accuracy < 0 THEN 'failed' ELSE 'ok' END AS verdict,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2
    """,
)
def score_web_flagship_q(spark, sf):
    """C7 shape (the reference's flagship web_connectivity scorer,
    core.py:957-1052): fingerprint containment → confirmed; probe-reported
    blocking passthrough; accuracy gating; one verdict per record — the
    full confirmed/anomaly/failed/ok lattice of C20 (core.py:1517-1539,
    1598-1603)."""
    from pipeline_spark.operators.scoring import confirmed_determination, make_scores

    e = _t(spark, sf, "events").withColumn("_k", _k_col())
    fp_hit = F.instr(F.col("props"), "7") > 0
    scores = make_scores(
        F.least(F.lit(1.0), F.col("value") / 200.0),
        F.when(F.col("_k") % 11 == 0, -1.0).otherwise(1.0),
        F.lit("probe_passthrough"),
    )
    verdict = confirmed_determination(scores, fingerprint_hit=fp_hit)
    return e.select("event_type", verdict.alias("verdict")).groupBy("event_type", "verdict").agg(
        F.count(F.lit(1)).alias("n")
    )


@q("trivial_id_rows", None)  # shake_128 has no SQL twin → rows-only check
def trivial_id_q(spark, sf):
    """P8: deterministic sortable row id (reference utils.py:1692-1711)."""
    from pipeline_spark.functions import trivial_id_udf

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        trivial_id_udf(F.lit("20240101"), F.encode(F.col("text"), "UTF-8")).alias("trivial_id"),
    )


# =====================================================================
# Concrete scorer parameterizations (C4/C5/C6/C11/C12/C14/C15) — the
# remaining entries of the reference's scorer dispatch dict, each with a
# full DuckDB value oracle. Inputs are synthesized deterministically from
# the events payload key k on BOTH sides.
# =====================================================================


@q(
    "score_vanilla_bootstrap",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'view')
    SELECT event_id,
           round(CAST(CASE WHEN k % 5 IN (0, 1, 2) THEN 0.0
                 ELSE 1.0 - least(100, greatest(0, (k % 130) - 10)) * 0.004 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 5 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_vanilla_q(spark, sf):
    """C6: vanilla_tor bootstrap-progress formula (core.py:908-940) —
    null log → unscored; success marker → 0; else 1 − clamp(progress)×0.004
    (progress is synthesized over [-10, 119] so both clamps are exercised)."""
    from pipeline_spark.operators.scoring import bootstrap_progress_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "view").withColumn("_k", _k_col())
    k = F.col("_k")
    log = (
        F.when(k % 5 == 0, F.lit(None).cast("string"))
        .when(k % 5 == 1, F.lit("x Bootstrapped 100%: Done y"))
        .when(k % 5 == 2, F.lit("x Bootstrapped 100% (done): Done y"))
        .otherwise(F.lit("Bootstrapping in progress"))
    )
    progress = (k % 130) - 10
    s = bootstrap_progress_scorer(
        log, progress, ["Bootstrapped 100%: Done", "Bootstrapped 100% (done): Done"]
    )
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_meek_responses",
    f"""
    WITH t AS (SELECT event_id, ({_K}) % 5 AS m FROM events WHERE event_type = 'error')
    SELECT event_id,
           round(CAST(CASE m WHEN 0 THEN 1.0 WHEN 1 THEN 1.0 WHEN 2 THEN 1.0
                             WHEN 3 THEN 0.5 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN m = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_meek_q(spark, sf):
    """C11: meek status + Server-header-prefix check (core.py:1154-1194) —
    empty requests → blocked+unscorable; a missing response or non-200 →
    blocked; each 200 whose Server lacks the CDN prefix adds 0.5."""
    from pipeline_spark.operators.scoring import response_check_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "error").withColumn("_k", _k_col())
    m = F.col("_k") % 5
    resp_t = "struct<code:int,server:string>"

    def r(code, server):
        return F.struct(F.lit(code).cast("int").alias("code"), F.lit(server).alias("server"))

    null_resp = F.lit(None).cast(resp_t)
    responses = (
        F.when(m == 0, F.array().cast(f"array<{resp_t}>"))
        .when(m == 1, F.array(null_resp, r(200, "ECAcc x")))
        .when(m == 2, F.array(r(404, "ECAcc x")))
        .when(m == 3, F.array(r(200, "nginx"), r(200, "ECAcc y")))
        .otherwise(F.array(r(200, "ECAcc a"), r(200, "ECAcc b")))
    )
    s = response_check_scorer(responses, server_prefix="ECAcc ")
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_http_requests_legacy",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'purchase')
    SELECT event_id,
           round(CAST(CASE WHEN k % 7 = 0 OR k % 4 = 0 THEN 0.0
                           WHEN k % 4 = 2 OR k % 3 = 0 THEN 1.0
                           ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 7 = 0 OR k % 4 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_http_requests_q(spark, sf):
    """C14: legacy http_requests match-flag scorer (core.py:1287-1332) —
    control/experiment failure or a missing match flag → unusable;
    otherwise !(body_length_match AND headers_match) → blocking 1. (The
    reference's fingerprint-confirmation tail is the C17/C18 joins.)"""
    from pipeline_spark.operators.scoring import match_flags_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "purchase").withColumn("_k", _k_col())
    k = F.col("_k")
    body_len_match = F.when(k % 4 == 0, F.lit(None).cast("boolean")).otherwise(k % 4 != 2)
    headers_match = k % 3 != 0
    failed = k % 7 == 0
    s = match_flags_scorer([body_len_match, headers_match], failed)
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_signal_version_gated",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k, value FROM events WHERE event_type = 'signup')
    SELECT event_id,
           round(CAST(CASE WHEN k % 3 = 1 THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 11 = 0 OR (k % 2 = 0 AND value >= 50) THEN 0.0
                           WHEN k % 3 IN (0, 1) THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_signal_q(spark, sf):
    """C15: version-gated signal backend-status scorer (core.py:1344-1378)
    — failed operation → unusable; probes older than 0.2.2 measuring after
    the backend change → unusable (ooni/probe#2344); 'blocked' → 1,
    'ok' → 0, anything else unusable."""
    from pipeline_spark.operators.scoring import status_gate_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "signup").withColumn("_k", _k_col())
    k = F.col("_k")
    status = (
        F.when(k % 3 == 0, F.lit("ok")).when(k % 3 == 1, F.lit("blocked")).otherwise(F.lit("weird"))
    )
    version = F.when(k % 2 == 0, F.lit("0.2.1")).otherwise(F.lit("0.3.0"))
    s = status_gate_scorer(
        status,
        failure_gate=k % 11 == 0,
        version_col=version,
        min_version="0.2.2",
        cutoff_gate=F.col("value") >= 50,
    )
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_zip_compare",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'click')
    SELECT event_id,
           round(CAST(CASE WHEN k % 5 >= 2 AND k % 3 = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 5 = 0 AND k % 4 <> 0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_zip_compare_q(spark, sf):
    """C4: positional sent-vs-received zip compare (core.py:732-763) —
    both empty → unusable; a mutation inside the zipped prefix → blocking 1;
    a trailing extra line beyond the shorter list is ignored (zip
    truncation), exercised via the k%4 appended element."""
    from pipeline_spark.operators.scoring import zip_compare_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "click").withColumn("_k", _k_col())
    k = F.col("_k")
    base = F.array(F.lit("GET /"), F.lit("Host: x"), F.lit("Accept: *"), F.lit("UA: probe"))
    sent = F.slice(base, F.lit(1), (k % 5).cast("int"))
    # received: sent with position 2 tampered when k%3=0, plus an extra
    # trailing line when k%4=0 (beyond the zip prefix → must not score)
    received = F.transform(
        sent, lambda x, i: F.when((k % 3 == 0) & (i == 1), F.lit("TAMPERED")).otherwise(x)
    )
    received = F.when(k % 4 == 0, F.concat(received, F.array(F.lit("extra")))).otherwise(received)
    s = zip_compare_scorer(sent, received)
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_psiphon_bootstrap",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'view')
    SELECT event_id,
           round(CAST(CASE WHEN k % 4 = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 13 = 0 THEN 0.0
                           WHEN k % 4 <> 0 AND k % 3 = 0 THEN 0.0
                           ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_psiphon_q(spark, sf):
    """C12: psiphon failure/bootstrap scorer (core.py:1196-1230) — a
    failure (bootstrap or runtime) → blocking 1; null failure with
    bootstrap_time 0 is an invalid measurement; missing resolver_ip voids
    accuracy."""
    from pipeline_spark.operators.scoring import bootstrap_failure_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "view").withColumn("_k", _k_col())
    k = F.col("_k")
    failure = F.when(k % 4 == 0, F.lit("timeout")).otherwise(F.lit(None).cast("string"))
    bootstrap_time = F.when(k % 3 == 0, F.lit(0.0)).otherwise((k % 10).cast("double") + 1.0)
    s = bootstrap_failure_scorer(failure, bootstrap_time, resolver_ok=k % 13 != 0)
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_whatsapp_version_gate",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k, 1 + ({_K}) % 4 AS m FROM events WHERE event_type = 'signup')
    SELECT event_id,
           round(CASE WHEN k % 3 = 0 AND k % 5 = 0 THEN 0.0
                 ELSE CAST(greatest(m - 2, 0) AS DOUBLE) / m END, 6) AS blocking
    FROM t
    """,
)
def score_whatsapp_gate_q(spark, sf):
    """C5: whatsapp multi-part ratio + version-gated false-positive patch
    (core.py:797-905, gate at :840-848): affected software versions
    reporting 'blocked' hit the unsupported-browser page — their blocking
    signal collapses to 0."""
    from pipeline_spark.operators.scoring import combined_ratio_scorer, gate_false_positive

    e = _t(spark, sf, "events").filter(F.col("event_type") == "signup").withColumn("_k", _k_col())
    k = F.col("_k")
    part = F.sequence(F.lit(1), (F.lit(1) + k % 4).cast("int"))
    base = combined_ratio_scorer([(part, lambda x: x > 2)])
    version = F.when(k % 3 == 0, F.lit("2.2.0")).otherwise(F.lit("3.0.0"))
    web_blocked = k % 5 == 0
    gated = gate_false_positive(
        base, version.isin("2.1.0", "2.2.0", "2.3.0") & web_blocked
    )
    return e.select("event_id", F.round(gated["blocking"], 6).alias("blocking"))


@q(
    "score_stun_torsf_failure",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'error')
    SELECT event_id,
           round(CAST(CASE WHEN k % 4 = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(1.0 AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_stun_torsf_q(spark, sf):
    """C8 concrete: the stun_reachability / torsf failure-flag shape
    (core.py:1381-1413) — a non-empty failure string means blocked,
    always scored."""
    from pipeline_spark.operators.scoring import simple_failure_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "error").withColumn("_k", _k_col())
    k = F.col("_k")
    failure = F.when(k % 4 == 0, F.lit("stun_timeout")).otherwise(F.lit(None).cast("string"))
    s = simple_failure_scorer(failure)
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )


@q(
    "score_riseupvpn_flags",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'click')
    SELECT event_id,
           round(CAST(CASE WHEN k % 5 = 0 OR k % 7 = 0 OR k % 11 = 0 OR k % 13 = 0
                      THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking
    FROM t
    """,
)
def score_riseupvpn_q(spark, sf):
    """C8 concrete: the riseupvpn anomaly-flag shape (core.py:1415-1436)
    — api blocked OR bad CA cert OR either transport blocked → blocking
    1. Composed from :func:`flag_count_scorer` with weight 1 (any TRUE
    anomaly flag saturates the cap)."""
    from pipeline_spark.operators.scoring import flag_count_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "click").withColumn("_k", _k_col())
    k = F.col("_k")
    s = flag_count_scorer(
        [],
        [k % 5 == 0, k % 7 == 0, k % 11 == 0, k % 13 == 0],
        weight=1.0,
    )
    return e.select("event_id", F.round(s["blocking"], 6).alias("blocking"))


@q(
    "score_openvpn_success",
    f"""
    WITH t AS (SELECT event_id, {_K} AS k FROM events WHERE event_type = 'purchase')
    SELECT event_id,
           round(CAST(CASE WHEN k % 5 <> 0 AND k % 2 <> 0 THEN 1.0 ELSE 0.0 END AS DOUBLE), 6) AS blocking,
           round(CAST(CASE WHEN k % 5 = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE), 6) AS accuracy
    FROM t
    """,
)
def score_openvpn_q(spark, sf):
    """C8 concrete: the openvpn tri-state success shape
    (core.py:1438-1449) — success False → blocking 1, success missing →
    unscorable, success True → reachable."""
    from pipeline_spark.operators.scoring import tristate_success_scorer

    e = _t(spark, sf, "events").filter(F.col("event_type") == "purchase").withColumn("_k", _k_col())
    k = F.col("_k")
    success = F.when(k % 5 == 0, F.lit(None).cast("boolean")).otherwise(k % 2 == 0)
    s = tristate_success_scorer(success)
    return e.select(
        "event_id", F.round(s["blocking"], 6).alias("blocking"), F.round(s["accuracy"], 6).alias("accuracy")
    )
